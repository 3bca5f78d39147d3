"""Run all ```python blocks of a docs/*.md file in one namespace (same as
tests/docs/test_tutorials.py) — quick local check before adding to CI."""
import os
import re
import sys

os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

path = sys.argv[1]
blocks = re.findall(r'```python\n(.*?)```', open(path).read(), re.DOTALL)
ns = {}
for i, code in enumerate(blocks):
    try:
        exec(compile(code, f"{path}[block {i}]", 'exec'), ns)
    except Exception as exc:
        print(f"FAIL block {i}: {type(exc).__name__}: {exc}\n{code}")
        sys.exit(1)
print(f"OK {len(blocks)} blocks")
