"""Docs-as-tests: execute every ```python block in the tutorial markdown files
(SURVEY.md §4 — the reference counts its executable notebooks as tests;
reference analogs: docs/Fluids_Tutorial.ipynb, Math_Introduction.ipynb,
FLIP.ipynb, Scene_Format_Specification.md).

Blocks within one document share a namespace and run in order, so tutorials
are written exactly like a notebook."""
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), '..', '..', 'docs')

TUTORIALS = ['Math_Introduction.md', 'Fluids_Tutorial.md', 'FLIP.md',
             'Scene_Format_Specification.md', 'Geometry.md', 'SDF.md',
             'Heightmaps.md', 'IO_with_Scenes.md', 'Unstructured_Meshes.md',
             'Physics.md', 'Visualization.md', 'Cookbook.md']

_BLOCK = re.compile(r'```python\n(.*?)```', re.DOTALL)


def _blocks(name):
    with open(os.path.join(DOCS, name)) as f:
        return _BLOCK.findall(f.read())


@pytest.mark.parametrize('name', TUTORIALS)
def test_tutorial_runs(name):
    blocks = _blocks(name)
    assert blocks, f"{name} has no runnable python blocks"
    ns = {}
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"{name}[block {i}]", 'exec'), ns)
        except Exception as exc:
            raise AssertionError(f"{name} block {i} failed: {type(exc).__name__}: {exc}\n{code}") from exc
