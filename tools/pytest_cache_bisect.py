"""Diagnostic pytest plugin (opt-in via -p tools.pytest_cache_bisect):
after every test, run a trivial jit probe and report the first test after
which the C++ pjit fast-path cache stops populating (cache_size stays 0),
then dump the jax dispatch-state that explains WHY and exit early.
Used to root-cause the full-suite-order-only SPH cache-guard failure."""
import sys

_broken_after = None
_snapshot = None


def _trace_context():
    from jax._src import config as jconfig
    return jconfig.trace_context()


def pytest_sessionstart(session):
    global _snapshot
    try:
        _snapshot = _trace_context()
    except Exception as e:  # pragma: no cover
        _snapshot = None
        sys.stderr.write(f"[cache-bisect] snapshot failed: {e}\n")


def _dump(out):
    import jax
    from jax._src import core
    out.write(f"[cache-bisect] trace_state_clean={core.trace_state_clean()}\n")
    try:
        out.write(f"[cache-bisect] trace_ctx.trace={core.trace_ctx.trace!r}\n")
        out.write(f"[cache-bisect] trace_ctx.axis_env={core.trace_ctx.axis_env!r}\n")
    except Exception as e:
        out.write(f"[cache-bisect] trace_ctx introspect failed: {e}\n")
    try:
        from jax._src.lib import jax_jit
        gs = jax_jit.global_state()
        ts = jax_jit.thread_local_state()
        for name in ('disable_jit', 'enable_x64', 'post_hook', 'extra_jit_context',
                     'default_device', 'enable_memories'):
            g = getattr(gs, name, '<absent>')
            t = getattr(ts, name, '<absent>')
            out.write(f"[cache-bisect] jax_jit global.{name}={g!r} thread.{name}={t!r}\n")
    except Exception as e:
        out.write(f"[cache-bisect] jax_jit introspect failed: {e}\n")
    try:
        cur = _trace_context()
        if _snapshot is not None and type(cur) is type(_snapshot) and len(cur) == len(_snapshot):
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(_snapshot, cur)) if a != b]
            out.write(f"[cache-bisect] trace_context diffs vs session start: {len(diffs)}\n")
            for i, a, b in diffs[:20]:
                out.write(f"[cache-bisect]   [{i}] {a!r} -> {b!r}\n")
        else:
            out.write(f"[cache-bisect] trace_context now: {cur!r}\n")
    except Exception as e:
        out.write(f"[cache-bisect] trace_context diff failed: {e}\n")
    # Does the python-side fastpath builder even get healthy inputs? Re-run the
    # probe with internal monkeypatch to see what _get_fastpath_data returns.
    try:
        import jax.numpy as jnp
        from jax._src import pjit as _pjit
        orig = _pjit._get_fastpath_data
        seen = []

        def spy(*a, **k):
            r = orig(*a, **k)
            seen.append(r is not None)
            return r

        _pjit._get_fastpath_data = spy
        try:
            f = jax.jit(lambda x: x * 3)
            for _ in range(2):
                f(jnp.ones((2,)))
            out.write(f"[cache-bisect] probe2 cache={f._cache_size()} fastpath_data_non_none={seen}\n")
        finally:
            _pjit._get_fastpath_data = orig
    except Exception as e:
        out.write(f"[cache-bisect] fastpath spy failed: {e}\n")


def pytest_runtest_teardown(item, nextitem):
    global _broken_after
    if _broken_after is not None:
        return
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2)
    for _ in range(2):
        f(jnp.ones((2,)))
    if f._cache_size() != 1:
        _broken_after = item.nodeid
        sys.stderr.write(f"\n[cache-bisect] cpp-pjit cache BROKEN after {item.nodeid} "
                         f"(cache_size={f._cache_size()})\n")
        _dump(sys.stderr)
        import pytest
        pytest.exit(f"[cache-bisect] broken after {item.nodeid}", returncode=3)


def pytest_sessionfinish(session, exitstatus):
    if _broken_after:
        sys.stderr.write(f"\n[cache-bisect] first breaking test: {_broken_after}\n")
    else:
        sys.stderr.write("\n[cache-bisect] cpp-pjit cache healthy for all tests\n")
