"""Setup diagnostics (reference: /root/reference/phi/_troubleshoot.py:7-66).

`troubleshoot()` returns a human-readable report of the installation: package
versions, device inventory, jit/compilation-cache status, Pallas availability,
vis/web-GUI readiness — the TPU analog of the reference's per-backend checks.
"""
from __future__ import annotations

__all__ = ['assert_minimal_config', 'troubleshoot', 'troubleshoot_jax', 'troubleshoot_vis']


def assert_minimal_config():
    """Raise AssertionError if the base requirements are missing (reference: :7)."""
    import sys
    assert sys.version_info.major == 3 and sys.version_info.minor >= 9, \
        f"phiflow_tpu requires Python 3.9+, found {sys.version}"
    try:
        import numpy  # noqa: F401
    except ImportError:
        raise AssertionError("numpy is required")
    try:
        import jax  # noqa: F401
        import jax.numpy  # noqa: F401
    except ImportError:
        raise AssertionError("jax is required (the only compute backend)")


def troubleshoot_jax() -> str:
    import jax
    lines = [f"jax {jax.__version__}"]
    try:
        devices = jax.devices()
        lines.append(f"default backend: {jax.default_backend()}, devices: {devices}")
    except Exception as e:
        return f"jax {jax.__version__} — device initialization FAILED: {e}"
    try:
        import jax.numpy as jnp
        y = jax.jit(lambda x: x * 2.0)(jnp.ones(8))
        assert float(y.sum()) == 16.0
        lines.append("jit compile+execute: OK")
    except Exception as e:
        lines.append(f"jit FAILED: {e}")
    try:
        from .ops.interp import pallas_available
        lines.append(f"pallas TPU kernels: {'active' if pallas_available() else 'inactive (non-TPU backend)'}")
    except Exception as e:
        lines.append(f"pallas probe failed: {e}")
    cache = jax.config.jax_compilation_cache_dir if hasattr(jax.config, 'jax_compilation_cache_dir') else None
    lines.append(f"compilation cache: {cache or 'not configured'}")
    return '\n'.join(lines)


def troubleshoot_vis() -> str:
    lines = []
    try:
        import matplotlib
        lines.append(f"matplotlib {matplotlib.__version__} (backend {matplotlib.get_backend()})")
    except ImportError:
        lines.append("matplotlib NOT installed — plot()/show() unavailable")
    try:
        from .vis._plotly_plots import plotly_available
        lines.append(f"plotly backend: {'available' if plotly_available() else 'not installed (matplotlib + web GUI active)'}")
    except Exception as e:
        lines.append(f"plotly probe failed: {e}")
    lines.append("web GUI: built-in (std-lib http.server, vis.WebGui)")
    return '\n'.join(lines)


def troubleshoot() -> str:
    """Full diagnostic report (reference: :26)."""
    from . import __version__
    import numpy
    parts = [f"phiflow_tpu {__version__}", f"numpy {numpy.__version__}", troubleshoot_jax(), troubleshoot_vis()]
    try:
        from .math import spatial
        from .field import CenteredGrid, Noise, laplace
        _ = laplace(CenteredGrid(Noise(), 0., x=8, y=8))
        parts.append("field ops smoke test: OK")
    except Exception as e:
        parts.append(f"field ops smoke test FAILED: {e}")
    try:
        from .native._lib import build_face_tables_2d  # noqa: F401
        parts.append("native C++ mesh builder: loaded")
    except Exception:
        parts.append("native C++ mesh builder: unavailable (python fallback active)")
    return '\n'.join(parts)
