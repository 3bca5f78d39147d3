"""Generic explicit time integrators over state tuples
(reference: /root/reference/phi/physics/integrate.py:4-16)."""
from __future__ import annotations

__all__ = ['rk4', 'euler']


def _mul(state, factor):
    if isinstance(state, tuple):
        return tuple(_mul(s, factor) for s in state)
    return state * factor


def _add(a, b):
    if isinstance(a, tuple):
        return tuple(_add(x, y) for x, y in zip(a, b))
    return a + b


def rk4(pde, state, dt, **pde_kwargs):
    k1 = pde(*state, **pde_kwargs) if isinstance(state, tuple) else pde(state, **pde_kwargs)
    s2 = _add(state, _mul(k1, dt / 2))
    k2 = pde(*s2, **pde_kwargs) if isinstance(s2, tuple) else pde(s2, **pde_kwargs)
    s3 = _add(state, _mul(k2, dt / 2))
    k3 = pde(*s3, **pde_kwargs) if isinstance(s3, tuple) else pde(s3, **pde_kwargs)
    s4 = _add(state, _mul(k3, dt))
    k4 = pde(*s4, **pde_kwargs) if isinstance(s4, tuple) else pde(s4, **pde_kwargs)
    incr = _add(_add(k1, _mul(k2, 2)), _add(_mul(k3, 2), k4))
    return _add(state, _mul(incr, dt / 6))


def euler(pde, state, dt, **pde_kwargs):
    k = pde(*state, **pde_kwargs) if isinstance(state, tuple) else pde(state, **pde_kwargs)
    return _add(state, _mul(k, dt))
