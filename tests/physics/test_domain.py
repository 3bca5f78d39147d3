"""Legacy Domain API (reference: phi/physics/_boundaries.py:72 — deprecated but public)."""
import warnings

import numpy as np
import pytest


def test_domain_factories():
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        from phiflow_tpu.physics import Domain, CLOSED, PERIODIC_DOMAIN
        d = Domain(x=16, y=16, boundaries=CLOSED)
        assert d.rank == 2
        s = d.grid(1.)
        assert float(np.asarray(s.values.native(('x', 'y'))).sum()) == 256.0
        v = d.staggered_grid(0.)
        assert v.is_staggered
        vg = d.vector_grid(0.)
        assert 'vector' in vg.values.shape
        p = Domain(x=8, boundaries=PERIODIC_DOMAIN)
        from phiflow_tpu.math import extrapolation
        assert p.grid(0.).boundary == extrapolation.PERIODIC


def test_domain_simulation_roundtrip():
    """Domain grids plug straight into make_incompressible."""
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        from phiflow_tpu.physics import Domain, CLOSED, fluid
        from phiflow_tpu.math import Solve, ConvergenceException
        from phiflow_tpu.field import Noise, divergence, resample
        d = Domain(x=16, y=16, boundaries=CLOSED)
        v = d.staggered_grid(Noise())
        v2, p = fluid.make_incompressible(v, (), Solve('CG', 1e-4, 1e-4, suppress=(ConvergenceException,)))
        div = divergence(v2)
        assert float(abs(div.values).max) < 1e-2 if hasattr(abs(div.values), 'max') else True
        import phiflow_tpu.math as math
        assert float(math.max(abs(div.values))) < 1e-2
