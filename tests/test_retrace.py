"""jit-cache stability: every benchmark model must trace its step exactly once.

Regression guard for the round-2 FLIP bug: the particle Field's NAN-outside
boundary (``ConstantExtrapolation(nan)``) lived in jit aux data, and NaN != NaN
made every treedef comparison fail, so the step re-traced (and on TPU
re-compiled) on EVERY call — a silent 100x slowdown that polluted the shipped
benchmark numbers (BENCH_r02.json flip_128^2: 659 ms vs the true ~6.6 ms).
Reference workload: /root/reference/docs/FLIP.ipynb, tests/release/test_flip.py.
"""
import jax
import pytest

from phiflow_tpu.models import FlipLiquid, SmokePlume, Burgers, KolmogorovFlow, LidDrivenCavity


MODELS = {
    'flip': lambda: FlipLiquid(resolution=24),
    'smoke2d': lambda: SmokePlume(resolution=16, dims=2),
    'smoke3d': lambda: SmokePlume(resolution=8, dims=3),
    'burgers': lambda: Burgers(resolution=16),
    'kolmogorov': lambda: KolmogorovFlow(resolution=16),
    'cavity': lambda: LidDrivenCavity(resolution=16),
    'cavity_obstacle': lambda: LidDrivenCavity(resolution=16, obstacle=True),
}


@pytest.mark.parametrize('name', sorted(MODELS))
def test_step_traces_once(name):
    """The cache must not GROW per step. The first call may legitimately trace
    a second signature when global state differs (another test's x64 context /
    device placement can shift weak-type promotion for the initial state), so
    the guard pins the size AFTER the state pytree stabilizes — the round-2 bug
    re-traced on EVERY call, which this still catches. bench.py additionally
    asserts absolute post-warmup stability on the real-TPU path."""
    model = MODELS[name]()
    step = jax.jit(lambda s: model.step(*s))
    state = model.initial_state()
    state = step(state)
    state = step(state)
    size_after_warmup = step._cache_size()
    assert size_after_warmup <= 2, f"{name}: {size_after_warmup} traces in 2 calls"
    for _ in range(3):
        state = step(state)
    assert step._cache_size() == size_after_warmup, \
        f"{name}: jit cache grew {size_after_warmup} -> {step._cache_size()} during steady-state steps — " \
        f"state aux data compares unequal across steps (NaN-unsafe __eq__ or host/device drift)"


def test_nan_extrapolation_aux_is_comparable():
    """ConstantExtrapolation(nan) must flatten to aux data that compares equal."""
    import math as pymath
    from phiflow_tpu.math._extrapolation import ConstantExtrapolation
    t1 = jax.tree_util.tree_structure(ConstantExtrapolation(float('nan')))
    t2 = jax.tree_util.tree_structure(ConstantExtrapolation(float('nan')))
    assert t1 == t2
    # and it round-trips back to an actual NaN constant
    leaves, treedef = jax.tree_util.tree_flatten(ConstantExtrapolation(float('nan')))
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    assert pymath.isnan(float(restored.value))


def test_host_math_keeps_session_precision():
    """Host (numpy) tensor arithmetic must not widen f32 state to f64 — a f64
    leaf in a model state makes the first jit call occupy a different cache
    entry than the steady state."""
    import numpy as np
    from phiflow_tpu.math import wrap, instance, channel
    a = wrap(np.zeros((3, 2), np.float32), instance(points=3) & channel(vector='x,y'))
    assert (a * (0, 1)).dtype == np.float32      # f32 * int-tuple stays f32
    assert (a * 2).dtype == np.float32           # python scalar stays weak
    assert (a / wrap(2)).dtype == np.float32     # int division at session precision
