"""Measure the MG V-cycle's residual-reduction factor and the CG iteration
count it yields, per storage dtype — isolates preconditioner-quality
regressions (e.g. bf16 level storage) from speed work."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(res=128):
    from phiflow_tpu.ops import poisson
    from phiflow_tpu.math._multigrid import make_poisson_vcycle

    shape = (res,) * 3
    bc = (('neumann', 'neumann'),) * 3
    inv = (1.0, 1.0, 1.0)
    b = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    b = b - jnp.mean(b)  # compatible RHS for the singular Neumann system

    def resid_norm(u, bb):
        r = poisson.poisson_apply(u.reshape(shape), inv, bc, b=bb.reshape(shape), mode='residual')
        return jnp.sqrt(jnp.sum(r * r))

    for dtype in ('float32', 'bfloat16'):
        vc = make_poisson_vcycle(shape, (1., 1., 1.), bc, dtype=jnp.dtype(dtype).type)

        @jax.jit
        def one(bb):
            u = vc(bb.reshape((1,) + shape)).reshape(shape)
            return resid_norm(u, bb)

        b0 = float(np.asarray(jnp.sqrt(jnp.sum(b * b))))
        r1 = float(np.asarray(one(b)))
        print(f"{dtype}: |b|={b0:.4e}  |r after 1 V-cycle|={r1:.4e}  reduction={r1/b0:.4f}")

        # CG with this preconditioner
        from phiflow_tpu.math._solve import _cg
        A = lambda xs: [poisson.poisson_apply(xs[0], inv, bc)]
        M = lambda rs: [vc(rs[0].reshape((1,) + shape)).reshape(shape)]

        @jax.jit
        def solve(bb):
            x, res, it, conv = _cg(A, [bb], [jnp.zeros_like(bb)], 1e-3, 0.0, 60, M=M, nb=0,
                                   fused_dot=True)
            return res, it

        res_n, it = solve(b)
        print(f"  CG(tol 1e-3, fused_dot=True):  iters={int(np.asarray(it))}  res={float(np.asarray(res_n)):.3e}")

        @jax.jit
        def solve_nf(bb):
            x, res, it, conv = _cg(A, [bb], [jnp.zeros_like(bb)], 1e-3, 0.0, 60, M=M, nb=0,
                                   fused_dot=False)
            return res, it

        res_n, it = solve_nf(b)
        print(f"  CG(tol 1e-3, fused_dot=False): iters={int(np.asarray(it))}  res={float(np.asarray(res_n)):.3e}")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
