"""HBM bandwidth probe: what read+write rate does a trivial elementwise op
actually achieve at various shapes/batches? Establishes the roofline unit for
the 512^3 pressure-solve budget (VERDICT r4 #1)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(shape, n=20, donate=True, dtype=jnp.float32):
    x = jnp.zeros(shape, dtype)
    f = jax.jit((lambda a: a + 1.0), donate_argnums=(0,) if donate else ())
    x = f(x)
    float(jnp.sum(x[..., :1]))
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    float(jnp.sum(x[..., :1]))
    dt = (time.perf_counter() - t0) / n
    nbytes = x.size * x.dtype.itemsize
    gbps = 2 * nbytes / dt / 1e9
    print(f"{str(shape):>24} {str(np.dtype(dtype)):>8} donate={donate}: "
          f"{dt*1e3:7.2f} ms  {gbps:7.1f} GB/s")
    return gbps


def main():
    print(f"device: {jax.devices()[0]}")
    probe((512, 512, 512))
    probe((512, 512, 512), donate=False)
    probe((256, 256, 256))
    probe((128, 512, 512))
    probe((512 * 512 * 512,))
    probe((1024, 512 * 256))
    probe((512, 512, 512), dtype=jnp.bfloat16)
    # fused multi-array op: a*b+c (3 reads 1 write)
    a = jnp.zeros((512, 512, 512), jnp.float32)
    b = jnp.ones_like(a)
    c = jnp.ones_like(a)
    f = jax.jit(lambda a, b, c: a * b + c)
    out = f(a, b, c)
    float(jnp.sum(out[..., :1]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(a, b, c)
    float(jnp.sum(out[..., :1]))
    dt = (time.perf_counter() - t0) / 10
    print(f"a*b+c 512^3: {dt*1e3:7.2f} ms  {4 * a.size * 4 / dt / 1e9:7.1f} GB/s")


if __name__ == '__main__':
    main()
