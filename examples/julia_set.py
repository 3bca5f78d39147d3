"""Julia-set fractals via `iterate` over complex tensors (reference recipe:
/root/reference/examples/grids/Julia_Set.ipynb): J_c membership counts sampled
on a CenteredGrid from a function of the re/im coordinates, animated over a
circle of c values carried as a batch dim."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
jax.config.update('jax_platforms', 'cpu')  # complex dtypes are unimplemented on the axon TPU runtime
import numpy as np

from phiflow_tpu.flow import *

PI = np.pi


def julia_map(z, counter, c):
    next_z = z ** 2 + c
    counter += math.to_float(abs(z) < 2)
    return next_z, counter


def belongs_to_julia_set(z, c, iter_count: int):
    final_z, final_counter = math.iterate(julia_map, iter_count, z, 0. * abs(z), c=c)
    return final_counter


if __name__ == '__main__':
    c = 0.7885 * math.exp(1j * math.linspace(0., 2 * PI, batch(time=8)))
    sampled = CenteredGrid(lambda re, im: belongs_to_julia_set(re + im * 1j, c, 50),
                           re=128, im=128, bounds=Box(re=(-2, 2), im=(-2, 2)))
    counts = sampled.values
    assert 'time' in counts.shape, counts.shape
    counts_np = np.asarray(counts.native(('time', 're', 'im')))
    mean_iter = float(counts_np.mean())
    max_iter = float(counts_np.max())
    print(f"J_c over {counts.shape.get_size('time')} c values: mean escape count "
          f"{mean_iter:.2f}, max {max_iter:.0f}")
    assert max_iter == 50, "interior points must survive all 50 iterations"
    assert 1 < mean_iter < 50, "escape counts should be non-trivial"
    print("done")
