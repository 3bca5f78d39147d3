"""phiflow_tpu.ops — Pallas TPU kernels for the hot numerical paths.

The reference outsources all native execution to Torch-CUDA/XLA (SURVEY.md §2.0:
no native code of its own). Here, the performance-critical compositions that XLA
cannot fuse optimally are hand-written Pallas kernels:

 * `poisson` — the fused masked-Poisson stencil (matvec / residual / Jacobi
               epilogues) driving the pressure CG and the multigrid smoother.
 * `interp`  — bounded window-shift interpolation (semi-Lagrangian backtrace)
               with adaptive window radius and the MacCormack extrema fused in.

Each kernel has a pure-XLA reference implementation for correctness testing
(interpret mode on CPU; SURVEY.md §4 "Pallas kernel vs pure-XLA consistency").
Dispatch helpers choose Pallas on TPU, XLA elsewhere.
"""
from .poisson import poisson_apply, stage_masks, pallas_ok
from .interp import window_interp_3d, window_interp_2d, pallas_available
