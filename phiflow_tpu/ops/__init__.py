"""phiflow_tpu.ops — Pallas TPU kernels for the hot numerical paths.

The reference outsources all native execution to Torch-CUDA/XLA (SURVEY.md §2.0:
no native code of its own). Here, the performance-critical compositions that XLA
cannot fuse optimally are hand-written Pallas kernels:

 * `stencil`   — fused Laplacian / masked-laplace matvec over VMEM tiles
                 (one HBM round-trip for the whole CG matvec).
 * `interp`    — fused gather-interpolation for semi-Lagrangian advection.

Each kernel has a pure-XLA reference implementation for correctness testing
(interpret mode on CPU; SURVEY.md §4 "Pallas kernel vs pure-XLA consistency").
Dispatch helpers choose Pallas on TPU, XLA elsewhere.
"""
from .stencil import laplacian_2d, laplacian_2d_xla, use_pallas
