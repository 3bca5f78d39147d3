"""phiflow_tpu.parallel — multi-chip sharding over the ICI mesh.

This subsystem has NO reference counterpart: tum-pbs/PhiFlow is single-device
(SURVEY.md §2.7 — no distributed runtime at all). It is the TPU-native extension
that makes large spatial domains scale:

 * **Domain decomposition** (the SP/CP analog for PDE grids): spatial dims of
   grid Fields are sharded across mesh axes with `jax.sharding.NamedSharding`.
   Under `jax.jit`, XLA GSPMD partitions every stencil op and inserts
   halo-exchange collective-permutes over ICI automatically; global reductions
   inside the CG solve become psums.
 * **Data parallel**: named `batch` dims map to a data mesh axis and compose
   freely with spatial sharding.

Explicit `shard_map` + Pallas ring-halo kernels (phiflow_tpu.ops) can override
the GSPMD default where manual scheduling wins.
"""
from ._mesh import (
    create_mesh, sharding_for, shard_tensor, shard_field, replicate, with_sharding_constraint_field,
    simulation_mesh,
)
from ._halo import halo_exchange_spec
from ._context import decomposition, set_decomposition, current_decomposition
