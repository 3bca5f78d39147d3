"""phiflow_tpu.utils — profiling, benchmarking, checkpointing.

TPU-native replacements for the reference's aux subsystems (SURVEY.md §5):
Φ-Board's step benchmark → `benchmark`; TF profiler/TensorBoard launcher →
`profile` (jax.profiler traces viewable in TensorBoard/Perfetto); Scene-based
checkpointing is complemented by an orbax-backed `CheckpointManager` for
training state (the recovery story the reference lacks).
"""
from ._profile import profile, profile_function, benchmark, Timer
from ._checkpoint import CheckpointManager, save_checkpoint, load_checkpoint
