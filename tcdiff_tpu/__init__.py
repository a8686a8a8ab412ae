"""tcdiff_tpu — TPU-native framework for harmonious group choreography.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TCDiff
("Harmonious Group Choreography with Trajectory-Controllable Diffusion",
AAAI 2025): music-conditioned group dance generation on AIOZ-GDance via a
two-stage pipeline — a Dance-Beat Navigator that autoregressively predicts
per-dancer global XY trajectories from music, and a trajectory-conditioned
Gaussian diffusion model over a multi-dancer transformer that generates
full-body SMPL motion.

Design principles (TPU-first, not a port):
  * pure-functional core: params are pytrees, every hot path is `jit`-able
  * samplers and recurrences are `lax.scan`s, not Python loops
  * classifier-free guidance is ONE batched forward, not two calls
  * SMPL forward kinematics is level-parallel over the joint tree
  * data parallelism is `jax.sharding.Mesh` + collectives over ICI,
    not NCCL/DDP
"""

__version__ = "0.1.0"

from tcdiff_tpu.config import (  # noqa: F401
    DanceDecoderConfig,
    DiffusionConfig,
    TrainConfig,
    TrajDecoderConfig,
    TCDiffConfig,
)
