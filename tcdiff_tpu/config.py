"""Typed configuration tree for the whole framework.

The reference hardcodes its constants across call sites
(`/root/reference/TCDiff.py:56-102`, `/root/reference/model/diffusion.py:291,387`,
`/root/reference/args.py:4-68`, `/root/reference/TrajDecoder/options/option_traj.py:3-70`).
Here every knob lives in one dataclass tree; CLI flags map onto these fields.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DanceDecoderConfig:
    """Denoiser network (reference `model/model.py:416-540`, built at `TCDiff.py:76-87`)."""

    nfeats: int = 151  # 4 contacts + 3 root + 24*6 rot6d
    seq_len: int = 150  # 5 s @ 30 FPS
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    dropout: float = 0.1
    cond_feature_dim: int = 438  # librosa 438-d music features @ 60 FPS
    dancer_num: int = 3
    max_dancers: int = 10  # size of the shared trajectory embedding table
    head_dim: int = 64  # SBI-MSA per-head projection dim (d_k)

    @property
    def tokens(self) -> int:
        return self.seq_len * self.dancer_num


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Gaussian diffusion (reference `model/diffusion.py:79-172`, `TCDiff.py:90-102`)."""

    n_timestep: int = 1000
    schedule: str = "cosine"
    loss_type: str = "l2"
    clip_denoised: bool = True
    predict_epsilon: bool = False  # model predicts x0 directly
    guidance_weight: float = 2.0
    use_p2: bool = False
    cond_drop_prob: float = 0.25
    sampling_timesteps: int = 50  # DDIM steps (`model/diffusion.py:387`)
    ddim_eta: float = 1.0
    # lax.scan unroll factor for the sampling loops (XLA can pipeline
    # consecutive steps; costs compile time)
    scan_unroll: int = 1
    # loss weights (`model/diffusion.py:735-740`)
    w_recon: float = 0.636
    w_velocity: float = 2.964
    w_fk: float = 0.646
    w_foot: float = 10.942
    # footwork adaptor (`model/diffusion.py:288-383`)
    footwork_frames: Tuple[int, int] = (75, 120)
    footwork_joints: Tuple[int, ...] = (1, 2, 3, 4, 5, 7, 8, 10, 11)
    footwork_blend_width: int = 10


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Diffusion trainer (reference `args.py:17,42-51`, `TCDiff.py:110`)."""

    batch_size: int = 37  # per data-parallel shard
    learning_rate: float = 5e-5
    weight_decay: float = 0.02
    epochs: int = 10000
    save_interval: int = 50
    ema_interval: int = 1
    ema_beta: float = 0.9999
    seed: int = 0
    # Adan betas (`model/adan.py:16`)
    adan_betas: Tuple[float, float, float] = (0.02, 0.08, 0.01)
    adan_eps: float = 1e-8
    # mesh axis sizes; dp=-1 means "all remaining devices"
    dp: int = -1
    tp: int = 1
    # compute dtype for the network forward ("float32" or "bfloat16")
    compute_dtype: str = "float32"
    # rematerialize decoder layers in the backward pass (memory <- FLOPs)
    remat: bool = False
    # train steps per device dispatch: >1 stacks that many host batches
    # and runs them as ONE jitted lax.scan, amortizing per-step host
    # dispatch latency (worth ~25% wall on a tunneled host, measured
    # BENCH_NOTES r5; a local-chip host pays less but still benefits).
    # Logging/NaN-detection granularity becomes per scan block.
    scan_steps: int = 1


@dataclasses.dataclass(frozen=True)
class TrajDecoderConfig:
    """Dance-Beat Navigator (reference `TrajDecoder/model/traj_model.py:125-167`,
    `TrajDecoder/options/option_traj.py:3-70`)."""

    nfeats: int = 2  # global XY
    trans_layer: int = 6
    window_size: int = 100
    step: int = 25
    latent_dim: int = 64
    n_head: int = 4
    dropout: float = 0.1
    cond_feature_dim: int = 438
    # trainer
    total_iter: int = 800_000
    print_iter: int = 5000
    batch_size: int = 128
    lr: float = 2e-3
    gamma: float = 0.05
    lr_milestones: Tuple[int, ...] = (60_000,)
    weight_decay: float = 1e-6
    adam_betas: Tuple[float, float] = (0.5, 0.9)
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset layout (reference `dataset/group_dataset.py:99-165`, `data/slice.py`)."""

    data_path: str = "./data/AIOZ_Dataset/"
    processed_data_dir: str = "./data/dataset_backups/"
    raw_fps: int = 30
    music_fps: int = 60
    slice_length_s: float = 5.0
    slice_stride_s: float = 0.5
    feature_dim: int = 438


@dataclasses.dataclass(frozen=True)
class TCDiffConfig:
    """Top-level bundle used by the CLI and trainers."""

    model: DanceDecoderConfig = dataclasses.field(default_factory=DanceDecoderConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    traj: TrajDecoderConfig = dataclasses.field(default_factory=TrajDecoderConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    def with_dancers(self, n: int) -> "TCDiffConfig":
        return dataclasses.replace(self, model=dataclasses.replace(self.model, dancer_num=n))


# Channel layout of the 151-d motion representation
# (`dataset/group_dataset.py:210-215`): [contacts(4), root_pos(3), rot6d(24*6)]
N_CONTACT = 4
N_ROOT = 3
N_JOINTS = 24
N_ROT6D = N_JOINTS * 6
REPR_DIM = N_CONTACT + N_ROOT + N_ROT6D  # 151
TRAJ_XY = (N_CONTACT, N_CONTACT + 1)  # channels 4,5 = global XY trajectory
FOOT_JOINTS = (7, 8, 10, 11)  # lankle, rankle, ltoes, rtoes
