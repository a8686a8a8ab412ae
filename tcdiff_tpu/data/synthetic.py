"""Synthetic AIOZ-like data for tests, benchmarks, and dataset-free runs.

Generates smooth random multi-dancer motion (slowly varying joint rotations,
wandering root trajectories) and music-feature stand-ins with the exact
shapes of the real pipeline: motion (dn, 150, 151 packed channels) and
music (301, 438) @ 60 FPS. The packing/normalization goes through the same
`_process_batch` path as real data, so everything downstream (losses, FK,
samplers) sees realistic statistics.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tcdiff_tpu.data.dataset import _per_sample_normalize, _process_batch
from tcdiff_tpu.data.normalizer import Normalizer


def _smooth_noise(rng, shape, smoothing=15):
    """Low-pass filtered gaussian noise along axis -2 (time)."""
    from scipy.ndimage import uniform_filter1d

    x = rng.normal(size=shape)
    # box filter along the time axis; unlike np.convolve(mode="same") this
    # preserves length even when the window exceeds the sequence
    return uniform_filter1d(x, size=smoothing, axis=-2 if x.ndim > 1 else 0, mode="nearest")


def synthetic_motion(
    n: int, dancer_num: int = 3, seq_len: int = 150, seed: int = 0
):
    """Raw (pos, q) pairs shaped like the sliced AIOZ pkls."""
    rng = np.random.default_rng(seed)
    # wandering roots: integrate small velocities, dancers offset on a circle
    vel = _smooth_noise(rng, (n, dancer_num, seq_len, 3)) * 0.02
    pos = np.cumsum(vel, axis=2)
    angles = 2 * np.pi * np.arange(dancer_num) / max(dancer_num, 1)
    offsets = np.stack([np.cos(angles), np.zeros_like(angles), np.sin(angles)], -1)
    pos = pos + offsets[None, :, None, :] * 1.5
    pos[..., 1] += 0.9  # roughly hip height in Y-up

    # smooth joint axis-angle rotations, small magnitudes
    q = _smooth_noise(rng, (n, dancer_num, seq_len, 72)) * 0.4
    return pos.astype(np.float32), q.astype(np.float32)


def synthetic_music(n: int, frames: int = 301, dim: int = 438, seed: int = 1):
    rng = np.random.default_rng(seed)
    feats = _smooth_noise(rng, (n, frames, dim), smoothing=5).astype(np.float32)
    # beat-like impulses in one channel, mimicking the one-hot beat feature
    beat_period = 30
    feats[:, ::beat_period, 53] = 1.0
    return feats


def synthetic_dataset(
    n: int = 8,
    dancer_num: int = 3,
    seq_len: int = 150,
    seed: int = 0,
    per_sample_normalization: bool = True,
):
    """Processed, normalized dataset arrays.

    Returns (poses (n, dn, S, 151), music (n, 2*S+1, 438), normalizer).
    """
    pos, q = synthetic_motion(n, dancer_num, seq_len, seed)
    packed = _process_batch(
        jnp.asarray(pos), jnp.asarray(q.reshape(n, dancer_num, seq_len, 24, 3))
    )
    if per_sample_normalization:
        normalized, normalizer = _per_sample_normalize(packed)
    else:
        normalizer = Normalizer.fit(packed.reshape(-1, packed.shape[-1]))
        normalized = normalizer.normalize(packed)
    music = synthetic_music(n, 2 * seq_len + 1, seed=seed + 1)
    return np.asarray(normalized), music, normalizer


def synthetic_batch(batch_size: int = 2, dancer_num: int = 3, seq_len: int = 150, seed: int = 0):
    """One training batch: x (B, dn, S, 151), cond (B, 2S+1, 438)."""
    poses, music, normalizer = synthetic_dataset(
        batch_size, dancer_num, seq_len, seed
    )
    return jnp.asarray(poses), jnp.asarray(music), normalizer
