"""Trajectory post-processing beyond the Kalman filter.

Rebuilds the remaining utilities of
`/root/reference/TrajDecoder/utils/utils_model.py:76-180` as vectorized
device code: the reference loops savgol per (batch, dancer, channel) in
Python and integrates offsets with an O(S^2) torch.cat loop; here both are
single vectorized ops (cumsum is the O(S) integral of `offset2xyz`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def smooth_data(traj, window_length: int = 21, polyorder: int = 3):
    """Savitzky-Golay smoothing along time of (b, dn, S, C)
    (`utils_model.py:77-84`, vectorized via scipy's axis argument)."""
    from scipy.signal import savgol_filter

    arr = np.asarray(traj)
    wl = min(window_length, arr.shape[2] if arr.shape[2] % 2 == 1 else arr.shape[2] - 1)
    return savgol_filter(arr, wl, min(polyorder, wl - 1), axis=2)


@jax.jit
def offset2xyz(offset: jnp.ndarray, start_xyz: jnp.ndarray) -> jnp.ndarray:
    """Integrate per-frame offsets to absolute positions.

    offset: (b, dn, S-1, C); start_xyz: (b, dn, 1, C) -> (b, dn, S, C).
    The reference's quadratic cat-loop (`utils_model.py:86-100`) is a cumsum.
    """
    integrated = start_xyz + jnp.cumsum(offset, axis=2)
    return jnp.concatenate([start_xyz, integrated], axis=2)


@jax.jit
def process_traj(traj: jnp.ndarray, v_max: float = 0.01, var_frame: int = 15) -> jnp.ndarray:
    """Velocity clamp + piecewise-constant velocity hold
    (`utils_model.py:102-120`): per-frame offsets are clipped to |v| <= v_max
    and frozen to the first value of every var_frame-frame block, then
    re-integrated."""
    start_xyz = traj[:, :, 0:1]
    offset = jnp.clip(traj[:, :, 1:] - traj[:, :, :-1], -v_max, v_max)
    s = offset.shape[2]
    block_start = (jnp.arange(s) // var_frame) * var_frame
    offset = offset[:, :, block_start]
    return offset2xyz(offset, start_xyz)


def get_ci(acc_log):
    """(mean, 95% confidence interval) of a metric log (`utils_model.py:125-131`)."""
    arr = np.asarray(acc_log, dtype=np.float64)
    return float(arr.mean()), float(1.96 * arr.std() / np.sqrt(len(arr)))


@jax.jit
def get_motion_with_trans(motion: jnp.ndarray, velocity: jnp.ndarray) -> jnp.ndarray:
    """Add integrated root velocity onto translation-free motion
    (`utils_model.py:171-180`): (b, T, 72) + cumsum((b, T, 3)) tiled over the
    24 joints' XYZ columns... the reference tiles x21 to cover channels; we
    tile to the motion's channel count / 3."""
    trans = jnp.cumsum(velocity, axis=1)
    trans = trans - trans[:, :1]
    reps = motion.shape[-1] // velocity.shape[-1]
    return motion + jnp.tile(trans, (1, 1, reps))
