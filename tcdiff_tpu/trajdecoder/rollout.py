"""Autoregressive DBN rollout — a lax.scan over sliding windows.

The reference rolls the trajectory out with a host-side Python loop over
window starts (`/root/reference/TCDiff.py:527-547`): seed with the first
`window_size` ground-truth XY frames, then repeatedly feed the last window +
a (window+step)*2-frame music slice to the TrajDecoder and append the last
`step` predicted frames. Here the whole rollout is one scan, with
dynamic_slice for the sliding music window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tcdiff_tpu.trajdecoder.model import TrajDecoder


def autoregressive_rollout(
    model: TrajDecoder,
    params,
    seed_traj: jnp.ndarray,
    music: jnp.ndarray,
    window_size: int = 100,
    step: int = 25,
):
    """seed_traj: (b, dn, window_size, 2) ground-truth XY seed;
    music: (b, L, 438) at 2x motion FPS.

    Returns (b, dn, window_size + n_steps*step, 2), matching the reference's
    `torch.cat(pre_list, dim=2)` layout (`TCDiff.py:533-547`).
    """
    cond_len = music.shape[1]
    starts = list(range(0, cond_len + 1 - (window_size + step) * 2, step * 2))
    n_steps = len(starts)
    if n_steps == 0:
        return seed_traj
    music_win = (window_size + step) * 2

    def body(carry, start):
        window = carry
        m = jax.lax.dynamic_slice_in_dim(music, start, music_win, axis=1)
        pred = model.apply({"params": params}, window, m, deterministic=True)
        return pred, pred[:, :, -step:]

    _, tails = jax.lax.scan(body, seed_traj, jnp.asarray(starts, jnp.int32))
    # tails: (n_steps, b, dn, step, 2) -> concat on time after the seed
    b, dn = seed_traj.shape[:2]
    tails = jnp.moveaxis(tails, 0, 2).reshape(b, dn, n_steps * step, 2)
    return jnp.concatenate([seed_traj, tails], axis=2)
