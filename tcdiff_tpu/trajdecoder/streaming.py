"""Incremental DBN trajectory production for streaming serving.

The reference (and our `generate`) rolls the FULL song's trajectory before
any motion is denoised (`/root/reference/TCDiff.py:527-550`); for streaming
that puts the whole autoregressive rollout + Kalman pass in front of the
first slice's latency. `TrajectoryStreamer` produces the trajectory in
window-sized increments, carrying the DBN window and Kalman state, so the
pipeline only ever rolls far enough for the NEXT motion slice — the values
are exactly the full-rollout + batch-Kalman result (both stages are strictly
causal), verified in tests/test_streaming_pipeline.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tcdiff_tpu.trajdecoder.kalman import kalman_filter_chunk
from tcdiff_tpu.trajdecoder.model import TrajDecoder


@functools.partial(jax.jit, static_argnums=0)
def _rollout_apply(model, params, window, music_win):
    """One DBN window step; jitted ONCE per model config (module-level cache
    — a per-streamer jit would recompile for every song served)."""
    return model.apply({"params": params}, window, music_win, deterministic=True)


class TrajectoryStreamer:
    """Produces smoothed trajectory frames on demand.

    seed: (b, dn, window_size, 2) normalized XY; music: (b, L, 438) @ 2x
    motion FPS. `frames(upto)` returns the first `upto` smoothed frames
    (b, dn, upto, 2), rolling the DBN and advancing the Kalman filter only
    as far as needed; when the music is exhausted the last frame is held
    (matching generate()'s tail padding).
    """

    def __init__(self, model: TrajDecoder, params, seed, music,
                 window_size: int = 100, step: int = 25):
        self.model = model
        self.params = params
        self.music = jnp.asarray(music)
        self.window_size = window_size
        self.step = step
        self.window = jnp.asarray(seed)  # current DBN window (b, dn, W, 2)
        b, dn = self.window.shape[:2]
        self._b, self._dn = b, dn
        self.raw = [self.window]  # unfiltered chunks, seed first
        self.raw_len = window_size
        self.next_start = 0  # next music window start (music frames)
        self.smoothed = []  # filtered chunks
        self.smoothed_len = 0
        self.kstate = None

    def _can_roll(self) -> bool:
        music_win = (self.window_size + self.step) * 2
        return self.next_start + music_win <= self.music.shape[1]

    def _roll_once(self) -> None:
        """One DBN window: identical to `autoregressive_rollout`'s scan body
        (seed window -> predicted window, keep the last `step` frames)."""
        music_win = (self.window_size + self.step) * 2
        m = jax.lax.dynamic_slice_in_dim(self.music, self.next_start, music_win, axis=1)
        self.window = _rollout_apply(self.model, self.params, self.window, m)
        self.raw.append(self.window[:, :, -self.step:])
        self.raw_len += self.step
        self.next_start += self.step * 2

    def frames(self, upto: int) -> jnp.ndarray:
        """Smoothed trajectory (b, dn, upto, 2); rolls/filters lazily."""
        while self.raw_len < upto and self._can_roll():
            self._roll_once()
        # advance the Kalman filter over everything rolled so far (chunked
        # application is exactly the batch filter — the filter is causal)
        pending = self.raw
        if pending:
            chunk = jnp.concatenate(pending, axis=2) if len(pending) > 1 else pending[0]
            self.raw = []
            flat = chunk.reshape(self._b * self._dn, chunk.shape[2], 2)
            out, self.kstate = kalman_filter_chunk(flat, self.kstate)
            self.smoothed.append(
                out.reshape(self._b, self._dn, chunk.shape[2], 2)
            )
            self.smoothed_len += chunk.shape[2]
        traj = (
            jnp.concatenate(self.smoothed, axis=2)
            if len(self.smoothed) > 1
            else self.smoothed[0]
        )
        self.smoothed = [traj]
        if traj.shape[2] < upto:  # music exhausted: hold the last frame
            pad = jnp.repeat(traj[:, :, -1:], upto - traj.shape[2], axis=2)
            return jnp.concatenate([traj, pad], axis=2)
        return traj[:, :, :upto]
