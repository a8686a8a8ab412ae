"""Batched constant-velocity Kalman smoother — one vmapped lax.scan.

The reference runs a filterpy KalmanFilter per (batch, dancer) in nested
Python loops (`/root/reference/TrajDecoder/utils/utils_model.py:10-74`);
here the identical filter (state [x, y, vx, vy], F with dt coupling, H
observing positions, P0 = 10 I, R = 0.1^2 I, Q = 1e-2 I — note the reference
sets Q to the std, not its square, `utils_model.py:51-55`) is a single scan
over time vmapped over all trajectories, so it runs on-device between the
DBN rollout and the diffusion stage with no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kalman_scan(xy: jnp.ndarray, x0: jnp.ndarray, P0: jnp.ndarray,
                 dt=1.0, process_noise_std=1e-2, measurement_noise_std=1e-1):
    """Run the filter over xy: (T, 2) from state (x0 (4,), P0 (4,4)).

    Returns (filtered (T, 2), (x_T, P_T)) so filtering can continue on the
    next chunk — the filter is strictly causal, so chunked application is
    EXACTLY the batch result."""
    F = jnp.asarray(
        [[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=xy.dtype
    )
    H = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=xy.dtype)
    Q = jnp.eye(4, dtype=xy.dtype) * process_noise_std  # std, not var: reference quirk
    R = jnp.eye(2, dtype=xy.dtype) * measurement_noise_std**2

    def step(carry, z):
        x, P = carry
        # predict
        x = F @ x
        P = F @ P @ F.T + Q
        # update
        S = H @ P @ H.T + R
        K = P @ H.T @ jnp.linalg.inv(S)
        y = z - H @ x
        x = x + K @ y
        # filterpy: P = (I - KH) P (I - KH)^T + K R K^T (Joseph form)
        IKH = jnp.eye(4, dtype=xy.dtype) - K @ H
        P = IKH @ P @ IKH.T + K @ R @ K.T
        return (x, P), x[:2]

    (xT, PT), out = jax.lax.scan(step, (x0, P0), xy)
    return out, (xT, PT)


def _kalman_single(xy: jnp.ndarray, dt=1.0, process_noise_std=1e-2, measurement_noise_std=1e-1):
    """xy: (T, 2) -> filtered positions (T, 2)."""
    P0 = jnp.eye(4, dtype=xy.dtype) * 10.0
    x0 = jnp.concatenate([xy[0], jnp.zeros(2, xy.dtype)])
    out, _ = _kalman_scan(xy, x0, P0, dt, process_noise_std, measurement_noise_std)
    return out


import functools


@functools.partial(jax.jit, static_argnames=("dt", "q_std", "r_std"))
def _kalman_chunk_jit(arr, x0, P0, dt, q_std, r_std):
    """Module-level jit so chunked streaming reuses one compile per chunk
    shape (a per-call vmap(lambda) would retrace every invocation)."""
    return jax.vmap(lambda xy, x, P: _kalman_scan(xy, x, P, dt, q_std, r_std))(
        arr, x0, P0
    )


def kalman_filter_chunk(
    xy_chunk, state=None, dt=1.0, process_noise_std=1e-2, measurement_noise_std=1e-1
):
    """Incremental filtering for streaming: (N, T, 2) chunk + carried state
    -> (filtered (N, T, 2), state). state=None initializes from the chunk's
    first frame exactly like the batch filter (`utils_model.py:39-47`).
    Feeding a trajectory in chunks reproduces `kalman_smooth_batch` bitwise.
    """
    arr = jnp.asarray(xy_chunk)
    n = arr.shape[0]
    if state is None:
        x0 = jnp.concatenate([arr[:, 0], jnp.zeros((n, 2), arr.dtype)], axis=-1)
        P0 = jnp.broadcast_to(jnp.eye(4, dtype=arr.dtype) * 10.0, (n, 4, 4))
        state = (x0, P0)
    return _kalman_chunk_jit(
        arr, state[0], state[1], float(dt), float(process_noise_std),
        float(measurement_noise_std),
    )


def kalman_smooth_batch(xy_batch, dt=1.0, process_noise_std=1e-2, measurement_noise_std=1e-1):
    """(B, dn, T, 2) -> same shape, filtered. Accepts numpy or jax arrays."""
    arr = jnp.asarray(xy_batch)
    b, dn, t, _ = arr.shape
    flat = arr.reshape(b * dn, t, 2)
    out = jax.vmap(
        lambda xy: _kalman_single(xy, dt, process_noise_std, measurement_noise_std)
    )(flat)
    return out.reshape(b, dn, t, 2)
