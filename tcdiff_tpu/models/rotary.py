"""Rotary position embedding, applied to the FULL model vector.

The reference applies RoPE to the whole 512-d layer input before the q/k
projections rather than per-head after them
(`/root/reference/model/model.py:231,375,387-388`,
`model/rotary_embedding_torch.py:107-113`). That unusual placement changes
the math (the projection mixes rotated channels), so we keep it: frequencies
span the model dim, channels are rotated in adjacent (even, odd) pairs, and
rotation happens on the pre-projection activations.

Pure functions + a tiny stateless helper class; the angle table for a given
sequence length is a compile-time constant under jit, so XLA folds the
cos/sin into the surrounding fused elementwise op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotary_freqs(seq_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Angle table (seq_len, dim): outer(position, inv_freq) with every
    frequency duplicated into adjacent channel pairs
    (reference `rotary_embedding_torch.py:89-92,124-125`)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    angles = np.outer(np.arange(seq_len), inv_freq)  # (S, dim//2)
    return np.repeat(angles, 2, axis=-1).astype(np.float32)  # (S, dim)


def _rotary_layout() -> str:
    """TCDIFF_ROTARY selects the implementation (identical math, different
    TPU layout):
      * "pair" — reference-shaped (..., D/2, 2) reshape/stack. The XProf
        profile (BENCH_NOTES.md) shows this tiles poorly: the pair axis
        forces T(2,128) relayouts, ~9% of sampler device time.
      * "roll" (default) — the pair swap expressed as two lane rotations +
        a select, with the pair signs folded into the sin table: no reshape,
        no sublane-2 tiling. Bit-identical outputs (same multiplies/adds).
    """
    import os

    return os.environ.get("TCDIFF_ROTARY", "roll")


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Adjacent-pair rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)
    (reference `rotary_embedding_torch.py:39-43`)."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def _swap_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (x1, x0, x3, x2, ...) via lane rolls: even
    channels read their right neighbor, odd channels their left."""
    even = (jnp.arange(x.shape[-1]) % 2) == 0
    return jnp.where(even, jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))


def apply_rotary(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """x: (..., S, D); angles: (S, D) broadcast over leading dims."""
    angles = angles.astype(x.dtype)
    if _rotary_layout() == "roll":
        # x*cos + rotate_half(x)*sin with the (-1)^(i+1) pair signs moved
        # into the sin table: rotate_half(x) == swap_pairs(x) * sign, and
        # sign*sin is a compile-time constant under jit
        sign = jnp.asarray(np.tile([-1.0, 1.0], x.shape[-1] // 2), x.dtype)
        return x * jnp.cos(angles) + _swap_pairs(x) * (jnp.sin(angles) * sign)
    return x * jnp.cos(angles) + _rotate_half(x) * jnp.sin(angles)


class RotaryEmbedding:
    """Stateless convenience wrapper matching the reference call pattern."""

    def __init__(self, dim: int, theta: float = 10000.0):
        self.dim = dim
        self.theta = theta

    def rotate(self, x: jnp.ndarray) -> jnp.ndarray:
        seq_len = x.shape[-2]
        angles = jnp.asarray(rotary_freqs(seq_len, self.dim, self.theta))
        return apply_rotary(x, angles)
