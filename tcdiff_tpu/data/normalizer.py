"""Min-max normalization as plain arrays — jit-friendly, no object state.

Behavior-compatible with the reference's `Normalizer`/`MinMaxScaler` pair
(`/root/reference/dataset/preprocess.py:28-43`, `dataset/scaler.py:19-83`):

  * fit on the flattened (N*S, C) feature matrix, per-channel min/max
  * near-constant channels get scale 1 (`scaler.py:4-16`)
  * normalize: x * scale + min, clipped to [-1, 1]
  * unnormalize: clip to [-1, 1] first, then invert; supports TRAILING
    channel subsets by indexing `scale_[-C:]` (`scaler.py:80-83`) — the
    reference uses this to unnormalize the 147 non-contact channels with a
    151-channel scaler.

Unlike the reference, transforms never mutate their input (JAX arrays are
immutable anyway); the in-place semantics of `scaler.py:73-78` are
observationally equivalent for every call site.

The stats are a flax-style pytree (a dict of two arrays) so a Normalizer can
ride inside jitted functions, checkpoints, and shard-mapped train steps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Normalizer:
    scale: jnp.ndarray  # (C,)
    offset: jnp.ndarray  # (C,) — the reference's `min_`

    feature_range = (-1.0, 1.0)

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        return (self.scale, self.offset), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction -------------------------------------------------------
    @classmethod
    def fit(cls, data) -> "Normalizer":
        """data: (..., C); stats are computed over all leading dims."""
        flat = jnp.asarray(data).reshape(-1, data.shape[-1])
        data_min = jnp.min(flat, axis=0)
        data_max = jnp.max(flat, axis=0)
        data_range = data_max - data_min
        eps = 10 * jnp.finfo(flat.dtype).eps
        safe_range = jnp.where(data_range < eps, 1.0, data_range)
        lo, hi = cls.feature_range
        scale = (hi - lo) / safe_range
        offset = lo - data_min * scale
        return cls(scale=scale, offset=offset)

    @classmethod
    def identity(cls, channels: int) -> "Normalizer":
        return cls(scale=jnp.ones((channels,)), offset=jnp.zeros((channels,)))

    # -- transforms ----------------------------------------------------------
    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.feature_range
        return jnp.clip(x * self.scale + self.offset, lo, hi)

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse transform. If x has fewer channels than the fit data, the
        TRAILING channels of the stats are used (reference `scaler.py:80-83`)."""
        lo, hi = self.feature_range
        c = x.shape[-1]
        x = jnp.clip(x, lo, hi)
        return (x - self.offset[-c:]) / self.scale[-c:]

    # -- interop -------------------------------------------------------------
    def to_numpy(self) -> dict:
        return {"scale": np.asarray(self.scale), "offset": np.asarray(self.offset)}

    @classmethod
    def from_torch_state(cls, scale_, min_) -> "Normalizer":
        """Build from a reference checkpoint's pickled MinMaxScaler attributes
        (`TCDiff.py:74` stores the whole Normalizer object in the .pt file)."""
        return cls(scale=jnp.asarray(np.asarray(scale_)), offset=jnp.asarray(np.asarray(min_)))
