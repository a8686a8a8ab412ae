"""TrajDecoder — the Dance-Beat Navigator trajectory network, in flax.

Rebuilds `/root/reference/TrajDecoder/model/traj_model.py:11-200`:
a 3-layer LSTM over the flattened (dancer-major) XY tokens, a music MLP
(2-frame packed 876 -> 438 -> 438 -> 64), a transformer over the
concatenated [music, traj] 128-d features, and a 4-layer MLP decoder.

Reference-faithful quirks (kept deliberately, each cited):
  * The torch LSTM is constructed WITHOUT batch_first (`traj_model.py:139`)
    yet fed (batch, tokens, 2) — torch then treats the BATCH axis as time and
    the token axis as batch. Our `lstm_over_axis0` reproduces exactly that
    recurrence (scan over axis 0, vectorized over axis 1).
  * `CausalCrossConditionalSelfAttention` registers a causal mask buffer but
    never applies it (`traj_model.py:26,37-39`), so attention is full;
    likewise `music2traj_Transformer.traj_emb` is a dead parameter
    (`traj_model.py:80`). We keep full attention and create the dead param
    for checkpoint compatibility.
  * Sinusoidal absolute positions are added to the traj features only
    (`traj_model.py:106`, `model/utils.py:11-32`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tcdiff_tpu.config import TrajDecoderConfig


def positional_encoding(length: int, dim: int) -> np.ndarray:
    """Reference `model/utils.py:18-22` table (max_len truncated to length)."""
    position = np.arange(length)[:, None]
    div_term = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TorchLSTMCellStack(nn.Module):
    """Multi-layer LSTM matching torch.nn.LSTM's packing ([i, f, g, o] gate
    order, per-layer ih/hh weights with two bias vectors)."""

    hidden_size: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        """xs: (T, N, C) — recurrence over axis 0. Returns (T, N, H)."""
        h = xs
        for layer in range(self.num_layers):
            in_dim = h.shape[-1]
            wi = self.param(
                f"weight_ih_l{layer}",
                nn.initializers.uniform(scale=1.0 / np.sqrt(self.hidden_size)),
                (4 * self.hidden_size, in_dim),
                jnp.float32,
            )
            wh = self.param(
                f"weight_hh_l{layer}",
                nn.initializers.uniform(scale=1.0 / np.sqrt(self.hidden_size)),
                (4 * self.hidden_size, self.hidden_size),
                jnp.float32,
            )
            bi = self.param(
                f"bias_ih_l{layer}", nn.initializers.zeros, (4 * self.hidden_size,), jnp.float32
            )
            bh = self.param(
                f"bias_hh_l{layer}", nn.initializers.zeros, (4 * self.hidden_size,), jnp.float32
            )

            def step(carry, xt, wi=wi, wh=wh, bi=bi, bh=bh):
                hprev, cprev = carry
                gates = xt @ wi.T.astype(xt.dtype) + bi.astype(xt.dtype)
                gates = gates + hprev @ wh.T.astype(xt.dtype) + bh.astype(xt.dtype)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                c = f * cprev + i * jnp.tanh(g)
                hnew = o * jnp.tanh(c)
                return (hnew, c), hnew

            n = h.shape[1]
            init = (
                jnp.zeros((n, self.hidden_size), h.dtype),
                jnp.zeros((n, self.hidden_size), h.dtype),
            )
            _, h = jax.lax.scan(step, init, h)
        return h


class TransformerBlock(nn.Module):
    """Pre-LN block with FULL (mask-unused) self-attention
    (`traj_model.py:48-65`)."""

    embed_dim: int
    n_head: int
    fc_rate: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        b, t, c = x.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        dh = c // self.n_head
        q = nn.Dense(c, dtype=self.dtype, name="query")(h)
        k = nn.Dense(c, dtype=self.dtype, name="key")(h)
        v = nn.Dense(c, dtype=self.dtype, name="value")(h)
        q = q.reshape(b, t, self.n_head, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.n_head, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.n_head, dh).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.asarray(np.sqrt(dh), self.dtype)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.fc_rate * c, dtype=self.dtype, name="mlp0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="mlp2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TrajDecoder(nn.Module):
    """Full DBN network (`traj_model.py:125-200`).

    __call__(x, music_feat):
      x: (b, dn, seq, 2) XY windows; music_feat: (b, 2*(seq+step), 438).
    Returns (b, dn, seq, 2): the window shifted `step` frames forward.
    """

    cfg: TrajDecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, music_feat, *, deterministic=True):
        cfg = self.cfg
        d = cfg.latent_dim
        b, dn, seq, c = x.shape
        x = x.astype(self.dtype).reshape(b, dn * seq, c)  # dancer-major tokens

        # torch-LSTM quirk: recurrence over the BATCH axis (see module doc)
        h = TorchLSTMCellStack(d, 3, self.dtype, name="lstm")(x)

        # music: drop odd frame, pack 2 frames, 3-layer MLP
        m = music_feat.astype(self.dtype)
        if m.shape[1] % 2 == 1:
            m = m[:, :-1]
        m = m.reshape(b, m.shape[1] // 2, cfg.cond_feature_dim * 2)
        m = nn.Dense(cfg.cond_feature_dim, dtype=self.dtype, name="music_projection_0")(m)
        m = jax.nn.leaky_relu(m)
        m = nn.Dense(cfg.cond_feature_dim, dtype=self.dtype, name="music_projection_1")(m)
        m = jax.nn.leaky_relu(m)
        m = nn.Dense(d, dtype=self.dtype, name="music_projection_2")(m)

        # transformer over [music ‖ traj] (128-d)
        pe = jnp.asarray(positional_encoding(dn * seq, d), self.dtype)
        traj_feat = h + pe[None]
        traj_feat = nn.Dropout(cfg.dropout)(traj_feat, deterministic=deterministic)
        cond_tok = nn.Dense(d, dtype=self.dtype, name="cond_emb")(m[:, :seq])
        # dead parameter kept for checkpoint compatibility (`traj_model.py:80`)
        self.param("traj_emb_kernel", nn.initializers.normal(0.02), (3, d), jnp.float32)
        self.param("traj_emb_bias", nn.initializers.zeros, (d,), jnp.float32)
        cond_tok = jnp.tile(cond_tok, (1, dn, 1))
        feat = jnp.concatenate([cond_tok, traj_feat], axis=2)
        for i in range(cfg.trans_layer):
            feat = TransformerBlock(
                d * 2, cfg.n_head, 4, cfg.dropout, self.dtype, name=f"block_{i}"
            )(feat, deterministic=deterministic)

        # decode with the LAST seq music frames appended (prediction context)
        pred_m = jnp.tile(m[:, -seq:], (1, dn, 1))
        feat = jnp.concatenate([feat, pred_m], axis=2)  # (b, dn*seq, 3d)
        out = nn.Dense(d * 2, dtype=self.dtype, name="decoder_0")(feat)
        out = jax.nn.leaky_relu(out)
        out = nn.Dense(d * 2, dtype=self.dtype, name="decoder_1")(out)
        out = jax.nn.leaky_relu(out)
        out = nn.Dense(d, dtype=self.dtype, name="decoder_2")(out)
        out = jax.nn.leaky_relu(out)
        out = nn.Dense(cfg.nfeats, dtype=self.dtype, name="decoder_3")(out)
        return out.reshape(b, dn, seq, c).astype(jnp.float32)
