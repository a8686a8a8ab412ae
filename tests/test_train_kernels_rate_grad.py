"""Exact gradient checks for the train-path block kernels at rate > 0.

The rate=0 limit is covered against flax autodiff in test_train_sab.py /
test_train_ffb.py. Here the DROPOUT handling of the hand-written backwards
is pinned: a pure-JAX replica of each forward chain — using the kernels'
own `_keep_mask` hash so the masks are bit-identical — is differentiated
with jax.grad and compared against the custom VJP. This catches the
subtle class of bugs where a backward regenerates a mask with the wrong
salt/seed or applies it at the wrong point in the chain, which the
finiteness/variability tests cannot see.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.ops.fused_sa_block_train import (
    _SALT_ATTN, _SALT_FC, _SALT_OUT, _drop,
    fused_sa_block_train, sa_train_tables,
)
from tcdiff_tpu.ops.fused_ff_block_train import (
    _SALT_FF1, _SALT_FF2, fused_ff_tail_train,
)


def _ln(x, s, b, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale
    )


def _swap_pairs(y):
    d = y.shape[-1]
    y2 = y.reshape(y.shape[:-1] + (d // 2, 2))
    return y2[..., ::-1].reshape(y.shape)


@pytest.mark.parametrize("lblk,save", [(None, None), ("4", None), (None, "1")])
def test_train_sab_rate_grads_match_pure_jax_replica(monkeypatch, lblk, save):
    # lblk="4" forces the row-blocked K5 backward (grid (b, L//lblk)) the
    # full model hits at L=450; K5 is dropout-free so the replica needs no
    # row0 re-keying — the check is purely that blocked accumulation and
    # blocked LN1/rotary backward reproduce the whole-L grads.
    # save="1" (TCDIFF_TRAIN_SAVE_RESID) makes the forward write q/k/v/o
    # residuals and the backward skip its K1/K2 recompute programs — the
    # masks and rounding points are identical, so rate>0 grads must still
    # match the replica exactly.
    if lblk is not None:
        monkeypatch.setenv("TCDIFF_SAB_LBLK", lblk)
        jax.clear_caches()
    if save is not None:
        monkeypatch.setenv("TCDIFF_TRAIN_SAVE_RESID", save)
        jax.clear_caches()
    b, L, d, nhead = 2, 16, 32, 4
    dk = d // nhead
    rate = 0.3
    rng = np.random.default_rng(0)
    x = _rand((b, L, d), 1)
    s1, b1 = _rand((d,), 2, 0.1) + 1.0, _rand((d,), 3, 0.1)
    s2, b2 = _rand((d,), 4, 0.1) + 1.0, _rand((d,), 5, 0.1)
    wq, wk, wv = _rand((d, d), 6, 0.2), _rand((d, d), 7, 0.2), _rand((d, d), 8, 0.2)
    wfc = _rand((d, d), 9, 0.2)
    fs, fb = _rand((b, d), 10, 0.1), _rand((b, d), 11, 0.1)
    angles = _rand((L, d), 12, 0.5)
    cos, ssin = sa_train_tables(x, angles, d)
    seeds = jnp.asarray(rng.integers(0, 2**32, size=(b,), dtype=np.uint32))
    scale = 1.0 / np.sqrt(dk)

    def replica_one(xi, wq, wk, wv, wfc, s1, b1, s2, b2, fsi, fbi, seed):
        """Pure-JAX forward of one batch element, kernel-identical masks."""
        xh = _ln(xi, s1, b1, 1e-5)
        r = xh * cos + _swap_pairs(xh) * ssin
        q, k, v = r @ wq, r @ wk, xh @ wv
        outs = []
        for i in range(nhead):
            sl = slice(i * dk, (i + 1) * dk)
            logits = (q[:, sl] * scale) @ k[:, sl].T
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pd = _drop(p, seed, _SALT_ATTN + i, rate)
            outs.append(pd @ v[:, sl])
        o = jnp.concatenate(outs, axis=-1)
        z2 = _drop(o @ wfc, seed, _SALT_FC, rate)
        sa_d = _drop(_ln(z2, s2, b2, 1e-6), seed, _SALT_OUT, rate)
        return xi + (fsi + 1.0) * sa_d + fbi

    def loss_replica(args):
        x, wq, wk, wv, wfc, s1, b1, s2, b2, fs, fb = args
        out = jnp.stack([
            replica_one(x[i], wq, wk, wv, wfc, s1, b1, s2, b2,
                        fs[i], fb[i], seeds[i])
            for i in range(b)
        ])
        return jnp.mean(out * out)

    def loss_kernel(args):
        x, wq, wk, wv, wfc, s1, b1, s2, b2, fs, fb = args
        out = fused_sa_block_train(
            x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2, fs, fb,
            seeds, nhead, rate, 1e-5, 1e-6,
        )
        return jnp.mean(out * out)

    args = (x, wq, wk, wv, wfc, s1, b1, s2, b2, fs, fb)
    ref_val = loss_replica(args)
    ker_val = loss_kernel(args)
    np.testing.assert_allclose(float(ker_val), float(ref_val), rtol=2e-5)

    ref_g = jax.grad(loss_replica)(args)
    ker_g = jax.grad(loss_kernel)(args)
    names = ("x", "wq", "wk", "wv", "wfc", "s1", "b1", "s2", "b2", "fs", "fb")
    for name, a, r in zip(names, ker_g, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("lblk", [None, "4"])
def test_train_ffb_rate_grads_match_pure_jax_replica(monkeypatch, lblk):
    # lblk="4" forces the row-blocked backward (grid (b, L//lblk)) that the
    # full model hits at L=450 — the replica uses GLOBAL row indices in the
    # dropout hash, so this pins the backward's row0 re-keying bit-exactly.
    if lblk is not None:
        monkeypatch.setenv("TCDIFF_FFB_LBLK", lblk)
        jax.clear_caches()
    b, L, d, ff = 2, 12, 24, 48
    rate = 0.25
    rng = np.random.default_rng(1)
    x = _rand((b, L, d), 20)
    s3, b3 = _rand((d,), 21, 0.1) + 1.0, _rand((d,), 22, 0.1)
    s4, b4 = _rand((d,), 23, 0.1) + 1.0, _rand((d,), 24, 0.1)
    w1, bb1 = _rand((d, ff), 25, 0.2), _rand((ff,), 26, 0.1)
    w2, bb2 = _rand((ff, d), 27, 0.2), _rand((d,), 28, 0.1)
    w3, bb3 = _rand((d, d), 29, 0.2), _rand((d,), 30, 0.1)
    fs, fb = _rand((b, d), 31, 0.1), _rand((b, d), 32, 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**32, size=(b,), dtype=np.uint32))

    def replica_one(xi, w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4,
                    fsi, fbi, seed):
        y = _ln(xi, s3, b3, 1e-5)
        u = y @ w1 + bb1
        a = jax.nn.gelu(u, approximate=False)
        ad = _drop(a, seed, _SALT_FF1, rate)
        zd = _drop(ad @ w2 + bb2, seed, _SALT_FF2, rate)
        x2 = xi + (fsi + 1.0) * zd + fbi
        return _ln(x2, s4, b4, 1e-5) @ w3 + bb3

    def loss_replica(args):
        x, w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4, fs, fb = args
        out = jnp.stack([
            replica_one(x[i], w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4,
                        fs[i], fb[i], seeds[i])
            for i in range(b)
        ])
        return jnp.mean(out * out)

    def loss_kernel(args):
        x, w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4, fs, fb = args
        out = fused_ff_tail_train(
            x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3,
            seeds, rate, 1e-5,
        )
        return jnp.mean(out * out)

    args = (x, w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4, fs, fb)
    np.testing.assert_allclose(
        float(loss_kernel(args)), float(loss_replica(args)), rtol=2e-5
    )
    ref_g = jax.grad(loss_replica)(args)
    ker_g = jax.grad(loss_kernel)(args)
    names = ("x", "w1", "bb1", "w2", "bb2", "w3", "bb3", "s3", "b3",
             "s4", "b4", "fs", "fb")
    for name, a, r in zip(names, ker_g, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-5, err_msg=name
        )
