"""Golden parity of the Adan optimizer vs the reference torch implementation."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tcdiff_tpu.optim import adan, ema_update

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
from model.adan import Adan as TorchAdan  # noqa: E402


def test_adan_matches_reference_over_steps():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    grads_seq = [
        (rng.normal(size=(5, 3)).astype(np.float32), rng.normal(size=(3,)).astype(np.float32))
        for _ in range(7)
    ]
    lr, wd = 5e-4, 0.02

    # torch side
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = TorchAdan([tw, tb], lr=lr, betas=(0.02, 0.08, 0.01), eps=1e-8, weight_decay=wd)
    for gw, gb in grads_seq:
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()

    # jax side
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = adan(lr, (0.02, 0.08, 0.01), 1e-8, wd)
    state = tx.init(params)
    step = jax.jit(tx.update)
    for gw, gb in grads_seq:
        updates, state = step({"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-6, rtol=1e-5)


def test_adan_first_step_is_decay_only():
    """Step 1 must only shrink by 1/(1 + wd*lr) (`adan.py:71,99-105`)."""
    params = {"w": jnp.ones((4,))}
    lr, wd = 1e-2, 0.1
    tx = adan(lr, weight_decay=wd)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.full((4,), 123.0)}, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["w"]), 1.0 / (1 + wd * lr), rtol=1e-6)


def test_ema_update():
    ema = {"w": jnp.zeros((3,))}
    cur = {"w": jnp.ones((3,))}
    out = ema_update(ema, cur, beta=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


def test_adan_fused_matches_per_leaf():
    """The flat-vector fused form (optim/flatten.py) must be elementwise-
    IDENTICAL to the per-leaf form: same updates, same AdanState leaves,
    over several steps (covers the first-step zero-buffer quirk too)."""
    rng = np.random.default_rng(5)
    params = {
        "a": {"kernel": jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)},
        "b": jnp.asarray(rng.normal(size=(7,)), jnp.float32),
    }
    txf = adan(3e-4, weight_decay=0.02, fused=True)
    txp = adan(3e-4, weight_decay=0.02, fused=False)
    sf, sp = txf.init(params), txp.init(params)
    pf = pp = params
    for i in range(3):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        uf, sf = txf.update(g, sf, pf)
        up, sp = txp.update(g, sp, pp)
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            uf, up,
        )
        for field in ("m", "v", "n", "prev_grad"):
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
                getattr(sf, field), getattr(sp, field),
            )
        pf = optax.apply_updates(pf, uf)
        pp = optax.apply_updates(pp, up)


def test_adan_fused_falls_back_on_mixed_dtypes():
    params = {
        "a": jnp.ones((4,), jnp.float32),
        "b": jnp.ones((4,), jnp.bfloat16),
    }
    tx = adan(1e-3, fused=True)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(g, state, params)  # must not raise
    assert updates["a"].dtype == jnp.float32
    assert state.m["b"].dtype == jnp.bfloat16
