"""Train kernels under a dp x tp sharded train step (virtual 8-device mesh).

All three custom-VJP train kernels (TCDIFF_TRAIN_{SAB,XAB,FFB}) must
compose with the pjit-ed train step: one dp=4 x tp=2 step produces
bit-identical parameters to the single-device step.

GSPMD note (VERDICT r3 #4): when the model is built with `mesh=...`, the
kernel call sites run under `shard_map` over dp (parallel/kernel_shard.py)
— the batch stays sharded into the Pallas programs and the weight-grad
partial sums are psum'd explicitly, so on real multi-chip TPU the custom
call is never left to GSPMD's all-gather fallback. Both routes are tested
here: the mesh-threaded shard_map path AND the legacy mesh=None path
(interpret-mode kernels as partitionable HLO).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("thread_mesh", [True, False])
def test_train_step_sharded_equals_single_with_train_kernels(monkeypatch, thread_mesh):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    for var in ("TCDIFF_TRAIN_SAB", "TCDIFF_TRAIN_XAB", "TCDIFF_TRAIN_FFB"):
        monkeypatch.setenv(var, "1")
    jax.clear_caches()

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch
    from tcdiff_tpu.train import create_train_state, make_train_step

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        cond_feature_dim=16, dancer_num=2, head_dim=16,
    )
    tokens = cfg.seq_len * 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 2, cfg.seq_len, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(8, 2 * cfg.seq_len + 1, 16)).astype(np.float32))
    params = DanceDecoder(cfg).init(
        jax.random.key(0), jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 2 * cfg.seq_len + 1, 16)), jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(5e-5)
    key = jax.random.key(1)

    def one_step(dp, tp):
        mesh = make_mesh(dp=dp, tp=tp)
        # thread the mesh into the kernels exactly as the orchestrator does
        model = DanceDecoder(
            cfg, mesh=mesh if (thread_mesh and dp > 1) else None
        )
        diff = GaussianDiffusion(
            model, DiffusionConfig(sampling_timesteps=2, n_timestep=10)
        )
        state = jax.device_put(create_train_state(params, tx), replicated(mesh))
        xs, cs = shard_batch((x, cond), mesh)
        step = jax.jit(make_train_step(diff, tx))
        ns, m = step(state, xs, cs, jax.device_put(key, replicated(mesh)))
        return ns, float(m["total"])

    ns_sharded, loss_sharded = one_step(4, 2)
    ns_single, loss_single = one_step(1, 1)
    assert abs(loss_sharded - loss_single) < 1e-4
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        ns_sharded.params, ns_single.params,
    )
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_train_kernel_default_yields_to_megatron_at_tp_gt1(monkeypatch):
    """The TPU default for the TRAIN kernels must NOT engage under a
    threaded mesh with tp>1 — the shard_map wrap duplicates kernel compute
    across tp peers (parallel/kernel_shard.py), so the default there is
    the XLA/Megatron path. An explicit env "1" still forces the kernel
    (what the dp4xtp2 equality test above relies on)."""
    from tcdiff_tpu.models.dance_decoder import (
        _use_train_ffb, _use_train_sab, _use_train_xab,
    )

    class FakeMesh:
        def __init__(self, tp):
            self.shape = {"dp": 2, "tp": tp}

    for name, fn in (
        ("TCDIFF_TRAIN_SAB", _use_train_sab),
        ("TCDIFF_TRAIN_XAB", _use_train_xab),
        ("TCDIFF_TRAIN_FFB", _use_train_ffb),
    ):
        monkeypatch.delenv(name, raising=False)
        assert fn(FakeMesh(2)) is False
        monkeypatch.setenv(name, "1")
        assert fn(FakeMesh(2)) is True
        monkeypatch.delenv(name, raising=False)
