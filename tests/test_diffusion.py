"""Golden parity of the diffusion core vs the PyTorch reference.

Imports the reference `model.diffusion.GaussianDiffusion` (via the stub
fixture in `_refstubs`), binds both frameworks to identical DanceDecoder
weights, injects identical noise, and requires losses and full sampler
outputs to match. This pins the schedules, the 4-term loss (incl. FK and
foot-skate), the 50-step DDIM update, the trajectory clamp, the long-sample
half-copy coupling, and the footwork splice in one sweep.

The loss test uses a cheap seq=10 / 2-dancer config; the sampler tests need
seq_len=150 because the reference hardcodes 150 in its sampler reshapes
(`model/diffusion.py:303,399-400,816`), so they run 1 dancer, batch 1-3.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import _refstubs

_refstubs.install()

import torch  # noqa: E402

from model.diffusion import GaussianDiffusion as RefGaussianDiffusion  # noqa: E402
from model.model import DanceDecoder as TorchDanceDecoder  # noqa: E402
from vis import SMPLSkeleton  # noqa: E402

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig  # noqa: E402
from tcdiff_tpu.diffusion import GaussianDiffusion  # noqa: E402
from tcdiff_tpu.interop import dance_decoder_params_from_torch  # noqa: E402
from tcdiff_tpu.models.dance_decoder import DanceDecoder  # noqa: E402

C = 151
DCFG = DiffusionConfig(cond_drop_prob=0.0)


def _make_pair(seq, dn, seed):
    torch.manual_seed(seed)
    mcfg = DanceDecoderConfig(
        nfeats=C,
        seq_len=seq,
        latent_dim=512,
        ff_size=128,
        num_layers=2,
        num_heads=8,
        dropout=0.0,
        cond_feature_dim=24,
        dancer_num=dn,
    )
    tm = TorchDanceDecoder(
        nfeats=C,
        seq_len=seq,
        latent_dim=512,
        ff_size=128,
        num_layers=2,
        num_heads=8,
        dropout=0.0,
        cond_feature_dim=24,
        activation=torch.nn.functional.gelu,
        use_rotary=True,
        required_dancer_num=dn,
    ).eval()
    smpl = SMPLSkeleton(torch.device("cpu"))
    ref = RefGaussianDiffusion(
        model=tm,
        horizon=seq * dn,
        repr_dim=C,
        smpl=smpl,
        schedule="cosine",
        n_timestep=1000,
        loss_type="l2",
        clip_denoised=True,
        predict_epsilon=False,
        guidance_weight=2,
        use_p2=False,
        cond_drop_prob=0.0,
        seq_len=seq,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = dance_decoder_params_from_torch(sd, mcfg.num_layers, mcfg.latent_dim)
    ours = GaussianDiffusion(DanceDecoder(mcfg), DCFG)
    return ref, ours, params


@pytest.fixture(scope="module")
def small_pair():
    return _make_pair(seq=10, dn=2, seed=7)


@pytest.fixture(scope="module")
def sampler_pair():
    return _make_pair(seq=150, dn=1, seed=9)


class _NoiseFeeder:
    """Sequential feeder monkeypatched over torch.randn/randn_like."""

    def __init__(self, arrays):
        self.arrays = [torch.from_numpy(a) for a in arrays]
        self.i = 0

    def randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        out = self.arrays[self.i]
        assert tuple(out.shape) == tuple(shape), (out.shape, shape)
        self.i += 1
        return out

    def randn_like(self, x, **kw):
        return self.randn(*x.shape)


def _normals(seed, shapes):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=s).astype(np.float32) for s in shapes]


def test_buffers_match_reference(small_pair):
    ref, ours, _ = small_pair
    for name in (
        "betas",
        "alphas_cumprod",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
        "p2_loss_weight",
    ):
        np.testing.assert_allclose(
            getattr(ours.buffers, name),
            getattr(ref, name).numpy(),
            # torch vs numpy float32 cumprod differ by ~1 ulp per step, and
            # the cosine schedule's clipped tail pushes alphas_cumprod into
            # float32 denormals where relative error amplifies
            atol=1e-5,
            rtol=1e-3,
            err_msg=name,
        )


def test_p_losses_matches_reference(small_pair, monkeypatch):
    ref, ours, params = small_pair
    b, dn, seq = 2, 2, 10
    rng = np.random.default_rng(3)
    x = rng.normal(size=(b, dn, seq, C)).astype(np.float32) * 0.5
    cond = rng.normal(size=(b, 2 * seq + 1, 24)).astype(np.float32)
    t = np.array([17, 801], dtype=np.int64)
    noise = rng.normal(size=(b, seq, dn, C)).astype(np.float32)

    feeder = _NoiseFeeder([noise])
    monkeypatch.setattr(torch, "randn_like", feeder.randn_like)
    ref_total, ref_losses = ref.p_losses(
        torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t)
    )

    total, losses = ours.p_losses(
        params,
        jnp.asarray(x),
        jnp.asarray(cond),
        jnp.asarray(t),
        jax.random.key(0),
        noise=jnp.asarray(noise),
        keep_mask=jnp.ones((b,), bool),
    )
    ref_vals = [float(v) for v in ref_losses]
    ours_vals = [float(losses[k]) for k in ("recon", "velocity", "fk", "foot")]
    np.testing.assert_allclose(ours_vals, ref_vals, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(float(total), float(ref_total), atol=5e-4, rtol=2e-3)


def test_ddim_sample_matches_reference(sampler_pair, monkeypatch):
    ref, ours, params = sampler_pair
    b, tokens = 1, 150
    rng = np.random.default_rng(11)
    cond = rng.normal(size=(b, 301, 24)).astype(np.float32)
    x0 = rng.normal(size=(b, tokens, 3)).astype(np.float32)
    arrays = _normals(5, [(b, tokens, C)] * 51)

    feeder = _NoiseFeeder(arrays)
    monkeypatch.setattr(torch, "randn", feeder.randn)
    monkeypatch.setattr(torch, "randn_like", feeder.randn_like)
    with torch.no_grad():
        ref_out = ref.ddim_sample(
            (b, tokens, C), torch.from_numpy(cond), x_0=torch.from_numpy(x0)
        ).numpy()

    noise = {"init": arrays[0], "steps": np.stack(arrays[1:])}
    out = ours.ddim_sample(
        params, (b, tokens, C), jnp.asarray(cond), jax.random.key(0), x_0=jnp.asarray(x0), noise=noise
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)


def test_long_ddim_sample_matches_reference(sampler_pair, monkeypatch):
    ref, ours, params = sampler_pair
    nb, tokens = 3, 150  # batch of 3 half-overlapping slices
    rng = np.random.default_rng(13)
    cond = rng.normal(size=(nb, 301, 24)).astype(np.float32)
    x0 = rng.normal(size=(nb, tokens, 1, 3)).astype(np.float32)
    arrays = _normals(6, [(nb, tokens, C)] * 51)

    feeder = _NoiseFeeder(arrays)
    monkeypatch.setattr(torch, "randn", feeder.randn)
    monkeypatch.setattr(torch, "randn_like", feeder.randn_like)
    with torch.no_grad():
        ref_out = ref.long_ddim_sample(
            (nb, tokens, C), torch.from_numpy(cond), x_0=torch.from_numpy(x0)
        ).numpy()

    noise = {"init": arrays[0], "steps": np.stack(arrays[1:])}
    out = ours.long_ddim_sample(
        params,
        (nb, tokens, C),
        jnp.asarray(cond),
        jax.random.key(0),
        x_0=jnp.asarray(x0.reshape(nb, tokens, 3)),
        noise=noise,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)


def test_footwork_sample_matches_reference(sampler_pair, monkeypatch):
    ref, ours, params = sampler_pair
    b, tokens = 1, 150
    rng = np.random.default_rng(17)
    cond = rng.normal(size=(b, 301, 24)).astype(np.float32)
    x0 = rng.normal(size=(b, tokens, C)).astype(np.float32)
    arrays = _normals(9, [(b, tokens, C)] * 51)

    feeder = _NoiseFeeder(arrays)
    monkeypatch.setattr(torch, "randn", feeder.randn)
    monkeypatch.setattr(torch, "randn_like", feeder.randn_like)
    with torch.no_grad():
        ref_out = ref.ddim_sample_Footwork(
            (b, tokens, C), torch.from_numpy(cond), x_0=torch.from_numpy(x0)
        ).numpy()

    noise = {"init": arrays[0], "steps": np.stack(arrays[1:])}
    out = ours.ddim_sample_footwork(
        params, (b, tokens, C), jnp.asarray(cond), jax.random.key(0), x_0=jnp.asarray(x0), noise=noise
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)


def test_p_sample_loop_matches_reference(sampler_pair, monkeypatch):
    ref, ours, params = sampler_pair
    b, tokens, steps = 1, 150, 5
    rng = np.random.default_rng(23)
    cond = rng.normal(size=(b, 301, 24)).astype(np.float32)
    arrays = _normals(25, [(b, tokens, C)] * (1 + steps))

    feeder = _NoiseFeeder(arrays)
    monkeypatch.setattr(torch, "randn", feeder.randn)
    monkeypatch.setattr(torch, "randn_like", feeder.randn_like)
    with torch.no_grad():
        ref_out = ref.p_sample_loop(
            (b, tokens, C), torch.from_numpy(cond), start_point=steps
        ).numpy()

    noise = {"init": arrays[0], "steps": np.stack(arrays[1:])}
    out = ours.p_sample_loop(
        params, (b, tokens, C), jnp.asarray(cond), jax.random.key(0), noise=noise, start_point=steps
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)
