"""Golden parity of the flax DanceDecoder vs the PyTorch reference.

The reference net (`/root/reference/model/model.py:416-624`) is importable
with torch+einops only, so we instantiate it directly, port its randomly
initialized weights through `dance_decoder_params_from_torch`, and require
the two forwards to agree on identical inputs. This pins every architectural
detail at once: rotary placement, SBI-MSA norms, FiLM, fusion projection,
the traj-modulation dead-path, CFG null embeddings, time embeddings.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.interop import dance_decoder_params_from_torch
from tcdiff_tpu.models.dance_decoder import DanceDecoder, guided_forward

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
from model.model import DanceDecoder as TorchDanceDecoder  # noqa: E402

# latent_dim must be 512: the reference hardcodes context_dim=512 in its
# ConcatSquash traj-modulation layers (`model/model.py:256,300-304`).
CFG = DanceDecoderConfig(
    nfeats=151,
    seq_len=10,
    latent_dim=512,
    ff_size=128,
    num_layers=2,
    num_heads=8,
    dropout=0.0,
    cond_feature_dim=24,
    dancer_num=2,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchDanceDecoder(
        nfeats=CFG.nfeats,
        seq_len=CFG.seq_len,
        latent_dim=CFG.latent_dim,
        ff_size=CFG.ff_size,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
        dropout=0.0,
        cond_feature_dim=CFG.cond_feature_dim,
        activation=torch.nn.functional.gelu,
        use_rotary=True,
        required_dancer_num=CFG.dancer_num,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = dance_decoder_params_from_torch(sd, CFG.num_layers, CFG.latent_dim)
    jm = DanceDecoder(CFG)
    return tm, jm, params


def _inputs(seed=0, b=2):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, CFG.seq_len * CFG.dancer_num, CFG.nfeats)).astype(np.float32)
    cond = rng.normal(size=(b, 2 * CFG.seq_len + 1, CFG.cond_feature_dim)).astype(np.float32)
    t = np.array([3, 977][:b], dtype=np.int64)
    return x, cond, t


def test_forward_matches_reference(pair):
    tm, jm, params = pair
    x, cond, t = _inputs()
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t), cond_drop_prob=0
        ).numpy()
    ours = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_uncond_forward_matches_reference(pair):
    tm, jm, params = pair
    x, cond, t = _inputs(seed=1)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t), cond_drop_prob=1
        ).numpy()
    keep = jnp.zeros((x.shape[0],), bool)
    ours = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t), keep)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_guided_forward_matches_reference(pair):
    tm, jm, params = pair
    x, cond, t = _inputs(seed=2)
    with torch.no_grad():
        ref = tm.guided_forward(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t), 2.0
        ).numpy()
    ours = guided_forward(jm, params, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t), 2.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-4)


def test_trj_dist_bias_changes_output(pair):
    """The TRPE gather path (`model/model.py:89-94`) must be wired in."""
    _, jm, params = pair
    x, cond, t = _inputs(seed=3)
    tokens = x.shape[1]
    rng = np.random.default_rng(0)
    trj = rng.integers(0, 10, size=(x.shape[0], tokens, tokens))
    base = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    biased = jm.apply(
        {"params": params},
        jnp.asarray(x),
        jnp.asarray(cond),
        jnp.asarray(t),
        None,
        jnp.asarray(trj),
    )
    assert not np.allclose(np.asarray(base), np.asarray(biased))
