"""End-to-end .pt checkpoint import: a fabricated reference checkpoint file
(EMA + raw weights + pickled Normalizer) loads through
`load_reference_checkpoint` and produces the reference net's outputs."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import _refstubs

_refstubs.install()
sys.path.insert(0, "/root/reference")

from tests.test_dance_decoder import CFG, _inputs  # noqa: E402
from model.model import DanceDecoder as TorchDanceDecoder  # noqa: E402
from dataset.preprocess import Normalizer as TorchNormalizer  # noqa: E402

from tcdiff_tpu.models.dance_decoder import DanceDecoder  # noqa: E402
from tcdiff_tpu.utils import load_reference_checkpoint  # noqa: E402


def _torch_model(seed):
    torch.manual_seed(seed)
    return TorchDanceDecoder(
        nfeats=CFG.nfeats, seq_len=CFG.seq_len, latent_dim=CFG.latent_dim,
        ff_size=CFG.ff_size, num_layers=CFG.num_layers, num_heads=CFG.num_heads,
        dropout=0.0, cond_feature_dim=CFG.cond_feature_dim,
        activation=torch.nn.functional.gelu, use_rotary=True,
        required_dancer_num=CFG.dancer_num,
    ).eval()


def test_pt_checkpoint_roundtrip(tmp_path):
    raw = _torch_model(0)
    ema = _torch_model(1)
    norm_data = torch.from_numpy(
        np.random.default_rng(2).normal(size=(40, CFG.nfeats)).astype(np.float32)
    )
    normalizer = TorchNormalizer(norm_data)
    # DDP-prefixed keys like a multi-GPU reference run (`TCDiff.py:113-120`)
    pt = tmp_path / "train-50.pt"
    torch.save(
        {
            "ema_state_dict": {f"module.{k}": v for k, v in ema.state_dict().items()},
            "model_state_dict": raw.state_dict(),
            "optimizer_state_dict": {},
            "normalizer": normalizer,
        },
        pt,
    )

    x, cond, t = _inputs(seed=3)
    jm = DanceDecoder(CFG)

    for use_ema, tm in ((True, ema), (False, raw)):
        params, norm = load_reference_checkpoint(str(pt), num_layers=CFG.num_layers, use_ema=use_ema)
        out = jm.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t),
        )
        with torch.no_grad():
            ref = tm(
                torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t),
                cond_drop_prob=0.0,
            ).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

        # normalizer round-trips through the MinMaxScaler attributes
        # (reference normalize expects (batch, seq, ch), `preprocess.py:34-37`)
        probe = np.random.default_rng(4).normal(size=(1, 5, CFG.nfeats)).astype(np.float32)
        ref_n = normalizer.normalize(torch.from_numpy(probe.copy())).numpy()
        np.testing.assert_allclose(
            np.asarray(norm.normalize(jnp.asarray(probe))), ref_n, atol=1e-5
        )


def test_reverse_converter_roundtrip():
    """torch -> flax -> torch is the identity, and the reference net loads
    the reconstructed state dict strictly and computes the same outputs."""
    from tcdiff_tpu.interop import (
        dance_decoder_params_from_torch,
        dance_decoder_params_to_torch,
    )

    tm = _torch_model(5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = dance_decoder_params_from_torch(sd, CFG.num_layers, CFG.latent_dim)
    back = dance_decoder_params_to_torch(params, CFG.num_layers)

    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        if k.endswith("rotary.freqs"):  # recomputed constant: 1-ulp pow diff
            np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # strict load into a fresh reference net + identical forward
    tm2 = _torch_model(6)
    tm2.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in back.items()}, strict=True)
    x, cond, t = _inputs(seed=8)
    with torch.no_grad():
        a = tm(torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t), cond_drop_prob=0.0)
        b = tm2(torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t), cond_drop_prob=0.0)
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
