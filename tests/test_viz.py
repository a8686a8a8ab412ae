"""Golden parity of the sample postprocessing pipeline vs the reference.

Drives the reference's `GaussianDiffusion.render_sample`
(`/root/reference/model/diffusion.py:765-988`) with precomputed samples
(sampling skipped — the reference accepts a tensor in place of `shape`),
rendering off, and fk_out set, then compares the dumped pkl (smpl_poses /
smpl_trans / full_pose) against our `tcdiff_tpu.viz.render_sample`. Covers:
unnormalize, contact split, 6D->axis-angle, SMPL FK, and the long-mode
crossfade + quaternion-slerp stitch.
"""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

import _refstubs

_refstubs.install()

import torch  # noqa: E402

from dataset.preprocess import Normalizer as RefNormalizer  # noqa: E402
from model.diffusion import GaussianDiffusion as RefGaussianDiffusion  # noqa: E402
from vis import SMPLSkeleton  # noqa: E402

from tcdiff_tpu.data.normalizer import Normalizer  # noqa: E402
from tcdiff_tpu.viz import render_sample  # noqa: E402

SEQ = 150
C = 151


class _NoModel(torch.nn.Module):
    def forward(self, *a, **k):  # pragma: no cover - never called
        raise AssertionError("sampling should be skipped")


@pytest.fixture(scope="module")
def ref_diffusion():
    smpl = SMPLSkeleton(torch.device("cpu"))
    return RefGaussianDiffusion(
        model=_NoModel(),
        horizon=SEQ,
        repr_dim=C,
        smpl=smpl,
        schedule="cosine",
        n_timestep=10,
        predict_epsilon=False,
        seq_len=SEQ,
    )


def _normalizers(seed=0):
    rng = np.random.default_rng(seed)
    fit = rng.normal(size=(64, C)).astype(np.float32) * 2.0
    ref_norm = RefNormalizer(torch.from_numpy(fit))
    ours = Normalizer.from_torch_state(ref_norm.scaler.scale_, ref_norm.scaler.min_)
    return ref_norm, ours


def _pkl(dirpath):
    files = sorted(os.listdir(dirpath))
    assert files, "no pkl written"
    with open(os.path.join(dirpath, files[0]), "rb") as f:
        return pickle.load(f)


@pytest.mark.parametrize("mode,b,dn", [("long", 3, 1), ("normal", 1, 1)])
def test_render_sample_matches_reference(ref_diffusion, tmp_path, mode, b, dn):
    rng = np.random.default_rng(5)
    samples = np.clip(
        rng.normal(size=(b, SEQ * dn, C)).astype(np.float32) * 0.4, -1, 1
    )
    ref_norm, our_norm = _normalizers()
    cond = torch.zeros(b, 301, 4)
    names = [f"data/train/feats438/clip_slice{i}.wav" for i in range(b)]

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_render = tmp_path / "ref_render"

    ref_diffusion.render_sample(
        torch.from_numpy(samples.copy()),
        cond,
        ref_norm,
        epoch=1,
        render_out=str(ref_render),
        fk_out=str(ref_dir),
        name=names,
        sound=False,
        mode=mode,
        required_dancer_num=dn,
        render=False,
    )

    render_sample(
        jnp.asarray(samples),
        our_norm,
        epoch=1,
        render_out=str(tmp_path / "our_render"),
        dancer_num=dn,
        fk_out=str(our_dir),
        name=names,
        sound=False,
        mode=mode,
        render=False,
    )

    ref = _pkl(ref_dir)
    ours = _pkl(our_dir)
    np.testing.assert_allclose(
        ours["smpl_trans"], np.asarray(ref["smpl_trans"]), atol=2e-4, rtol=2e-4
    )
    # axis-angle can differ by quaternion sign; compare via FK instead for poses
    np.testing.assert_allclose(
        ours["full_pose"], np.asarray(ref["full_pose"]), atol=5e-4, rtol=5e-4
    )


def test_skeleton_render_writes_gif(tmp_path):
    from tcdiff_tpu.viz import skeleton_render

    rng = np.random.default_rng(0)
    poses = rng.normal(size=(2, 8, 24, 3)).astype(np.float32)
    out = skeleton_render(poses, epoch="t", out=str(tmp_path), name="x.wav", sound=False)
    assert out is not None and os.path.exists(out)
