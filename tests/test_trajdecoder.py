"""Golden parity of the TrajDecoder (DBN) vs the PyTorch reference, plus the
vectorized Kalman smoother vs a straight filterpy-equivalent numpy filter and
the scan-based autoregressive rollout vs the reference's Python window loop
(`/root/reference/TCDiff.py:527-547`)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import _refstubs

_refstubs.install()

import torch  # noqa: E402

sys.path.insert(0, "/root/reference")
from TrajDecoder.model.traj_model import TrajDecoder as TorchTrajDecoder  # noqa: E402

from tcdiff_tpu.config import TrajDecoderConfig  # noqa: E402
from tcdiff_tpu.interop import traj_decoder_params_from_torch  # noqa: E402
from tcdiff_tpu.trajdecoder import (  # noqa: E402
    TrajDecoder,
    autoregressive_rollout,
    kalman_smooth_batch,
)

CFG = TrajDecoderConfig(window_size=20, step=5, trans_layer=2, cond_feature_dim=24)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    tm = TorchTrajDecoder(
        nfeats=2,
        trans_layer=CFG.trans_layer,
        window_size=CFG.window_size,
        latent_dim=CFG.latent_dim,
        dropout=0.0,
        n_head=CFG.n_head,
        cond_feature_dim=CFG.cond_feature_dim,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = traj_decoder_params_from_torch(sd, CFG.trans_layer)
    jm = TrajDecoder(CFG)
    return tm, jm, params


def test_forward_matches_reference(pair):
    tm, jm, params = pair
    rng = np.random.default_rng(0)
    b, dn, seq = 2, 3, CFG.window_size
    x = rng.normal(size=(b, dn, seq, 2)).astype(np.float32)
    music = rng.normal(size=(b, (seq + CFG.step) * 2, CFG.cond_feature_dim)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(music)).numpy()
    ours = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(music))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_rollout_matches_reference_loop(pair):
    tm, jm, params = pair
    rng = np.random.default_rng(1)
    b, dn = 2, 3
    window, step = CFG.window_size, CFG.step
    cond_len = (window + step) * 2 + step * 2 * 2 + 1  # 3 rollout iterations
    seed = rng.normal(size=(b, dn, window, 2)).astype(np.float32)
    music = rng.normal(size=(b, cond_len, CFG.cond_feature_dim)).astype(np.float32)

    # reference host loop (`TCDiff.py:533-547`)
    with torch.no_grad():
        cond_traj = torch.from_numpy(seed)
        pre_list = [cond_traj]
        for start in range(0, cond_len + 1 - (window + step) * 2, step * 2):
            pre = tm(cond_traj, torch.from_numpy(music[:, start : start + (window + step) * 2]))
            cond_traj = pre
            pre_list.append(pre[:, :, -step:])
        ref = torch.cat(pre_list, dim=2).numpy()

    ours = autoregressive_rollout(jm, params, jnp.asarray(seed), jnp.asarray(music), window, step)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-4)


def _numpy_kalman(xy, dt=1.0, q=1e-2, r=1e-1):
    """Independent numpy transcription of the filterpy constant-velocity
    filter the reference builds (`utils_model.py:27-72`)."""
    F = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]])
    H = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0]])
    P = np.eye(4) * 10.0
    R = np.eye(2) * r**2
    Q = np.eye(4) * q
    x = np.array([xy[0, 0], xy[0, 1], 0.0, 0.0])
    out = []
    for z in xy:
        x = F @ x
        P = F @ P @ F.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x = x + K @ (z - H @ x)
        IKH = np.eye(4) - K @ H
        P = IKH @ P @ IKH.T + K @ R @ K.T
        out.append(x[:2].copy())
    return np.asarray(out)


def test_kalman_matches_numpy_filter():
    rng = np.random.default_rng(2)
    xy = np.cumsum(rng.normal(size=(2, 3, 40, 2)).astype(np.float32) * 0.1, axis=2)
    ours = np.asarray(kalman_smooth_batch(xy))
    for b in range(2):
        for d in range(3):
            ref = _numpy_kalman(xy[b, d].astype(np.float64))
            np.testing.assert_allclose(ours[b, d], ref, atol=1e-4, rtol=1e-4)


def test_kalman_smooths():
    rng = np.random.default_rng(3)
    t = np.linspace(0, 4 * np.pi, 100)
    clean = np.stack([np.cos(t), np.sin(t)], -1)[None, None]
    noisy = clean + rng.normal(size=clean.shape) * 0.05
    sm = np.asarray(kalman_smooth_batch(noisy.astype(np.float32)))
    # smoothed curve has lower second-difference energy than the noisy one
    acc = lambda a: np.mean(np.diff(a, n=2, axis=2) ** 2)
    assert acc(sm) < acc(noisy)
