"""Pipelined streaming (VERDICT item 8): the incremental DBN/Kalman path
must reproduce the full-rollout math exactly while only ever computing as
far as the next slice needs."""

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.config import TrajDecoderConfig
from tcdiff_tpu.trajdecoder.kalman import kalman_filter_chunk, kalman_smooth_batch
from tcdiff_tpu.trajdecoder.model import TrajDecoder
from tcdiff_tpu.trajdecoder.rollout import autoregressive_rollout
from tcdiff_tpu.trajdecoder.streaming import TrajectoryStreamer


def test_chunked_kalman_equals_batch():
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(3, 2, 40, 2)).astype(np.float32).cumsum(axis=2)
    ref = np.asarray(kalman_smooth_batch(xy))
    flat = jnp.asarray(xy.reshape(6, 40, 2))
    state = None
    outs = []
    for lo, hi in ((0, 7), (7, 8), (8, 25), (25, 40)):  # ragged chunks
        out, state = kalman_filter_chunk(flat[:, lo:hi], state)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1).reshape(3, 2, 40, 2)
    np.testing.assert_array_equal(got, ref)


def _setup(seed=0, dn=2, music_len=260):
    tcfg = TrajDecoderConfig(window_size=8, step=4, trans_layer=1, latent_dim=16)
    model = TrajDecoder(tcfg)
    rng = np.random.default_rng(seed)
    seed_traj = rng.normal(size=(1, dn, tcfg.window_size, 2)).astype(np.float32) * 0.1
    music = rng.normal(size=(1, music_len, tcfg.cond_feature_dim)).astype(np.float32)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, dn, tcfg.window_size, tcfg.nfeats)),
        jnp.zeros((1, (tcfg.window_size + tcfg.step) * 2, tcfg.cond_feature_dim)),
    )["params"]
    return tcfg, model, params, seed_traj, music


def test_streamer_matches_full_rollout():
    tcfg, model, params, seed, music = _setup()
    full = autoregressive_rollout(
        model, params, jnp.asarray(seed), jnp.asarray(music), tcfg.window_size, tcfg.step
    )
    ref = np.asarray(kalman_smooth_batch(full))

    streamer = TrajectoryStreamer(model, params, seed, music, tcfg.window_size, tcfg.step)
    # on-demand prefixes of increasing length, mid-chunk boundaries included
    for upto in (3, tcfg.window_size, tcfg.window_size + 1, 19, 30, ref.shape[2]):
        got = np.asarray(streamer.frames(upto))
        np.testing.assert_allclose(got, ref[:, :, :upto], atol=1e-6, err_msg=f"upto={upto}")
    # laziness: the streamer must NOT have rolled the whole song for a
    # 3-frame request made first (next_start advanced only as needed)
    fresh = TrajectoryStreamer(model, params, seed, music, tcfg.window_size, tcfg.step)
    fresh.frames(3)
    assert fresh.next_start == 0  # seed already covers 8 frames
    fresh.frames(tcfg.window_size + 1)
    assert fresh.next_start == tcfg.step * 2  # exactly one rollout window


def test_streamer_pads_when_music_exhausted():
    tcfg, model, params, seed, music = _setup(music_len=40)
    streamer = TrajectoryStreamer(model, params, seed, music, tcfg.window_size, tcfg.step)
    got = np.asarray(streamer.frames(60))
    assert got.shape[2] == 60
    # tail frames hold the last real frame
    np.testing.assert_array_equal(got[:, :, -1], got[:, :, -5])
