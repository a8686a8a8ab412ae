"""Failure detection: non-finite loss halts with a rescue checkpoint;
profiler flag captures a trace."""

import glob

import numpy as np
import pytest

from tcdiff_tpu.train.orchestrator import TCDiff

from tests.test_orchestrator import _opt, _tiny_cfg


def test_nan_loss_halts_with_rescue_checkpoint(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    # poison the params so the first loss is NaN
    import jax
    import jax.numpy as jnp

    runner.state = runner.state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, runner.state.params)
    )
    opt = _opt(tmp_path, epochs=1)
    opt.render_during_train = False
    with pytest.raises(FloatingPointError, match="non-finite"):
        runner.train_loop(opt)
    assert glob.glob(str(tmp_path / "runs" / "t" / "checkpoints" / "ckpt_*"))


def test_profile_dir_writes_trace(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, epochs=2)
    opt.render_during_train = False
    opt.profile_dir = str(tmp_path / "prof")
    runner.train_loop(opt)
    assert glob.glob(str(tmp_path / "prof" / "**" / "*.trace*"), recursive=True) or \
        glob.glob(str(tmp_path / "prof" / "**" / "*.pb"), recursive=True) or \
        glob.glob(str(tmp_path / "prof" / "plugins" / "**"), recursive=True)
