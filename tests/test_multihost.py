"""Multi-host behavior: host-0 gating of logging/checkpoints/renders and
`maybe_init_multihost` plumbing (VERDICT round-1 item 6).

The reference gates side effects on accelerate's `is_main_process`
(`/root/reference/TCDiff.py:237-251`); our analogue is
`jax.process_index() == 0`. A real multi-host launch cannot run here
(single host), so these tests fake a non-zero process index and assert a
non-zero host performs NO filesystem side effects — exactly the failures a
multi-host run would hit as corrupted checkpoints / duplicate renders.

The intended multi-host launch (e.g. v5e-8 across hosts):

    COORDINATOR_ADDRESS=<host0>:8476 python -m tcdiff_tpu.cli.train ...

on every host; `maybe_init_multihost` calls `jax.distributed.initialize()`
(coordinator/num_processes/process_id resolved from the TPU env), the
(dp, tp) mesh then spans all hosts' devices, and only process 0 writes.
"""

import glob
import json

import jax
import numpy as np
import pytest

from tests.test_orchestrator import _opt, _tiny_cfg
from tcdiff_tpu.train.orchestrator import TCDiff
from tcdiff_tpu.utils.paths import maybe_init_multihost


def test_nonzero_host_writes_nothing(tmp_path, monkeypatch):
    """A non-zero host must not log, checkpoint, or render."""
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    opt = _opt(tmp_path)
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    runner.train_loop(opt)
    assert int(runner.state.step) == 4  # it DID train...
    run_dir = tmp_path / "runs" / "t"
    assert not glob.glob(str(run_dir / "checkpoints" / "ckpt_*"))  # ...silently
    assert not (run_dir / "metrics.jsonl").exists()
    assert not glob.glob(str(tmp_path / "renders" / "**" / "*"))


def test_host0_writes_everything(tmp_path, monkeypatch):
    """Contrast: the same run on process 0 produces all artifacts."""
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    opt = _opt(tmp_path)
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    runner.train_loop(opt)
    run_dir = tmp_path / "runs" / "t"
    assert len(glob.glob(str(run_dir / "checkpoints" / "ckpt_*"))) == 2
    rows = [
        json.loads(l) for l in open(run_dir / "metrics.jsonl") if "_config" not in l
    ]
    assert rows and np.isfinite(rows[-1]["total"])


def test_nonzero_host_nan_rescue_does_not_checkpoint(tmp_path, monkeypatch):
    """The NaN-halt path still raises on every host but only host 0 writes
    the rescue checkpoint."""
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    opt = _opt(tmp_path)
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    # poison the params so the first step's loss is non-finite
    runner.state = runner.state.replace(
        params=jax.tree.map(lambda p: p * np.nan, runner.state.params)
    )
    with pytest.raises(FloatingPointError):
        runner.train_loop(opt)
    assert not glob.glob(str(tmp_path / "runs" / "t" / "checkpoints" / "ckpt_*"))


def test_maybe_init_multihost_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: called.append(1))
    assert maybe_init_multihost() is False
    assert not called


def test_maybe_init_multihost_initializes_under_coordinator(monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    called = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: called.append((a, k)))
    assert maybe_init_multihost() is True
    assert len(called) == 1
