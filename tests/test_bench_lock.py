"""Chip-lock coordination between a driver-fired bench and the campaign.

bench.py announces itself via a `wanted` marker and waits for the
campaign's `busy` lock to clear (tools/bench_campaign_r4.sh yields between
arms); the campaign's own bench children skip the protocol via
TCDIFF_BENCH_LOCK_OWNER. Pure-filesystem logic — no chip needed.
"""

import os

import bench


def _patch_paths(monkeypatch, tmp_path):
    busy = tmp_path / "tpu_busy"
    wanted = tmp_path / "tpu_wanted"
    monkeypatch.setattr(bench, "_TPU_BUSY", str(busy))
    monkeypatch.setattr(bench, "_TPU_WANTED", str(wanted))
    return busy, wanted


def test_lock_owner_skips_protocol(monkeypatch, tmp_path):
    busy, wanted = _patch_paths(monkeypatch, tmp_path)
    monkeypatch.setenv("TCDIFF_BENCH_LOCK_OWNER", "1")
    busy.touch()
    bench._chip_lock_coordination()  # must not wait on the busy lock
    assert not wanted.exists()


def test_creates_wanted_marker_and_returns_when_free(monkeypatch, tmp_path):
    busy, wanted = _patch_paths(monkeypatch, tmp_path)
    monkeypatch.delenv("TCDIFF_BENCH_LOCK_OWNER", raising=False)
    bench._chip_lock_coordination()
    assert wanted.exists()
    assert wanted.read_text() == str(os.getpid())
    bench._release_wanted()
    assert not wanted.exists()


def test_busy_lock_with_zero_budget_proceeds(monkeypatch, tmp_path, capsys):
    busy, wanted = _patch_paths(monkeypatch, tmp_path)
    monkeypatch.delenv("TCDIFF_BENCH_LOCK_OWNER", raising=False)
    monkeypatch.setenv("BENCH_LOCK_WAIT", "0")
    busy.touch()
    bench._chip_lock_coordination()  # must break out, not sleep
    assert wanted.exists()  # still held so the campaign keeps yielding
    assert "proceeding anyway" in capsys.readouterr().err
    bench._release_wanted()


def test_release_is_idempotent(monkeypatch, tmp_path):
    _patch_paths(monkeypatch, tmp_path)
    bench._release_wanted()  # no marker: must not raise


def test_train_dynamics_yield(monkeypatch, tmp_path):
    """The dynamics arm idles while a fresh bench marker exists, dropping
    and restoring the campaign's busy lock around the idle window."""
    import threading
    import time as _time

    import importlib
    td = importlib.import_module("tools.train_dynamics")

    marker = tmp_path / "wanted"
    busy = tmp_path / "busy"
    monkeypatch.setenv("TPU_WANTED_MARK", str(marker))
    monkeypatch.setenv("TPU_BUSY_LOCK", str(busy))
    monkeypatch.setenv("DYN_YIELD_POLL_S", "0.2")

    # no marker: no-op, zero idle
    busy.touch()
    assert td._yield_to_driver_bench() == 0.0
    assert busy.exists()

    # stale marker (crashed bench): ignored
    marker.touch()
    old = _time.time() - 3 * 3600
    import os as _os
    _os.utime(marker, (old, old))
    assert td._yield_to_driver_bench() == 0.0

    # fresh marker: busy dropped while idling, restored after
    marker.touch()
    seen = {}

    def finish_bench():
        _time.sleep(0.8)
        seen["busy_during"] = busy.exists()
        marker.unlink()

    t = threading.Thread(target=finish_bench)
    t.start()
    idled = td._yield_to_driver_bench()
    t.join()
    assert idled >= 0.8
    assert seen["busy_during"] is False
    assert busy.exists()
