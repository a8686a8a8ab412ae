"""Bash side of the chip-lock protocol (tools/bench_campaign_r4.sh).

Extracts the real wanted_fresh/yield_chip functions from the campaign
script and exercises them against scratch lock paths: the campaign must
drop the busy lock while a fresh wanted marker exists, reclaim it when the
marker clears, and ignore stale (crashed-bench) markers. Complements
tests/test_bench_lock.py, which covers bench.py's side.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAMPAIGN = os.path.join(REPO, "tools", "bench_campaign_r4.sh")


@pytest.fixture
def funcs(tmp_path):
    lines = open(CAMPAIGN).read().splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("wanted_fresh()"))
    # the two functions are adjacent; take through yield_chip's closing brace
    end = [i for i, l in enumerate(lines) if l == "}" and i > start][1]
    body = "\n".join(lines[start : end + 1])
    f = tmp_path / "funcs.sh"
    f.write_text(body + "\n")
    return f


def _run(harness, tmp_path, funcs):
    paths = {
        "out": tmp_path / "out.jsonl",
        "busy": tmp_path / "busy",
        "wanted": tmp_path / "wanted",
    }
    script = tmp_path / "harness.sh"
    script.write_text(
        "set -eu\n"
        f"out={paths['out']}\nbusy={paths['busy']}\nwanted={paths['wanted']}\n"
        ': > "$out"\n'
        f"source {funcs}\n" + harness
    )
    subprocess.run(["bash", str(script)], check=True, timeout=60)
    return paths


def test_yields_then_reclaims(tmp_path, funcs):
    paths = _run(
        'touch "$busy"; touch "$wanted"\n'
        '( sleep 2; [ ! -e "$busy" ] && echo BUSY_RELEASED >> "$out"; rm -f "$wanted" ) &\n'
        "YIELD_POLL_S=1\n"
        "yield_chip\n"
        '[ -e "$busy" ] && echo BUSY_RECLAIMED >> "$out"\n'
        "wait\n",
        tmp_path,
        funcs,
    )
    out = paths["out"].read_text()
    assert "yielding chip to driver bench" in out
    assert "BUSY_RELEASED" in out  # lock really dropped while bench waited
    assert "chip reclaimed" in out
    assert "BUSY_RECLAIMED" in out
    assert paths["busy"].exists()


def test_stale_marker_ignored(tmp_path, funcs):
    paths = _run(
        'touch "$busy"\n'
        'touch -d "3 hours ago" "$wanted"\n'
        "YIELD_POLL_S=1\n"
        "yield_chip\n",
        tmp_path,
        funcs,
    )
    assert paths["busy"].exists()  # never dropped for a crashed bench
    assert "yielding" not in paths["out"].read_text()


def test_no_marker_is_a_noop(tmp_path, funcs):
    paths = _run('touch "$busy"\nYIELD_POLL_S=1\nyield_chip\n', tmp_path, funcs)
    assert paths["busy"].exists()
    assert paths["out"].read_text() == ""


SHIM = """#!/bin/bash
case "$1" in
  bench.py)
    mode=${BENCH_MODE:-sample}
    if [ "$mode" = train ]; then
      echo '{"metric": "train_steps/sec (batch 64, 3 dancers)", "value": 3.2, "unit": "steps/s", "vs_baseline": 1.0}'
    elif [ "$mode" = stream ]; then
      echo '{"metric": "streaming slice denoise", "value": 60.0, "unit": "ms/slice", "vs_baseline": 1.0}'
    else
      echo '{"metric": "sec_of_motion/sec/chip (50-step DDIM, 3 dancers)", "value": 180.0, "unit": "s_motion/s/chip", "vs_baseline": 36.0}'
    fi
    ;;
  tools/aot_checks.py)
    case "$2" in
      sharded_train) echo "sharded_train: COMPILE OK";;
      layer) echo "layer FULL: COMPILE OK";;
    esac
    ;;
  tools/train_dynamics.py) echo '{"event": "summary"}';;
  *) echo "unexpected: $*" >&2; exit 9;;
esac
"""


def test_campaign_dry_run_control_flow(tmp_path):
    """Execute the ENTIRE campaign script with a stubbed `python` on PATH:
    every arm must fire in order, the layer A/B must open on its COMPILE OK
    gate, and the busy lock must be cleaned up on exit. Catches bash-level
    regressions without a chip (the recovery window is too precious to
    debug shell bugs in)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    shim = bindir / "python"
    shim.write_text(SHIM)
    shim.chmod(0o755)
    out = tmp_path / "out.jsonl"
    env = dict(
        os.environ,
        PATH=f"{bindir}:{os.environ['PATH']}",
        BENCH_CAMPAIGN_OUT=str(out),
        TPU_BUSY_LOCK=str(tmp_path / "busy"),
        TPU_WANTED_MARK=str(tmp_path / "wanted"),
    )
    subprocess.run(["bash", CAMPAIGN], check=True, timeout=120, env=env)
    arms = [
        l[4:].split(" (")[0] for l in out.read_text().splitlines()
        if l.startswith("### ")
    ]
    assert arms[0] == "headline reps8 session1"
    assert arms[-1] == "DONE"
    for needed in ("train control A", "TRAIN_ALL3", "train control B",
                   "headline b16", "LAYER_FUSE full", "LAYER_FUSE stream",
                   "stream control"):
        assert needed in arms, needed
    assert not (tmp_path / "busy").exists()
