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
