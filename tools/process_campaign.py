"""Summarize a bench campaign JSONL (tools/bench_campaign_r4.sh output).

Usage: python tools/process_campaign.py [/root/repo/.bench_r4_campaign.jsonl]

Prints a BENCH_NOTES-ready table: one row per arm with the metric value,
MFU when reported, and the delta vs the nearest control arm of the same
BENCH_MODE (arms named '*control*' / 'headline*' / 'layer control').
"""

import json
import sys


def main(path="/root/repo/.bench_r4_campaign.jsonl"):
    rows = []  # (arm, dict | None)
    arm = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("### "):
                arm = line[4:].split(" (")[0]
                if not line.startswith("### DONE"):
                    rows.append([arm, None])
            elif line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rows and rows[-1][1] is None:
                    rows[-1][1] = d
                else:
                    rows.append([arm or "?", d])

    def is_train(d):
        return d and "train" in str(d.get("metric", ""))

    controls = {
        True: [r for r in rows if r[1] and is_train(r[1]) and "control" in r[0]],
        False: [r for r in rows if r[1] and not is_train(r[1])
                and ("control" in r[0] or r[0].startswith("headline"))],
    }

    print(f"{'arm':34s} {'value':>10s} {'unit':24s} {'MFU':>7s} {'vs ctl':>8s}")
    for name, d in rows:
        if d is None:
            print(f"{name:34s} {'NO RESULT':>10s}")
            continue
        if d.get("metric") == "bench_error":
            print(f"{name:34s} {'ERROR':>10s}  {d.get('error', '')[:48]}")
            continue
        val = d.get("value")
        mfu = d.get("mfu_vs_v5e_bf16_peak")
        ctl = controls[is_train(d)]
        ref = None
        if ctl:
            vals = [c[1]["value"] for c in ctl if c[1].get("value")]
            ref = sum(vals) / len(vals) if vals else None
        delta = f"{(val / ref - 1) * 100:+.1f}%" if (ref and val) else ""
        print(
            f"{name:34s} {val if val is not None else '—':>10} "
            f"{str(d.get('unit', ''))[:24]:24s} "
            f"{(f'{mfu*100:.1f}%' if mfu else ''):>7s} {delta:>8s}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
