"""Summarize a bench campaign JSONL (tools/bench_campaign_r4.sh output).

Usage: python tools/process_campaign.py [/root/repo/.bench_r4_campaign.jsonl]

Prints a BENCH_NOTES-ready table: one row per arm with the metric value,
MFU when reported, and the delta vs the mean of the control arms reporting
the SAME metric string (arms named '*control*' or 'headline reps8 *'), so
train / sample / stream arms each get a like-for-like reference.
"""

import json
import sys


def main(path="/root/repo/.bench_r4_campaign.jsonl"):
    rows = []  # (arm, dict | None)
    arm = None
    skip_markers = ("DONE", "yielding chip", "chip reclaimed")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("### "):
                name = line[4:].split(" (")[0]
                if any(m in name for m in skip_markers):
                    continue
                arm = name
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

    def is_control(name):
        return "control" in name or name.startswith("headline reps8")

    # mean control value per metric string — like-for-like references only
    by_metric = {}
    for name, d in rows:
        if d and is_control(name) and d.get("value"):
            by_metric.setdefault(d["metric"], []).append(d["value"])
    ref_for = {m: sum(v) / len(v) for m, v in by_metric.items()}

    print(f"{'arm':34s} {'value':>10s} {'unit':24s} {'MFU':>7s} {'vs ctl':>8s}")
    for name, d in rows:
        if d is None:
            print(f"{name:34s} {'NO RESULT':>10s}")
            continue
        if d.get("metric") == "bench_error":
            print(f"{name:34s} {'ERROR':>10s}  {d.get('error', '')[:48]}")
            continue
        if "ab_label" in d:  # tools/ab_train.py paired in-process configs
            print(
                f"{name:22s} [{d['ab_label']:>10s}] {d.get('steps_per_s', '—'):>9} steps/s"
                f"  {d.get('samples_per_s', ''):>7} samples/s  b{d.get('batch', '?')}"
            )
            continue
        val = d.get("value")
        mfu = d.get("mfu_vs_v5e_bf16_peak")
        ref = ref_for.get(d.get("metric"))
        delta = f"{(val / ref - 1) * 100:+.1f}%" if (ref and val) else ""
        print(
            f"{name:34s} {val if val is not None else '—':>10} "
            f"{str(d.get('unit', ''))[:24]:24s} "
            f"{(f'{mfu*100:.1f}%' if mfu else ''):>7s} {delta:>8s}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
