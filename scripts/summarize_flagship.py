"""Summarize a product-path Trainer run's metrics.jsonl for the docs.

Prints the per-eval-point trajectory of the monitored group (valA/valB
top-1 median, both weight streams), the best-tracker trace, and
steps/sec stats.  Used for the round-5 flagship product-path run
(docs/PERFORMANCE.md).

Run:  python scripts/summarize_flagship.py /tmp/flagship_run/flagship_r5
"""
import json
import sys

run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_run/flagship_r5"
# metrics.jsonl appends across process restarts (kill/resume legs);
# keep the LAST row per (step, kind) — the resumed stream supersedes
# any pre-kill rows past the restored checkpoint.
by_key = {}
with open(f"{run_dir}/metrics.jsonl") as f:
    for line in f:
        r = json.loads(line)
        kind = (
            "ema"
            if any(k.startswith("val_ema/") for k in r)
            else "inst"
            if any(k.startswith("val/") for k in r)
            else "train"
        )
        by_key[(r["step"], kind)] = r
merged = {}
for (step, kind), r in sorted(by_key.items()):
    merged.setdefault(step, {}).update(r)
rows = [merged[s] for s in sorted(merged)]

evals = [r for r in rows if any(k.startswith("val/") or k.startswith("val_ema/") for k in r)]
print("step | valA top1 med (inst/ema) | valB top1 med (inst/ema) | valA acc30 (inst/ema)")
for r in evals:
    def g(k):
        v = r.get(k)
        return f"{v:.1f}" if isinstance(v, (int, float)) else "-"
    print(
        f"{r['step']:>5} | {g('val/valA/top1, median'):>6}/{g('val_ema/valA/top1, median'):>6}"
        f" | {g('val/valB/top1, median'):>6}/{g('val_ema/valB/top1, median'):>6}"
        f" | {g('val/valA/top1, accuracy_30'):>5}/{g('val_ema/valA/top1, accuracy_30'):>5}"
    )

steps = [r["steps_per_sec"] for r in rows if "steps_per_sec" in r and r["step"] > 100]
if steps:
    import statistics

    print(
        f"\nsteps/sec over {len(steps)} prints: median {statistics.median(steps):.2f}, "
        f"max {max(steps):.2f}"
    )
try:
    best = json.load(open(f"{run_dir}/checkpoints/best.json"))
    print(f"best tracker: {best}")
except FileNotFoundError:
    pass
