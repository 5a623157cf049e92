"""Render a probe history.json (scripts/probe_unseen_objects.py output)
as the markdown table rows used in docs/PERFORMANCE.md ("Round-3
unseen-object generalization probe").

Usage: python scripts/summarize_probe.py /tmp/probe_unseen_ablate8/history.json
"""
import json
import sys


def rows(history):
    out = []
    for h in history:
        s, v, o = h["seen"], h["views"], h["objects"]
        loss = h.get("loss")
        out.append(
            f"| {h['step']} | {loss if loss is not None else '—'} "
            f"| {s['top1_median_deg']}° "
            f"| {v['top1_median_deg']}° / {v['acc15']:.2f} / {v['acc30']:.2f} "
            f"| {o['top1_median_deg']}° / {o['top5_median_deg']}° / {o['acc30']:.2f} |"
        )
    return out


if __name__ == "__main__":
    history = json.load(open(sys.argv[1]))
    print("| step | train loss | seen top-1 | views top-1 / Acc15 / Acc30 "
          "| objects top-1 / top-5 / Acc30 |")
    print("|---|---|---|---|---|")
    for r in rows(history):
        print(r)
