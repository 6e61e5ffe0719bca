"""Render the S2D-MTT sweep JSONL (scripts/sweep_s2d_mtt.py --out) as a
markdown table for BASELINE.md (VERDICT r4 ask #4).

Pure-python (no jax import): safe to run while the TPU is busy.

Usage: python scripts/sweep_report.py artifacts/sweep_s2d_mtt/sweep_r5.jsonl
"""

from __future__ import annotations

import json
import sys


def fmt_hp(hp: dict) -> str:
    keys = ("lr_dynamic", "lr_hal", "lr_lr", "epoch_eval_train")
    return ", ".join(f"{k.replace('lr_', 'lr ')}={hp[k]:g}"
                     if isinstance(hp[k], float) else f"{k}={hp[k]}"
                     for k in keys if k in hp)


def main(path: str) -> None:
    recs = [json.loads(line) for line in open(path) if line.strip()]
    if not recs:
        print("no records in", path)
        return
    # union of eval points, sorted numerically
    points = sorted({int(k) for r in recs for k in r["curve"]})
    head = " | ".join(f"it={p}" for p in points)
    print(f"| config | {head} | monotone@1600? | wall |")
    print("|---|" + "---|" * (len(points) + 2))
    for r in recs:
        cells = []
        for p in points:
            v = r["curve"].get(str(p))
            if not v:
                cells.append("—")
            elif len(v) > 2:  # newer runs also record the learned syn_lr
                cells.append(f"{v[0]:.3f}±{v[1]:.3f} @{v[2]:.4f}")
            else:
                cells.append(f"{v[0]:.3f}±{v[1]:.3f}")
        # the ask: accuracy at the last point >= accuracy at it=400
        a400 = r["curve"].get("400")
        alast = r["curve"].get(str(points[-1]))
        mono = ("**yes**" if a400 and alast and alast[0] >= a400[0]
                else "no")
        if r.get("diverged_at") is not None:
            mono = f"diverged@{r['diverged_at']}"
        print(f"| {fmt_hp(r['hp'])} | " + " | ".join(cells) +
              f" | {mono} | {r['wall_sec']:.0f}s |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "artifacts/sweep_s2d_mtt/sweep_r5.jsonl")
