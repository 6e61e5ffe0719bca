"""Merge per-side head-to-head JSONs (scripts/parity_head2head.py
--side ref / --side rebuild) into the PARITY_RUNS.md markdown tables.

Usage: python scripts/merge_h2h_tables.py ref.json rebuild.json [--key mtt]
Prints the markdown table on stdout.
"""

from __future__ import annotations

import argparse
import json


def band_table(ref, reb, ref_gl=None, reb_gl=None):
    lines = ["| iter | reference top-1 | rebuild top-1 | "
             "ref grand loss | rebuild grand loss | overlap |",
             "|---|---|---|---|---|---|"]
    for it in sorted(reb["acc"], key=int):
        ra, rs = ref["acc"].get(it), ref["std"].get(it, 0.0)
        oa, os_ = reb["acc"][it], reb["std"][it]
        if ra is None:
            continue
        overlap = abs(ra - oa) <= (rs + os_ + 1e-9)

        def gl_at(gl):
            if gl is None:
                return "-"
            if isinstance(gl, dict):
                v = gl.get(it)
            else:  # per-iteration list
                i = min(int(it), len(gl) - 1)
                v = gl[i] if gl else None
            return f"{v:.4f}" if v is not None else "-"
        lines.append(f"| {it} | {ra:.4f} +- {rs:.4f} | "
                     f"{oa:.4f} +- {os_:.4f} | {gl_at(ref_gl)} | "
                     f"{gl_at(reb_gl)} | {'yes' if overlap else 'NO'} |")
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_json")
    ap.add_argument("rebuild_json")
    ap.add_argument("--key", default="mtt",
                    help="top-level section: 'mtt' or '' for the DM run")
    args = ap.parse_args()
    with open(args.ref_json) as f:
        ref_rep = json.load(f)
    with open(args.rebuild_json) as f:
        reb_rep = json.load(f)
    if args.key:
        ref_rep, reb_rep = ref_rep[args.key], reb_rep[args.key]
    hp = reb_rep.get("hp") or ref_rep.get("hp")
    ref, reb = ref_rep["reference"], reb_rep["rebuild"]
    print(f"hyperparameters: {hp}\n")
    print("\n".join(band_table(ref, reb, ref.get("grand_loss"),
                               reb.get("grand_loss"))))


if __name__ == "__main__":
    main()
