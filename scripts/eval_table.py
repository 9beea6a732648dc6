"""Render the controllability markdown table from eval JSON legs.

    python scripts/eval_table.py random=runs/flagship_r4/eval2_random.json \
        trained=runs/flagship_r4/eval2_trained.json ...

Each positional arg is ``column_name=path``.  Rows are the four control
axes (mean |set - achieved| per axis, as published in docs/TRAINING.md);
a ``--time-stats`` flag appends one bar-duration repair summary line
per column.  Missing axes (e.g. tensile under unk_mode 1) render as
an em dash.
"""

from __future__ import annotations

import argparse
import json

AXES = [
    ("tensile", "tensile (0-11)"),
    ("density", "density (0-9)"),
    ("occupation", "occupation (0-9)"),
    ("polyphony", "polyphony (0-9)"),
]


def cell(leg: dict, axis: str) -> str:
    d = leg.get(axis)
    if not d or not d.get("n"):
        return "—"
    return f"{d['mean_abs_diff']:.2f}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("legs", nargs="+", metavar="name=path")
    ap.add_argument("--time-stats", action="store_true")
    args = ap.parse_args(argv)

    cols = []
    for spec in args.legs:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"expected name=path, got {spec!r}")
        with open(path) as f:
            cols.append((name, json.load(f)))

    print("| control (bins) | " + " | ".join(n for n, _ in cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for axis, label in AXES:
        row = [cell(leg, axis) for _, leg in cols]
        print(f"| {label} | " + " | ".join(row) + " |")
    ns = {leg[a]["n"] for _, leg in cols for a, _ in AXES if leg.get(a, {}).get("n")}
    print(f"\nper-axis n across legs: {sorted(ns)}")

    if args.time_stats:
        for name, leg in cols:
            ts = leg.get("time_stats") or {}
            tc = ts.get("time_correct_list") or []
            print(
                f"time_stats ({name}): spans={len(tc)} "
                f"mean_corrections={ts.get('mean_corrections')} "
                f"failed_rate={ts.get('failed_rate')}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
