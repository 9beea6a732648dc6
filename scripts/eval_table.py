"""Render controllability tables (with bootstrap CIs) from eval JSON legs.

    python scripts/eval_table.py random=runs/flagship_r4/eval2_random.json \
        trained=runs/flagship_r4/eval2_trained.json ...

Each positional arg is ``column_name=path``.  Rows are the four control
axes; each cell is the mean |set - achieved| with a 95% bootstrap CI of
the mean (10,000 resamples, seeded).  ``--diff A B`` appends a
difference table (mean_B - mean_A per axis with its bootstrap CI) —
paired resampling when the two legs evaluated the same windows (equal
list lengths: the harness draws seeded windows in a deterministic
order), independent resampling otherwise.  A difference CI containing
zero means the claim "B improves on A" does not survive sampling noise
at this n.  ``--time-stats`` appends one bar-duration repair summary
line per column.  Missing axes (e.g. tensile under unk_mode 1) render
as an em dash.

CI caveat: diffs within one window are resampled as independent draws;
d/o/y axes carry a few diffs per window (set-control copies per masked
bar/track), so their effective n is somewhat below the listed n and the
CIs are correspondingly a little tight.  Tensile is one diff per masked
bar with one bar set per window at mutation time: nearly iid.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

AXES = [
    ("tensile", "tensile (0-11)"),
    ("density", "density (0-9)"),
    ("occupation", "occupation (0-9)"),
    ("polyphony", "polyphony (0-9)"),
]
N_BOOT = 10_000
SEED = 7


def boot_ci(diffs: np.ndarray, rng: np.random.Generator):
    """95% bootstrap CI of the mean."""
    n = len(diffs)
    idx = rng.integers(0, n, size=(N_BOOT, n))
    means = diffs[idx].mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def cell(leg: dict, axis: str, rng: np.random.Generator) -> str:
    d = leg.get(axis)
    if not d or not d.get("n"):
        return "—"
    diffs = np.asarray(d["diffs"], dtype=np.float64)
    lo, hi = boot_ci(diffs, rng)
    return f"{d['mean_abs_diff']:.2f} [{lo:.2f}, {hi:.2f}]"


def diff_ci(a: dict, b: dict, axis: str, rng: np.random.Generator, indep: bool = False) -> str:
    da, db = a.get(axis), b.get(axis)
    if not da or not db or not da.get("n") or not db.get("n"):
        return "—"
    xa = np.asarray(da["diffs"], dtype=np.float64)
    xb = np.asarray(db["diffs"], dtype=np.float64)
    delta = float(xb.mean() - xa.mean())
    if len(xa) == len(xb) and not indep:
        # paired: same seeded windows in the same order (the caller must
        # ensure the legs really share windows — equal length alone is
        # necessary, not sufficient; use --indep otherwise)
        d = xb - xa
        idx = rng.integers(0, len(d), size=(N_BOOT, len(d)))
        boots = d[idx].mean(axis=1)
        kind = "paired"
    else:
        ia = rng.integers(0, len(xa), size=(N_BOOT, len(xa)))
        ib = rng.integers(0, len(xb), size=(N_BOOT, len(xb)))
        boots = xb[ib].mean(axis=1) - xa[ia].mean(axis=1)
        kind = "indep"
    lo, hi = np.percentile(boots, 2.5), np.percentile(boots, 97.5)
    sig = "" if lo <= 0.0 <= hi else " *"
    return f"{delta:+.2f} [{lo:+.2f}, {hi:+.2f}] ({kind}){sig}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("legs", nargs="+", metavar="name=path")
    ap.add_argument("--time-stats", action="store_true")
    ap.add_argument(
        "--diff", nargs=2, metavar=("A", "B"), action="append", default=[],
        help="append a mean_B - mean_A difference table for named columns "
             "(paired resampling iff the legs evaluated the SAME seeded "
             "windows — asserted only by equal diff counts; pass --indep "
             "when the legs cover different windows)",
    )
    ap.add_argument("--indep", action="store_true",
                    help="force independent (unpaired) resampling in --diff")
    args = ap.parse_args(argv)

    cols = []
    for spec in args.legs:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"expected name=path, got {spec!r}")
        with open(path) as f:
            cols.append((name, json.load(f)))

    rng = np.random.default_rng(SEED)
    print("| control (bins) | " + " | ".join(n for n, _ in cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for axis, label in AXES:
        row = [cell(leg, axis, rng) for _, leg in cols]
        print(f"| {label} | " + " | ".join(row) + " |")
    ns = {leg[a]["n"] for _, leg in cols for a, _ in AXES if leg.get(a, {}).get("n")}
    print(f"\nper-axis n across legs: {sorted(ns)}; cells are mean [95% CI]")

    by_name = dict(cols)
    for a_name, b_name in args.diff:
        if a_name not in by_name or b_name not in by_name:
            ap.error(f"--diff names must be leg columns: {a_name}, {b_name}")
        print(f"\ndelta {b_name} - {a_name} (negative = {b_name} better; * = CI excludes 0):")
        print("| control | delta [95% CI] |")
        print("|---|---|")
        for axis, label in AXES:
            print(f"| {label} | {diff_ci(by_name[a_name], by_name[b_name], axis, rng, args.indep)} |")

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
