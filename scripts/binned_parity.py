"""Binned-run (r8) loss-parity + controllability comparison vs r6/r7.

The defaults-flip evidence for Finding 8: does a full 20-epoch run under
--binned --gated_metrics match the plain-loader runs at the loss level
and on the 144-window controllability cells?

    python scripts/binned_parity.py
"""
import json
import sys

import numpy as np

RUNS = {
    "r6 (plain, seed 99)": "docs/training_run/r6",
    "r7 (plain, seed 7)": "docs/training_run/r7",
    "r8 (binned+gated, seed 99)": "docs/training_run/r8_binned",
    "r9 (binned+gated, lr 1.6e-4, seed 99)": "docs/training_run/r9_binned_lr",
    "r10 (binned+gated, rows 4, seed 99)": "docs/training_run/r10_binned4",
}


def val_curve(d):
    vals = {}
    try:
        for line in open(f"{d}/metrics.jsonl"):
            r = json.loads(line)
            if "val_total" in r:
                vals[int(r["epoch"])] = r["val_total"]
    except FileNotFoundError:
        pass
    return vals


def main():
    rng = np.random.default_rng(0)
    curves = {k: val_curve(d) for k, d in RUNS.items()}
    epochs = sorted(set().union(*[c.keys() for c in curves.values()]))
    print("epoch | " + " | ".join(RUNS))
    for e in epochs:
        row = " | ".join(
            f"{curves[k].get(e, float('nan')):.4f}" for k in RUNS
        )
        print(f"{e:5d} | {row}")
    for k in RUNS:
        if curves[k]:
            print(f"{k}: best valid {min(curves[k].values()):.4f}")

    def ci(diffs):
        a = np.abs(np.asarray(diffs, float))
        boots = [a[rng.integers(0, len(a), len(a))].mean() for _ in range(10000)]
        return f"{a.mean():.2f} [{np.percentile(boots,2.5):.2f}, {np.percentile(boots,97.5):.2f}]"

    evals = {}
    for k, d in RUNS.items():
        try:
            evals[k] = json.load(open(f"{d}/eval3_ckpt19.json"))
        except FileNotFoundError:
            print(f"(no eval3 for {k})")
    for ax in ("tensile", "density", "occupation", "polyphony"):
        print(f"{ax:10s} " + " | ".join(
            f"{k.split()[0]}: {ci(v[ax]['diffs'])}" for k, v in evals.items()
        ))


if __name__ == "__main__":
    main()
