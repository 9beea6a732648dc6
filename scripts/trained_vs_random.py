"""Trained-vs-random restatement at 144 windows (VERDICT r3 missing #3).

Computes per-cell |set-achieved| means with 95% bootstrap CIs and the
paired trained-minus-random deltas for both encodings, from the round-4
eval3_random legs + the committed r6/r6_remi trained evals.

    python scripts/trained_vs_random.py
"""
import json
import sys

import numpy as np

AXES = ("tensile", "density", "occupation", "polyphony")
PAIRS = (
    ("SMER", "docs/training_run/r6/eval3_ckpt19.json",
     "runs/flagship_r6/eval3_random.json"),
    ("REMI", "docs/training_run/r6_remi/eval3_ckpt19.json",
     "runs/flagship_r6_remi/eval3_random.json"),
)


def ci(diffs, rng):
    a = np.abs(np.asarray(diffs, float))
    boots = [a[rng.integers(0, len(a), len(a))].mean() for _ in range(10000)]
    return a.mean(), np.percentile(boots, 2.5), np.percentile(boots, 97.5), len(a)


def main():
    rng = np.random.default_rng(0)
    for enc, trained_f, random_f in PAIRS:
        try:
            tr = json.load(open(trained_f))
            ra = json.load(open(random_f))
        except FileNotFoundError as e:
            print(f"{enc}: missing {e.filename}")
            continue
        print(f"== {enc} (144 windows, seed 5) ==")
        for ax in AXES:
            tm, tlo, thi, tn = ci(tr[ax]["diffs"], rng)
            rm, rlo, rhi, rn = ci(ra[ax]["diffs"], rng)
            a = np.abs(np.asarray(tr[ax]["diffs"], float))
            b = np.abs(np.asarray(ra[ax]["diffs"], float))
            if len(a) == len(b):
                d = a - b
                boots = [d[rng.integers(0, len(d), len(d))].mean()
                         for _ in range(10000)]
                delta = (f"paired {d.mean():+.2f} "
                         f"[{np.percentile(boots, 2.5):+.2f}, "
                         f"{np.percentile(boots, 97.5):+.2f}]")
                sig = "SIG" if np.percentile(boots, 97.5) < 0 else "ns"
            else:
                # unpaired (random decodes can fail different windows):
                # bootstrap the difference of means
                boots = [
                    np.abs(a[rng.integers(0, len(a), len(a))]).mean()
                    - np.abs(b[rng.integers(0, len(b), len(b))]).mean()
                    for _ in range(10000)
                ]
                delta = (f"unpaired {(a.mean() - b.mean()):+.2f} "
                         f"[{np.percentile(boots, 2.5):+.2f}, "
                         f"{np.percentile(boots, 97.5):+.2f}] "
                         f"(n {len(a)} vs {len(b)})")
                sig = "SIG" if np.percentile(boots, 97.5) < 0 else "ns"
            print(f"  {ax:10s} trained {tm:.2f} [{tlo:.2f},{thi:.2f}] n={tn} | "
                  f"random {rm:.2f} [{rlo:.2f},{rhi:.2f}] n={rn} | "
                  f"{delta} {sig}")


if __name__ == "__main__":
    main()
