"""Summarize a training run's metrics.jsonl into a markdown table.

    python scripts/summarize_run.py runs/flagship_r2 [--out docs/training_run]

Copies metrics.jsonl + run.json + config.json into --out and prints the
per-epoch summary table (train/valid loss, per-class accuracies).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from collections import defaultdict


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    path = os.path.join(args.run_dir, "metrics.jsonl")
    records = [json.loads(line) for line in open(path)]

    per_epoch = defaultdict(dict)
    for r in records:
        if "epoch" not in r:
            continue
        e = int(r["epoch"])
        d = per_epoch[e]
        if "train_loss" in r:
            d["train_loss"] = r["train_loss"]  # last record of the epoch wins
        for k, v in r.items():
            if k.startswith("val_") or k.startswith("ave_epoch_train_"):
                d[k] = v

    acc_keys = sorted(
        {k for d in per_epoch.values() for k in d if k.startswith("val_") and k.endswith("_accuracy")}
    )
    print("| epoch | train loss | valid loss | " +
          " | ".join(k.replace("val_", "").replace("_accuracy", " acc") for k in acc_keys) + " |")
    print("|" + "---|" * (3 + len(acc_keys)))
    for e in sorted(per_epoch):
        d = per_epoch[e]
        row = [str(e + 1),
               f"{d.get('train_loss', float('nan')):.4f}",
               f"{d.get('val_total', float('nan')):.4f}"]
        for k in acc_keys:
            row.append(f"{d.get(k, float('nan')):.3f}")
        print("| " + " | ".join(row) + " |")

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        for name in ("metrics.jsonl", "run.json", "config.json"):
            src = os.path.join(args.run_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.out, name))
        print(f"\ncopied run artifacts to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
