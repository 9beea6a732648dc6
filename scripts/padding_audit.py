"""Padding-waste audit of the bucketed loader (PERFORMANCE.md Finding 8a).

Measures, over one finetuning + one pretraining epoch of the real corpus,
what fraction of collated tensor slots carry real tokens vs bucket
padding: per-axis (src rows/cols, tgt rows/cols), loss-bearing targets,
and the FLOP-weighted utilization (attention + FFN work scales with the
padded sequence lengths, loss work with padded target slots).

    python scripts/padding_audit.py [--bucket 256] [--row_bucket 8]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from smer_music_generation_tpu.data.loader import BatchLoader, LoaderConfig
from smer_music_generation_tpu.data.masking import MaskingConfig
from smer_music_generation_tpu.data.pack import load_batches
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab


def audit(loader, pad_index: int):
    stats = {
        "batches": 0,
        "src_slots": 0, "src_real": 0,
        "tgt_slots": 0, "tgt_real": 0,
        "loss_tokens": 0,
        "rows": 0, "rows_real": 0,
        "flops_padded": 0.0, "flops_real": 0.0,
    }
    shapes = {}
    for batch in loader:
        stats["batches"] += 1
        src, tgt = batch["input"], batch["target_out"]
        B, S = src.shape
        T = tgt.shape[1]
        shapes[(B, S, T)] = shapes.get((B, S, T), 0) + 1
        src_real = int((src != pad_index).sum())
        tgt_real = int((tgt != pad_index).sum())
        # dummy rows carry one <eos> input but an all-pad target: count
        # loss-bearing rows, not nonempty-input rows
        real_rows = int((tgt != pad_index).any(axis=1).sum())
        stats["src_slots"] += B * S
        stats["src_real"] += src_real
        stats["tgt_slots"] += B * T
        stats["tgt_real"] += tgt_real
        stats["loss_tokens"] += tgt_real
        stats["rows"] += B
        stats["rows_real"] += real_rows
        # matmul-FLOP weighting at the flagship shape (d=512, ff=2048,
        # 4 enc + 4 dec): per-row cost ~ S*(enc per-token) + T*(dec
        # per-token) + S*T + T^2 attention-score terms; padded cost uses
        # the bucketed (B,S,T), real cost the actual per-row lengths.
        d, ff, L = 512, 2048, 4
        per_tok = 4 * d * d + 2 * d * ff  # qkv/o + ffn matmuls per layer
        row_src = (src != pad_index).sum(axis=1)
        row_tgt = (tgt != pad_index).sum(axis=1)
        attn = d  # score+value matmul factor per pair
        stats["flops_padded"] += B * (
            L * (S + 2 * T) * per_tok + L * (S * S + T * T + S * T) * 2 * attn
        )
        stats["flops_real"] += float(
            (L * (row_src + 2 * row_tgt) * per_tok).sum()
            + (L * (row_src**2 + row_tgt**2 + row_src * row_tgt) * 2 * attn).sum()
        )
    out = {
        "batches": stats["batches"],
        "distinct_shapes": len(shapes),
        "src_token_utilization": stats["src_real"] / max(stats["src_slots"], 1),
        "tgt_token_utilization": stats["tgt_real"] / max(stats["tgt_slots"], 1),
        "row_utilization": stats["rows_real"] / max(stats["rows"], 1),
        "flop_utilization": stats["flops_real"] / max(stats["flops_padded"], 1),
        "top_shapes": sorted(
            ((f"{k[0]}x{k[1]}->{k[2]}", v) for k, v in shapes.items()),
            key=lambda kv: -kv[1],
        )[:8],
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_batches", default="corpus/data/smer_training")
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--row_bucket", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--binned", action="store_true",
                    help="audit the shape-binned batcher instead")
    ap.add_argument("--rows_per_batch", type=int, default=0)
    args = ap.parse_args()

    vocab = WordVocab(0, CONTROL_SETS[5])
    groups, _ = load_batches(args.train_batches)
    results = {}
    for phase, pretraining in (("finetuning", False), ("pretraining", True)):
        loader = BatchLoader(
            vocab, groups,
            LoaderConfig(batch_size=args.batch_size, max_src=2400, max_tgt=2400,
                         pretraining=pretraining, bucket=args.bucket,
                         row_bucket=args.row_bucket, bin_rows=args.binned,
                         rows_per_batch=args.rows_per_batch),
            MaskingConfig(total_mask_ratio=0.15, bar_track_control=True,
                          bar_control_at_end=True),
            seed=args.seed,
        )
        results[phase] = audit(loader, vocab.pad_index)
    print(json.dumps({"bucket": args.bucket, "row_bucket": args.row_bucket,
                      **results}, indent=2, default=str))


if __name__ == "__main__":
    main()
