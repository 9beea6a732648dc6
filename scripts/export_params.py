"""Export a trained orbax checkpoint as a committable params-only snapshot.

Orbax run dirs live under gitignored ``runs/`` and are wiped with the
ephemeral build host; this exports ``{params}`` cast to bf16 as ONE
msgpack file (~52 MB for the d512 flagship vs ~300 MB orbax) plus a
provenance sidecar, small enough to commit under ``assets/`` so
trained-weights demos and bench legs are reproducible on a fresh host.

Usage:
    python scripts/export_params.py \
        --checkpoint runs/flagship_r10_binned4/checkpoints/checkpoint_19 \
        --output assets/flagship_params.msgpack \
        --note "r10 rows4 binned, valid 0.xxx"
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # pure host-side file surgery

import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from smer_music_generation_tpu.train.checkpoint import (  # noqa: E402
    checkpoint_has_final_norm,
    export_params_msgpack,
    restore_params_only,
)
from smer_music_generation_tpu.train.state import (  # noqa: E402
    TrainState,
    build_model,
)
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", type=int, default=0, help="vocab mode (0 SMER, 1 REMI)")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    vocab = WordVocab(args.mode, CONTROL_SETS[5])
    final_norm = checkpoint_has_final_norm(args.checkpoint)
    final_norm = True if final_norm is None else final_norm
    model = build_model(vocab.vocab_size, final_norm=final_norm)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 64), jnp.int32),
        jnp.ones((1, 64), jnp.int32),
    )
    abstract = jax.eval_shape(lambda: TrainState.create(params, lr=1e-4))
    trained, epoch = restore_params_only(args.checkpoint, abstract)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except OSError:
        commit = ""
    meta = {
        "source_checkpoint": args.checkpoint,
        "epoch": epoch,
        "vocab_mode": args.mode,
        "vocab_size": vocab.vocab_size,
        "final_norm": final_norm,
        "dtype": "bfloat16",
        "git_commit": commit,
        "note": args.note,
    }
    path = export_params_msgpack(args.output, trained, meta=meta)
    print(json.dumps({"exported": path, "bytes": os.path.getsize(path), **meta}))


if __name__ == "__main__":
    main()
