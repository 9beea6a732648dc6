"""CLI: start the infilling HTTP server.

    python -m smer_music_generation_tpu.serve.serve_cli \
        --checkpoint runs/default/checkpoints/checkpoint_9 [--port 5000]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from ..train.state import load_inference_model
from ..utils.config import ExperimentConfig
from ..utils.logging import logger_init
from ..vocab import WordVocab
from .app import ServingContext, serve


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--nucleus_p", type=float, default=0.9)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--batch_window_ms", type=float, default=8.0,
                        help="coalesce concurrent /generate requests into "
                        "batched decodes for up to this many ms (0 = off)")
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--draft_k", type=int, default=0,
                        help="speculative decode for single-request (B=1) "
                        "sessions (0 = off)")
    parser.add_argument("--dp", type=int, default=0,
                        help="shard batched serving over a dp mesh of N "
                        "devices (0/1 = single-chip fused kernel)")
    args = parser.parse_args(argv)

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    logger = logger_init(None)
    cfg = ExperimentConfig.load(args.config) if args.config else ExperimentConfig()
    vocab = WordVocab(cfg.vocab_mode, cfg.control_list)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.checkpoint == "random":
        args.checkpoint = None
    elif args.checkpoint is None and args.config is None and cfg.vocab_mode == 0:
        from ..train.state import default_flagship_snapshot

        args.checkpoint = default_flagship_snapshot()
        if args.checkpoint:
            logger.info("no --checkpoint: serving the committed trained "
                        "snapshot (pass '--checkpoint random' for random "
                        "weights)")
    model, params, epoch = load_inference_model(
        cfg, vocab.vocab_size, args.checkpoint, dtype
    )
    if args.checkpoint:
        logger.info(f"loaded checkpoint {args.checkpoint} (epoch {epoch})")
    else:
        logger.warning("serving with RANDOM weights (no --checkpoint given)")

    mesh = None
    if args.dp > 1:
        from ..parallel.mesh import make_mesh

        n_avail = jax.device_count()
        if args.dp > n_avail:
            logger.error(f"--dp {args.dp} exceeds the {n_avail} available device(s)")
            return 1
        mesh = make_mesh(args.dp, tp=1)
        logger.info(f"dp-sharded serving over {args.dp} devices")
    ctx = ServingContext(
        model, params, vocab, nucleus_p=args.nucleus_p,
        temperature=args.temperature, batch_window_ms=args.batch_window_ms,
        max_batch=args.max_batch, mesh=mesh, draft_k=args.draft_k,
    )
    server = serve(ctx, host=args.host, port=args.port)
    logger.info(f"serving on {server.server_address}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
