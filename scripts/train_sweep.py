"""Training-step optimization sweep on the real TPU chip.

Measures steps/s + derived MFU across batch sizes / sequence shapes /
step variants, as the decode path got in round 1 (VERDICT r1 weak #1).

    python scripts/train_sweep.py [--profile]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def model_train_flops(B, S, T, d=512, ff=2048, n_enc=4, n_dec=4, V=309):
    """Analytic matmul FLOPs per train step (fwd + 2x bwd)."""
    enc_tok = 8 * d * d + 4 * S * d + 4 * d * ff
    enc = n_enc * B * S * enc_tok
    dec_tok = 8 * d * d + 4 * T * d + 2 * d * d + 4 * S * d + 4 * d * ff
    dec = n_dec * B * T * dec_tok
    cross_kv = n_dec * B * S * 4 * d * d
    logits = B * T * 2 * d * V
    return 3 * (enc + dec + cross_kv + logits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true", help="per-layer jax.checkpoint")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state (pessimal over a tunnelled "
                         "backend — r2 finding 1)")
    ap.add_argument("--no_rbg", action="store_true", help="threefry dropout RNG")
    ap.add_argument("--no_bf16_residual", action="store_true",
                    help="f32 attention-softmax residual (pre-Finding-5 step)")
    ap.add_argument("--no_fused_attn_bwd", action="store_true",
                    help="unfused attention backward (pre-Finding-6 step)")
    ap.add_argument("--real_shapes", action="store_true",
                    help="sweep the real packed-loader regime instead of the "
                         "synthetic long-sequence grid")
    ap.add_argument("--out", default="/tmp/train_sweep.json")
    ap.add_argument("--only", default=None,
                    help="comma list of B:S:T triples to run, e.g. "
                         "'8:640:384,32:2048:512' (chunk long sweeps)")
    args = ap.parse_args()

    import jax

    if not args.no_rbg:
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from smer_music_generation_tpu.train.loss import build_loss_tables
    from smer_music_generation_tpu.train.state import (
        TrainState,
        build_model,
        make_train_step,
    )
    from smer_music_generation_tpu.utils.cache import enable_persistent_cache
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    enable_persistent_cache()
    vocab = WordVocab(0, CONTROL_SETS[5])
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(vocab.vocab_size, dtype=dtype, remat=args.remat,
                        bf16_attn_residual=not args.no_bf16_residual,
                        fused_attn_bwd=not args.no_fused_attn_bwd)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32),
    )
    tables = build_loss_tables(vocab)
    step = jax.jit(
        make_train_step(model, tables, dropout=True),
        donate_argnums=(0,) if args.donate else (),
    )

    PEAK = 197e12  # v5e bf16 peak FLOP/s
    if args.real_shapes:
        configs = [
            (8, 640, 384),     # the natural packed-group collate shape
            (16, 640, 384),
            (32, 640, 384),
            (64, 640, 384),
            (8, 2048, 512),
            (32, 2048, 512),   # OOMs without remat
            (64, 2048, 512),
        ]
    else:
        configs = [
            (8, 2048, 512),    # round-1 bench point
            (16, 2048, 512),
            (32, 2048, 512),
            (64, 2048, 512),
            (8, 1024, 1024),
            (32, 1024, 1024),
            (16, 2304, 1024),  # real packed shape: groups <=2200 src, long tgt
            (32, 1024, 512),
            (64, 1024, 512),
            (128, 512, 512),
        ]
    if args.only:
        configs = [
            tuple(int(x) for x in spec.split(":"))
            for spec in args.only.split(",")
        ]
    results = []
    for B, S, T in configs:
        batch = {
            "input": jnp.ones((B, S), jnp.int32),
            "target_in": jnp.ones((B, T), jnp.int32),
            "target_out": jnp.ones((B, T), jnp.int32),
            "input_pad_mask": jnp.zeros((B, S), bool),
            "target_pad_mask": jnp.zeros((B, T), bool),
        }
        rng = jax.random.PRNGKey(0)
        state = TrainState.create(params, lr=1e-4)
        try:
            state, m = step(state, batch, jnp.float32(0.8), rng)
            jax.device_get(m["loss"])  # block_until_ready lies over the tunnel
            n = args.steps
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch, jnp.float32(0.8), rng)
            jax.device_get(m["loss"])
            dt = time.perf_counter() - t0
        except Exception as e:
            results.append({"B": B, "S": S, "T": T, "error": str(e)[:120]})
            print(results[-1], flush=True)
            continue
        sps = n / dt
        flops = model_train_flops(B, S, T)
        r = {
            "B": B, "S": S, "T": T,
            "steps_per_sec": round(sps, 2),
            "tokens_per_sec": round(sps * B * (S + T)),
            "tflops_per_sec": round(flops * sps / 1e12, 1),
            "mfu_pct": round(100 * flops * sps / PEAK, 1),
        }
        results.append(r)
        print(r, flush=True)

    if args.profile:
        import jax.profiler

        B, S, T = 32, 2048, 512
        batch = {
            "input": jnp.ones((B, S), jnp.int32),
            "target_in": jnp.ones((B, T), jnp.int32),
            "target_out": jnp.ones((B, T), jnp.int32),
            "input_pad_mask": jnp.zeros((B, S), bool),
            "target_pad_mask": jnp.zeros((B, T), bool),
        }
        state = TrainState.create(params, lr=1e-4)
        rng = jax.random.PRNGKey(0)
        state, m = step(state, batch, jnp.float32(0.8), rng)
        jax.device_get(m["loss"])
        with jax.profiler.trace("/tmp/train_trace"):
            for _ in range(3):
                state, m = step(state, batch, jnp.float32(0.8), rng)
            jax.device_get(m["loss"])
        print("trace written to /tmp/train_trace")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
