"""Decompose the fixed per-session infill cost (Finding 10, VERDICT r4 #3).

The B=1 serving session is bounded by a ~20-25 ms fixed cost on top of
the fused decode loop (PERFORMANCE.md Finding 9 addendum).  This probe
measures each component on the live backend so the remaining headroom is
attributed, not guessed:

* ``rtt``            — minimal dispatch+fetch round trip of a trivial
                       compiled program (the tunnel floor: every session
                       pays at least one dispatch and one blocking fetch);
* ``host_prep``      — engine.prepare + batch assembly (pure host);
* ``dispatch``       — time for the decoder call to RETURN (async): jit
                       argument processing + transfer dispatch;
* ``encoder``        — dispatch+fetch of encoder + cross-cache init alone
                       at the session's source shape;
* ``session``        — the full engine call (bench_single's shape);
* ``decode_loop``    — session p50 minus encoder/RTT/host components,
                       vs tokens x the microbenched per-token kernel cost.

Usage (repo root, chip idle):  python scripts/session_overhead.py
CPU smoke:  python scripts/session_overhead.py --tiny
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def pct(ts, q=50):
    return round(float(np.percentile(np.asarray(ts) * 1e3, q)), 3)


def timed(fn, reps, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model smoke run (CPU-safe)")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--out", type=str, default="docs/perf/session_overhead_r5.json")
    args = ap.parse_args()

    from smer_music_generation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from smer_music_generation_tpu.infer.engine import InfillEngine
    from smer_music_generation_tpu.models.transformer import ScoreTransformer

    results = {"backend": jax.default_backend()}

    # 1. tunnel round-trip floor
    trip = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros((8,), jnp.float32)
    ts = timed(lambda: jax.device_get(trip(x8)), 30)
    results["rtt_ms"] = {"p50": pct(ts), "min": pct([min(ts)])}

    # model + session inputs (the bench_single shape)
    if args.tiny:
        from smer_music_generation_tpu.train.state import build_model
        from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

        vocab = WordVocab(0, CONTROL_SETS[5])
        model = build_model(vocab.vocab_size, d_model=64, nhead=4,
                            num_layers=1, d_ff=128, max_len=2400)
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)},
            jnp.ones((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32),
        )
    else:
        vocab, model, params = bench.build_flagship()
    events = bench.serving_events(vocab)
    engine = InfillEngine(model, params, vocab, nucleus_p=0.9,
                          max_tgt_len=1024, max_time_fix_attempts=0)
    bars = list(range(8))

    # 2. host-side request prep (no device)
    ts = timed(lambda: engine.prepare(events, [0], bars), args.reps)
    results["host_prep_ms"] = {"p50": pct(ts)}
    req = engine.prepare(events, [0], bars)
    ts = timed(lambda: engine._assemble([req]), args.reps)
    results["host_assemble_ms"] = {"p50": pct(ts)}

    # 3. encoder + cross-cache program alone at the session src shape
    asm = engine._assemble([req])
    src_b = asm[0]

    def enc_fn(params, src):
        pad = src == 0
        mem = model.apply(params, src, pad, method=ScoreTransformer.encode)
        cross = model.apply(params, mem, method=ScoreTransformer.init_cross_cache)
        return jax.tree.map(lambda a: a.sum(), cross)

    enc = jax.jit(enc_fn)
    ts = timed(lambda: jax.device_get(enc(params, src_b)), args.reps)
    results["encoder_cross_ms"] = {"p50": pct(ts), "src_shape": list(src_b.shape)}

    # 4. full session (blocking) + dispatch-only (async return)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(args.reps + 2)]
    it = iter(rngs)
    toks = []

    def session():
        res = engine(events, [0], bars, next(it))
        toks.append(res.decode_steps)

    ts = timed(session, args.reps, warmup=2)
    results["session_ms"] = {
        "p50": pct(ts), "min": pct([min(ts)]),
        "decode_tokens": int(np.mean(toks[2:])),
    }

    span_types = np.zeros((1, engine.decoder.max_spans), np.int32)
    span_types[0, : len(req.span_codes)] = req.span_codes
    n_spans = np.asarray([len(req.span_codes)], np.int32)

    def dispatch_only():
        out = engine.decoder(
            params, src_b, span_types, n_spans, False, jax.random.PRNGKey(1)
        )
        return out

    ts = timed(dispatch_only, args.reps)
    results["dispatch_only_ms"] = {"p50": pct(ts)}
    # drain anything still in flight before attributing
    jax.device_get(dispatch_only().lengths)

    # 5. attribution
    sess = results["session_ms"]["p50"]
    fixed = (
        results["rtt_ms"]["p50"]
        + results["host_prep_ms"]["p50"]
        + results["host_assemble_ms"]["p50"]
        + results["encoder_cross_ms"]["p50"]
    )
    results["attribution"] = {
        "fixed_components_ms": round(fixed, 3),
        "decode_loop_ms": round(sess - fixed, 3),
        "per_token_us": round(
            1e3 * (sess - fixed) / max(results["session_ms"]["decode_tokens"], 1), 1
        ),
    }

    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
