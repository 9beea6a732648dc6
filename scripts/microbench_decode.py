"""Microbenchmark: where does the per-token decode time go?

Times four fori_loop programs (N iterations each) on the live backend:

  matmul_floor : only the decoder weight matmuls at B=1 (HBM streaming bound)
  step_only    : full ScoreTransformer.decode_step (KV cache attend incl.)
  sample_only  : grammar mask lookup + nucleus sampling on fixed logits
  full_decode  : the production InfillDecoder while_loop

Run:  python scripts/microbench_decode.py [--iters 512] [--cache-len 1024]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # force a real device->host value fetch (block_until_ready alone can be
    # a no-op on the remote axon backend)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timeit(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--src-len", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--quant", default="none", choices=["none", "int8"])
    ap.add_argument("--token-chunk", type=int, default=1)
    ap.add_argument("--full-only", action="store_true",
                    help="skip the floor/step/sample isolation loops")
    ap.add_argument("--draft-k", type=int, default=0,
                    help="speculative decode draft width for the full leg")
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--r6", action="store_true",
                    help="use the trained r6 checkpoint + a real corpus "
                    "window (draft acceptance needs real model output)")
    args = ap.parse_args()
    N, L, S, B = args.iters, args.cache_len, args.src_len, args.batch

    from smer_music_generation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from smer_music_generation_tpu.infer.decode import InfillDecoder
    from smer_music_generation_tpu.infer.grammar import (
        SPAN_BODY,
        GrammarTables,
        allowed_mask_fast,
        build_fast_tables,
        update_bits,
    )
    from smer_music_generation_tpu.infer.sampling import masked_sample
    from smer_music_generation_tpu.models.transformer import ScoreTransformer
    from smer_music_generation_tpu.train.state import build_model
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(vocab.vocab_size, dtype=dtype)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32),
    )
    print(f"backend={jax.default_backend()} B={B} iters={N} cache={L} src={S}")

    src = jnp.ones((B, S), jnp.int32)
    src_pad = src == 0

    if args.r6:
        from smer_music_generation_tpu.data.pack import load_batches
        from smer_music_generation_tpu.infer.decode import pad_to_bucket
        from smer_music_generation_tpu.infer.engine import mask_bar_and_track
        from smer_music_generation_tpu.train.checkpoint import restore_params_only
        from smer_music_generation_tpu.train.state import TrainState

        state = TrainState.create(params, lr=1e-4)
        params, _ = restore_params_only(
            "runs/flagship_r6/checkpoints/checkpoint_19",
            jax.eval_shape(lambda: state),
        )
        groups, _ = load_batches("corpus/data/smer_test")
        for w in (x for g in groups for x in g):
            if len(w) < 400:
                continue
            res = mask_bar_and_track(list(w), vocab, [0, 1], list(range(8)))
            if res is not None:
                src_ids, span_codes, _, _ = res
                break
        src = jnp.asarray(pad_to_bucket(np.asarray(src_ids, np.int32)[None]))
        _full_decode(args, model, vocab, params, src, L, B,
                     span_codes=span_codes)
        return

    if args.full_only:
        _full_decode(args, model, vocab, params, src, L, B)
        return

    # ---- matmul floor: stream every decode-path weight once per iter ----
    p = params["params"]
    dec_mats = []
    for i in range(4):
        lp = p[f"decoder_{i}"]
        for m in ("self_attn", "cross_attn"):
            dec_mats.append(lp[m]["q"]["kernel"])
            dec_mats.append(lp[m]["out"]["kernel"])
        dec_mats.append(lp["self_attn"]["k"]["kernel"])
        dec_mats.append(lp["self_attn"]["v"]["kernel"])
        dec_mats.append(lp["ff"]["fc1"]["kernel"])
        dec_mats.append(lp["ff"]["fc2"]["kernel"])
    fc = p["fc"]["kernel"]
    dec_mats = [m.astype(dtype) for m in dec_mats]
    nbytes = sum(int(np.prod(m.shape)) for m in dec_mats) * dtype.dtype.itemsize + fc.size * 4

    @jax.jit
    def matmul_floor(mats, fc):
        def body(_, x):
            acc = x
            for m in mats:
                y = acc[:, : m.shape[0]] @ m
                acc = jnp.pad(y, ((0, 0), (0, max(0, 2048 - y.shape[1]))))[:, :2048]
            lo = acc[:, :512].astype(jnp.float32) @ fc
            lo = jnp.pad(lo[:, :512], ((0, 0), (0, 2048 - min(512, lo.shape[1]))))
            return lo.astype(dtype)

        x0 = jnp.ones((B, 2048), dtype)
        return jax.lax.fori_loop(0, N, body, x0)

    t = timeit(matmul_floor, dec_mats, fc)
    print(f"matmul_floor : {t / N * 1e6:8.1f} us/tok  ({nbytes / 1e6:.1f} MB weights -> "
          f"{nbytes / (t / N) / 1e9:.0f} GB/s)")

    # ---- step_only: decode_step in a loop, greedy-ish feed ----
    memory = model.apply(params, src, src_pad, method=ScoreTransformer.encode)
    cross = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)
    cache0 = model.apply(params, B, L, method=ScoreTransformer.init_self_cache)

    @jax.jit
    def step_only(params, cache0, cross, src_pad):
        def body(i, carry):
            tok, cache = carry
            logits, cache = model.apply(
                params, tok, i, cache, cross, src_pad,
                method=ScoreTransformer.decode_step,
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        tok0 = jnp.ones((B,), jnp.int32)
        return jax.lax.fori_loop(0, N, body, (tok0, cache0))[0]

    t = timeit(step_only, params, cache0, cross, src_pad)
    print(f"step_only    : {t / N * 1e6:8.1f} us/tok")

    # ---- sample_only: grammar + nucleus on fixed logits ----
    tables = GrammarTables.build(vocab)
    state_masks, sid_from_bits, next_bits = build_fast_tables(tables)
    logits0 = jnp.asarray(np.random.randn(B, vocab.vocab_size), jnp.float32)

    @jax.jit
    def sample_only(logits, rng):
        def body(i, carry):
            state, rng, acc = carry
            allowed = allowed_mask_fast(
                state_masks, sid_from_bits, state, jnp.ones((B,), bool),
                jnp.full((B,), SPAN_BODY, jnp.int32), jnp.asarray(False),
            )
            rng, sub = jax.random.split(rng)
            samp = masked_sample(sub, logits, allowed, 0.9, 1.0)
            state = update_bits(next_bits, state, samp)
            return state, rng, acc + samp

        state = jnp.zeros((B,), jnp.int32)
        acc = jnp.zeros((B,), jnp.int32)
        return jax.lax.fori_loop(0, N, body, (state, rng, acc))[2]

    t = timeit(sample_only, logits0, jax.random.PRNGKey(0))
    print(f"sample_only  : {t / N * 1e6:8.1f} us/tok")

    # ---- full production decode ----
    _full_decode(args, model, vocab, params, src, L, B)


def _full_decode(args, model, vocab, params, src, L, B, span_codes=None):
    from smer_music_generation_tpu.infer.decode import InfillDecoder

    decoder = InfillDecoder(model, vocab, max_tgt_len=L,
                            nucleus_p=None if args.greedy else 0.9,
                            greedy=args.greedy,
                            quant=args.quant, token_chunk=args.token_chunk,
                            draft_k=args.draft_k)
    span_types = np.zeros((B, decoder.max_spans), np.int32)
    if span_codes is not None:
        span_types[:, : len(span_codes)] = span_codes
        n_spans = np.full((B,), len(span_codes), np.int32)
    else:
        n_spans = np.full((B,), 64, np.int32)

    def full(params, src, rng):
        return decoder(params, np.asarray(src), span_types, n_spans, False, rng)

    out = full(params, src, jax.random.PRNGKey(0))
    jax.block_until_ready(out.tokens)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = full(params, src, jax.random.PRNGKey(i))
        jax.block_until_ready(out.tokens)
        best = min(best, time.perf_counter() - t0)
    steps = int(out.steps)
    print(f"full_decode  : {best / steps * 1e6:8.1f} us/tok  ({steps} tokens, "
          f"{best*1e3:.1f} ms total, quant={args.quant}, "
          f"chunk={args.token_chunk}, draft_k={args.draft_k}, "
          f"greedy={args.greedy})")


if __name__ == "__main__":
    main()
