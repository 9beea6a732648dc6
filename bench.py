"""Benchmark: infill decode throughput on the flagship model.

Measures the driver metric (BASELINE.json): infill tokens/sec/chip and p50
16-bar infill latency, against the structural reference cost model — the
reference re-runs the full encoder + decoder prefix per emitted token
(``generation.py:209-225``), so the baseline is measured here as the same
model driven one full forward per token on this chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from smer_music_generation_tpu.codec.annotate import encode_midi
    from smer_music_generation_tpu.infer.engine import InfillEngine, change_controls
    from smer_music_generation_tpu.models.transformer import ScoreTransformer
    from smer_music_generation_tpu.train.state import build_model
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
    from tests.test_annotate import make_two_track_score

    vocab = WordVocab(0, CONTROL_SETS[5])
    model = build_model(vocab.vocab_size, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    init_src = jnp.ones((1, 64), dtype=jnp.int32)
    init_tgt = jnp.ones((1, 64), dtype=jnp.int32)
    params = jax.jit(model.init)({"params": rng}, init_src, init_tgt)

    # 16-bar two-track serving stream (control mode 2)
    score = make_two_track_score()
    events, controls = encode_midi(
        score, controls={"key": None}, track_names=["track_0", "track_1"]
    )
    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    events = change_controls(events, controls, vocab)

    engine = InfillEngine(
        model, params, vocab, nucleus_p=0.9, temperature=1.0, max_tgt_len=1024
    )

    bars = list(range(8))  # 8-bar, 1-track infill: 8 x (body + 3 controls)
    # warmup / compile
    res = engine(events, [0], bars, jax.random.PRNGKey(1))
    assert res is not None

    lat = []
    tokens_out = []
    for i in range(5):
        t0 = time.perf_counter()
        res = engine(events, [0], bars, jax.random.PRNGKey(2 + i))
        dt = time.perf_counter() - t0
        lat.append(dt)
        tokens_out.append(res.decode_steps)

    p50 = float(np.percentile(lat, 50))
    toks_per_sec = float(np.mean([t / l for t, l in zip(tokens_out, lat)]))

    # structural baseline: full enc+dec re-forward per token (the reference
    # decode cost), measured with the same model/jit on this chip
    fwd = jax.jit(lambda p, s, t: model.apply(p, s, t)[0])
    src = jnp.ones((1, 512), dtype=jnp.int32)
    n_base = 16
    tgt_half = jnp.ones((1, 50), dtype=jnp.int32)
    fwd(params, src, tgt_half).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_base):
        fwd(params, src, tgt_half).block_until_ready()
    base_dt = (time.perf_counter() - t0) / n_base
    base_toks_per_sec = 1.0 / base_dt  # one token per full forward

    print(
        json.dumps(
            {
                "metric": "infill_tokens_per_sec_per_chip",
                "value": round(toks_per_sec, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_sec / base_toks_per_sec, 2),
                "p50_latency_s": round(p50, 4),
                "decode_tokens": int(np.mean(tokens_out)),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
