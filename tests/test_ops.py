"""Pallas fused attention: interpret-mode parity with the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.ops.attention import (
    attention_reference,
    fused_attention,
)


def rand_qkv(B=2, T=64, S=96, H=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.float32)
    return q, k, v


def test_fused_matches_reference_full():
    q, k, v = rand_qkv()
    want = attention_reference(q, k, v)
    got = fused_attention(q, k, v, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_matches_reference_padded_lengths():
    q, k, v = rand_qkv(B=3, T=40, S=70)
    lens = jnp.array([70, 33, 1], dtype=jnp.int32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = fused_attention(q, k, v, kv_valid_len=lens, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_causal():
    q, k, v = rand_qkv(B=1, T=48, S=48)
    want = attention_reference(q, k, v, causal=True)
    got = fused_attention(q, k, v, causal=True, blk_q=16, blk_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_non_multiple_shapes():
    # T and S not multiples of the block sizes -> internal padding path
    q, k, v = rand_qkv(B=1, T=37, S=53)
    want = attention_reference(q, k, v)
    got = fused_attention(q, k, v, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Fused single-token decoder-step kernel (ops/decode_step.py)
# ---------------------------------------------------------------------------

def _decode_fixture(B=2, V=309, S=512, L=512, nl=2):
    from smer_music_generation_tpu.models.transformer import (
        ModelConfig,
        ScoreTransformer,
    )

    cfg = ModelConfig(
        vocab_size=V, d_model=512, nhead=8, num_encoder_layers=1,
        num_decoder_layers=nl, d_ff=2048, max_len=2048, dropout=0.0,
        pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    src = jax.random.randint(rng, (B, S), 1, V)
    params = model.init({"params": rng}, src, jnp.ones((B, 8), jnp.int32))
    return cfg, model, params, src


def test_fused_decode_step_matches_model():
    """Kernel (interpret) == ScoreTransformer.decode_step over a multi-step
    roll-out with per-element cross lengths (one element padded)."""
    from smer_music_generation_tpu.models.transformer import ScoreTransformer
    from smer_music_generation_tpu.ops.decode_step import (
        fused_decode_step,
        pack_decoder_weights,
        stack_kv_cache,
        vocab_pad,
    )

    B, V, S, L, nl = 2, 309, 512, 512, 2
    cfg, model, params, src = _decode_fixture(B, V, S, L, nl)
    D = cfg.d_model

    src_pad = np.zeros((B, S), bool)
    src_pad[0, 400:] = True
    src_pad = jnp.asarray(src_pad)
    memory = model.apply(params, src, src_pad, method=ScoreTransformer.encode)
    cross = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)
    cache = model.apply(params, B, L, method=ScoreTransformer.init_self_cache)

    cross_kv = stack_kv_cache(cross, nl)
    cross_len = jnp.asarray([400, S], jnp.int32)
    self_kv = jnp.zeros((nl, B, L, 2 * D), cfg.dtype)
    packed = pack_decoder_weights(params, cfg, vocab_pad(V))
    pe = model.apply(params, method=lambda m: m.pos_table)
    emb = params["params"]["embedding"]["embedding"]

    toks = jax.random.randint(jax.random.PRNGKey(1), (4, B), 1, V)
    for pos in range(4):
        lg_ref, cache = model.apply(
            params, toks[pos], pos, cache, cross, src_pad,
            method=ScoreTransformer.decode_step,
        )
        x = (emb[toks[pos]] * np.sqrt(D) + pe[pos]).astype(cfg.dtype)
        lg, new_kv = fused_decode_step(
            packed, x, self_kv, cross_kv, jnp.int32(pos), cross_len,
            n_layers=nl, d_model=D, nhead=cfg.nhead, d_ff=cfg.d_ff,
            vpad=vocab_pad(V), interpret=True,
        )
        self_kv = jax.lax.dynamic_update_slice(
            self_kv, new_kv[:, :, None, :], (0, 0, pos, 0))
        a = np.asarray(lg_ref)
        b = np.asarray(lg)[:, :V]
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
        assert (a.argmax(-1) == b.argmax(-1)).all(), pos


def test_fused_decode_loop_matches_xla_loop():
    """InfillDecoder(fused) == InfillDecoder(XLA) token-for-token on CPU."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    # tiny serving-shaped source: header + m_0 spans
    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)
    rng = jax.random.PRNGKey(3)

    kw = dict(max_tgt_len=512, nucleus_p=0.9)
    slow = InfillDecoder(model, vocab, fused=False, **kw)
    # fused_sampling draws its noise over the padded vocab (different
    # stream); token-exactness vs the XLA loop holds for the v2 step kernel
    fast = InfillDecoder(model, vocab, fused=True, fused_sampling=False,
                         interpret=True, **kw)
    r_slow = slow(params, src, span_types, n_spans, False, rng)
    r_fast = fast(params, src, span_types, n_spans, False, rng)

    assert int(r_slow.lengths[0]) == int(r_fast.lengths[0])
    n = int(r_slow.lengths[0])
    assert np.array_equal(np.asarray(r_slow.tokens)[0, :n],
                          np.asarray(r_fast.tokens)[0, :n])


def test_fused_sampling_loop_greedy_matches_xla():
    """v3 kernel (embed+sample+bookkeeping in-kernel, interpret) must be
    token-exact vs the XLA loop under greedy decoding (no noise stream)."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)
    rng = jax.random.PRNGKey(3)

    kw = dict(max_tgt_len=512, nucleus_p=None, greedy=True)
    slow = InfillDecoder(model, vocab, fused=False, **kw)
    fast = InfillDecoder(model, vocab, fused=True, fused_sampling=True,
                         interpret=True, **kw)
    r_slow = slow(params, src, span_types, n_spans, False, rng)
    r_fast = fast(params, src, span_types, n_spans, False, rng)
    n = int(r_slow.lengths[0])
    assert int(r_fast.lengths[0]) == n
    assert np.array_equal(np.asarray(r_slow.tokens)[0, :n],
                          np.asarray(r_fast.tokens)[0, :n])


def test_fused_sampling_loop_nucleus_well_formed():
    """v3 nucleus path: stream is grammar-legal and seed-deterministic."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.infer.grammar import GrammarTables
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)

    dec = InfillDecoder(model, vocab, max_tgt_len=512, nucleus_p=0.9,
                        fused=True, fused_sampling=True, interpret=True)
    r1 = dec(params, src, span_types, n_spans, False, jax.random.PRNGKey(7))
    r2 = dec(params, src, span_types, n_spans, False, jax.random.PRNGKey(7))
    n = int(r1.lengths[0])
    t1 = np.asarray(r1.tokens)[0, :n]
    assert np.array_equal(t1, np.asarray(r2.tokens)[0, :n])

    toks = [vocab.index2char(int(x)) for x in t1]
    assert toks.count("m_0") == 4  # four spans emitted
    # span 2..4 are control slots: exactly one d_/o_/y_ token each
    spans, cur = [], None
    for tk in toks:
        if tk == "m_0":
            cur = []
            spans.append(cur)
        elif cur is not None:
            cur.append(tk)
    assert spans[1][0].startswith("d_") and len(spans[1]) == 1
    assert spans[2][0].startswith("o_") and len(spans[2]) == 1
    assert spans[3][0].startswith("y_") and len(spans[3]) == 1
    # body span tokens come from legal classes only
    t = GrammarTables.build(vocab)
    banned = np.asarray(t.always_banned)
    for tk in spans[0]:
        assert not banned[vocab.char2index(tk)], tk


def test_fused_sampling_loop_remi_greedy_matches_xla():
    """v3 kernel under the REMI (mode 1) grammar: token-exact vs XLA."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(1, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)
    rng = jax.random.PRNGKey(5)

    kw = dict(max_tgt_len=512, nucleus_p=None, greedy=True)
    slow = InfillDecoder(model, vocab, fused=False, **kw)
    fast = InfillDecoder(model, vocab, fused=True, fused_sampling=True,
                         interpret=True, **kw)
    r_slow = slow(params, src, span_types, n_spans, False, rng)
    r_fast = fast(params, src, span_types, n_spans, False, rng)
    n = int(r_slow.lengths[0])
    assert int(r_fast.lengths[0]) == n
    assert np.array_equal(np.asarray(r_slow.tokens)[0, :n],
                          np.asarray(r_fast.tokens)[0, :n])


# ---------------------------------------------------------------------------
# int8 weight-streaming decode (quant="int8")
# ---------------------------------------------------------------------------

def _dequantized_params(params):
    """Replace every decoder matmul kernel by its int8 quantize->dequantize
    image (same per-column scheme as ``pack_decoder_weights(quant='int8')``,
    which quantizes the column-concatenated blocks — per-column scales make
    the two layouts identical)."""
    from smer_music_generation_tpu.ops.decode_step import quantize_columns

    def dq(w):
        q, s = quantize_columns(jnp.asarray(w, jnp.float32))
        return (q.astype(jnp.float32) * s).astype(np.asarray(w).dtype)

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    import copy

    p = copy.deepcopy(jax.device_get(params))
    root = p["params"]
    for name, lp in root.items():
        if not name.startswith("decoder_"):
            continue
        for m in ("q", "k", "v", "out"):
            lp["self_attn"][m]["kernel"] = dq(lp["self_attn"][m]["kernel"])
        for m in ("q", "out"):
            lp["cross_attn"][m]["kernel"] = dq(lp["cross_attn"][m]["kernel"])
        for m in ("fc1", "fc2"):
            lp["ff"][m]["kernel"] = dq(lp["ff"][m]["kernel"])
    return jax.tree_util.tree_map(jnp.asarray, p)


def test_fused_decode_step_int8_matches_dequantized_model():
    """int8 kernel (interpret) == XLA decode_step running on the
    dequantized weights: the only difference is accumulation order."""
    from smer_music_generation_tpu.models.transformer import ScoreTransformer
    from smer_music_generation_tpu.ops.decode_step import (
        fused_decode_step,
        pack_decoder_weights,
        stack_kv_cache,
        vocab_pad,
    )

    B, V, S, L, nl = 2, 309, 512, 512, 2
    cfg, model, params, src = _decode_fixture(B, V, S, L, nl)
    D = cfg.d_model
    params_dq = _dequantized_params(params)

    src_pad = np.zeros((B, S), bool)
    src_pad[0, 400:] = True
    src_pad = jnp.asarray(src_pad)
    # encoder is NOT quantized: cross K/V come from the original params
    memory = model.apply(params, src, src_pad, method=ScoreTransformer.encode)
    # decoder cross projections belong to the quantized stack
    cross = model.apply(params_dq, memory, method=ScoreTransformer.init_cross_cache)
    cache = model.apply(params_dq, B, L, method=ScoreTransformer.init_self_cache)

    cross_kv = stack_kv_cache(cross, nl)
    cross_len = jnp.asarray([400, S], jnp.int32)
    self_kv = jnp.zeros((nl, B, L, 2 * D), cfg.dtype)
    packed = pack_decoder_weights(params, cfg, vocab_pad(V), quant="int8")
    assert packed["w_attn"].dtype == jnp.int8
    assert packed["scale"].shape == (nl, 1, 7 * D + cfg.d_ff)
    pe = model.apply(params, method=lambda m: m.pos_table)
    emb = params["params"]["embedding"]["embedding"]

    toks = jax.random.randint(jax.random.PRNGKey(1), (3, B), 1, V)
    for pos in range(3):
        lg_ref, cache = model.apply(
            params_dq, toks[pos], pos, cache, cross, src_pad,
            method=ScoreTransformer.decode_step,
        )
        x = (emb[toks[pos]] * np.sqrt(D) + pe[pos]).astype(cfg.dtype)
        lg, new_kv = fused_decode_step(
            packed, x, self_kv, cross_kv, jnp.int32(pos), cross_len,
            n_layers=nl, d_model=D, nhead=cfg.nhead, d_ff=cfg.d_ff,
            vpad=vocab_pad(V), interpret=True,
        )
        self_kv = jax.lax.dynamic_update_slice(
            self_kv, new_kv[:, :, None, :], (0, 0, pos, 0))
        a = np.asarray(lg_ref)
        b = np.asarray(lg)[:, :V]
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
        assert (a.argmax(-1) == b.argmax(-1)).all(), pos


def test_fused_int8_v2_v3_token_exact_greedy():
    """Same int8 logits through the v2 step kernel (XLA sampling) and the
    v3 whole-token kernel (in-kernel sampling) -> identical greedy streams,
    and the stream stays grammar-legal."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.infer.grammar import GrammarTables
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)
    rng = jax.random.PRNGKey(3)

    kw = dict(max_tgt_len=512, nucleus_p=None, greedy=True, quant="int8",
              fused=True, interpret=True)
    v2 = InfillDecoder(model, vocab, fused_sampling=False, **kw)
    v3 = InfillDecoder(model, vocab, fused_sampling=True, **kw)
    r2 = v2(params, src, span_types, n_spans, False, rng)
    r3 = v3(params, src, span_types, n_spans, False, rng)
    n = int(r2.lengths[0])
    assert int(r3.lengths[0]) == n
    t2 = np.asarray(r2.tokens)[0, :n]
    assert np.array_equal(t2, np.asarray(r3.tokens)[0, :n])

    t = GrammarTables.build(vocab)
    banned = np.asarray(t.always_banned)
    for x in t2:
        tok = vocab.index2char(int(x))
        if tok != "m_0":
            assert not banned[int(x)], tok


def test_quant_requires_fused():
    import pytest as _pytest

    from smer_music_generation_tpu.infer.decode import InfillDecoder
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)
    with _pytest.raises(ValueError):
        InfillDecoder(model, vocab, fused=False, quant="int8")


def test_kernel_looped_v4_matches_v3():
    """v4 (token_chunk=4, KV appended in-kernel) must be token-exact vs v3
    under both greedy and nucleus decoding (same noise rows by position)."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :4] = [0, 1, 2, 3]
    n_spans = np.asarray([4], np.int32)
    rng = jax.random.PRNGKey(3)

    for kw in (dict(nucleus_p=None, greedy=True), dict(nucleus_p=0.9)):
        v3 = InfillDecoder(model, vocab, max_tgt_len=512, fused=True,
                           fused_sampling=True, interpret=True, **kw)
        v4 = InfillDecoder(model, vocab, max_tgt_len=512, fused=True,
                           fused_sampling=True, interpret=True,
                           token_chunk=4, **kw)
        r3 = v3(params, src, span_types, n_spans, False, rng)
        r4 = v4(params, src, span_types, n_spans, False, rng)
        n = int(r3.lengths[0])
        assert int(r4.lengths[0]) == n, (kw, r3.lengths, r4.lengths)
        assert np.array_equal(np.asarray(r3.tokens)[0, :n],
                              np.asarray(r4.tokens)[0, :n]), kw
        assert int(r4.steps) == int(r3.steps), kw


def test_kernel_looped_v4_respects_cap():
    """A stream still live at max_tgt_len must clamp (ADVICE r1): with
    token_chunk > 1 the in-kernel cap is per chunk, so without the
    post-loop clamp lengths could exceed L and tokens spill into slop
    rows.  Assert lengths <= L, output shape (B, L), token-exact vs v3."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    # 160 spans cannot fit in 512 tokens: the stream is still live at the
    # cap (verified: v3 reports lengths == 512)
    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2"] + ["m_0"] * 160
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    span_types[0, :] = np.tile([0, 1, 2, 3], 40)
    n_spans = np.asarray([160], np.int32)
    rng = jax.random.PRNGKey(3)

    L = 512
    kw = dict(max_tgt_len=L, nucleus_p=None, greedy=True, fused=True,
              fused_sampling=True, interpret=True)
    v3 = InfillDecoder(model, vocab, **kw)
    v4 = InfillDecoder(model, vocab, token_chunk=8, **kw)
    r3 = v3(params, src, span_types, n_spans, False, rng)
    r4 = v4(params, src, span_types, n_spans, False, rng)
    assert int(r3.lengths[0]) == L  # the cap is actually hit
    assert np.asarray(r4.tokens).shape[1] == L
    assert int(r4.lengths[0]) <= L
    assert int(r4.lengths[0]) == L
    assert np.array_equal(np.asarray(r3.tokens)[0], np.asarray(r4.tokens)[0])
    # step-count parity at the cap: v3 exits its loop at pos + 1 == L
    # (L - 1 iterations); v4's reconstruction must not report L even
    # though the live row ran into the slop region (review finding)
    assert int(r3.steps) == L - 1
    assert int(r4.steps) == int(r3.steps)


def test_kernel_looped_v4_steps_all_done_at_start():
    """n_spans == 0 for every row: v3's while_loop never runs (steps 0);
    the v4 reconstruction must not report max(ST_LEN) == 1."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)
    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 160), np.int32)
    n_spans = np.asarray([0], np.int32)
    rng = jax.random.PRNGKey(3)

    kw = dict(max_tgt_len=512, nucleus_p=None, greedy=True, fused=True,
              fused_sampling=True, interpret=True)
    v3 = InfillDecoder(model, vocab, **kw)
    v4 = InfillDecoder(model, vocab, token_chunk=8, **kw)
    r3 = v3(params, src, span_types, n_spans, False, rng)
    r4 = v4(params, src, span_types, n_spans, False, rng)
    assert int(r3.steps) == 0
    assert int(r4.steps) == 0
    assert int(r3.lengths[0]) == int(r4.lengths[0])


def test_fused_decode_sharded_matches_unsharded():
    """shard_map'd fused loop over a dp=8 CPU mesh: tokens bit-identical
    to the single-shard fused kernel (VERDICT r1: multi-chip serving must
    keep the fused path)."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.parallel.mesh import make_mesh
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(V=vocab.vocab_size, nl=2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    B = 8
    src = np.array([[vocab.char2index(t) for t in src_tokens]] * B, np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((B, 160), np.int32)
    span_types[:, :4] = [0, 1, 2, 3]
    n_spans = np.full((B,), 4, np.int32)
    rng = jax.random.PRNGKey(13)

    base = InfillDecoder(model, vocab, max_tgt_len=512, nucleus_p=0.9,
                         fused=True, fused_sampling=True, interpret=True)
    r_base = base(params, src, span_types, n_spans, False, rng)

    sharded = InfillDecoder(model, vocab, max_tgt_len=512, nucleus_p=0.9,
                            fused=True, fused_sampling=True, interpret=True,
                            mesh=make_mesh(8, tp=1))
    r_sh = sharded(params, src, span_types, n_spans, False, rng)

    lens_a = np.asarray(r_base.lengths)
    lens_b = np.asarray(r_sh.lengths)
    assert np.array_equal(lens_a, lens_b)
    for i in range(B):
        assert np.array_equal(
            np.asarray(r_base.tokens)[i, : lens_a[i]],
            np.asarray(r_sh.tokens)[i, : lens_b[i]],
        ), i


# ----------------------------------------------------------------------
# fused TRAINING attention (scores -> softmax -> dropout -> V, pallas)
# ----------------------------------------------------------------------
def _fda_inputs(B=2, T=256, S=512, H=2, D=64, seed=0, pad=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    valid = jnp.asarray(rng.random((B, S)) < 0.9) if pad else jnp.ones((B, S), bool)
    return q, k, v, valid


def test_fused_train_attention_forward_exact():
    """Kernel forward is BIT-exact vs the jnp twin fed the identical
    hash-derived keep mask (rate 0 and rate 0.1, keyed + causal)."""
    from smer_music_generation_tpu.ops.train_attention import (
        attention_dropout_twin,
        dropout_mask_reference,
        fused_dropout_attention,
    )

    q, k, v, valid = _fda_inputs()
    key = jax.random.PRNGKey(7)
    B, T, H, _ = q.shape
    S = k.shape[1]

    out0 = fused_dropout_attention(q, k, v, valid, key, 0.0)
    tw0 = attention_dropout_twin(q, k, v, valid, None, 0.0)
    assert np.array_equal(np.asarray(out0, np.float32), np.asarray(tw0, np.float32))

    keep = dropout_mask_reference(key, B, H, T, S, 0.1)
    rate = float(np.asarray(keep, np.float32).mean())
    assert 0.88 < rate < 0.92, rate  # hash RNG hits the keep probability
    out1 = fused_dropout_attention(q, k, v, valid, key, 0.1)
    tw1 = attention_dropout_twin(q, k, v, valid, keep, 0.1)
    assert np.array_equal(np.asarray(out1, np.float32), np.asarray(tw1, np.float32))

    # different key -> different mask -> different output
    out2 = fused_dropout_attention(q, k, v, valid, jax.random.PRNGKey(8), 0.1)
    assert not np.array_equal(np.asarray(out1, np.float32), np.asarray(out2, np.float32))


def test_fused_train_attention_causal_and_degenerate_rows():
    """Causal masking matches the twin bit-for-bit, and batch rows with NO
    valid key produce zero (finite) outputs and finite gradients."""
    from smer_music_generation_tpu.ops.train_attention import (
        attention_dropout_twin,
        dropout_mask_reference,
        fused_dropout_attention,
    )

    q, k, v, _ = _fda_inputs(T=512, S=512, seed=1)
    B, T, H, _ = q.shape
    S = k.shape[1]
    valid = np.ones((B, S), bool)
    valid[1, :] = False
    valid = jnp.asarray(valid)
    key = jax.random.PRNGKey(11)
    keep = dropout_mask_reference(key, B, H, T, S, 0.1)

    out = fused_dropout_attention(q, k, v, valid, key, 0.1, True)
    tw = attention_dropout_twin(q, k, v, valid, keep, 0.1, True)
    assert np.array_equal(np.asarray(out, np.float32), np.asarray(tw, np.float32))
    assert (np.asarray(out)[1] == 0).all()
    assert np.isfinite(np.asarray(out, np.float32)).all()

    g = jax.grad(
        lambda a, b, c: (
            fused_dropout_attention(a, b, c, valid, key, 0.1, True).astype(jnp.float32) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for x in g:
        assert np.isfinite(np.asarray(x, np.float32)).all()


def test_fused_train_attention_gradients_vs_twin():
    """Kernel VJP vs jax.grad of the twin with the identical mask: dv
    agrees to f32 accumulation-order noise (the kernel sums per-q-block
    partials, the twin one einsum — ~1e-5 relative), dq/dk to the
    bf16-cotangent rounding the fused-bwd family accepts (<2%)."""
    from smer_music_generation_tpu.ops.train_attention import (
        attention_dropout_twin,
        dropout_mask_reference,
        fused_dropout_attention,
    )

    q, k, v, valid = _fda_inputs(seed=3)
    key = jax.random.PRNGKey(5)
    B, T, H, _ = q.shape
    S = k.shape[1]
    keep = dropout_mask_reference(key, B, H, T, S, 0.1)

    gt = jax.grad(
        lambda a, b, c: (
            attention_dropout_twin(a, b, c, valid, keep, 0.1).astype(jnp.float32) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gf = jax.grad(
        lambda a, b, c: (
            fused_dropout_attention(a, b, c, valid, key, 0.1).astype(jnp.float32) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b in zip("qkv", gt, gf):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        limit = 1e-4 if name == "v" else 0.02
        assert rel < limit, (name, rel)


def test_fused_attn_train_model_integration():
    """ModelConfig.fused_attn_train: train-mode losses differ from the XLA
    path only via the dropout stream (close, not equal); deterministic
    logits are bit-identical (kernel inert); gradients finite."""
    import dataclasses

    from smer_music_generation_tpu.models.transformer import (
        ModelConfig,
        ScoreTransformer,
    )

    V = 64
    base = ModelConfig(
        vocab_size=V, d_model=32, nhead=4, num_encoder_layers=2,
        num_decoder_layers=2, d_ff=64, max_len=512, dropout=0.1,
        pos_dropout=0.1, dtype=jnp.bfloat16,
    )
    src = jnp.asarray(np.random.default_rng(2).integers(1, V, (2, 256)), jnp.int32)
    tgt = jnp.asarray(np.random.default_rng(3).integers(1, V, (2, 256)), jnp.int32)
    spm = jnp.zeros((2, 256), bool).at[:, 200:].set(True)
    tpm = jnp.zeros((2, 256), bool).at[:, 180:].set(True)

    results = {}
    for fused in (True, False):
        m = ScoreTransformer(dataclasses.replace(base, fused_attn_train=fused))
        params = m.init({"params": jax.random.PRNGKey(0)}, src, tgt)

        def loss(p, det, m=m):
            logits, _ = m.apply(
                p, src, tgt, src_pad_mask=spm, tgt_pad_mask=tpm,
                deterministic=det,
                rngs={} if det else {"dropout": jax.random.PRNGKey(7)},
            )
            return (logits.astype(jnp.float32) ** 2).mean()

        l, g = jax.jit(jax.value_and_grad(lambda p, m=m: loss(p, False, m)))(params)
        ld = jax.jit(lambda p, m=m: loss(p, True, m))(params)
        gn = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                         for x in jax.tree.leaves(g)))
        )
        assert np.isfinite(gn)
        results[fused] = (float(l), float(ld))
    assert results[True][0] != results[False][0]  # new dropout stream engaged
    assert results[True][1] == results[False][1]  # deterministic pass inert
    assert abs(results[True][0] - results[False][0]) / results[False][0] < 0.05


def test_fused_verify_window_matches_decode_window():
    """v6 verify kernel (interpret) == ScoreTransformer.decode_window:
    slot-exact logits for all W rows and identical new K/V, both at a
    cold cache and mid-stream over a warm cache."""
    from smer_music_generation_tpu.models.transformer import ScoreTransformer
    from smer_music_generation_tpu.ops.decode_step import (
        fused_verify_window,
        pack_decoder_weights,
        stack_kv_cache,
        vocab_pad,
    )

    B, V, S, L, nl = 1, 309, 512, 512, 2
    cfg, model, params, src = _decode_fixture(B, V, S, L, nl)
    D = cfg.d_model
    W = 6

    src_pad = np.zeros((B, S), bool)
    src_pad[0, 400:] = True
    src_pad = jnp.asarray(src_pad)
    memory = model.apply(params, src, src_pad, method=ScoreTransformer.encode)
    cross = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)
    cache = model.apply(params, B, L, method=ScoreTransformer.init_self_cache)

    cross_kv = stack_kv_cache(cross, nl)
    cross_len = jnp.asarray([400], jnp.int32)
    self_kv = jnp.zeros((nl, B, L, 2 * D), cfg.dtype)
    packed = pack_decoder_weights(params, cfg, vocab_pad(V))
    pe = model.apply(params, method=lambda m: m.pos_table)
    emb = params["params"]["embedding"]["embedding"]

    rng = jax.random.PRNGKey(3)
    for start in (0, W):  # cold cache, then warm mid-stream
        toks = jax.random.randint(jax.random.fold_in(rng, start), (B, W), 1, V)
        lg_ref, cache = model.apply(
            params, toks, jnp.int32(start), cache, cross, src_pad,
            method=ScoreTransformer.decode_window,
        )
        x = (emb[toks[0]] * np.sqrt(D) + pe[start : start + W]).astype(cfg.dtype)
        lg, new_kv = fused_verify_window(
            packed, x, self_kv, cross_kv, jnp.int32(start), cross_len,
            n_layers=nl, d_model=D, nhead=cfg.nhead, d_ff=cfg.d_ff,
            vpad=vocab_pad(V), interpret=True,
        )
        self_kv = jax.lax.dynamic_update_slice(
            self_kv, new_kv[:, None, :, :], (0, 0, start, 0))
        a = np.asarray(lg_ref)[0]          # (W, V)
        b = np.asarray(lg)[:, :V]          # (W, V)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
        assert (a.argmax(-1) == b.argmax(-1)).all(), start
        # cache rows must agree with the model's own cache
        for li in range(nl):
            k_ref, v_ref = cache[f"layer_{li}"]
            kv_ker = np.asarray(self_kv[li, 0, start : start + W])
            k_flat = np.asarray(k_ref[0, start : start + W]).reshape(W, D)
            v_flat = np.asarray(v_ref[0, start : start + W]).reshape(W, D)
            np.testing.assert_allclose(kv_ker[:, :D], k_flat, rtol=2e-2, atol=2e-2)
            np.testing.assert_allclose(kv_ker[:, D:], v_flat, rtol=2e-2, atol=2e-2)


def test_spec_decode_kernel_verify_greedy_matches_xla():
    """v5 with the v6 verify kernel (interpret) must reproduce the
    baseline greedy stream bit-for-bit, same as the XLA-verify v5."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg, model, params, _ = _decode_fixture(1, vocab.vocab_size, 512, 512, 2)

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=512)
    span_types = np.zeros((1, 256), np.int32)
    span_types[0, :5] = [0, 1, 2, 3, 4]
    n_spans = np.asarray([5], np.int32)

    base = InfillDecoder(model, vocab, max_tgt_len=512, greedy=True,
                         fused=False)
    spec_xla = InfillDecoder(model, vocab, max_tgt_len=512, greedy=True,
                             fused=False, draft_k=4)
    spec_ker = InfillDecoder(model, vocab, max_tgt_len=512, greedy=True,
                             fused=False, draft_k=4, interpret=True)
    # the interpret decoder must actually take the kernel path
    import jax as _jax
    assert _jax.default_backend() != "tpu"  # CPU CI: gate is interpret
    rb = base(params, src, span_types, n_spans, False, jax.random.PRNGKey(0))
    rx = spec_xla(params, src, span_types, n_spans, False, jax.random.PRNGKey(0))
    rk = spec_ker(params, src, span_types, n_spans, False, jax.random.PRNGKey(0))
    Lb = int(rb.lengths[0])
    assert int(rx.lengths[0]) == Lb and int(rk.lengths[0]) == Lb
    ref = np.asarray(rb.tokens[0, :Lb])
    np.testing.assert_array_equal(ref, np.asarray(rx.tokens[0, :Lb]))
    np.testing.assert_array_equal(ref, np.asarray(rk.tokens[0, :Lb]))
