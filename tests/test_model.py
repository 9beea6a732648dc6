"""Model core tests: shapes, causality, KV-cache decode equivalence, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.models.transformer import (
    ModelConfig,
    ScoreTransformer,
    sinusoidal_table,
)
from smer_music_generation_tpu.train.loss import (
    build_loss_tables,
    multihead_ce,
    per_class_accuracy,
)
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

V = 64
CFG = ModelConfig(
    vocab_size=V, d_model=32, nhead=4, num_encoder_layers=2, num_decoder_layers=2,
    d_ff=64, max_len=128, dropout=0.0, pos_dropout=0.0,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = ScoreTransformer(CFG)
    rng = jax.random.PRNGKey(0)
    src = jnp.ones((2, 10), dtype=jnp.int32)
    tgt = jnp.ones((2, 8), dtype=jnp.int32)
    params = model.init({"params": rng}, src, tgt)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    src = jnp.arange(20, dtype=jnp.int32).reshape(2, 10) % V
    tgt = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % V
    logits, weights = model.apply(params, src, tgt)
    assert logits.shape == (2, 8, V)
    assert weights.shape == (2, CFG.num_decoder_layers, 8, 10)


def test_causality(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(1, V, (1, 10)), dtype=jnp.int32)
    tgt1 = jnp.asarray(rng.integers(1, V, (1, 8)), dtype=jnp.int32)
    tgt2 = tgt1.at[0, 5].set((tgt1[0, 5] + 1) % V)  # change a future token
    l1, _ = model.apply(params, src, tgt1)
    l2, _ = model.apply(params, src, tgt2)
    # positions < 5 unaffected by the change at position 5
    np.testing.assert_allclose(l1[0, :5], l2[0, :5], atol=1e-5)
    assert not np.allclose(l1[0, 5:], l2[0, 5:])


def test_padding_mask_effect(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(1, V, (1, 10)), dtype=jnp.int32)
    tgt = jnp.asarray(rng.integers(1, V, (1, 6)), dtype=jnp.int32)
    pad_mask = jnp.zeros((1, 10), dtype=bool).at[0, 7:].set(True)
    # changing padded src positions must not change output when masked
    src2 = src.at[0, 8].set((src[0, 8] + 3) % V)
    l1, _ = model.apply(params, src, tgt, src_pad_mask=pad_mask)
    l2, _ = model.apply(params, src2, tgt, src_pad_mask=pad_mask)
    np.testing.assert_allclose(l1, l2, atol=1e-5)


def test_kv_cache_decode_matches_full(model_and_params):
    """Cached stepwise decode must equal the full (re-forward) decode."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.integers(1, V, (1, 12)), dtype=jnp.int32)
    tgt = jnp.asarray(rng.integers(1, V, (1, 9)), dtype=jnp.int32)

    full_logits, _ = model.apply(params, src, tgt)

    memory = model.apply(params, src, method=ScoreTransformer.encode)
    cross_cache = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)
    self_cache = model.apply(params, 1, 16, method=ScoreTransformer.init_self_cache)

    step_logits = []
    for i in range(9):
        logits, self_cache = model.apply(
            params,
            tgt[:, i],
            jnp.int32(i),
            self_cache,
            cross_cache,
            method=ScoreTransformer.decode_step,
        )
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, atol=2e-4, rtol=1e-3)


def test_sinusoidal_table():
    pe = sinusoidal_table(16, 8)
    assert pe.shape == (16, 8)
    np.testing.assert_allclose(pe[0], np.array([0, 1] * 4), atol=1e-6)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vocab():
    return WordVocab(0, CONTROL_SETS[5])


def _torch_style_reference_loss(logits, targets, vocab, eos_weight):
    """Direct transliteration of the reference's 7+k-head loss."""
    logits = np.asarray(logits, dtype=np.float64)
    targets = np.asarray(targets)
    Vn = vocab.vocab_size
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)

    ce_all = np.ones(Vn)
    ce_all[0] = 0
    ce_all[2] = 0
    ce_all[-1] = 0
    ce_all[1] = eos_weight

    heads = []
    meta = np.zeros(Vn); meta[1] = eos_weight; heads.append(meta)
    for lo, hi in [(3, 7), (7, 11), (11, 18), (18, 146), (146, 234), (234, 234 + len(vocab.duration_indices))]:
        w = np.zeros(Vn); w[lo:hi] = 1; heads.append(w)
    for name in ("key", "tensile", "density", "polyphony", "occupation"):
        idxs = vocab.control_indices[name]
        w = np.zeros(Vn); w[idxs[0]:idxs[-1] + 1] = 1; heads.append(w)

    flat_t = targets.reshape(-1)
    flat_lp = logp.reshape(-1, Vn)
    nll = -flat_lp[np.arange(len(flat_t)), flat_t]
    nll[flat_t == 0] = 0.0
    denom = ce_all[flat_t][flat_t != 0].sum()
    total = 0.0
    for w in heads:
        total += (w[flat_t] * nll).sum() / denom
    return total


def test_fused_loss_matches_reference_heads(vocab):
    rng = np.random.default_rng(0)
    B, T = 2, 12
    logits = jnp.asarray(rng.normal(size=(B, T, vocab.vocab_size)), dtype=jnp.float32)
    targets = jnp.asarray(
        rng.choice([0, 1, 5, 9, 14, 100, 200, 238, 245, 300], size=(B, T)), dtype=jnp.int32
    )
    tables = build_loss_tables(vocab)
    total, per_head = multihead_ce(logits, targets, tables, eos_weight=0.8)
    want = _torch_style_reference_loss(logits, targets, vocab, 0.8)
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    assert set(per_head) == {
        "meta", "structure", "time_signature", "tempo", "program", "pitch",
        "duration", "key", "tensile", "density", "polyphony", "occupation",
    }
    # per-head sum equals the total
    np.testing.assert_allclose(
        float(sum(per_head.values())), float(total), rtol=1e-6
    )


def test_per_class_accuracy(vocab):
    tables = build_loss_tables(vocab)
    B, T = 1, 6
    targets = jnp.asarray([[1, 150, 150, 238, 0, 300]], dtype=jnp.int32)
    logits = jnp.full((B, T, vocab.vocab_size), -10.0)
    # predict correctly for positions 0,1,3; wrong for 2, 5
    logits = logits.at[0, 0, 1].set(10.0)
    logits = logits.at[0, 1, 150].set(10.0)
    logits = logits.at[0, 2, 151].set(10.0)
    logits = logits.at[0, 3, 238].set(10.0)
    logits = logits.at[0, 4, 7].set(10.0)
    logits = logits.at[0, 5, 299].set(10.0)
    correct_pc, count_pc, total_c, total_n = per_class_accuracy(logits, targets, tables)
    names = tables["class_names"]
    acc = {n: (c, k) for n, c, k in zip(names, correct_pc.tolist(), count_pc.tolist())}
    assert acc["pitch"] == (1.0, 2.0)
    assert acc["duration"] == (1.0, 1.0)
    assert acc["eos"] == (1.0, 1.0)
    assert float(total_n) == 5.0  # pad excluded
    assert float(total_c) == 3.0


def test_flash_encoder_matches_reference_path():
    """flash_encoder=True must reproduce the einsum encoder (deterministic,
    suffix padding)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, flash_encoder=False, max_len=256)
    cfg_flash = dataclasses.replace(cfg, flash_encoder=True)
    model = ScoreTransformer(cfg)
    model_flash = ScoreTransformer(cfg_flash)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.integers(1, V, (2, 40)), dtype=jnp.int32)
    pad = jnp.zeros((2, 40), bool).at[0, 33:].set(True).at[1, 25:].set(True)
    src = jnp.where(pad, 0, src)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, src[:, :8])
    mem = model.apply(params, src, pad, method=ScoreTransformer.encode)
    mem_flash = model_flash.apply(params, src, pad, method=ScoreTransformer.encode)
    # padded rows may differ (flash normalizes over nothing); compare valid
    np.testing.assert_allclose(
        np.asarray(mem[0, :33]), np.asarray(mem_flash[0, :33]), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(mem[1, :25]), np.asarray(mem_flash[1, :25]), atol=2e-3, rtol=1e-2
    )


def test_flash_training_flag_fallback_and_api():
    """flash_training=True falls back to the XLA path (identical outputs)
    when sequence lengths are not 128-multiples; decode() returns None
    cross-attention weights on the flash path by contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smer_music_generation_tpu.models.transformer import (
        ModelConfig,
        ScoreTransformer,
    )

    kw = dict(vocab_size=50, d_model=64, nhead=2, num_encoder_layers=1,
              num_decoder_layers=1, d_ff=128, max_len=256, dropout=0.0,
              pos_dropout=0.0)
    m0 = ScoreTransformer(ModelConfig(**kw))
    m1 = ScoreTransformer(ModelConfig(flash_training=True, **kw))
    src = jnp.ones((2, 100), jnp.int32)  # 100 % 128 != 0 -> fallback
    tgt = jnp.ones((2, 60), jnp.int32)
    params = m0.init({"params": jax.random.PRNGKey(0)}, src, tgt)
    l0, w0 = m0.apply(params, src, tgt)
    l1, w1 = m1.apply(params, src, tgt)
    assert np.allclose(np.asarray(l0), np.asarray(l1))
    assert w1 is not None  # fallback path still returns weights


def test_remat_exact_loss_and_grads():
    """remat=True (per-layer jax.checkpoint) must not change numerics or
    the param tree: same ops, same dropout RNG draws, recomputed in bwd."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smer_music_generation_tpu.train.state import build_model

    def run(remat):
        m = build_model(64, d_model=32, nhead=2, num_layers=2, d_ff=64,
                        max_len=128, dropout=0.1, remat=remat)
        src = jnp.arange(24, dtype=jnp.int32).reshape(2, 12) % 60
        tgt = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 60
        params = m.init({"params": jax.random.PRNGKey(0)}, src, tgt)

        def loss(p):
            logits, _ = m.apply(p, src, tgt, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean(logits ** 2)

        return params, jax.jit(jax.value_and_grad(loss))(params)

    p0, (l0, g0) = run(False)
    p1, (l1, g1) = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_bf16_attn_residual_gradient_parity():
    """ModelConfig.bf16_attn_residual changes ONLY the attention-softmax
    autodiff residual dtype: under bf16 compute, gradients agree with the
    plain-softmax path to bf16 rounding; under f32 compute the gate is
    inert and gradients are bit-identical."""
    import dataclasses

    def grads(cfg):
        model = ScoreTransformer(cfg)
        src = jnp.asarray(np.random.default_rng(0).integers(1, V, (2, 12)), jnp.int32)
        tgt = jnp.asarray(np.random.default_rng(1).integers(1, V, (2, 8)), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, src, tgt)

        def loss(p):
            logits, _ = model.apply(p, src, tgt)
            return (logits.astype(jnp.float32) ** 2).mean()

        return jax.grad(loss)(params)

    bf16 = dataclasses.replace(CFG, dtype=jnp.bfloat16)
    g_on = grads(dataclasses.replace(bf16, bf16_attn_residual=True))
    g_off = grads(dataclasses.replace(bf16, bf16_attn_residual=False))
    leaves = list(
        zip(jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off))
    )
    global_scale = max(
        float(np.linalg.norm(np.asarray(b, np.float32))) for _, b in leaves
    )
    for a, b in leaves:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if max(np.linalg.norm(a), np.linalg.norm(b)) < 1e-3 * global_scale:
            # k-projection biases: the true gradient is zero (softmax is
            # shift-invariant in the keys), both sides are rounding noise
            continue
        err = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert err < 0.02, (a.shape, err)
    # at least one leaf must actually differ (the bf16 residual is live)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)
        )
    )

    g_on32 = grads(dataclasses.replace(CFG, bf16_attn_residual=True))
    g_off32 = grads(dataclasses.replace(CFG, bf16_attn_residual=False))
    for a, b in zip(
        jax.tree_util.tree_leaves(g_on32), jax.tree_util.tree_leaves(g_off32)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_attn_bwd_bit_identical():
    """ModelConfig.fused_attn_bwd changes what is STORED between the
    passes, not the forward computation: with identical dropout keys,
    train-mode loss is bit-identical to the unfused bf16-residual path
    (same ops, same RNG draws).  Gradients agree to rounding: the
    hand-written einsum cotangents accumulate in a different order than
    the AD-generated ones, so bitwise equality is not expected."""
    import dataclasses

    def run(fused):
        cfg = dataclasses.replace(
            CFG, dtype=jnp.bfloat16, dropout=0.1, pos_dropout=0.1,
            bf16_attn_residual=True, fused_attn_bwd=fused,
        )
        m = ScoreTransformer(cfg)
        src = jnp.asarray(np.random.default_rng(2).integers(1, V, (2, 12)), jnp.int32)
        tgt = jnp.asarray(np.random.default_rng(3).integers(1, V, (2, 8)), jnp.int32)
        params = m.init({"params": jax.random.PRNGKey(0)}, src, tgt)

        def loss(p):
            logits, _ = m.apply(p, src, tgt, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(7)})
            return (logits.astype(jnp.float32) ** 2).mean()

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        return l, g

    l_f, g_f = run(True)
    l_u, g_u = run(False)
    assert np.array_equal(np.asarray(l_f), np.asarray(l_u))
    leaves = list(
        zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_u))
    )
    global_scale = max(
        float(np.linalg.norm(np.asarray(b, np.float32))) for _, b in leaves
    )
    for a, b in leaves:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if max(np.linalg.norm(a), np.linalg.norm(b)) < 1e-3 * global_scale:
            continue  # near-zero true gradient: both sides rounding noise
        err = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert err < 0.02, (a.shape, err)


def test_fused_attn_bwd_inert_f32_train_and_long_klen():
    """The fused path must stay inert in TRAIN mode (dropout active) under
    f32 compute, and under bf16 when the key length exceeds the 1024
    residual gate: train-mode loss AND gradients are bit-identical with
    fused_attn_bwd on/off in both regimes (ADVICE r2)."""
    import dataclasses

    cases = [
        # f32 compute, dropout on: the bf16-residual gate is closed
        (dataclasses.replace(CFG, dropout=0.1, pos_dropout=0.1), 12, 8),
        # bf16 compute but klen > 1024 for EVERY attention (src and tgt
        # both past the gate — a short tgt would leave the decoder
        # self-attention, klen = tgt, legitimately fused)
        (
            dataclasses.replace(
                CFG, dtype=jnp.bfloat16, dropout=0.1, pos_dropout=0.1,
                max_len=2048,
            ),
            1030,
            1030,
        ),
    ]
    for base, S, T in cases:
        src = jnp.asarray(
            np.random.default_rng(6).integers(1, V, (1, S)), jnp.int32
        )
        tgt = jnp.asarray(
            np.random.default_rng(7).integers(1, V, (1, T)), jnp.int32
        )
        outs = []
        for fused in (True, False):
            m = ScoreTransformer(dataclasses.replace(base, fused_attn_bwd=fused))
            params = m.init({"params": jax.random.PRNGKey(0)}, src, tgt)

            def loss(p, m=m):
                logits, _ = m.apply(
                    p, src, tgt, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(9)},
                )
                return (logits.astype(jnp.float32) ** 2).mean()

            l, g = jax.jit(jax.value_and_grad(loss))(params)
            outs.append((np.asarray(l), jax.tree_util.tree_leaves(g)))
        (l_f, g_f), (l_u, g_u) = outs
        assert np.array_equal(l_f, l_u), (base.dtype, S)
        for a, b in zip(g_f, g_u):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (base.dtype, S)


def test_fused_attn_bwd_inert_when_gated_off():
    """The fused path must not engage under f32 compute or deterministic
    passes: logits with fused_attn_bwd on/off are bit-identical there."""
    import dataclasses

    src = jnp.asarray(np.random.default_rng(4).integers(1, V, (2, 10)), jnp.int32)
    tgt = jnp.asarray(np.random.default_rng(5).integers(1, V, (2, 6)), jnp.int32)
    for base in (CFG, dataclasses.replace(CFG, dtype=jnp.bfloat16)):
        outs = []
        for fused in (True, False):
            m = ScoreTransformer(dataclasses.replace(base, fused_attn_bwd=fused))
            params = m.init({"params": jax.random.PRNGKey(0)}, src, tgt)
            logits, _ = m.apply(params, src, tgt)  # deterministic
            outs.append(np.asarray(logits, np.float32))
        assert np.array_equal(outs[0], outs[1])


def test_decode_window_matches_stepwise(model_and_params):
    """decode_window (spec-decode verify) must equal W sequential cached
    decode_steps: same logits at every slot, same cache contents, both
    mid-stream (nonzero index over a warm cache) and at the start."""
    model, params = model_and_params
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.integers(1, V, (1, 12)), dtype=jnp.int32)
    tgt = jnp.asarray(rng.integers(1, V, (1, 11)), dtype=jnp.int32)

    memory = model.apply(params, src, method=ScoreTransformer.encode)
    cross = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)

    for start, W in ((0, 5), (4, 7)):
        cache_a = model.apply(params, 1, 16, method=ScoreTransformer.init_self_cache)
        cache_b = model.apply(params, 1, 16, method=ScoreTransformer.init_self_cache)
        # warm both caches stepwise up to `start`
        for i in range(start):
            _, cache_a = model.apply(
                params, tgt[:, i], jnp.int32(i), cache_a, cross,
                method=ScoreTransformer.decode_step,
            )
            _, cache_b = model.apply(
                params, tgt[:, i], jnp.int32(i), cache_b, cross,
                method=ScoreTransformer.decode_step,
            )
        step_logits = []
        for i in range(start, start + W):
            logits, cache_a = model.apply(
                params, tgt[:, i], jnp.int32(i), cache_a, cross,
                method=ScoreTransformer.decode_step,
            )
            step_logits.append(logits)
        step_logits = jnp.stack(step_logits, axis=1)  # (1, W, V)

        win_logits, cache_b = model.apply(
            params, tgt[:, start : start + W], jnp.int32(start), cache_b,
            cross, method=ScoreTransformer.decode_window,
        )
        np.testing.assert_allclose(win_logits, step_logits, atol=2e-4, rtol=1e-3)
        for key in cache_a:
            for a, b in zip(cache_a[key], cache_b[key]):
                np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
