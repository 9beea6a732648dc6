"""Inference engine tests: grammar masks, decode well-formedness, restore,
duration repair — the minimum end-to-end infilling slice on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.codec.annotate import encode_midi
from smer_music_generation_tpu.codec.durations import duration_table_for_signature
from smer_music_generation_tpu.codec.smer import events_to_midi
from smer_music_generation_tpu.codec.structure import bar_with_track_positions
from smer_music_generation_tpu.infer.engine import (
    InfillEngine,
    change_controls,
    check_track_total_time,
    mask_bar_and_track,
    restore_marked_input,
)
from smer_music_generation_tpu.infer.grammar import (
    SPAN_BODY,
    SPAN_DENSITY,
    SPAN_TENSILE,
    GrammarState,
    GrammarTables,
    allowed_mask,
    update_flags,
)
from smer_music_generation_tpu.models.transformer import ModelConfig, ScoreTransformer
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
from tests.test_annotate import make_two_track_score


@pytest.fixture(scope="module")
def vocab():
    return WordVocab(0, CONTROL_SETS[5])


@pytest.fixture(scope="module")
def tables(vocab):
    return GrammarTables.build(vocab)


@pytest.fixture(scope="module")
def mode2_events(vocab):
    """Serving stream with end-of-track control copies (control mode 2)."""
    score = make_two_track_score()
    events, controls = encode_midi(
        score, controls={"key": None}, track_names=["track_0", "track_1"]
    )
    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    return change_controls(events, controls, vocab), controls


def test_grammar_start_states(tables, vocab):
    state = GrammarState.zeros(2)
    is_start = jnp.array([True, True])
    span_type = jnp.array([SPAN_BODY, SPAN_DENSITY], dtype=jnp.int32)
    mask = np.asarray(allowed_mask(tables, state, is_start, span_type, False))
    # body start: pitch/rest/sep/eos allowed, durations and controls banned
    assert mask[0, vocab.pitch_indices[0]]
    assert mask[0, vocab.rest_indices[0]]
    assert mask[0, vocab.eos_index]
    assert not mask[0, vocab.duration_only_indices[0]]
    assert not mask[0, vocab.control_indices["density"][0]]
    assert not mask[0, vocab.program_indices[0]]
    assert not mask[0, vocab.pad_index]
    # density-slot start: only d_* tokens
    want = np.zeros(vocab.vocab_size, bool)
    want[vocab.control_indices["density"]] = True
    np.testing.assert_array_equal(mask[1], want)


def test_grammar_state_priorities(tables, vocab):
    # in_rest: only durations (minus whole when flagged)
    state = GrammarState(
        in_sep=jnp.array([False]), in_continue=jnp.array([False]),
        in_pitch=jnp.array([False]), in_rest=jnp.array([True]),
    )
    mask = np.asarray(allowed_mask(
        tables, state, jnp.array([False]), jnp.array([SPAN_BODY]), True
    ))[0]
    assert set(np.where(mask)[0]) == set(vocab.duration_only_indices[1:])  # no whole
    # in_continue: only pitch
    state = GrammarState(
        in_sep=jnp.array([False]), in_continue=jnp.array([True]),
        in_pitch=jnp.array([False]), in_rest=jnp.array([False]),
    )
    mask = np.asarray(allowed_mask(
        tables, state, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert set(np.where(mask)[0]) == set(vocab.pitch_indices)
    # in_sep outranks in_pitch
    state = GrammarState(
        in_sep=jnp.array([True]), in_continue=jnp.array([False]),
        in_pitch=jnp.array([True]), in_rest=jnp.array([False]),
    )
    mask = np.asarray(allowed_mask(
        tables, state, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert not mask[vocab.eos_index]
    assert not mask[vocab.rest_indices[0]]
    assert mask[vocab.continue_index]


def test_grammar_transitions(tables, vocab):
    s = GrammarState.zeros(1)
    s = update_flags(tables, s, jnp.array([vocab.sep_indices[0]]))
    assert bool(s.in_sep[0])
    s = update_flags(tables, s, jnp.array([vocab.pitch_indices[5]]))
    assert not bool(s.in_sep[0]) and bool(s.in_pitch[0])
    s = update_flags(tables, s, jnp.array([vocab.duration_only_indices[2]]))
    assert not bool(s.in_pitch[0])
    s = update_flags(tables, s, jnp.array([vocab.continue_index]))
    assert bool(s.in_continue[0])


def test_restore_marked_input():
    src = ["a", "m_0", "b", "m_0", "c"]
    generated = ["m_0", "x", "y", "m_0", "z"]
    assert restore_marked_input(src, generated) == ["a", "x", "y", "b", "z", "c"]


def test_check_track_total_time(vocab):
    table = duration_table_for_signature((4, 4), 60.0)
    ok, fixed = check_track_total_time(["p_60", "whole"], table)
    assert ok and fixed == ["p_60", "whole"]
    # short body gets its tail extended
    ok, fixed = check_track_total_time(["p_60", "half"], table)
    assert not ok
    assert fixed[0] == "p_60"
    assert table.total_duration(fixed[1:]) == pytest.approx(table.bar_duration)
    # overlong body gets truncated at the bar
    ok, fixed = check_track_total_time(
        ["p_60", "half", "p_62", "half", "p_64", "half"], table
    )
    assert not ok
    assert fixed == ["p_60", "half", "p_62", "half"]
    # sep rewind accounted: chord 0..2, overlapping note at beat 2 (sep
    # rewinds to the chord start then advances by the offset), rest to end
    ok, fixed = check_track_total_time(
        ["p_60", "p_64", "half", "sep", "quarter", "p_72",
         "quarter", "eighth", "sixteenth", "rest", "quarter", "sixteenth"],
        table,
    )
    assert ok


def test_mask_bar_and_track_spans(vocab, mode2_events):
    events, _ = mode2_events
    res = mask_bar_and_track(events, vocab, [0], [2, 3])
    assert res is not None
    src, span_codes, mask_tracks, mask_bars = res
    # 2 bars x 1 track -> body + d + o + y per slot (track 0 is not the
    # last track, so no tensile span)
    assert len(span_codes) == 2 * 4
    assert mask_bars == [2, 3]
    n_masks = int(np.sum(src == vocab.mask_index))
    assert n_masks == len(span_codes)


def test_mask_last_track_gets_tensile_span(vocab, mode2_events):
    events, _ = mode2_events
    res = mask_bar_and_track(events, vocab, [1], [0])
    src, span_codes, _, _ = res
    assert len(span_codes) == 5  # body + d,o,y + tensile
    assert span_codes[-1] == SPAN_TENSILE


@pytest.fixture(scope="module")
def tiny_engine(vocab):
    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    src = jnp.ones((1, 8), dtype=jnp.int32)
    tgt = jnp.ones((1, 8), dtype=jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, tgt)
    return InfillEngine(
        model, params, vocab, nucleus_p=0.9, temperature=1.0, max_tgt_len=512,
        max_time_fix_attempts=1,  # random weights: retries would exhaust
    )


def test_end_to_end_infill_well_formed(vocab, mode2_events, tiny_engine):
    """Random-weight model; the grammar must still force well-formed spans."""
    events, _ = mode2_events
    result = tiny_engine(events, tracks_to_generate=[0], bars_to_generate=[1, 2],
                         rng=jax.random.PRNGKey(42))
    assert result is not None
    out = result.events
    assert "m_0" not in out
    # still 16 bars, same header
    assert out[:3] == events[:3]
    assert out.count("bar") == 16
    # every token encodable
    vocab.encode(out)
    # masked track bodies close their bars exactly after repair
    table = duration_table_for_signature((4, 4), 60.0)
    _, _, bars = bar_with_track_positions(out)
    for bar_num in (1, 2):
        track_start, track_end = bars[bar_num][0]
        tensile_end = 1 if out[track_end - 1].startswith("s_") else 0
        body = out[track_start + 3 : track_end - 3 - tensile_end]
        ok, _ = check_track_total_time(body, table)
        assert ok, f"bar {bar_num} body does not close: {body}"
    # the stream still decodes to MIDI
    midi = events_to_midi(out, 100.0)
    assert midi is not None


def test_infill_extends_song(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    result = tiny_engine(events, tracks_to_generate=[0, 1], bars_to_generate=[16, 17],
                         rng=jax.random.PRNGKey(7))
    assert result is not None
    assert result.events.count("bar") == 18


def test_infill_correct_controls(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    result = tiny_engine(
        events, tracks_to_generate=[0], bars_to_generate=[3],
        rng=jax.random.PRNGKey(11), correct_controls=True,
    )
    assert result is not None
    out = result.events
    _, _, bars = bar_with_track_positions(out)
    track_start, track_end = bars[3][0]
    # leading and trailing control copies agree after correction
    lead = out[track_start : track_start + 3]
    tensile_end = 1 if out[track_end - 1].startswith("s_") else 0
    trail = out[track_end - 3 - tensile_end : track_end - tensile_end]
    assert lead == trail
    assert lead[0].startswith("d_") and lead[1].startswith("o_") and lead[2].startswith("y_")


# ---------------------------------------------------------------------------
# REMI (mode 1) decode path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def remi_vocab():
    return WordVocab(1, CONTROL_SETS[5])


def test_remi_grammar_states(remi_vocab):
    t = GrammarTables.build(remi_vocab)
    assert t.mode == 1
    # state A: step or eos
    state = GrammarState.zeros(1)
    mask = np.asarray(allowed_mask(
        t, state, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert set(np.where(mask)[0]) == set(remi_vocab.step_indices) | {remi_vocab.eos_index}
    # after a step -> pitch only
    s = update_flags(t, state, jnp.array([remi_vocab.step_indices[3]]))
    mask = np.asarray(allowed_mask(
        t, s, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert set(np.where(mask)[0]) == set(remi_vocab.pitch_indices)
    # after a pitch -> pitch or duration
    s = update_flags(t, s, jnp.array([remi_vocab.pitch_indices[0]]))
    mask = np.asarray(allowed_mask(
        t, s, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert set(np.where(mask)[0]) == set(remi_vocab.pitch_indices) | set(
        remi_vocab.duration_only_indices
    )
    # duration closes the run -> back to state A
    s = update_flags(t, s, jnp.array([remi_vocab.duration_only_indices[3]]))
    mask = np.asarray(allowed_mask(
        t, s, jnp.array([False]), jnp.array([SPAN_BODY]), False
    ))[0]
    assert set(np.where(mask)[0]) == set(remi_vocab.step_indices) | {remi_vocab.eos_index}


def test_remi_end_to_end_infill(remi_vocab, mode2_events):
    from smer_music_generation_tpu.codec.remi import remi_to_midi, smer_to_remi
    from smer_music_generation_tpu.data.masking import copy_bar_controls_to_end

    smer_events, _ = mode2_events
    # convert the SMER mode-2 stream to REMI; control layout carries over
    remi_events = smer_to_remi(smer_events)
    cfg = ModelConfig(
        vocab_size=remi_vocab.vocab_size, d_model=32, nhead=4,
        num_encoder_layers=1, num_decoder_layers=1, d_ff=64, max_len=2048,
        dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    engine = InfillEngine(model, params, remi_vocab, max_tgt_len=512)
    result = engine(remi_events, tracks_to_generate=[0], bars_to_generate=[1],
                    rng=jax.random.PRNGKey(2))
    assert result is not None
    out = result.events
    assert "m_0" not in out
    remi_vocab.encode(out)
    assert remi_to_midi(out, 100.0) is not None


def test_nucleus_distribution_matches_reference_rule():
    """Empirical check of the masked nucleus sampler against a direct
    transliteration of the reference's numpy nucleus rule
    (generation.py:11-25)."""
    from smer_music_generation_tpu.infer.sampling import masked_sample

    rng = np.random.default_rng(0)
    V = 24
    logits = jnp.asarray(rng.normal(size=(1, V)) * 2, dtype=jnp.float32)
    allowed = jnp.ones((1, V), dtype=bool).at[0, :4].set(False)
    p = 0.8

    # reference rule on the masked logits
    masked = np.asarray(logits)[0].copy()
    masked[:4] = -1e9
    probs = np.exp(masked - masked.max())
    probs /= probs.sum()
    order = np.argsort(-probs)
    csum = np.cumsum(probs[order])
    last = int(np.where(csum > p)[0][0]) + 1
    keep = order[:last]
    want = np.zeros(V)
    want[keep] = probs[keep] / probs[keep].sum()

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    samples = jax.vmap(lambda k: masked_sample(k, logits, allowed, p=p)[0])(keys)
    counts = np.bincount(np.asarray(samples), minlength=V) / n
    # support sets identical
    assert set(np.where(counts > 0)[0]) <= set(keep)
    np.testing.assert_allclose(counts[keep], want[keep], atol=0.02)


def test_run_batch_heterogeneous(vocab, mode2_events, tiny_engine):
    """Batched decode with different span structures per element."""
    events, _ = mode2_events
    r1 = tiny_engine.prepare(events, [0], [1])
    r2 = tiny_engine.prepare(events, [0, 1], [2, 3])
    assert r1 is not None and r2 is not None
    results = tiny_engine.run_batch([r1, r2], jax.random.PRNGKey(9))
    assert len(results) == 2
    for res in results:
        assert res is not None
        assert "m_0" not in res.events
        vocab.encode(res.events)
    assert len(results[1].mask_bars) > len(results[0].mask_bars)


def test_fast_tables_parity(vocab, tables):
    """Table-driven fast grammar == reference allowed_mask/update_flags over
    every packed state x start/span combination, SMER and REMI modes."""
    from smer_music_generation_tpu.infer.grammar import (
        allowed_mask_fast,
        build_fast_tables,
        update_bits,
    )
    from smer_music_generation_tpu.vocab import WordVocab

    for mode in (0, 1):
        voc = vocab if mode == 0 else WordVocab(1, CONTROL_SETS[5])
        t = GrammarTables.build(voc)
        state_masks, sid_from_bits, next_bits = build_fast_tables(t)
        V = t.vocab_size

        for bits in range(16):
            st = GrammarState(
                jnp.array([bool(bits & 8)]),
                jnp.array([bool(bits & 4)]),
                jnp.array([bool(bits & 2)]),
                jnp.array([bool(bits & 1)]),
            )
            for is_start in (False, True):
                for span_type in range(5):
                    for nw in (False, True):
                        ref = np.asarray(allowed_mask(
                            t, st, jnp.array([is_start]),
                            jnp.array([span_type], jnp.int32), jnp.array([nw]),
                        ))[0]
                        fast = np.asarray(allowed_mask_fast(
                            state_masks, sid_from_bits, jnp.array([bits], jnp.int32),
                            jnp.array([is_start]), jnp.array([span_type], jnp.int32),
                            jnp.asarray(nw), start_overrides=(mode == 1),
                        ))[0]
                        assert (ref == fast).all(), (mode, bits, is_start, span_type, nw)

            idx = jnp.arange(V, dtype=jnp.int32)
            st_v = GrammarState(*(jnp.full((V,), bool(bits & b)) for b in (8, 4, 2, 1)))
            ref_next = update_flags(t, st_v, idx)
            ref_packed = (
                np.asarray(ref_next.in_sep).astype(np.int32) * 8
                + np.asarray(ref_next.in_continue) * 4
                + np.asarray(ref_next.in_pitch) * 2
                + np.asarray(ref_next.in_rest)
            )
            fast_packed = np.asarray(
                update_bits(next_bits, jnp.full((V,), bits, jnp.int32), idx)
            )
            assert (ref_packed == fast_packed).all(), (mode, bits)


def test_check_track_total_time_cap_truncated_tail():
    """A span cut by the 100-token cap can end in pitches with its last
    duration group closed: the repair must REPLACE that group, not append
    another on top of it (regression: repair used to leave the bar at
    bar_duration + last_group_time)."""
    table = duration_table_for_signature((4, 4), 60.0)
    body = ["p_60", "half", "p_62", "quarter", "p_64", "p_65", "p_66"]
    ok, fixed = check_track_total_time(body, table)
    assert not ok
    ok2, fixed2 = check_track_total_time(fixed, table)
    assert ok2, f"repair did not converge: {fixed}"
    assert fixed2 == fixed


def test_decode_batch_parallel_over_mesh(vocab):
    """Multi-chip serving: the decode program with the batch sharded over an
    8-device dp mesh produces the exact same token streams as unsharded
    (SURVEY §2.5: DP is the load-bearing scale-out; sessions are
    batch-parallel across chips)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.models.transformer import ModelConfig, ScoreTransformer
    from smer_music_generation_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))

    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0"]
    B = 8
    src = np.repeat(
        pad_to_bucket(np.array([[vocab.char2index(t) for t in src_tokens]], np.int32),
                      bucket=256),
        B, axis=0,
    )
    span_types = np.zeros((B, 160), np.int32)
    span_types[:, :4] = [0, 1, 2, 3]
    n_spans = np.full((B,), 4, np.int32)
    rng = jax.random.PRNGKey(11)

    dec = InfillDecoder(model, vocab, max_tgt_len=256, nucleus_p=0.9, fused=False)
    base = dec(params, src, span_types, n_spans, False, rng)

    mesh = make_mesh(8, tp=1)
    shard = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    src_d = jax.device_put(jnp.asarray(src), shard)
    st_d = jax.device_put(jnp.asarray(span_types), shard)
    ns_d = jax.device_put(jnp.asarray(n_spans), shard)
    params_d = jax.device_put(params, rep)
    sharded = dec(params_d, src_d, st_d, ns_d, False, rng)

    assert np.array_equal(np.asarray(base.tokens), np.asarray(sharded.tokens))
    assert np.array_equal(np.asarray(base.lengths), np.asarray(sharded.lengths))


def test_run_batch_rejects_span_overflow_and_pads_tail(vocab, mode2_events, tiny_engine):
    """A request with more spans than the decoder's static budget yields
    None (not a crash); a 9-request batch runs as padded fused groups and
    returns exactly 9 results."""
    from dataclasses import replace

    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1, 2])
    assert req is not None

    too_many = replace(req, span_codes=list(req.span_codes) * 60)
    assert len(too_many.span_codes) > tiny_engine.decoder.max_spans
    results = tiny_engine.run_batch([too_many, req], jax.random.PRNGKey(0))
    assert results[0] is None
    assert results[1] is not None and "m_0" not in results[1].events

    # tail-group padding path requires a fused decoder; on CPU the decoder
    # reports fused=False, so force the chunking branch to execute by
    # monkey-flagging it (the decode itself still runs the XLA path with
    # B = group via the padded dummies).
    tiny_engine.decoder.fused = True
    tiny_engine.decoder.fused_sampling = False
    tiny_engine.decoder.interpret = True
    try:
        results = tiny_engine.run_batch([req] * 9, jax.random.PRNGKey(1))
    finally:
        tiny_engine.decoder.fused = False
        tiny_engine.decoder.interpret = False
    assert len(results) == 9
    assert all(r is not None for r in results)


def test_spans_close_detection(vocab, mode2_events, tiny_engine):
    """_spans_close: exact-closing regenerated bodies pass; non-closing
    bodies trigger the regeneration path."""
    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1])
    # untouched source: bodies close by construction
    src_tokens = [vocab.index2char(int(t)) for t in req.src]
    closing = list(events)
    assert tiny_engine._spans_close(closing, req)
    # corrupt the masked bar's body to overflow its duration
    from smer_music_generation_tpu.codec.structure import bar_with_track_positions
    _, _, bars = bar_with_track_positions(closing)
    ts, te = bars[1][0]
    broken = closing[: ts + 3] + ["p_60", "whole", "p_62", "whole"] + closing[te - 3 :]
    assert not tiny_engine._spans_close(broken, req)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_decode_grammar_legal_under_many_seeds(vocab, seed):
    """Fuzz: every sampled token stream obeys the grammar (no banned
    classes, control spans emit exactly their family) across seeds."""
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.models.transformer import ModelConfig, ScoreTransformer

    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init({"params": jax.random.PRNGKey(seed)},
                        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=256)
    span_types = np.zeros((1, 256), np.int32)
    span_types[0, :5] = [0, 1, 2, 3, 4]  # body + d/o/y + tensile
    n_spans = np.asarray([5], np.int32)

    dec = InfillDecoder(model, vocab, max_tgt_len=256, nucleus_p=0.9, fused=False)
    r = dec(params, src, span_types, n_spans, False, jax.random.PRNGKey(100 + seed))
    toks = [vocab.index2char(int(x))
            for x in np.asarray(r.tokens)[0, : int(r.lengths[0])]]

    t = GrammarTables.build(vocab)
    banned = np.asarray(t.always_banned).copy()
    banned[vocab.mask_index] = False  # span introducers are expected
    spans, cur = [], None
    for tk in toks:
        if tk == "m_0":
            cur = []
            spans.append(cur)
        else:
            assert cur is not None
            assert not banned[vocab.char2index(tk)], tk
            cur.append(tk)
    assert len(spans) == 5
    assert spans[1] and spans[1][0].startswith("d_") and len(spans[1]) == 1
    assert spans[2] and spans[2][0].startswith("o_") and len(spans[2]) == 1
    assert spans[3] and spans[3][0].startswith("y_") and len(spans[3]) == 1
    assert spans[4] and spans[4][0].startswith("s_") and len(spans[4]) == 1


def test_run_batch_pads_to_fused_tileable_sizes(vocab, mode2_events, tiny_engine):
    """Fused-kernel batches must be B==1 or B%4==0 (Mosaic lane tiling);
    odd request counts are padded with done-at-start dummies."""
    from smer_music_generation_tpu.infer.engine import InfillEngine

    engine = InfillEngine(
        tiny_engine.model, tiny_engine.params, vocab, nucleus_p=0.9,
        max_tgt_len=512, max_time_fix_attempts=1,
    )

    class _RecordingDecoder:
        def __init__(self, inner):
            self._inner = inner
            self.fused = True  # pretend we're on the kernel path
            self.batches = []

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def __call__(self, params, src, span_types, n_spans, no_whole, rng):
            self.batches.append(int(src.shape[0]))
            return self._inner(params, src, span_types, n_spans, no_whole, rng)

    proxy = _RecordingDecoder(engine.decoder)
    engine.decoder = proxy

    events, _ = mode2_events
    reqs = [
        engine.prepare(events, [0], [b]) for b in (1, 2, 3)
    ]
    assert all(r is not None for r in reqs)
    results = engine.run_batch(reqs, jax.random.PRNGKey(0))
    assert len(results) == 3
    assert all(r is not None and "m_0" not in r.events for r in results)
    # 3 requests dispatched as one tileable batch of 4
    assert all(b == 4 for b in proxy.batches)


def test_generate_cli_remi_mode(tmp_path):
    """Mode-1 serving end to end: SMER tokenize -> smer_to_remi -> REMI
    grammar decode -> remi_to_midi (regression: the CLI used to feed SMER
    duration tokens to the REMI vocab and crash on char2index)."""
    import json

    from smer_music_generation_tpu.codec.midi import read_midi
    from smer_music_generation_tpu.infer import generate_cli

    score = make_two_track_score()
    midi_in = tmp_path / "in.mid"
    score.write(str(midi_in))
    cfg = {"vocab_mode": 1, "d_model": 32, "nhead": 4, "num_layers": 1, "d_ff": 64}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out_path = tmp_path / "out.mid"
    rc = generate_cli.main([
        "-i", str(midi_in), "-o", str(out_path),
        "--bars", "1", "--tracks", "0",
        "--config", str(cfg_path), "--seed", "5", "--max_tgt", "256",
    ])
    assert rc == 0
    decoded = read_midi(str(out_path))
    assert decoded.instruments


def test_fill_empty_bars_remi_mode(remi_vocab):
    """Mode-1 placeholder bars contain no SMER-only tokens (regression:
    extending a REMI song past its end crashed on char2index('rest'))."""
    from smer_music_generation_tpu.codec.durations import duration_table_for_signature
    from smer_music_generation_tpu.infer.engine import fill_empty_bars

    table = duration_table_for_signature((4, 4), 60.0)
    events = ["4/4", "t_2", "k_0", "i_0", "bar", "s_2", "track_0",
              "d_0", "o_0", "y_0", "e_0", "p_60", "n_4", "d_0", "o_0", "y_0", "s_2"]
    out = fill_empty_bars(list(events), 2, table, mode=1)
    assert out.count("bar") == 3
    for tok in out:
        remi_vocab.char2index(tok)  # every token must be encodable
    assert "rest" not in out and "whole" not in out


def test_engine_run_batch_over_mesh(vocab, mode2_events, tiny_engine):
    """InfillEngine(mesh=...) serves a batch dp-sharded over 8 virtual
    devices with results identical to the unsharded engine."""
    from smer_music_generation_tpu.infer.engine import InfillEngine
    from smer_music_generation_tpu.parallel.mesh import make_mesh

    events, _ = mode2_events
    base = InfillEngine(
        tiny_engine.model, tiny_engine.params, vocab, nucleus_p=0.9,
        max_tgt_len=512, max_time_fix_attempts=1,
    )
    sharded = InfillEngine(
        tiny_engine.model, tiny_engine.params, vocab, nucleus_p=0.9,
        max_tgt_len=512, max_time_fix_attempts=1, mesh=make_mesh(8, tp=1),
    )
    reqs_a = [base.prepare(events, [0], [b]) for b in range(8)]
    reqs_b = [sharded.prepare(events, [0], [b]) for b in range(8)]
    rng = jax.random.PRNGKey(21)
    out_a = base.run_batch(reqs_a, rng)
    out_b = sharded.run_batch(reqs_b, rng)
    assert len(out_a) == len(out_b) == 8
    for a, b in zip(out_a, out_b):
        assert a is not None and b is not None
        assert a.events == b.events


def test_forced_prefix_decode_reproduces_prefix(vocab, mode2_events, tiny_engine):
    """Teacher-forcing a previously decoded prefix must reproduce it
    verbatim and continue with legal spans (the in-decode
    use_correct_control seam)."""
    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1, 2])
    assert req is not None
    decoder = tiny_engine._eval_decoder
    import numpy as np

    from smer_music_generation_tpu.infer.decode import pad_to_bucket

    src_b = pad_to_bucket(np.asarray(req.src, np.int32)[None])
    span_types = np.zeros((1, decoder.max_spans), np.int32)
    span_types[0, : len(req.span_codes)] = req.span_codes
    n_spans = np.asarray([len(req.span_codes)], np.int32)
    no_whole = np.asarray([req.no_whole_duration])
    rng = jax.random.PRNGKey(3)
    out = decoder(tiny_engine.params, src_b, span_types, n_spans, no_whole, rng)
    toks, lens = jax.device_get((out.tokens, out.lengths))
    full = [vocab.index2char(int(t)) for t in toks[0][: int(lens[0])]]
    # force the first two spans (body + first control) and re-decode
    m0_positions = [i for i, t in enumerate(full) if t == "m_0"]
    assert len(m0_positions) >= 3
    prefix = full[: m0_positions[2]]
    forced = np.asarray([[vocab.char2index(t) for t in prefix]], np.int32)
    out2 = decoder(
        tiny_engine.params, src_b, span_types, n_spans, no_whole,
        jax.random.PRNGKey(99),  # different noise: suffix may differ
        forced=forced, forced_len=np.asarray([len(prefix)], np.int32),
    )
    toks2, lens2 = jax.device_get((out2.tokens, out2.lengths))
    full2 = [vocab.index2char(int(t)) for t in toks2[0][: int(lens2[0])]]
    assert full2[: len(prefix)] == prefix
    # the re-decode must still produce the full span count
    assert sum(1 for t in full2 if t == "m_0") == len(req.span_codes)
    # a TERMINATED prefix (trailing m_0, the settle-loop contract) must
    # reproduce the settled spans exactly and start a fresh span after the
    # terminator — without it a body-terminal prefix would resume sampling
    # inside the settled span
    prefix_t = full[: m0_positions[1]] + ["m_0"]
    forced_t = np.asarray([[vocab.char2index(t) for t in prefix_t]], np.int32)
    out3 = decoder(
        tiny_engine.params, src_b, span_types, n_spans, no_whole,
        jax.random.PRNGKey(99),
        forced=forced_t, forced_len=np.asarray([len(prefix_t)], np.int32),
    )
    toks3, lens3 = jax.device_get((out3.tokens, out3.lengths))
    full3 = [vocab.index2char(int(t)) for t in toks3[0][: int(lens3[0])]]
    assert full3[: len(prefix_t)] == prefix_t
    assert sum(1 for t in full3 if t == "m_0") == len(req.span_codes)


def test_in_decode_correct_controls(vocab, mode2_events, tiny_engine):
    """correct_controls='in_decode': the end-control copies of every
    regenerated slot must equal the MEASURED controls of the generated
    body (the reference's use_correct_control contract) — even with a
    random-weight model whose sampled controls are arbitrary."""
    from smer_music_generation_tpu.eval.controllability import (
        recompute_bar_track_control,
    )
    from smer_music_generation_tpu.infer.engine import (
        TOTAL_TRACK_CONTROL_TYPES,
        bar_with_track_positions,
    )

    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1, 2])
    assert req is not None
    result = tiny_engine.run_with_correct_controls(
        req, jax.random.PRNGKey(11), fix_durations=False
    )
    assert result is not None
    out = result.events
    bar0 = next(i for i, t in enumerate(out) if t == "bar")
    header = [out[0], out[1]] + [t for t in out[:bar0] if t.startswith("i_")]
    _, _, bars = bar_with_track_positions(out)
    checked = 0
    for bar_num, track_num in zip(result.mask_bars, result.mask_tracks):
        track_start, track_end = bars[bar_num][track_num]
        tensile_end = (
            1 if out[track_end - 1].startswith("s_") else 0
        )
        body = out[
            track_start + TOTAL_TRACK_CONTROL_TYPES
            : track_end - TOTAL_TRACK_CONTROL_TYPES - tensile_end
        ]
        d, o, y = recompute_bar_track_control(body, header)
        end_controls = out[
            track_end - TOTAL_TRACK_CONTROL_TYPES - tensile_end
            : track_end - tensile_end
        ]
        assert end_controls[0] == f"d_{d}"
        if o >= 0:
            assert end_controls[1] == f"o_{o}"
            assert end_controls[2] == f"y_{y}"
        checked += 1
    assert checked == len(result.mask_bars) > 0


def test_repair_adopts_trimmed_body_on_exact_close(vocab, tiny_engine):
    """An exactly-closing body with ONE dangling non-duration token
    returns ok=True (no retry needed, reference semantics) but the
    repair pass must still adopt the trimmed body — the reference assigns
    the returned list unconditionally (evaluation.py:1304)."""
    from smer_music_generation_tpu.codec.durations import duration_table_for_signature
    from smer_music_generation_tpu.infer.engine import check_track_total_time

    table = duration_table_for_signature((4, 4), tempo=60.0)
    ok, fixed = check_track_total_time(["rest", "whole", "p_60"], table)
    assert ok  # closes exactly: no regeneration retry
    assert fixed == ["rest", "whole"]  # dangling pitch trimmed

    # the full repair pass adopts the trim even though ok was True
    events = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
              "bar", "s_2", "track_0", "d_2", "o_2", "y_2",
              "rest", "whole", "p_60"]
    out = tiny_engine._repair_durations(events, table)
    assert out == events[:-1]


def test_correct_controls_degenerate_request(vocab, tiny_engine):
    """A request with zero spans (run_batch's padding dummies) returns
    None instead of raising while parsing the header."""
    import numpy as np

    from smer_music_generation_tpu.infer.engine import PreparedRequest

    dummy = PreparedRequest(
        src=np.zeros(4, np.int32),
        span_codes=[],
        mask_tracks=[],
        mask_bars=[],
        table=None,
        no_whole_duration=True,
    )
    assert tiny_engine.run_with_correct_controls(dummy, jax.random.PRNGKey(0)) is None


def test_shard_batch_warns_on_uneven_batch(vocab, tiny_engine):
    """A mesh-configured engine must warn (not silently degrade) when the
    batch cannot be dp-sharded (VERDICT r1 weak #5)."""
    from smer_music_generation_tpu.infer.engine import InfillEngine
    from smer_music_generation_tpu.parallel.mesh import make_mesh

    sharded = InfillEngine(
        tiny_engine.model, tiny_engine.params, vocab, nucleus_p=0.9,
        max_tgt_len=512, max_time_fix_attempts=1, mesh=make_mesh(8, tp=1),
    )
    with pytest.warns(UserWarning, match="not divisible by dp"):
        sharded._shard_batch(np.zeros((3, 16), np.int32))


@pytest.mark.parametrize("sig,mode", [((4, 4), 0), ((3, 4), 0), ((6, 8), 0),
                                      ((4, 4), 1), ((3, 4), 1)])
def test_engine_fuzz_signatures_and_modes(sig, mode):
    """Random scores x random mask configs through the full engine: every
    result must be encodable, well-formed and decodable to MIDI."""
    from smer_music_generation_tpu.codec.remi import remi_to_midi, smer_to_remi
    from smer_music_generation_tpu.infer.engine import InfillEngine
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
    from tests.test_smer_codec import make_score

    fuzz_vocab = WordVocab(mode, CONTROL_SETS[5])
    cfg = ModelConfig(
        vocab_size=fuzz_vocab.vocab_size, d_model=32, nhead=4,
        num_encoder_layers=1, num_decoder_layers=1, d_ff=64, max_len=2048,
        dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    engine = InfillEngine(model, params, fuzz_vocab, nucleus_p=0.9,
                          max_tgt_len=512, max_time_fix_attempts=1)

    rng = np.random.default_rng(sig[0] * 100 + mode)
    for trial in range(3):
        score = make_score(sig=sig, tracks=int(rng.integers(1, 3)),
                           bars=int(rng.integers(3, 8)), seed=int(rng.integers(1000)))
        enc = encode_midi(score, controls={"key": None},
                          track_names=[f"track_{i}" for i in range(len(score.instruments))])
        if enc is None:
            continue
        events, controls = enc
        if mode == 1:
            events = smer_to_remi(events)
        controls["bar_track"] = 0
        for i in range(len(score.instruments)):
            controls[f"track_{i}_c"] = controls[f"track_{i}"]
        events = change_controls(events, controls, fuzz_vocab)
        n_bars = events.count("bar")
        tracks = [int(rng.integers(0, len(score.instruments)))]
        # sometimes extend past the end of the song
        last = int(rng.integers(0, n_bars + 2))
        result = engine(events, tracks, [last], rng=jax.random.PRNGKey(trial))
        assert result is not None, (sig, mode, trial)
        out = result.events
        assert "m_0" not in out
        fuzz_vocab.encode(out)  # everything in-vocabulary
        decoded = (remi_to_midi if mode == 1 else events_to_midi)(out, 100.0)
        assert decoded is not None, (sig, mode, trial)


def test_engine_mesh_pads_batch_to_dp_multiple(vocab, mode2_events, tiny_engine):
    """With a mesh, run_batch pads B to a dp multiple so sharding engages
    (and mesh + quant is rejected with a clear error)."""
    from smer_music_generation_tpu.infer.engine import InfillEngine
    from smer_music_generation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, tp=1)
    with pytest.raises(ValueError, match="dp-sharded serving"):
        InfillEngine(tiny_engine.model, tiny_engine.params, vocab,
                     quant="int8", mesh=mesh)

    engine = InfillEngine(
        tiny_engine.model, tiny_engine.params, vocab, nucleus_p=0.9,
        max_tgt_len=512, max_time_fix_attempts=1, mesh=mesh,
    )
    seen = []
    orig = engine._dispatch

    def spy(src_b, span_types, n_spans, no_whole, rng):
        seen.append(int(src_b.shape[0]))
        return orig(src_b, span_types, n_spans, no_whole, rng)

    engine._dispatch = spy
    events, _ = mode2_events
    reqs = [engine.prepare(events, [0], [b]) for b in (1, 2, 3)]
    results = engine.run_batch(reqs, jax.random.PRNGKey(3))
    assert len(results) == 3 and all(r is not None for r in results)
    assert all(b % 8 == 0 for b in seen), seen


def test_repair_preserves_leading_only_stream(vocab, tiny_engine):
    """Corpus-layout streams carry leading copies only; _repair_durations
    must not mistake the last body tokens for end copies and truncate them
    (regression: every eval decode exhausted its retries and the repair
    rewrote correct bars)."""
    from smer_music_generation_tpu.codec.durations import duration_table_for_signature

    events = [
        "2/4", "t_3", "k_4", "d_1", "o_4", "y_0", "i_35",
        "bar", "s_2", "track_0", "d_1", "o_5", "y_0",
        "p_35", "quarter", "rest", "quarter",
        "bar", "s_0", "track_0", "d_0", "o_0", "y_0", "rest", "half",
    ]
    table = duration_table_for_signature((2, 4), tempo=60.0)
    out = tiny_engine._repair_durations(list(events), table)
    assert out == events

    req = tiny_engine.prepare(events, [0], [0, 1])
    assert tiny_engine._spans_close(events, req)


def test_body_bounds_both_layouts(vocab, tiny_engine, mode2_events):
    """_body_bounds detects end copies by token class: mode-2 streams strip
    the trailing (d,o,y)[+s] run, leading-only streams keep the full body."""
    from smer_music_generation_tpu.codec.structure import bar_with_track_positions

    events, _ = mode2_events
    _, _, bars = bar_with_track_positions(events)
    ts, te = bars[0][0]
    bs, be = tiny_engine._body_bounds(events, ts, te)
    body = events[bs:be]
    assert all(t[:2] not in ("d_", "o_", "y_") for t in body)
    # trailing copies were stripped (control-mode-2 fixture has them)
    assert events[be][:2] == "d_"


def test_span_retries_settles_groups_in_order(vocab, mode2_events, tiny_engine):
    """run_with_span_retries: per-group regeneration with teacher-forced
    settled prefix (reference evaluation.py:1300-1397).  With random weights
    and attempts=1 most groups exhaust and are accepted; per-span stats must
    cover every masked (bar, track) group and the stream stays well-formed."""
    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1, 2])
    res = tiny_engine.run_with_span_retries(req, jax.random.PRNGKey(7))
    assert res is not None
    assert res.time_corrections_per_span is not None
    assert len(res.time_corrections_per_span) == len(req.mask_bars)
    assert len(res.time_failed_per_span) == len(req.mask_bars)
    assert res.time_corrections == sum(res.time_corrections_per_span)
    assert "m_0" not in res.events
    assert res.events.count("bar") == events.count("bar")
    # repaired output closes every masked bar
    assert tiny_engine._spans_close(res.events, req)


def test_call_span_retries_flag(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    res = tiny_engine(events, [0], [3], jax.random.PRNGKey(9), span_retries=True)
    assert res is not None and res.time_corrections_per_span is not None


def test_correct_controls_time_retry_accounting(vocab, mode2_events, tiny_engine):
    """run_with_correct_controls runs inside the reference's
    check_total_time regeneration loop (evaluation.py:1300-1397): every
    masked (bar, track) group gets per-span time stats, retries are capped
    at max_time_fix_attempts, and the repaired stream closes every bar."""
    events, _ = mode2_events
    req = tiny_engine.prepare(events, [0], [1, 2])
    res = tiny_engine.run_with_correct_controls(req, jax.random.PRNGKey(13))
    assert res is not None
    n_groups = len(req.mask_bars)
    assert len(res.time_corrections_per_span) == n_groups
    assert len(res.time_failed_per_span) == n_groups
    assert res.time_corrections == sum(res.time_corrections_per_span)
    # retries are bounded by the per-group cap
    assert all(
        0 <= c <= tiny_engine.max_time_fix_attempts
        for c in res.time_corrections_per_span
    )
    # a group that closed without exhausting retries must not be failed
    for c, f in zip(res.time_corrections_per_span, res.time_failed_per_span):
        if f:
            assert c == tiny_engine.max_time_fix_attempts
    assert "m_0" not in res.events
    assert res.events.count("bar") == events.count("bar")
    assert tiny_engine._spans_close(res.events, req)


# ----------------------------------------------------------------------
# speculative decode (draft_k > 0): prompt-lookup draft + one-pass verify


def _spec_setup(vocab, seed=0):
    from smer_music_generation_tpu.infer.decode import InfillDecoder, pad_to_bucket
    from smer_music_generation_tpu.models.transformer import (
        ModelConfig, ScoreTransformer,
    )

    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=2, d_ff=64, max_len=2048, dropout=0.0,
        pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init({"params": jax.random.PRNGKey(seed)},
                        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    src_tokens = ["4/4", "t_3", "k_0", "d_2", "o_2", "y_2", "i_0",
                  "bar", "s_2", "track_0", "d_2", "o_2", "y_2", "m_0",
                  "m_0", "m_0", "m_0", "m_0"]
    src = np.array([[vocab.char2index(t) for t in src_tokens]], np.int32)
    src = pad_to_bucket(src, bucket=256)
    span_types = np.zeros((1, 256), np.int32)
    span_types[0, :5] = [0, 1, 2, 3, 4]
    n_spans = np.asarray([5], np.int32)
    return InfillDecoder, model, params, src, span_types, n_spans


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_decode_greedy_bit_exact(vocab, seed):
    """draft_k>0 under greedy must reproduce the baseline loop's output
    stream bit-for-bit (same argmax chain, only the verify granularity
    changes)."""
    InfillDecoder, model, params, src, span_types, n_spans = _spec_setup(
        vocab, seed
    )
    base = InfillDecoder(model, vocab, max_tgt_len=256, greedy=True,
                         fused=False)
    spec = InfillDecoder(model, vocab, max_tgt_len=256, greedy=True,
                         fused=False, draft_k=6)
    rb = base(params, src, span_types, n_spans, False, jax.random.PRNGKey(seed))
    rs = spec(params, src, span_types, n_spans, False, jax.random.PRNGKey(seed))
    Lb, Ls = int(rb.lengths[0]), int(rs.lengths[0])
    assert Lb == Ls
    np.testing.assert_array_equal(
        np.asarray(rb.tokens[0, :Lb]), np.asarray(rs.tokens[0, :Ls])
    )


@pytest.mark.parametrize("seed", [3, 4])
def test_spec_decode_nucleus_grammar_legal(vocab, seed):
    """Nucleus spec decode: streams stay grammar-legal with the exact
    span structure (the per-slot scan replays the baseline bookkeeping)."""
    InfillDecoder, model, params, src, span_types, n_spans = _spec_setup(
        vocab, seed
    )
    dec = InfillDecoder(model, vocab, max_tgt_len=256, nucleus_p=0.9,
                        fused=False, draft_k=6)
    r = dec(params, src, span_types, n_spans, False,
            jax.random.PRNGKey(100 + seed))
    toks = [vocab.index2char(int(x))
            for x in np.asarray(r.tokens)[0, : int(r.lengths[0])]]
    t = GrammarTables.build(vocab)
    banned = np.asarray(t.always_banned).copy()
    banned[vocab.mask_index] = False
    spans, cur = [], None
    for tk in toks:
        if tk == "m_0":
            cur = []
            spans.append(cur)
        else:
            assert cur is not None
            assert not banned[vocab.char2index(tk)], tk
            cur.append(tk)
    assert len(spans) == 5
    assert spans[1] and spans[1][0].startswith("d_") and len(spans[1]) == 1
    assert spans[4] and spans[4][0].startswith("s_") and len(spans[4]) == 1


def test_spec_accept_resample_distribution():
    """The delta-draft accept/resample step must emit the masked-nucleus
    distribution EXACTLY (speculative-sampling guarantee): empirical
    histogram over many independent (u, gumbel) draws matches the
    baseline sampler's histogram within Monte-Carlo error."""
    from smer_music_generation_tpu.infer.sampling import (
        masked_sample_gumbel,
        spec_accept_resample,
    )

    V = 24
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 2.0, (1, V)), jnp.float32)
    allowed = jnp.asarray(rng.random((1, V)) < 0.6)
    allowed = allowed.at[0, 3].set(True)  # nonempty support
    N = 30000
    key = jax.random.PRNGKey(11)
    gk, uk = jax.random.split(key)
    gumbel = jax.random.gumbel(gk, (N, V), dtype=jnp.float32)
    unif = jax.random.uniform(uk, (N,), dtype=jnp.float32)

    for draft_tok, p in ((3, 0.9), (5, None), (0, 0.7)):
        draft = jnp.full((N,), draft_tok, jnp.int32)
        base = jax.vmap(
            lambda g: masked_sample_gumbel(g[None], logits, allowed, p, 1.0)[0]
        )(gumbel)
        spec = jax.vmap(
            lambda g, u, d: spec_accept_resample(
                u[None], g[None], logits, allowed, d[None], p, 1.0
            )[0][0]
        )(gumbel, unif, draft)
        hb = np.bincount(np.asarray(base), minlength=V) / N
        hs = np.bincount(np.asarray(spec), minlength=V) / N
        tv = 0.5 * np.abs(hb - hs).sum()
        assert tv < 0.025, (draft_tok, p, tv)
        # banned tokens never emitted
        assert hs[~np.asarray(allowed[0])].sum() == 0


def test_engine_with_draft_k_well_formed(vocab, mode2_events):
    """Engine-level spec decode: the full infill path (mask -> spec decode
    -> restore) stays well-formed with draft_k set."""
    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    engine = InfillEngine(
        model, params, vocab, nucleus_p=0.9, max_tgt_len=512,
        max_time_fix_attempts=0, draft_k=6,
    )
    events, _ = mode2_events
    res = engine(events, [0], [1, 2], jax.random.PRNGKey(4))
    assert res is not None
    assert res.decode_steps > 0
    # restored stream keeps the window structure: same bar count
    n_bars_in = sum(1 for t in events if t == "bar")
    n_bars_out = sum(1 for t in res.events if t == "bar")
    assert n_bars_in == n_bars_out
