"""Controllability harness tests (tiny random model: flow + metrics math)."""

import jax
import numpy as np
import pytest

from smer_music_generation_tpu.eval.controllability import (
    ControllabilityEvaluator,
    apply_unk_mode,
    recompute_bar_tension,
    recompute_bar_track_control,
    recompute_track_controls,
    select_window_indices,
)
from smer_music_generation_tpu.codec.structure import bar_with_track_positions
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
from tests.test_infer import mode2_events, tiny_engine, vocab  # fixtures


def test_recompute_track_controls_matches_annotation(vocab, mode2_events):
    events, controls = mode2_events
    achieved = recompute_track_controls(events)
    assert achieved is not None
    # the annotation pipeline computed these same controls at encode time
    assert achieved["density"][0] == controls["track_0"]["density"]
    assert achieved["occupation"][0] == controls["track_0"]["occupation"]
    assert achieved["polyphony"][0] == controls["track_0"]["polyphony"]


def test_recompute_bar_track_control(vocab, mode2_events):
    events, controls = mode2_events
    _, _, bars = bar_with_track_positions(events)
    track_start, track_end = bars[0][0]
    body = events[track_start + 3 : track_end - 3]
    headers = [events[0], events[1], "i_0"]
    d, o, y = recompute_bar_track_control(body, headers)
    assert d == controls["bar_density"]["track_0"][0]
    assert 0 <= o <= 9 and 0 <= y <= 9


def test_recompute_bar_tension(vocab, mode2_events):
    events, controls = mode2_events
    _, bar_poses, _ = bar_with_track_positions(events)
    lo, hi = bar_poses[0], bar_poses[1]
    headers = [events[0], events[1], "i_0", "i_32"]
    t = recompute_bar_tension(events[lo + 1 : hi], headers)
    assert t is not None and 0 <= t <= 11


def _doy_tokens(vocab):
    s = set()
    for kind in ("density", "occupation", "polyphony"):
        s.update(vocab.name_to_tokens.get(kind, []))
    return s


def test_apply_unk_mode_all_unk(vocab, mode2_events):
    """Mode 3 (all_unk): every d/o/y token from the first bar on is blanked;
    tension tokens survive (reference evaluation.py:1959-1962)."""
    events, _ = mode2_events
    out = apply_unk_mode(list(events), vocab, 3)
    _, bar_poses, _ = bar_with_track_positions(out)
    doy = _doy_tokens(vocab)
    assert all(t not in doy for t in out[bar_poses[0] :])
    # bar tension tokens are NOT blanked
    assert any(out[bp + 1].startswith("s_") for bp in bar_poses)
    # header (pre-bar) track controls survive
    assert any(t in doy for t in out[: bar_poses[0]])


def test_apply_unk_mode_bar_unk_tracks(vocab, mode2_events):
    """Mode 2 with mask_tracks: only the masked track's bar-track controls
    are blanked (reference evaluation.py:2190-2195)."""
    events, _ = mode2_events
    out = apply_unk_mode(list(events), vocab, 2, mask_tracks=[1])
    _, _, bars = bar_with_track_positions(out)
    t0_start = bars[0][0][0]
    t1_start = bars[0][1][0]
    assert out[t0_start].startswith("d_")  # unmasked track kept
    assert out[t1_start] == "unk"  # masked track blanked


def test_apply_unk_mode_bar_unk_bars(vocab, mode2_events):
    """Mode 2 with mask_bars (tensile run): every track's controls within
    the masked bars only (reference evaluation.py:2083-2095)."""
    events, _ = mode2_events
    out = apply_unk_mode(list(events), vocab, 2, mask_bars=[0])
    _, _, bars = bar_with_track_positions(out)
    assert out[bars[0][0][0]] == "unk" and out[bars[0][1][0]] == "unk"
    if len(bars) > 1:
        assert out[bars[1][0][0]].startswith("d_")


def test_apply_unk_mode_one_unk(vocab, mode2_events):
    """Mode 1 (one_unk): only the selected kind's copies on the masked
    track (reference evaluation.py:2197-2210)."""
    events, _ = mode2_events
    out = apply_unk_mode(
        list(events), vocab, 1, mask_tracks=[0], selected_kind="density"
    )
    _, _, bars = bar_with_track_positions(out)
    t0_start, _ = bars[0][0]
    assert out[t0_start] == "unk"  # density copy blanked
    assert out[t0_start + 1].startswith("o_")  # occupation kept
    assert out[bars[0][1][0]].startswith("d_")  # other track untouched


def test_recompute_track_controls_remi_stream(vocab, mode2_events):
    """Mode-1 streams dispatch to the REMI decoder (reference
    evaluation.py:2261-2293 rest_multi branch)."""
    from smer_music_generation_tpu.codec.remi import smer_to_remi

    events, _ = mode2_events
    remi = smer_to_remi(list(events))
    achieved = recompute_track_controls(remi)
    smer_achieved = recompute_track_controls(events)
    assert achieved is not None and smer_achieved is not None
    # REMI decode yields the same notes as SMER decode, so score-derived
    # controls agree exactly; token-derived density can shift by at most one
    # category where continue-ties merged into single extended durations.
    assert list(achieved["occupation"]) == list(smer_achieved["occupation"])
    assert list(achieved["polyphony"]) == list(smer_achieved["polyphony"])
    assert all(
        abs(int(a) - int(b)) <= 1
        for a, b in zip(achieved["density"], smer_achieved["density"])
    )


def test_recompute_bar_metrics_remi(vocab, mode2_events):
    from smer_music_generation_tpu.codec.remi import smer_to_remi

    events, _ = mode2_events
    remi = smer_to_remi(list(events))
    _, _, bars = bar_with_track_positions(remi)
    track_start, track_end = bars[0][0]
    body = remi[track_start + 3 : track_end - 3]
    headers = [remi[0], remi[1], "i_0"]
    d, o, y = recompute_bar_track_control(body, headers)
    assert 0 <= d <= 9 and 0 <= o <= 9 and 0 <= y <= 9

    _, bar_poses, _ = bar_with_track_positions(remi)
    lo, hi = bar_poses[0], bar_poses[1]
    t_headers = [remi[0], remi[1], "i_0", "i_32"]
    t = recompute_bar_tension(remi[lo + 1 : hi], t_headers)
    assert t is not None and 0 <= t <= 11
    # same notes -> same tensile category as the SMER slice of the same bar
    _, smer_bar_poses, _ = bar_with_track_positions(list(events))
    smer_t = recompute_bar_tension(
        events[smer_bar_poses[0] + 1 : smer_bar_poses[1]], t_headers
    )
    assert t == smer_t


def test_bar_track_parts(vocab, mode2_events):
    from smer_music_generation_tpu.eval.controllability import _bar_track_parts

    events, _ = mode2_events
    _, _, bars = bar_with_track_positions(events)
    lead, body, trail, s_tok = _bar_track_parts(events, bars[0], 0)
    assert [t[:2] for t in lead] == ["d_", "o_", "y_"]
    assert trail is not None and [t[:2] for t in trail] == ["d_", "o_", "y_"]
    assert s_tok is None  # track 0 is not the bar's last track
    assert all(t[:2] not in ("d_", "o_", "y_") for t in body)
    _, _, trail1, s_tok1 = _bar_track_parts(events, bars[0], 1)
    assert trail1 is not None
    assert s_tok1 is not None and s_tok1.startswith("s_")


def test_bar_track_parts_empty_body_mode1():
    """A control-mode-1 track with an empty body is exactly K lead tokens;
    the trail heuristic must NOT re-read the leads as at-end predictions."""
    from smer_music_generation_tpu.eval.controllability import _bar_track_parts

    events = ["4/4", "t_2", "k_0", "d_0", "o_0", "y_0", "i_0", "i_1",
              "bar", "s_0",
              "track_0", "d_1", "o_1", "y_1",           # empty body, no copies
              "track_1", "d_2", "o_2", "y_2", "p_60", "whole"]
    bars = [[(11, 14), (15, 20)]]  # (start-after-name, end) per track
    lead, body, trail, s_tok = _bar_track_parts(events, bars[0], 0)
    assert lead == ["d_1", "o_1", "y_1"]
    assert body == [] and trail is None and s_tok is None


def test_evaluator_track_secondary_families(vocab, mode2_events, tiny_engine):
    """Track runs report the reference's extra diff families
    (evaluation.py:2546-2813) and time-repair stats (:1319-1328)."""
    events, _ = mode2_events
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    res = ev.evaluate_track_control(events, 0, "density", 4, jax.random.PRNGKey(5))
    # span-retry engine path: one entry per masked (bar, track) group
    assert len(ev.time_correct_list) >= 1
    assert len(ev.time_correct_list) == len(ev.failed_times_list)
    if res.diffs:
        other = res.secondary.get("changed_track_other", {})
        assert set(other) == {"occupation", "polyphony"}
        # control-mode-2 stream: at-end copies exist, so predicted families
        # are populated for at least one bar
        fams = set(res.secondary)
        assert fams & {
            "target_predicted_calculated",
            "target_original_calculated",
            "other_original_calculated",
        }
        s = res.summary()
        fam = next(iter(res.secondary))
        kind = next(iter(res.secondary[fam]))
        assert s["secondary"][fam][kind]["n"] == len(res.secondary[fam][kind])


def test_evaluator_tensile_secondary_families(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    res = ev.evaluate_tensile(events, [1], [5], jax.random.PRNGKey(3))
    # one masked bar x two tracks -> two span groups
    assert len(ev.time_correct_list) == 2
    if res.diffs:
        assert set(res.secondary) & {
            "bar_track_calculated_original",
            "bar_track_predicted_calculated",
            "tension_predicted_calculated",
        }


def test_truncated_trailing_bar_is_failure_not_crash(vocab, mode2_events, tiny_engine):
    """A window cut right after a trailing 'bar' token (token-budget
    truncation): the bar-TOKEN count includes a bar with no content.
    Selecting it used to read past the stream end
    (``events[bar_poses[b] + 1]`` -> IndexError) or measure
    |set-achieved| against content the engine never regenerated; it must
    count as a failure directly and never be selected by the sweep."""
    events, _ = mode2_events
    truncated = list(events) + ["bar"]
    phantom = sum(1 for e in truncated if e == "bar") - 1
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    r = ev.evaluate_tensile(truncated, [phantom], [5], jax.random.PRNGKey(0))
    assert r.failures == 1 and r.diffs == []
    # the sweep draws mutation bars from COMPLETE bars only
    out = ev.run([truncated], control_kinds=("tensile",), max_windows=1, seed=0)
    assert out["tensile"]["n"] + out["tensile"]["failures"] >= 1


def test_run_skips_window_with_zero_complete_bars(vocab, mode2_events, tiny_engine):
    """A window truncated inside its FIRST bar has zero complete bars;
    the sweep used to crash on ``py_rng.integers(1, 1)`` (review finding)
    instead of skipping the window for every control kind."""
    events, _ = mode2_events
    first_bar = list(events).index("bar")
    degenerate = list(events)[: first_bar + 1]  # headers + a lone 'bar'
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    out = ev.run(
        [degenerate], control_kinds=("tensile", "density"), max_windows=1, seed=0
    )
    assert out["tensile"]["n"] == 0 and out["tensile"]["failures"] == 0
    assert out["density"]["n"] == 0 and out["density"]["failures"] == 0


def test_run_reports_time_stats(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    out = ev.run([events], control_kinds=("density",), max_windows=1)
    assert "time_stats" in out
    ts = out["time_stats"]
    assert len(ts["time_correct_list"]) == len(ts["failed_times_list"])


def test_evaluator_tensile_flow(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    res = ev.evaluate_tensile(events, [1], [5], jax.random.PRNGKey(3))
    assert res.failures + len(res.diffs) == 1
    for d in res.diffs:
        assert 0 <= d <= 11


def test_evaluator_track_control_flow(vocab, mode2_events, tiny_engine):
    events, _ = mode2_events
    ev = ControllabilityEvaluator(tiny_engine, vocab)
    res = ev.evaluate_track_control(events, 0, "density", 4, jax.random.PRNGKey(5))
    assert res.failures + len(res.diffs) == 1
    summary = res.summary()
    assert summary["control"] == "density"


def test_apply_unk_mode_trailing_copies(vocab, mode2_events):
    """At-end copies: modes 1/2 blank leading copies only (reference blanks
    range(track_start, track_start+total+1), evaluation.py:2190-2214); mode 3
    blanks every d/o/y token including the trailing copies (:1959-1962)."""
    from smer_music_generation_tpu.eval.controllability import _bar_track_parts

    events, _ = mode2_events
    _, _, bars = bar_with_track_positions(events)

    out2 = apply_unk_mode(list(events), vocab, 2, mask_tracks=[0])
    _, _, bars2 = bar_with_track_positions(out2)
    lead, _, trail, _ = _bar_track_parts(out2, bars2[0], 0)
    assert lead == ["unk"] * 3
    assert trail is not None and trail[0].startswith("d_")  # trailing kept

    out3 = apply_unk_mode(list(events), vocab, 3)
    _, _, bars3 = bar_with_track_positions(out3)
    lead3, _, trail3, _ = _bar_track_parts(out3, bars3[0], 0)
    assert lead3 == ["unk"] * 3 and trail3 == ["unk"] * 3


def test_apply_unk_mode_truncated_final_track(vocab, mode2_events):
    """A window truncated mid-track (common for REMI streams cut at the
    token budget) must not index past the stream: modes 1/2 blank only the
    control tokens actually present in the short track slice."""
    events, _ = mode2_events
    _, _, bars = bar_with_track_positions(events)
    last_start, _ = bars[-1][-1]
    cut = list(events[: last_start + 1])  # 1-token body < control head

    out2 = apply_unk_mode(list(cut), vocab, 2, mask_tracks=[0, 1])
    assert len(out2) == len(cut)
    assert out2[last_start] == "unk"  # the one present copy is blanked

    out1 = apply_unk_mode(
        list(cut), vocab, 1, mask_tracks=[0, 1], selected_kind="density"
    )
    assert len(out1) == len(cut)
    assert out1[last_start] == "unk"


def test_apply_unk_mode_partial_final_bar(vocab, mode2_events):
    """A window cut before the final bar's last track token: that bar is
    absent from bar_with_track_positions' complete-group list, but the
    ablation must still blank its present control heads (otherwise the
    model conditions on controls the ablation claims were removed)."""
    events, _ = mode2_events
    _, bar_poses, bars = bar_with_track_positions(events)
    # cut inside the last bar's FIRST track body: track_1's token is gone
    t0_start, t0_end = bars[-1][0]
    cut = list(events[: t0_start + 4])  # full 3-token head + 1 body token
    last_bar_i = sum(1 for t in cut if t == "bar") - 1

    out2 = apply_unk_mode(list(cut), vocab, 2, mask_bars=[last_bar_i])
    assert out2[t0_start : t0_start + 3] == ["unk"] * 3

    out2t = apply_unk_mode(list(cut), vocab, 2, mask_tracks=[0])
    assert out2t[t0_start : t0_start + 3] == ["unk"] * 3

    out1 = apply_unk_mode(
        list(cut), vocab, 1, mask_tracks=[0], selected_kind="density"
    )
    assert out1[t0_start] == "unk" and out1[t0_start + 1].startswith("o_")


def test_apply_unk_mode_empty_body_keeps_trail_copies():
    """Mode 1/2 blank exactly the 3-token leading head: on an empty-body
    control-mode-2 track the first trailing copy starts immediately after
    the head and must survive (the old +1 range ate it)."""
    voc = WordVocab(0, CONTROL_SETS[5])
    ev = ["2/4", "t_0", "k_0", "d_1", "o_1", "y_1", "i_0",
          "bar", "s_5", "track_0",
          "d_1", "o_1", "y_1",          # leading head
          "d_2", "o_2", "y_2", "s_5"]   # trailing copies + at-end tensile
    out = apply_unk_mode(list(ev), voc, 2, mask_tracks=[0])
    assert out[10:13] == ["unk"] * 3
    assert out[13:17] == ["d_2", "o_2", "y_2", "s_5"]  # trail untouched


def test_bar_track_parts_corrupted_end_tensile(vocab, mode2_events):
    """An 'unk' written into the at-end tensile slot must still be parsed
    as the tensile position so the trailing copies are recognised (same
    detection as the engine's _body_bounds)."""
    from smer_music_generation_tpu.eval.controllability import _bar_track_parts

    events, _ = mode2_events
    _, _, bars = bar_with_track_positions(events)
    last_tr = len(bars[0]) - 1
    _, end = bars[0][last_tr]
    ev = list(events)
    assert ev[end - 1].startswith("s_")
    ev[end - 1] = "unk"
    lead, body, trail, s_tok = _bar_track_parts(ev, bars[0], last_tr)
    ref_lead, ref_body, ref_trail, _ = _bar_track_parts(events, bars[0], last_tr)
    assert body == ref_body and trail == ref_trail and lead == ref_lead


def test_evaluate_tensile_skips_unsubstituted_bars(vocab, mode2_events):
    """Streams with no s_ slot must not contribute |set-achieved| tensile
    diffs for values that were never written into the stream."""
    events, _ = mode2_events
    stripped = [t for t in events if not t.startswith("s_")]
    ev = ControllabilityEvaluator(None, vocab)  # engine must not be reached
    res = ev.evaluate_tensile(stripped, [0, 1], [5, 7], jax.random.PRNGKey(0))
    assert res.diffs == [] and res.failures == 2


def test_masking_rejects_partial_control_streams(vocab, mode2_events):
    """A stream stripped to one control family (what eval prep does for a
    -t 2 model) lacks the 3-copy head the serving layout hardcodes; the
    masker must raise instead of silently slicing body tokens as copies."""
    from smer_music_generation_tpu.infer.engine import mask_bar_and_track

    events, _ = mode2_events
    density_only = [
        t for t in events
        if not (t[:2] in ("o_", "y_") and t[2:].isdigit())
        and not t.startswith("s_")
    ]
    with pytest.raises(ValueError, match="3-copy"):
        mask_bar_and_track(density_only, vocab, [0], [0])


def test_unk_modes_2_and_3_differ_on_multitrack(vocab, mode2_events):
    """bar_unk blanks only the masked track's copies; all_unk blanks every
    track's.  On a multi-track window the two must produce different
    streams (they coincide only for single-track windows)."""
    events, _ = mode2_events
    e2 = apply_unk_mode(list(events), vocab, 2, mask_tracks=[0])
    e3 = apply_unk_mode(list(events), vocab, 3, mask_tracks=[0])
    assert e2 != e3
    # every extra mode-3 blank is a d/o/y control copy mode 2 left intact
    # (the unmasked track's copies, plus the masked track's trailing ones)
    extra = {i for i, (a, b) in enumerate(zip(e2, e3)) if a != b}
    assert extra
    assert all(e3[i] == "unk" and e2[i][:2] in ("d_", "o_", "y_") for i in extra)


def test_select_window_indices_not_a_prefix():
    """The eval subset must be a seeded random draw, not the first N:
    packed batches order short (single-track) windows first, so a prefix
    measures only the easiest windows (and makes unk modes 2/3 coincide)."""
    rng = np.random.default_rng(5)
    idx = select_window_indices(700, 48, rng)
    assert len(idx) == 48 and len(set(idx)) == 48
    assert idx == sorted(idx)
    assert idx != list(range(48))  # not the prefix
    assert max(idx) > 96  # reaches into the longer windows
    # deterministic for a given seed
    assert idx == select_window_indices(700, 48, np.random.default_rng(5))


def test_eval_cli_end_to_end(tmp_path):
    """eval_cli.main on a tiny random-weight model over one stored window:
    config load, control-family stripping, mode-2 end-copy insertion, all
    four control-axis decodes, and the output JSON schema.
    ``--max_time_fix_attempts 0`` = one decode per (window, kind)."""
    import json

    from smer_music_generation_tpu.data.pack import save_batches
    from smer_music_generation_tpu.eval import eval_cli
    from smer_music_generation_tpu.utils.config import ExperimentConfig
    from tests.test_annotate import make_two_track_score
    from smer_music_generation_tpu.codec.annotate import encode_midi

    score = make_two_track_score()
    # leading-copies-only stream, the stored-window format the CLI loads
    events, _ = encode_midi(
        score, controls={"key": None}, track_names=["track_0", "track_1"]
    )
    window = [str(t) for t in events]
    prefix = str(tmp_path / "tiny_test")
    save_batches([[window]], {len(window): [0]}, prefix)

    cfg = ExperimentConfig(d_model=32, nhead=4, num_layers=1, d_ff=64)
    cfg_path = str(tmp_path / "config.json")
    cfg.save(cfg_path)

    out = str(tmp_path / "eval.json")
    rc = eval_cli.main([
        "--config", cfg_path, "--test_batches", prefix,
        "--max_windows", "1", "--seed", "0", "--output", out,
        "--max_time_fix_attempts", "0",
    ])
    assert rc == 0
    with open(out) as f:
        results = json.load(f)
    assert "time_stats" in results
    kinds = [k for k in ("tensile", "density", "occupation", "polyphony")
             if k in results]
    assert set(kinds) == {"tensile", "density", "occupation", "polyphony"}
    assert any(results[k]["n"] >= 1 for k in kinds)
    for k in kinds:
        if results[k]["n"]:
            assert results[k]["mean_abs_diff"] >= 0
