"""Hypothesis fuzzing of the SMER codec on NON-grid-aligned input.

The seeded property tests (test_smer_codec.py) generate 16th-grid-aligned
scores; real MIDI is not aligned, and the codec's gridding / chord
grouping / tie emission must still produce a grammar-valid stream whose
canonicalized form is a fixed point (the reference's own acceptance gate:
write the decoded MIDI and re-tokenize, ``preprocessing.py:1351-1369``).
Generators draw free-floating note times, overlapping notes, extreme
pitches (the codec clamps to 21-108), random tempi and all four accepted
signatures.  ``derandomize=True`` keeps CI deterministic.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from smer_music_generation_tpu.codec.midi import (
    Instrument,
    MidiScore,
    Note,
    TimeSignature,
)
from smer_music_generation_tpu.codec.smer import (
    CORPUS_VELOCITIES,
    events_to_midi,
    midi_to_events,
    midi_to_events_window,
)

SIGS = [(4, 4), (3, 4), (2, 4), (6, 8)]


@st.composite
def scores(draw, max_tracks=3):
    tempo = draw(st.floats(min_value=40.0, max_value=220.0))
    sig = draw(st.sampled_from(SIGS))
    n_tracks = draw(st.integers(1, max_tracks))
    quarter = 60.0 / tempo
    bar_dur = sig[0] * quarter if sig[1] == 4 else sig[0] * quarter / 2
    horizon = bar_dur * draw(st.integers(2, 6))
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(sig[0], sig[1], 0.0)]
    for t in range(n_tracks):
        inst = Instrument(program=draw(st.integers(0, 127)))
        n_notes = draw(st.integers(1, 24))
        for _ in range(n_notes):
            start = draw(st.floats(min_value=0.0, max_value=horizon * 0.95))
            dur = draw(st.floats(min_value=1e-4, max_value=bar_dur * 2))
            pitch = draw(st.integers(0, 127))
            vel = draw(st.integers(1, 127))
            inst.notes.append(Note(vel, pitch, start, min(start + dur, horizon * 2)))
        inst.notes.sort(key=lambda n: n.start)
        s.instruments.append(inst)
    return s, sig


def _body_tokens(events):
    """Tokens after the first 'bar' (the per-bar stream the grammar owns)."""
    try:
        i = events.index("bar")
    except ValueError:
        return []
    return events[i:]


def _assert_stream_sane(events):
    for tok in _body_tokens(events):
        assert isinstance(tok, str)
        # pitch tokens must be within the clamped range
        if tok.startswith("p_"):
            assert 21 <= int(tok[2:]) <= 108, tok


@settings(max_examples=60, deadline=None, derandomize=True)
@given(scores())
def test_corpus_tokenizer_total_and_canonical(sc):
    """midi_to_events never raises; when it accepts a score, decoding and
    re-tokenizing reaches a fixed point within one canonicalization."""
    score, _ = sc
    res = midi_to_events(score)
    if res is None:  # rejected (e.g. all notes gridded away) — acceptable
        return
    events, _ = res
    _assert_stream_sane(events)
    tempo = float(events[1])
    decoded = events_to_midi(events, tempo, velocities=CORPUS_VELOCITIES)
    assert decoded is not None
    res2 = midi_to_events(decoded)
    if res2 is None:
        # The re-tokenize pass may FILTER the decoded score — e.g. a very
        # sparse input grids down to 0-1 notes per track and the empty-track
        # filter (reference ``preprocessing.remove_empty_track``, occupation
        # < 0.3) drops everything.  The reference's bulk loop skips such
        # files (``preprocessing.py:1359-1369``); rejection is acceptable,
        # crashing or emitting an invalid stream is not.
        return
    events2, _ = res2
    decoded2 = events_to_midi(events2, tempo, velocities=CORPUS_VELOCITIES)
    res3 = midi_to_events(decoded2)
    assert res3 is not None, "an accepted canonical form must stay accepted"
    assert res3[0] == events2, "second pass must be a fixed point"


@settings(max_examples=60, deadline=None, derandomize=True)
@given(scores())
def test_window_tokenizer_total_and_canonical(sc):
    """The 16-bar serving window: same totality + fixed-point contract,
    plus the pad-to-16-bars invariant."""
    score, _ = sc
    track_names = [f"track_{i}" for i in range(len(score.instruments))]
    res = midi_to_events_window(score, track_names)
    if res is None:
        return
    events, _, tempo = res
    assert events.count("bar") == 16
    _assert_stream_sane(events)
    decoded = events_to_midi(events, tempo)
    assert decoded is not None
    res2 = midi_to_events_window(decoded, track_names)
    assert res2 is not None
    events2, _, _ = res2
    decoded2 = events_to_midi(events2, tempo)
    res3 = midi_to_events_window(decoded2, track_names)
    assert res3 is not None
    assert res3[0] == events2, "second pass must be a fixed point"


@settings(max_examples=40, deadline=None, derandomize=True)
@given(scores(max_tracks=2), st.integers(0, 2**31 - 1))
def test_note_roundtrip_preserves_grid_content(sc, seed):
    """Decoded MIDI must contain only notes on the 16th grid with positive
    length — the codec's output contract regardless of input alignment.
    Checked for /4 signatures (the 6/8 duration table emits triplet-family
    subdivisions of the dotted-quarter beat, a finer grid)."""
    score, sig = sc
    if sig[1] != 4:
        return
    res = midi_to_events(score)
    if res is None:
        return
    events, _ = res
    tempo = float(events[1])
    decoded = events_to_midi(events, tempo, velocities=CORPUS_VELOCITIES)
    sixteenth = (60.0 / tempo) / 4
    for inst in decoded.instruments:
        for n in inst.notes:
            assert n.end > n.start
            frac = (n.start / sixteenth) % 1.0
            assert min(frac, 1.0 - frac) < 1e-4, (n.start, sixteenth)
