"""SMER <-> REMI conversion property tests: the REMI decode of a converted
stream must equal the SMER decode note-for-note (SURVEY.md §7 hard parts)."""

import numpy as np
import pytest

from smer_music_generation_tpu.codec.annotate import encode_midi
from smer_music_generation_tpu.codec.midi import Instrument, MidiScore, Note, TimeSignature
from smer_music_generation_tpu.codec.remi import (
    remi_to_midi,
    remove_first_continue,
    smer_to_remi,
)
from smer_music_generation_tpu.codec.smer import (
    CORPUS_VELOCITIES,
    events_to_midi,
    midi_to_events_window,
)
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
from tests.test_annotate import make_two_track_score
from tests.test_smer_codec import make_score


def note_set(score):
    out = []
    for i, inst in enumerate(score.instruments):
        for n in inst.notes:
            out.append((i, n.pitch, round(n.start, 4), round(n.end, 4)))
    return sorted(out)


@pytest.mark.parametrize("tracks", [1, 2, 3])
def test_remi_roundtrip_equals_smer_decode(tracks):
    score = make_score(sig=(4, 4), tracks=tracks, bars=5, seed=23 + tracks)
    events, _, tempo = midi_to_events_window(score, [f"track_{i}" for i in range(tracks)])
    remi = smer_to_remi(events)
    # token validity in mode-1 vocabulary
    vocab = WordVocab(1, CONTROL_SETS[5])
    for tok in remi:
        if tok not in ("rest", "sep", "continue") and not tok.replace(".", "").isdigit():
            vocab.char2index(tok)
    smer_midi = events_to_midi(events, tempo, velocities=CORPUS_VELOCITIES)
    remi_midi = remi_to_midi(remi, tempo)
    assert note_set(remi_midi) == note_set(smer_midi)


def test_remi_with_cross_bar_tie():
    tempo = 120.0
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(4, 4, 0.0)]
    inst = Instrument(program=0)
    q = 60.0 / tempo
    # tie from bar 1 beat 3 into bar 2, with a new onset in bar 2
    inst.notes = [
        Note(100, 60, 2 * q, 6 * q),
        Note(100, 72, 5 * q, 6 * q),
    ]
    s.instruments.append(inst)
    events, _, _ = midi_to_events_window(s, ["track_0"])
    remi = smer_to_remi(events)
    assert "continue" not in remi
    # the tied note must appear once, with its full 4-beat duration (16
    # sixteenths) attached in bar 1
    assert "n_16" in remi
    smer_midi = events_to_midi(events, tempo, velocities=CORPUS_VELOCITIES)
    remi_midi = remi_to_midi(remi, tempo)
    assert note_set(remi_midi) == note_set(smer_midi)


def test_remi_preserves_controls():
    score = make_two_track_score()
    events, _ = encode_midi(score, controls={"key": None}, track_names=["track_0", "track_1"])
    remi = smer_to_remi(events)
    assert remi[2].startswith("k_")
    assert sum(1 for t in remi if t.startswith("s_")) == sum(
        1 for t in events if t.startswith("s_")
    )
    assert remi.count("bar") == 16
    # mode-1 vocab can encode the whole stream
    vocab = WordVocab(1, CONTROL_SETS[5])
    vocab.encode(remi)


def test_remove_first_continue():
    ev = ["4/4", "100", "i_0", "bar", "track_0", "continue", "p_60", "half",
          "bar", "track_0", "continue", "p_60", "half"]
    out = remove_first_continue(ev)
    assert out.count("continue") == 1
    assert out[9] == "continue"  # the second-bar continue survives
