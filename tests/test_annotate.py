"""Serving encode pipeline tests: control insertion + all_controls dict."""

import numpy as np
import pytest

from smer_music_generation_tpu.codec.annotate import encode_midi, tempo_to_token
from smer_music_generation_tpu.codec.midi import (
    Instrument,
    MidiScore,
    Note,
    TimeSignature,
)
from smer_music_generation_tpu.codec.structure import bar_with_track_positions
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab


def make_two_track_score(tempo=100.0, bars=6, seed=42):
    rng = np.random.default_rng(seed)
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(4, 4, 0.0)]
    q = 60.0 / tempo
    melody = Instrument(program=0)
    bass = Instrument(program=32)
    scale = [60, 62, 64, 65, 67, 69, 71, 72]
    for bar in range(bars):
        for beat in range(4):
            t = (bar * 4 + beat) * q
            melody.notes.append(Note(100, int(rng.choice(scale)), t, t + q))
        t = bar * 4 * q
        root = int(rng.choice([48, 43, 45]))
        bass.notes.append(Note(100, root, t, t + 2 * q))
        bass.notes.append(Note(100, root + 7, t, t + 2 * q))
        bass.notes.append(Note(100, root, t + 2 * q, t + 4 * q))
    s.instruments = [melody, bass]
    return s


@pytest.fixture(scope="module")
def encoded():
    score = make_two_track_score()
    res = encode_midi(score, controls={"key": None}, track_names=["track_0", "track_1"])
    assert res is not None
    return res


def test_header_layout(encoded):
    events, controls = encoded
    assert events[0] == "4/4"
    assert events[1] == tempo_to_token(100.0)
    assert events[2].startswith("k_")
    # 2 tracks: d d o o y y then programs
    assert [e[0] for e in events[3:9]] == ["d", "d", "o", "o", "y", "y"]
    assert events[9] == "i_0" and events[10] == "i_32"
    assert events[11] == "bar"
    assert events[12].startswith("s_")
    assert events[13] == "track_0"
    assert events[14].startswith("d_")
    assert events[15].startswith("o_")
    assert events[16].startswith("y_")


def test_all_tokens_in_vocab(encoded):
    events, _ = encoded
    vocab = WordVocab(0, CONTROL_SETS[5])
    ids = vocab.encode(events)  # raises on unknown token
    assert len(ids) == len(events)


def test_sixteen_bars_with_controls(encoded):
    events, controls = encoded
    track_names, bar_poses, bars = bar_with_track_positions(events)
    assert len(bar_poses) == 16
    assert len(bars) == 16
    assert track_names == ["track_0", "track_1"]
    # every bar has an s_ token right after `bar` (padded bars keep the
    # tokenizer's `unk` marker before it, reference encode.py:1299-1308)
    for bp in bar_poses:
        nxt = events[bp + 1]
        assert nxt.startswith("s_") or (nxt == "unk" and events[bp + 2].startswith("s_"))


def test_all_controls_dict(encoded):
    _, controls = encoded
    assert controls["time_signature"] == "4/4"
    assert controls["track_nums"] == 2
    assert controls["bar_nums"] == 16
    assert len(controls["tensile"]) == 16
    for name in ("track_0", "track_1"):
        assert set(controls[name]) == {"instrument", "density", "polyphony", "occupation"}
        assert len(controls["bar_density"][name]) == 16
        assert len(controls["bar_occupation"][name]) == 16
        assert len(controls["bar_polyphony"][name]) == 16
    assert controls["track_0"]["instrument"] == "Acoustic Grand Piano"
    assert controls["track_1"]["instrument"] == "Acoustic Bass"


def test_infill_mode_uses_given_tensiles():
    score = make_two_track_score()
    given = list(range(12)) + [3, 4, 5, 6]
    res = encode_midi(
        score,
        controls={"key": "C major", "tensile": given},
        infill=True,
        track_names=["track_0", "track_1"],
    )
    assert res is not None
    events, controls = res
    assert controls["tensile"] == given
    s_tokens = [e for e in events if e.startswith("s_")]
    assert s_tokens == [f"s_{t}" for t in given]


def test_encode_midi_6_8():
    """6/8 signature: bar = 12 sixteenth slots, whole duration absent."""
    tempo = 90.0
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(6, 8, 0.0)]
    inst = Instrument(program=0)
    q = 60.0 / tempo
    bar = 3 * q  # 6 eighths
    for b in range(5):
        inst.notes.append(Note(100, 60 + b, b * bar, b * bar + q))
        inst.notes.append(Note(100, 67, b * bar + 1.5 * q, b * bar + 3 * q))
    s.instruments = [inst]
    res = encode_midi(s, controls={"key": None}, track_names=["track_0"])
    assert res is not None
    events, controls = res
    assert events[0] == "6/8"
    assert events.count("bar") == 16
    assert "whole" not in events
    vocab = WordVocab(0, CONTROL_SETS[5])
    vocab.encode(events)


def test_encode_midi_degenerate_window_returns_none():
    """A window whose notes are all filtered (tension fails under a
    user-supplied key) must return None, not crash on an emptied bar_pos
    (the reference falls through with tensiles='' — encode.py:1399)."""
    from smer_music_generation_tpu.codec.annotate import encode_midi

    s = MidiScore(initial_tempo=100)
    s.time_signature_changes = [TimeSignature(4, 4, 0.0)]
    inst = Instrument(program=0)
    inst.notes.append(Note(100, 120, 0.0, 0.2))  # out-of-range pitch
    s.instruments.append(inst)
    assert encode_midi(s, controls={"key": "C major"}, track_names=["track_0"]) is None
