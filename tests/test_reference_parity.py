"""Token-exact parity against the UNMODIFIED reference implementation.

BASELINE north star: "tokenizer parity: token-exact MIDI->SMER round trip
vs reference".  These tests load ``/root/reference/preprocessing.py``
itself (under the pretty_midi shim in ``reference_shim.py``) and compare
its output on the same files with ``codec/smer.py`` — encode direction
token-for-token, decode direction note-for-note.
"""

import os
import tempfile

import numpy as np
import pytest

from smer_music_generation_tpu.codec.smer import events_to_midi, midi_to_events
from tests.reference_shim import load_reference_preprocessing
from tests.test_smer_codec import make_score

ref = load_reference_preprocessing()
pytestmark = pytest.mark.skipif(
    ref is None, reason="/root/reference not available"
)

SIGS = [(4, 4), (3, 4), (2, 4), (6, 8)]


def _tokenize_both(score, roles):
    with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as f:
        path = f.name
    try:
        score.write(path)
        track_info = {path: {r: i for i, r in enumerate(roles)}}
        r = ref.midi_2event(path, track_info)
    finally:
        os.unlink(path)
    ref_events = list(r[0]) if r is not None else None
    res = midi_to_events(score, roles=roles)
    ours = list(res[0]) if res is not None else None
    return ref_events, ours


@pytest.mark.parametrize("sig", SIGS)
@pytest.mark.parametrize("seed", [101, 7, 42])
def test_encode_token_exact_two_tracks(sig, seed):
    score = make_score(sig=sig, tracks=2, bars=5, seed=seed)
    ref_events, ours = _tokenize_both(score, ["melody", "bass"])
    assert ref_events is not None
    assert ours == ref_events


@pytest.mark.parametrize("sig", SIGS)
def test_encode_token_exact_three_tracks(sig):
    score = make_score(sig=sig, tracks=3, bars=8, seed=13)
    ref_events, ours = _tokenize_both(score, ["melody", "bass", "accompaniment"])
    assert ref_events is not None
    assert ours == ref_events


def test_encode_token_exact_single_track():
    score = make_score(sig=(4, 4), tracks=1, bars=12, seed=3)
    ref_events, ours = _tokenize_both(score, ["melody"])
    assert ref_events is not None
    assert ours == ref_events


def _note_set(pm):
    out = []
    for inst in pm.instruments:
        for n in inst.notes:
            out.append((round(float(n.start), 6), round(float(n.end), 6),
                        int(n.pitch), int(n.velocity)))
    return sorted(out)


@pytest.mark.parametrize("sig", SIGS)
def test_decode_note_exact(sig):
    """events -> MIDI through both decoders produces identical notes."""
    score = make_score(sig=sig, tracks=2, bars=5, seed=101)
    ref_events, ours = _tokenize_both(score, ["melody", "bass"])
    assert ours == ref_events

    r = ref.event_2midi(list(ref_events))
    assert r is not None
    ref_pm = r[0]
    our_pm = events_to_midi(list(ref_events), tempo=float(ref_events[1]))
    assert our_pm is not None
    assert _note_set(our_pm) == _note_set(ref_pm)
