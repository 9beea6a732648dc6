"""Golden-fixture regression tests.

The fixtures in ``tests/golden/codec_fixtures.json`` pin the exact token
streams the codec/annotation pipeline produces for fixed-seed synthetic
scores (the framework's analogue of the reference's canonicalization
gate, SURVEY.md §4).  Any unintended change to gridding, chord grouping,
duration snapping, control insertion or the REMI converter shows up as a
token diff here.
"""

import json
import os

import pytest

from smer_music_generation_tpu.codec.annotate import encode_midi
from smer_music_generation_tpu.codec.remi import smer_to_remi
from smer_music_generation_tpu.codec.smer import midi_to_events, midi_to_events_window
from tests.test_annotate import make_two_track_score
from tests.test_smer_codec import make_score

FIXTURES = os.path.join(os.path.dirname(__file__), "golden", "codec_fixtures.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES) as f:
        return json.load(f)


@pytest.mark.parametrize("sig", [(4, 4), (3, 4), (6, 8)])
def test_window_tokens_golden(golden, sig):
    score = make_score(sig=sig, tracks=2, bars=5, seed=101)
    events, _, tempo = midi_to_events_window(score, ["track_0", "track_1"])
    want = golden[f"window_{sig[0]}_{sig[1]}"]
    assert tempo == want["tempo"]
    assert events == want["events"]


def test_annotated_tokens_golden(golden):
    score = make_two_track_score(bars=6, seed=42)
    events, controls = encode_midi(
        score, controls={"key": None}, track_names=["track_0", "track_1"]
    )
    want = golden["annotated"]
    assert events == want["events"]
    assert controls["key"] == want["key"]
    assert controls["tensile"] == want["tensile"]
    assert controls["track_0"] == want["track_0"]
    assert controls["track_1"] == want["track_1"]


def test_remi_tokens_golden(golden):
    smer = golden["window_4_4"]["events"]
    assert smer_to_remi(smer) == golden["remi"]["events"]


def test_corpus_tokens_golden(golden):
    events, _ = midi_to_events(make_two_track_score(bars=8, seed=7))
    assert events == golden["corpus"]["events"]
