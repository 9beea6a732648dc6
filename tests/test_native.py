"""Native tokenizer core: token-exact parity with the Python implementation."""

import numpy as np
import pytest

from smer_music_generation_tpu.codec.durations import get_duration_table
from smer_music_generation_tpu.codec.midi import Note
from smer_music_generation_tpu.codec.smer import bar_notes_to_event
from smer_music_generation_tpu.native.tokenizer import (
    bar_notes_to_event_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def random_bar(seed, tempo=100.0, with_cont=False):
    rng = np.random.default_rng(seed)
    q = 60.0 / tempo
    sixteenth = q / 4
    bar_time = 0.0
    next_bar = 4 * q
    notes = []
    slot = 0
    while slot < 16:
        if rng.random() < 0.6:
            length = int(rng.integers(1, 7))
            start = slot * sixteenth + rng.normal(0, sixteenth / 12)
            end = (slot + length) * sixteenth + rng.normal(0, sixteenth / 12)
            pitch = int(rng.integers(30, 100))
            notes.append(Note(100, pitch, max(start, 0.0), end))
            if rng.random() < 0.4:
                notes.append(Note(100, min(pitch + 3, 108), max(start, 0.0), end))
            slot += length
        else:
            slot += 1
    if with_cont:
        notes.insert(0, Note(-1, 55, bar_time, next_bar + 2 * q))
    notes.sort(key=lambda n: n.start)
    beats = np.arange(0, 5) * q
    return notes, bar_time, next_bar, beats


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("with_cont", [False, True])
def test_native_matches_python(seed, with_cont):
    tempo = 100.0
    table = get_duration_table(60.0 / tempo, (4, 4))
    notes, bar_time, next_bar, beats = random_bar(seed, tempo, with_cont)
    md = table.minimum_difference

    def clone(ns):
        return [Note(n.velocity, n.pitch, n.start, n.end) for n in ns]

    py_tokens, py_cont = bar_notes_to_event(
        clone(notes), bar_time, next_bar, beats, table, md
    )
    nat = bar_notes_to_event_native(
        clone(notes), bar_time, next_bar, beats, table, md
    )
    assert nat is not None
    nat_tokens, nat_cont = nat
    assert nat_tokens == py_tokens, f"seed={seed}"
    assert set(nat_cont) == set(py_cont)
    for p in py_cont:
        assert abs(nat_cont[p].end - py_cont[p].end) < 1e-9
        assert abs(nat_cont[p].start - py_cont[p].start) < 1e-9


def test_native_empty_bar():
    table = get_duration_table(0.6, (4, 4))
    nat = bar_notes_to_event_native(
        [], 0.0, 2.4, np.arange(5) * 0.6, table, table.minimum_difference
    )
    py = bar_notes_to_event([], 0.0, 2.4, np.arange(5) * 0.6, table, table.minimum_difference)
    assert nat[0] == py[0] == ["rest", "whole"]


@pytest.mark.parametrize("seed", range(8))
def test_track_native_matches_per_bar_pipeline(seed):
    """midi_to_events through the one-call-per-track core must emit the
    exact token stream of the per-bar fallback (ties carried across bars,
    multi-track interleave, empty bars)."""
    from smer_music_generation_tpu.codec import smer
    from tests.test_annotate import make_two_track_score

    score_a = make_two_track_score(bars=12, seed=seed)
    score_b = make_two_track_score(bars=12, seed=seed)
    smer.set_native_tokenizer(True)
    try:
        native = smer.midi_to_events(score_a)
        smer.set_native_tokenizer(False)
        python = smer.midi_to_events(score_b)
    finally:
        smer.set_native_tokenizer(True)
    assert (native is None) == (python is None)
    if native is not None:
        assert native[0] == python[0], f"seed={seed}"
