"""Feature engine tests: spiral geometry, tension, controls, key vote.

Oracles are written as direct transliterations of the reference formulas
(tension_calculation.py) so the vectorized implementations are checked
against the scalar math.
"""

import itertools

import numpy as np
import pytest

from smer_music_generation_tpu.codec.midi import (
    Instrument,
    MidiScore,
    Note,
    TimeSignature,
)
from smer_music_generation_tpu.features import spiral
from smer_music_generation_tpu.features.controls import occupation_polyphony_rate
from smer_music_generation_tpu.features.keyvote import (
    normalize_key_name,
    profile_key,
    vote_key,
)
from smer_music_generation_tpu.features.tension import (
    cal_key,
    cal_tension,
    extract_notes,
    score_tension,
)


# --- scalar oracle (reference tension_calculation.py:146-162) -------------
def oracle_position(pitch_index):
    c = pitch_index - (4 * (pitch_index // 4))
    pos = np.array([0.0, 0.0, 0.0])
    if c == 0:
        pos[1] = 1.0
    if c == 1:
        pos[0] = 1.0
    if c == 2:
        pos[1] = -1.0
    if c == 3:
        pos[0] = -1.0
    pos[2] = pitch_index * 0.4
    return pos


def test_pitch_position_matches_oracle():
    for p in range(-10, 15):
        np.testing.assert_allclose(spiral.pitch_index_to_position(p), oracle_position(p))


def test_class_positions_table():
    for shift in range(12):
        for pc in range(12):
            shifted = (pc - shift) % 12
            want = oracle_position(spiral.NOTE_INDEX_TO_PITCH_INDEX[shifted])
            np.testing.assert_allclose(spiral.CLASS_POSITIONS[shift, pc], want)


def test_centroid_matches_scalar():
    rng = np.random.default_rng(0)
    roll = (rng.random((128, 20)) < 0.05).astype(int)
    shift = 3
    got = spiral.centroids_for_shift(roll, shift)
    for t in range(20):
        idx = [
            spiral.NOTE_INDEX_TO_PITCH_INDEX[(i % 12 - shift) % 12]
            for i in range(128)
            if roll[i, t] > 0
        ]
        if idx:
            want = np.mean([oracle_position(i) for i in idx], axis=0)
        else:
            want = np.zeros(3)
        np.testing.assert_allclose(got[t], want, atol=1e-12)


def test_diameter_matches_bruteforce():
    rng = np.random.default_rng(1)
    roll = (rng.random((128, 15)) < 0.04).astype(int)
    shift = 7
    got = spiral.diameters_for_shift(roll, shift)
    for t in range(15):
        idx = [
            spiral.NOTE_INDEX_TO_PITCH_INDEX[(i % 12 - shift) % 12]
            for i in range(128)
            if roll[i, t] > 0
        ]
        best = 0.0
        for a, b in itertools.combinations(idx, 2):
            best = max(best, np.linalg.norm(oracle_position(a) - oracle_position(b)))
        assert abs(got[t] - best) < 1e-9


def _scale_score(tonic_pitches, tempo=120.0, bars=4):
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(4, 4, 0.0)]
    inst = Instrument(program=0)
    q = 60.0 / tempo
    t = 0.0
    for _ in range(bars):
        for p in tonic_pitches:
            inst.notes.append(Note(100, p, t, t + q))
            t += q
    s.instruments.append(inst)
    return s


C_MAJOR_SCALE = [60, 62, 64, 65, 67, 69, 71, 72]
A_MINOR = [57, 59, 60, 62, 64, 65, 68, 69]  # harmonic minor flavour


def test_cal_key_c_major():
    s = _scale_score(C_MAJOR_SCALE)
    grid = extract_notes(s, 1)
    assert grid is not None
    key_name, key_pos, shift = cal_key(grid.piano_roll, spiral.ALL_KEY_NAMES)
    assert key_name == "C major"
    assert shift == 0


def test_cal_tension_shapes_and_silence():
    s = _scale_score(C_MAJOR_SCALE, bars=4)
    grid = extract_notes(s, 1)
    res = cal_tension(
        grid.piano_roll,
        grid.beat_time,
        grid.beat_indices,
        grid.down_beat_time,
        grid.down_beat_indices,
    )
    assert res is not None
    tensile, diam, key_name, _, _ = res
    n_bars = len(grid.down_beat_indices) - 1
    assert tensile.shape[0] == n_bars
    assert diam.shape[0] == n_bars
    assert np.all(tensile >= 0)


def test_tension_out_of_key_higher():
    in_key = _scale_score([60, 64, 67] * 3, bars=2)  # C major triad
    out_key = _scale_score([61, 63, 66] * 3, bars=2)  # chromatic cluster
    g1 = extract_notes(in_key, 1)
    g2 = extract_notes(out_key, 1)
    t1 = cal_tension(
        g1.piano_roll, g1.beat_time, g1.beat_indices, g1.down_beat_time,
        g1.down_beat_indices, key_names=["C major"],
    )[0]
    t2 = cal_tension(
        g2.piano_roll, g2.beat_time, g2.beat_indices, g2.down_beat_time,
        g2.down_beat_indices, key_names=["C major"],
    )[0]
    assert t2.mean() > t1.mean()


def test_score_tension_wrapper():
    s = _scale_score(C_MAJOR_SCALE, bars=4)
    res = score_tension(s)
    assert res is not None
    tensile_cat, diam_cat, key, drumless = res
    assert all(0 <= c <= 11 for c in tensile_cat)
    assert key == "C major"
    assert len(drumless.instruments) == 1


def test_profile_keys():
    s = _scale_score(C_MAJOR_SCALE)
    for prof in ("krumhansl_schmuckler", "temperley_kostka_payne", "bellman_budge"):
        assert profile_key(s, prof) == "C major"
    g = _scale_score([67, 69, 71, 72, 74, 76, 78, 79])  # G major scale
    assert profile_key(g) == "G major"


def test_profile_key_matches_reference_loop():
    """The one-matmul correlation must agree with the literal reference
    scan (24 np.corrcoef calls, first strict max wins) on random
    distributions, including degenerate ones."""
    from smer_music_generation_tpu.features.keyvote import PROFILES, _TONIC_NAMES

    def reference_loop(dist, profile):
        if dist.sum() <= 0:
            return None
        major, minor = PROFILES[profile]
        best = (-2.0, None)
        for mode, prof in (("major", major), ("minor", minor)):
            for tonic in range(12):
                r = np.corrcoef(dist, np.roll(prof, tonic))[0, 1]
                if np.isnan(r):
                    continue
                if r > best[0]:
                    best = (r, f"{_TONIC_NAMES[tonic]} {mode}")
        return best[1]

    rng = np.random.default_rng(3)
    for _ in range(50):
        dist = rng.gamma(0.7, size=12) * rng.integers(0, 2, size=12)
        for prof in PROFILES:
            assert profile_key(dist, prof) == reference_loop(dist, prof)
    # degenerate: all-zero and constant distributions
    assert profile_key(np.zeros(12)) is None
    assert profile_key(np.ones(12)) == reference_loop(np.ones(12), "krumhansl_schmuckler")


def test_normalize_enharmonics():
    assert normalize_key_name("C# major") == "D- major"
    assert normalize_key_name("D- minor") == "C# minor"
    assert normalize_key_name("B- major") == "B- major"


def test_vote_key_agreement():
    s = _scale_score(C_MAJOR_SCALE)
    key, votes = vote_key("C major", s)
    assert key == "C major"
    assert votes == 4
    assert vote_key("C major", s, require_agreement=3) is not None


def test_occupation_polyphony():
    tempo = 120.0
    s = MidiScore(initial_tempo=tempo)
    s.time_signature_changes = [TimeSignature(4, 4, 0.0)]
    q = 60.0 / tempo
    sixteenth = q / 4
    inst = Instrument(program=0)
    # half a bar monophonic, half silent
    inst.notes = [Note(100, 60, 0.0, 8 * sixteenth)]
    inst2 = Instrument(program=32)
    # full bar, all polyphonic
    inst2.notes = [Note(100, 40, 0.0, 16 * sixteenth), Note(100, 47, 0.0, 16 * sixteenth)]
    s.instruments = [inst, inst2]
    occ, poly, bar_occ, bar_poly = occupation_polyphony_rate(s, 16, sixteenth, 1)
    assert occ[0] == pytest.approx(0.5)
    assert poly[0] == 0
    assert occ[1] == pytest.approx(1.0)
    assert poly[1] == pytest.approx(1.0)
    assert bar_occ[0][0] == pytest.approx(0.5)
    assert bar_poly[1][0] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Standalone tension CLI (reference tension_calculation.py:733-962; the
# reference __main__ itself is dead code — see features/tension_cli.py)
# ---------------------------------------------------------------------------


def test_tension_cli_end_to_end(tmp_path):
    import json
    import pickle

    from tests.test_smer_codec import make_score
    from smer_music_generation_tpu.features import tension_cli

    in_dir = tmp_path / "midi"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    for i in range(2):
        make_score(tracks=2, bars=6, seed=10 + i).write(str(in_dir / f"song{i}.mid"))

    assert tension_cli.main(["-i", str(in_dir), "-o", str(out_dir), "-k"]) == 0

    summary = json.loads((out_dir / "files_result.json").read_text())
    assert len(summary) == 2
    for path, (key, change_time, change_bar, change_name) in summary.items():
        assert key.endswith(("major", "minor"))
        assert isinstance(change_bar, int)
        base = path.rsplit("/", 1)[-1]
        with open(out_dir / f"{base}.tension", "rb") as fh:
            tensile = pickle.load(fh)
        with open(out_dir / f"{base}.diameter", "rb") as fh:
            diameter = pickle.load(fh)
        # bar-window aggregation: one value per bar boundary pair
        assert tensile.shape == diameter.shape
        assert 4 <= tensile.shape[0] <= 6
        assert np.count_nonzero(tensile) > 0


def test_tension_cli_single_file_fixed_key_and_window(tmp_path):
    import json

    from tests.test_smer_codec import make_score
    from smer_music_generation_tpu.features import tension_cli

    midi = tmp_path / "one.mid"
    make_score(tracks=1, bars=6, seed=3).write(str(midi))
    out_dir = tmp_path / "out"
    # 2-beat windows + a forced key (enharmonic input form)
    assert tension_cli.main(
        ["-f", str(midi), "-o", str(out_dir), "-w", "2", "-n", "C major"]
    ) == 0
    summary = json.loads((out_dir / "files_result.json").read_text())
    [(path, (key, _t, bar, _n))] = summary.items()
    assert key == "C major"
    assert bar == -1  # -k not passed: no key-change detection
    result = tension_cli.analyze_file(str(midi), window_size=2, key_name="C major")
    tensile = result[0]
    # 6 bars of 4/4 at 2-beat windows: ~2 windows per bar (minus tail)
    assert tensile.shape[0] > 6


def test_key_after_change_redetects():
    from smer_music_generation_tpu.features.tension import cal_key, key_after_change

    rng = np.random.default_rng(0)
    # first half C major pitch classes, second half F# major
    c_major = [60, 62, 64, 65, 67, 69, 71]
    fs_major = [66, 68, 70, 71, 73, 75, 77]
    roll = np.zeros((128, 128), dtype=int)
    for t in range(64):
        roll[rng.choice(c_major), t] = 1
    for t in range(64, 128):
        roll[rng.choice(fs_major), t] = 1
    first = cal_key(roll[:, :64], None or __import__(
        "smer_music_generation_tpu.features.tension", fromlist=["ALL_KEY_NAMES"]
    ).ALL_KEY_NAMES)
    after = key_after_change(roll, 64)
    assert first is not None and after is not None
    assert first[0] != after[0]
    assert key_after_change(roll, 200) is None  # past the end


def test_validate_event_data_and_check_remi(tmp_path):
    import pickle

    from tests.test_smer_codec import make_score
    from smer_music_generation_tpu.codec.remi import smer_to_remi
    from smer_music_generation_tpu.data.build import (
        build_file,
        check_remi_events,
        tokenize_file,
        validate_event_data,
    )

    path = tmp_path / "s.mid"
    make_score(tracks=2, bars=18, seed=5).write(str(path))
    remi = check_remi_events(smer_to_remi(tokenize_file(str(path))))
    assert remi is not None and remi[1].startswith("t_")
    # an un-decodable stream is rejected
    assert check_remi_events(["4/4", "100.0", "i_0"]) is None

    out = build_file(str(path), str(tmp_path), seed=1)
    windows = pickle.load(open(out, "rb"))
    batch = [w[0] if isinstance(w, tuple) else w for w in windows]
    assert validate_event_data([batch]) == []
    # a window that no longer decodes is reported
    broken = [batch[0][:3]]
    report = validate_event_data([broken])
    assert report and report[0]["error"] == "decode failed"
