"""Serving layer tests: plugin protocol round trip + live HTTP server."""

import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.codec.midi import MidiScore
from smer_music_generation_tpu.models.transformer import ModelConfig, ScoreTransformer
from smer_music_generation_tpu.serve.app import ServingContext, serve
from smer_music_generation_tpu.serve.protocol import merge_pm, midi2notes, note_midi
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab


def plugin_payload(bars=16):
    notes = []
    for bar in range(bars):
        for beat in range(4):
            notes.append([60 + (bar + beat) % 12, bar * 4 + beat, 1])
    bass = [[40 + bar % 5, bar * 4, 4] for bar in range(bars)]
    return {
        "tempo": 100,
        "numerator": 4,
        "denominator": 4,
        "track_0": notes,
        "track_0_program": 1,
        "track_1": bass,
        "track_1_program": 33,
    }


def test_note_midi_roundtrip():
    data = plugin_payload()
    score = note_midi(data, start_bar=1)
    assert score is not None
    assert len(score.instruments) == 2
    assert score.instruments[0].program == 0
    assert score.instruments[1].program == 32
    beat = 60 / 100
    assert abs(score.instruments[0].notes[0].start - 0.0) < 1e-9
    assert abs(score.instruments[0].notes[0].end - beat) < 1e-9

    controls = {"start_bar": 1, "s_bar": 1, "e_bar": 4, "track_0": 0, "track_1": 1}
    notes = midi2notes(score, 100.0, ["track_0", "track_1"], controls)
    assert len(notes["track_0"]) > 0
    assert notes["track_1"] == []  # locked track
    first = notes["track_0"][0]
    assert first["pitch"] == 60 and abs(first["duration"] - 1.0) < 1e-6


def test_merge_pm():
    data = plugin_payload(bars=8)
    total = note_midi(data, start_bar=1)
    partial = note_midi(plugin_payload(bars=8), start_bar=1)
    # shift partial's pitches so the merge is observable
    for n in partial.instruments[0].notes:
        n.pitch += 1
    controls = {"start_bar": 1, "s_bar": 2, "e_bar": 3}
    merged = merge_pm(total, partial, controls, 4, 4, 100.0)
    beat = 60 / 100
    fill_lo, fill_hi = beat * 4 * 1, beat * 4 * 3
    for n in merged.instruments[0].notes:
        inside = fill_lo <= n.start < fill_hi
        if inside:
            assert n.pitch != 60 or n.pitch > 60  # replaced notes shifted


def test_merge_pm_non_quarter_denominator():
    """Conscious divergence from the reference (encode.py:1348-1353):
    the splice window must use numerator*4/denominator quarter-beats per
    bar, consistent with note_midi/midi2notes — in 6/8 the reference's
    numerator-only math lands the window at 2x the real bar offset."""
    data = {
        "tempo": 120, "numerator": 6, "denominator": 8,
        # one note at the start of each of 8 bars (bar = 3 quarter-beats)
        "track_0": [[60 + bar, bar * 3, 1] for bar in range(8)],
        "track_0_program": 1,
    }
    total = note_midi(data, start_bar=1)
    partial = note_midi(dict(data, track_0=[[90, bar * 3, 1] for bar in range(8)]),
                        start_bar=1)
    controls = {"start_bar": 1, "s_bar": 2, "e_bar": 3}
    merged = merge_pm(total, partial, controls, 6, 8, 120.0)
    beat = 60 / 120
    bar_len = beat * 3  # 6/8 at quarter=120: 3 quarter-beats per bar
    for n in merged.instruments[0].notes:
        if bar_len * 1 <= n.start < bar_len * 3:  # bars 2-3 (1-based)
            assert n.pitch == 90, f"bar-2/3 note not replaced: {n}"
        else:
            assert n.pitch != 90, f"note outside the window replaced: {n}"


@pytest.fixture(scope="module")
def server_url():
    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    ctx = ServingContext(model, params, vocab)
    server = serve(ctx, host="127.0.0.1", port=0)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_http_health(server_url):
    with urllib.request.urlopen(server_url + "/health", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok" and body["vocab_size"] == 309


def test_http_encode_then_generate(server_url):
    enc = _post(server_url + "/encode", {"notes": plugin_payload(), "controls": {}})
    assert "events" in enc, enc
    events, controls = enc["events"], enc["controls"]
    assert controls["track_nums"] == 2
    # dense payload: identity mapping
    assert enc["track_map"] == {"track_0": "track_0", "track_1": "track_1"}

    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    gen = _post(
        server_url + "/generate",
        {
            "events": events,
            "controls": controls,
            "tracks": [0],
            "bars": [1, 2],
            "tempo": 100,
        },
    )
    assert "events" in gen, gen
    assert "m_0" not in gen["events"]
    assert gen["decode_steps"] > 0


def test_http_encode_sparse_tracks(server_url):
    """note_midi keeps only present tracks with program > 0 (reference
    encode.py:110-120), renumbering densely; /encode returns the
    plugin-name -> encoded-name map so callers can translate."""
    payload = plugin_payload()
    sparse = {
        "tempo": payload["tempo"],
        "numerator": payload["numerator"],
        "denominator": payload["denominator"],
        "track_1": payload["track_0"],
        "track_1_program": payload["track_0_program"],
        "track_3": payload["track_1"],
        "track_3_program": payload["track_1_program"],
    }
    enc = _post(server_url + "/encode", {"notes": sparse, "controls": {}})
    assert "events" in enc, enc
    assert enc["controls"]["track_nums"] == 2
    assert enc["track_map"] == {"track_1": "track_0", "track_3": "track_1"}


# ---------------------------------------------------------------------------
# Request micro-batching (serve/app.py MicroBatcher)
# ---------------------------------------------------------------------------


class _CountingEngine:
    """run_batch stub: records group sizes, returns one token per request."""

    def __init__(self, fail=False):
        self.calls = []
        self.fail = fail
        self._lock = threading.Lock()

    def run_batch(self, requests, rng):
        with self._lock:
            self.calls.append(len(requests))
        if self.fail:
            raise RuntimeError("device exploded")
        time.sleep(0.01)
        return [("ok", r) for r in requests]


def test_micro_batcher_coalesces_concurrent_requests():
    from smer_music_generation_tpu.serve.app import MicroBatcher

    engine = _CountingEngine()
    batcher = MicroBatcher(engine, max_batch=8, window_ms=250.0)
    results = [None] * 4

    def worker(i):
        results[i] = batcher.submit(f"req{i}", rng=None)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert results == [("ok", f"req{i}") for i in range(4)]
    # all four landed in one decode (the window is generous)
    assert engine.calls == [4]


def test_micro_batcher_caps_group_size():
    from smer_music_generation_tpu.serve.app import MicroBatcher

    engine = _CountingEngine()
    batcher = MicroBatcher(engine, max_batch=2, window_ms=250.0)
    threads = [
        threading.Thread(target=batcher.submit, args=(f"r{i}", None))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert sum(engine.calls) == 4
    assert max(engine.calls) <= 2


def test_micro_batcher_propagates_errors():
    from smer_music_generation_tpu.serve.app import MicroBatcher

    batcher = MicroBatcher(_CountingEngine(fail=True), window_ms=1.0)
    with pytest.raises(RuntimeError, match="device exploded"):
        batcher.submit("req", None)


def test_http_concurrent_generates_batched(server_url):
    """Concurrent /generate requests all succeed through the batcher."""
    enc = _post(server_url + "/encode", {"notes": plugin_payload(), "controls": {}})
    events, controls = enc["events"], enc["controls"]
    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    payload = {
        "events": events, "controls": controls,
        "tracks": [0], "bars": [3], "tempo": 100,
    }
    outs = [None] * 3
    errs = []

    def worker(i):
        try:
            outs[i] = _post(server_url + "/generate", payload)
        except Exception as exc:  # pragma: no cover - diagnostic
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    for out in outs:
        assert out is not None and "events" in out, out
        assert "m_0" not in out["events"]


def test_serving_context_with_mesh():
    """The serving stack accepts a dp mesh (8 virtual CPU devices) and
    still produces well-formed generates through the batcher."""
    from smer_music_generation_tpu.parallel.mesh import make_mesh

    vocab = WordVocab(0, CONTROL_SETS[5])
    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=2048, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    ctx = ServingContext(model, params, vocab, mesh=make_mesh(8, tp=1))
    enc = ctx.handle_encode({"notes": plugin_payload(), "controls": {}})
    events, controls = enc["events"], enc["controls"]
    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    gen = ctx.handle_generate(
        {"events": events, "controls": controls, "tracks": [0], "bars": [1]}
    )
    assert "events" in gen and "m_0" not in gen["events"]


def test_generate_notes_without_explicit_window(server_url):
    """A /generate with start_bar but no s_bar/e_bar still returns note
    dicts (window derived from the requested bars); locked tracks are
    omitted from the note payload."""
    enc = _post(server_url + "/encode",
                {"notes": plugin_payload(), "controls": {"start_bar": 1}})
    events, controls = enc["events"], enc["controls"]
    controls["bar_track"] = 0
    controls["track_0_c"] = controls["track_0"]
    controls["track_1_c"] = controls["track_1"]
    controls["track_0"] = 0  # unlocked
    controls["track_1"] = 1  # locked
    controls["start_bar"] = 1
    gen = _post(server_url + "/generate",
                {"events": events, "controls": controls,
                 "tracks": [0], "bars": [2, 3], "tempo": 100})
    assert "notes" in gen, gen.keys()
    assert gen["notes"].get("track_1", []) == []  # locked: plugin keeps its own
    assert "track_0" in gen["notes"]
