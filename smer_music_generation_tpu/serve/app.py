"""HTTP serving layer for the Ableton plugin protocol.

The reference served from a Colab notebook through Flask + ngrok
(``requirements.txt:5-7``; server code not in the repo — the repo-side
hooks are ``encode.encode_midi``, ``generation.generation_all``,
``generation.change_controls``, ``encode.midi2notes`` / ``note_midi`` /
``merge_pm``, SURVEY.md §1 L9).  This module is a dependency-free
``http.server`` implementation of that surface:

* ``POST /encode``    — plugin note dict -> token events + all_controls;
* ``POST /generate``  — events + UI controls + (tracks, bars) -> infilled
  events + regenerated plugin note dicts;
* ``GET  /health``    — model/config status.

The heavy lifting is one jitted decode session per request
(``infer/engine.py``); the host only does tokenizer string work.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import jax

from ..codec.annotate import encode_midi
from ..codec.smer import events_to_midi
from ..infer.engine import InfillEngine, change_controls
from ..vocab import WordVocab
from .protocol import midi2notes, note_midi


class ServingContext:
    """Model + vocab + engine shared across requests."""

    def __init__(self, model, params, vocab: WordVocab, nucleus_p: float = 0.9,
                 temperature: float = 1.0):
        self.vocab = vocab
        self.engine = InfillEngine(
            model, params, vocab, nucleus_p=nucleus_p, temperature=temperature
        )
        self._rng = jax.random.PRNGKey(0)
        self._lock = threading.Lock()

    def next_rng(self):
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
        return sub

    # ------------------------------------------------------------------
    def handle_encode(self, payload: Dict) -> Dict:
        controls = payload.get("controls", {})
        start_bar = controls.get("start_bar", 1)
        score = note_midi(payload["notes"], start_bar)
        if score is None:
            return {"error": "no playable tracks"}
        track_names = [
            f"track_{i}" for i in range(len(score.instruments))
        ]
        result = encode_midi(
            score,
            controls={"key": controls.get("key")},
            infill=False,
            track_names=track_names,
        )
        if result is None:
            return {"error": "encode failed"}
        events, all_controls = result
        return {"events": events, "controls": all_controls}

    def handle_generate(self, payload: Dict) -> Dict:
        events = list(payload["events"])
        controls = payload["controls"]
        tracks = payload.get("tracks", [0])
        bars = payload.get("bars", [])
        events = change_controls(events, controls, self.vocab)
        result = self.engine(events, tracks, bars, self.next_rng())
        if result is None:
            return {"error": "generation failed"}
        out: Dict = {"events": result.events, "decode_steps": result.decode_steps}
        tempo = float(payload.get("tempo", 100.0))
        partial = events_to_midi(result.events, tempo)
        if partial is not None and "start_bar" in controls:
            track_names = [f"track_{i}" for i in range(len(partial.instruments))]
            out["notes"] = midi2notes(partial, tempo, track_names, controls)
        return out


def make_handler(ctx: ServingContext):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok", "vocab_size": ctx.vocab.vocab_size})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "bad json"})
                return
            try:
                if self.path == "/encode":
                    self._send(200, ctx.handle_encode(payload))
                elif self.path == "/generate":
                    self._send(200, ctx.handle_generate(payload))
                else:
                    self._send(404, {"error": "not found"})
            except (KeyError, IndexError, TypeError, ValueError) as e:
                # malformed/incomplete payloads are client errors
                self._send(400, {"error": f"bad request: {type(e).__name__}: {e}"})
            except Exception as e:  # serving robustness: report, don't die
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(ctx: ServingContext, host: str = "0.0.0.0", port: int = 5000) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(ctx))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
