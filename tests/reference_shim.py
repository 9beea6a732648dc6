"""Run the UNMODIFIED reference tokenizer against this framework's codec.

The reference (`/root/reference/preprocessing.py`) needs ``pretty_midi``,
which is not installed; this shim satisfies that import with the
framework's own MIDI model (``codec/midi.py`` is API-compatible with the
``pretty_midi`` surface the reference touches: instruments / notes /
time_signature_changes / get_beats / get_downbeats / get_tempo_changes /
write).  Loading the reference module at test time — never copying its
code — lets tests assert the BASELINE north star directly: token-exact
MIDI→SMER parity between the reference implementation and
``codec/smer.py`` on the same input file.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_DIR = "/root/reference"

_cached = None


def load_reference_preprocessing():
    """Import /root/reference/preprocessing.py under the pretty_midi shim.

    Returns the module, or None when the reference tree is unavailable.
    """
    global _cached
    if _cached is not None:
        return _cached
    import os

    if not os.path.exists(os.path.join(REFERENCE_DIR, "preprocessing.py")):
        return None

    from smer_music_generation_tpu.codec import midi as fmidi

    import numpy as np

    class PrettyMIDI(fmidi.MidiScore):
        def __init__(self, midi_file=None, initial_tempo: float = 120.0):
            super().__init__(initial_tempo=initial_tempo)
            if midi_file is not None:
                src = fmidi.read_midi(midi_file)
                self.__dict__.update(src.__dict__)
                # real pretty_midi note times are np.float64 (tick->time
                # arrays); the reference relies on numpy broadcasting from
                # them (e.g. ``note.start - divided_beats`` with a list)
                for inst in self.instruments:
                    for n in inst.notes:
                        n.start = np.float64(n.start)
                        n.end = np.float64(n.end)

    from smer_music_generation_tpu.codec.annotate import program_to_instrument_name

    pm_mod = types.ModuleType("pretty_midi")
    pm_mod.PrettyMIDI = PrettyMIDI
    pm_mod.Note = fmidi.Note
    pm_mod.Instrument = fmidi.Instrument
    pm_mod.TimeSignature = fmidi.TimeSignature
    pm_mod.Lyric = fmidi.Lyric
    pm_mod.program_to_instrument_name = program_to_instrument_name

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):  # permissive logging-helper stub
            if name.startswith("__"):  # keep import machinery honest
                raise AttributeError(name)
            return lambda *a, **k: None

    sys.modules["pretty_midi"] = pm_mod
    sys.modules.setdefault("coloredlogs", _AnyAttr("coloredlogs"))
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    _cached = importlib.import_module("preprocessing")
    return _cached


def load_reference_module(name: str):
    """Import another reference module under the same shims.

    ``encode`` additionally needs music21 importable (its key-vote helpers
    use it); a permissive stub satisfies the import — the tokenizer-side
    functions under test never touch it.
    """
    if load_reference_preprocessing() is None:
        return None
    if name == "encode" and "music21" not in sys.modules:

        class _AnyAttr(types.ModuleType):
            def __getattr__(self, attr):
                if attr.startswith("__"):
                    raise AttributeError(attr)
                return _AnyAttr(f"{self.__name__}.{attr}")

            def __call__(self, *a, **k):  # pragma: no cover
                raise RuntimeError("music21 stub called")

        sys.modules["music21"] = _AnyAttr("music21")
    return importlib.import_module(name)
