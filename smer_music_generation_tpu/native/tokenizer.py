"""ctypes front end for the native SMER tokenizer core.

``bar_notes_to_event_native`` is a drop-in replacement for
``codec.smer.bar_notes_to_event`` (same inputs/outputs); it marshals the
bar's notes into flat arrays, calls the C++ core, and expands the returned
token codes back into strings via the duration table.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..codec.durations import DurationTable
from ..codec.midi import Note
from . import load_library

MAX_TOKENS = 4096
MAX_CONT = 256


def native_available() -> bool:
    return load_library() is not None


def bar_notes_to_event_native(
    notes: List[Note],
    bar_time: float,
    next_bar_time: float,
    beat_times: Sequence[float],
    table: DurationTable,
    minimum_difference: float,
    grid_division: int = 4,
    is_grid: bool = True,
) -> Optional[Tuple[List[str], Dict[int, Note]]]:
    """Native per-bar tokenization; None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None

    n = len(notes)
    starts = np.array([x.start for x in notes], dtype=np.float64)
    ends = np.array([x.end for x in notes], dtype=np.float64)
    pitches = np.array([x.pitch for x in notes], dtype=np.int32)
    velocities = np.array([x.velocity for x in notes], dtype=np.int32)
    beats = np.ascontiguousarray(beat_times, dtype=np.float64)
    dur_times = np.ascontiguousarray(table.times, dtype=np.float64)
    zero_index = table.names_by_time.index("zero")

    out = np.zeros(MAX_TOKENS, dtype=np.int32)
    cont_pitches = np.zeros(MAX_CONT, dtype=np.int32)
    cont_ends = np.zeros(MAX_CONT, dtype=np.float64)
    n_cont = ctypes.c_int32(0)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    n_out = lib.smer_tokenize_bar(
        ptr(starts, ctypes.c_double), ptr(ends, ctypes.c_double),
        ptr(pitches, ctypes.c_int32), ptr(velocities, ctypes.c_int32), n,
        ctypes.c_double(bar_time), ctypes.c_double(next_bar_time),
        ptr(beats, ctypes.c_double), len(beats),
        ctypes.c_double(minimum_difference), grid_division, int(is_grid),
        ptr(dur_times, ctypes.c_double), len(dur_times), zero_index,
        ptr(out, ctypes.c_int32), MAX_TOKENS,
        ptr(cont_pitches, ctypes.c_int32), ptr(cont_ends, ctypes.c_double),
        MAX_CONT, ctypes.byref(n_cont),
    )
    if n_out < 0:
        return None

    tokens: List[str] = []
    for code in out[:n_out]:
        if code == -1:
            tokens.append("rest")
        elif code == -2:
            tokens.append("sep")
        elif code == -3:
            tokens.append("continue")
        elif code >= 2000:
            tokens.extend(table.names_by_time[code - 2000].split("_"))
        else:
            tokens.append(f"p_{code - 1000}")

    continue_dict: Dict[int, Note] = {}
    for i in range(n_cont.value):
        pitch = int(cont_pitches[i])
        continue_dict[pitch] = Note(
            velocity=-1, pitch=pitch, start=next_bar_time, end=float(cont_ends[i])
        )
    return tokens, continue_dict
