"""ctypes front end for the native SMER tokenizer core.

``bar_notes_to_event_native`` is a drop-in replacement for
``codec.smer.bar_notes_to_event`` (same inputs/outputs); it marshals the
bar's notes into flat arrays, calls the C++ core, and expands the returned
token codes back into strings via the duration table.

The call is made once per (bar, track) — thousands of times per file in
the dataset build — so the marshalling layer is kept allocation-free on
the hot path: output scratch buffers live in thread-local storage with
prebuilt ctypes pointers, and everything derived from the duration table
(the contiguous times array, the ``zero`` index, the pre-split token
names) is computed once per table and memoized on it.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..codec.durations import DurationTable
from ..codec.midi import Note
from . import load_library

MAX_TOKENS = 4096
MAX_CONT = 256

_PD = ctypes.POINTER(ctypes.c_double)
_PI = ctypes.POINTER(ctypes.c_int32)

_scratch = threading.local()


def native_available() -> bool:
    return load_library() is not None


def _get_scratch():
    s = getattr(_scratch, "bufs", None)
    if s is None:
        out = np.zeros(MAX_TOKENS, dtype=np.int32)
        cont_pitches = np.zeros(MAX_CONT, dtype=np.int32)
        cont_ends = np.zeros(MAX_CONT, dtype=np.float64)
        s = (
            out, out.ctypes.data_as(_PI),
            cont_pitches, cont_pitches.ctypes.data_as(_PI),
            cont_ends, cont_ends.ctypes.data_as(_PD),
        )
        _scratch.bufs = s
    return s


def _table_cache(table: DurationTable):
    """(times ptr, n_times, zero index, pre-split names) for one table.

    DurationTable is a frozen dataclass; the cache is attached through
    ``object.__setattr__`` so repeated bars of the same table skip the
    contiguous copy, the linear ``index`` scan, and the ``str.split``.
    """
    cached = table.__dict__.get("_native_tok")
    if cached is None:
        dur_times = np.ascontiguousarray(table.times, dtype=np.float64)
        cached = (
            dur_times,  # keep the buffer alive alongside its pointer
            dur_times.ctypes.data_as(_PD),
            len(dur_times),
            table.names_by_time.index("zero"),
            tuple(name.split("_") for name in table.names_by_time),
        )
        object.__setattr__(table, "_native_tok", cached)
    return cached


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
    starts = np.fromiter((x.start for x in notes), np.float64, n)
    ends = np.fromiter((x.end for x in notes), np.float64, n)
    pitches = np.fromiter((x.pitch for x in notes), np.int32, n)
    velocities = np.fromiter((x.velocity for x in notes), np.int32, n)
    beats = np.ascontiguousarray(beat_times, dtype=np.float64)
    _, dur_ptr, n_dur, zero_index, names_split = _table_cache(table)
    out, out_ptr, cont_pitches, cont_p_ptr, cont_ends, cont_e_ptr = _get_scratch()
    n_cont = ctypes.c_int32(0)

    n_out = lib.smer_tokenize_bar(
        starts.ctypes.data_as(_PD), ends.ctypes.data_as(_PD),
        pitches.ctypes.data_as(_PI), velocities.ctypes.data_as(_PI), n,
        ctypes.c_double(bar_time), ctypes.c_double(next_bar_time),
        beats.ctypes.data_as(_PD), len(beats),
        ctypes.c_double(minimum_difference), grid_division, int(is_grid),
        dur_ptr, n_dur, zero_index,
        out_ptr, MAX_TOKENS,
        cont_p_ptr, cont_e_ptr,
        MAX_CONT, ctypes.byref(n_cont),
    )
    if n_out < 0:
        return None

    tokens: List[str] = []
    for code in out[:n_out].tolist():
        if code == -1:
            tokens.append("rest")
        elif code == -2:
            tokens.append("sep")
        elif code == -3:
            tokens.append("continue")
        elif code >= 2000:
            tokens.extend(names_split[code - 2000])
        else:
            tokens.append(f"p_{code - 1000}")

    continue_dict: Dict[int, Note] = {}
    for i in range(n_cont.value):
        pitch = int(cont_pitches[i])
        continue_dict[pitch] = Note(
            velocity=-1, pitch=pitch, start=next_bar_time, end=float(cont_ends[i])
        )
    return tokens, continue_dict
