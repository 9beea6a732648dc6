"""Native (C++) runtime components with transparent Python fallbacks.

The reference is pure Python end to end (SURVEY.md §2.4 — zero first-party
native code); its bulk dataset build spends its time in per-note Python
loops.  This package provides C++ implementations of those hot loops,
compiled on demand with the system toolchain and bound via ctypes:

* ``smer_tokenizer`` — per-bar note gridding / chord grouping / duration
  snapping (the inner loop of ``bar_notes_to_event``).

``load_library()`` compiles (once, cached beside the source) and returns
the ctypes handle, or None when no toolchain is available — callers fall
back to the pure-Python implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "smer_tokenizer.cpp")
_LIB = os.path.join(_DIR, "libsmer_tokenizer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        needs_build = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _compile():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        c = ctypes
        lib.smer_tokenize_bar.restype = c.c_int
        # pointer params are declared void* so callers can pass raw
        # ndarray.ctypes.data addresses (no per-call ctypes.cast)
        lib.smer_tokenize_bar.argtypes = [
            c.c_void_p, c.c_void_p,
            c.c_void_p, c.c_void_p, c.c_int,
            c.c_double, c.c_double,
            c.c_void_p, c.c_int,
            c.c_double, c.c_int, c.c_int,
            c.c_void_p, c.c_int, c.c_int,
            c.c_void_p, c.c_int,
            c.c_void_p, c.c_void_p, c.c_int,
            c.c_void_p,
        ]
        # absent in pre-existing binaries (the mtime check rebuilds, but a
        # read-only tree may pin an old .so): gate on symbol presence
        if not hasattr(lib, "smer_tokenize_track"):
            _lib = lib
            return _lib
        lib.smer_tokenize_track.restype = c.c_int
        lib.smer_tokenize_track.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_int,   # starts ends pitches n
            c.c_void_p, c.c_int,                            # down_beats n_bars
            c.c_void_p, c.c_void_p,                         # beats dbi
            c.c_int, c.c_int,                               # grid_division do_grid
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, # table times/n/zero/mindiff
            c.c_int, c.c_void_p,                            # stride bar_table
            c.c_void_p, c.c_int, c.c_void_p,                # out max_out offsets
        ]
        _lib = lib
        return _lib
