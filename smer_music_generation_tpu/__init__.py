"""smer_music_generation_tpu: TPU-native controllable music infilling.

Public surface (see README.md for the full map):

* :class:`~smer_music_generation_tpu.vocab.WordVocab` — token universe;
* ``codec`` — MIDI I/O, SMER/REMI tokenizers, control annotation;
* ``features`` — tension / control metrics / key voting;
* ``data`` — corpus build, packing, masking, loading;
* ``models`` / ``ops`` / ``parallel`` / ``train`` — the model stack;
* ``infer`` — the compiled infilling engine;
* ``eval`` / ``serve`` — controllability harness and HTTP serving.
"""

from .vocab import CONTROL_SETS, WordVocab

__version__ = "0.1.0"

__all__ = ["WordVocab", "CONTROL_SETS", "__version__"]
