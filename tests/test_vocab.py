"""Vocabulary layout contract tests (reference vocab.py:114-338)."""

import numpy as np
import pytest

from smer_music_generation_tpu.vocab import (
    CONTROL_SETS,
    TEMPO_BINS,
    WordVocab,
    to_category,
)


@pytest.fixture(scope="module")
def smer_vocab():
    return WordVocab(0, CONTROL_SETS[5])


@pytest.fixture(scope="module")
def remi_vocab():
    return WordVocab(1, CONTROL_SETS[5])


def test_vocab_sizes(smer_vocab, remi_vocab):
    assert smer_vocab.vocab_size == 309
    assert remi_vocab.vocab_size == 349


def test_index_layout_smer(smer_vocab):
    v = smer_vocab
    assert v.char2index("<pad>") == 0
    assert v.char2index("<eos>") == 1
    assert v.char2index("m_0") == 2
    assert v.structure_indices == [3, 4, 5, 6]
    assert v.time_signature_indices == [7, 8, 9, 10]
    assert v.tempo_indices == list(range(11, 18))
    assert v.program_indices == list(range(18, 146))
    assert v.pitch_indices == list(range(146, 234))
    assert v.duration_indices == list(range(234, 242))
    assert v.duration_only_indices == list(range(234, 239))
    assert v.index2char(234) == "whole"
    assert v.rest_indices == [239]
    assert v.sep_indices == [240]
    assert v.continue_index == 241
    assert v.control_indices["density"] == list(range(242, 252))
    assert v.control_indices["polyphony"] == list(range(252, 262))
    assert v.control_indices["occupation"] == list(range(262, 272))
    assert v.control_indices["key"] == list(range(272, 296))
    assert v.control_indices["tensile"] == list(range(296, 308))
    assert v.unk_index == 308
    assert v.index2char(308) == "unk"


def test_class_masks_consistent(smer_vocab):
    v = smer_vocab
    assert v.class_masks["pitch"].sum() == 88
    assert list(np.where(v.class_masks["pitch"])[0]) == v.pitch_indices
    assert v.class_masks["control"].sum() == 10 * 3 + 24 + 12
    assert v.token_class_ids[v.pad_index] == -1  # pad has no class


def test_token_roundtrip(smer_vocab):
    v = smer_vocab
    toks = ["4/4", "t_3", "k_0", "bar", "track_0", "p_60", "quarter", "<eos>"]
    ids = v.encode(toks)
    assert v.decode(ids) == toks


def test_control_set_matrix():
    assert CONTROL_SETS[1] == ["key", "tensile"]
    assert len(CONTROL_SETS[5]) == 5
    v0 = WordVocab(0, CONTROL_SETS[0])
    assert v0.control_indices == {}
    assert v0.vocab_size == 309  # tokens exist even when controls inactive


def test_to_category_matches_reference_semantics():
    # reference encode.py:206-210: last bin index where value >= bin edge
    bins = np.arange(0, 1, 0.1)
    assert to_category([0.0, 0.05, 0.1, 0.95, 2.0], bins) == [0, 0, 1, 9, 9]
    assert to_category([72.0], TEMPO_BINS) == [1]


def test_save_load(tmp_path, smer_vocab):
    p = tmp_path / "vocab.json"
    smer_vocab.save_vocab(str(p))
    v2 = WordVocab.load_vocab(str(p))
    assert v2.vocab_size == smer_vocab.vocab_size
    assert v2.control_indices == smer_vocab.control_indices
