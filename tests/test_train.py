"""Training-loop smoke tests on the 8-device CPU mesh (mock batches)."""

import os

import jax
import numpy as np
import pytest

from smer_music_generation_tpu.codec.smer import midi_to_events
from smer_music_generation_tpu.data.build import process_song
from smer_music_generation_tpu.data.pack import pack_windows
from smer_music_generation_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from smer_music_generation_tpu.train.loop import Trainer, pad_batch_rows
from smer_music_generation_tpu.utils.config import ExperimentConfig
from tests.test_annotate import make_two_track_score


@pytest.fixture(scope="module")
def mock_groups():
    score = make_two_track_score(bars=24, seed=13)
    events, _ = midi_to_events(score)
    windows = process_song(events, augment=False)
    assert windows
    groups, _ = pack_windows(windows * 2)
    return groups


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    return ExperimentConfig(
        d_model=32, nhead=4, num_layers=1, d_ff=64, max_seq=1408,
        epochs=2, pretraining_epochs=1, batch_size=1, print_every=1,
        output_dir=str(out), bf16=False, dropout=0.1,
    )


def test_pad_batch_rows():
    batch = {
        "input": np.ones((3, 8), np.int32),
        "input_pad_mask": np.zeros((3, 8), bool),
    }
    out = pad_batch_rows(batch, 4)
    assert out["input"].shape == (4, 8)
    assert out["input"][3].sum() == 0
    assert out["input_pad_mask"][3].all()


def test_trainer_two_epochs_and_checkpoint(tiny_cfg, mock_groups):
    trainer = Trainer(tiny_cfg)
    trainer.run(mock_groups, mock_groups)
    # metrics written
    assert os.path.exists(os.path.join(tiny_cfg.output_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(tiny_cfg.output_dir, tiny_cfg.checkpoint_dir)
    latest = latest_checkpoint(ckpt_dir)
    assert latest is not None and latest.endswith("checkpoint_1")

    # resume restores params exactly
    state2, epoch, loss = restore_checkpoint(latest, trainer.state)
    assert epoch == 1
    leaves_a = jax.tree.leaves(trainer.state.params)
    leaves_b = jax.tree.leaves(state2.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_test_mode(tiny_cfg, mock_groups):
    trainer = Trainer(tiny_cfg)
    result = trainer.test(mock_groups)
    assert np.isfinite(result["total"])
    assert "pitch_accuracy" in result or "total" in result


def test_remi_mode_pipeline(tmp_path):
    """Mode-1 (REMI) data build -> mask -> one train step."""
    from smer_music_generation_tpu.codec.remi import smer_to_remi
    from smer_music_generation_tpu.codec.smer import midi_to_events
    from smer_music_generation_tpu.data.build import process_song

    score = make_two_track_score(bars=24, seed=21)
    events, _ = midi_to_events(score)
    remi_events = smer_to_remi(events)
    windows = process_song(remi_events, mode=1, augment=False)
    assert windows
    groups, _ = pack_windows(windows)
    cfg = ExperimentConfig(
        vocab_mode=1, d_model=32, nhead=4, num_layers=1, d_ff=64, max_seq=1664,
        epochs=1, pretraining_epochs=1, batch_size=1, print_every=1,
        output_dir=str(tmp_path), bf16=False,
    )
    trainer = Trainer(cfg)
    assert trainer.vocab.vocab_size == 349
    loader = trainer.make_loader(groups, pretraining=False)
    batches = list(loader)
    assert batches
    result = trainer.test(groups)
    assert np.isfinite(result["total"])


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must compile and execute on the
    virtual CPU mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    dryrun_multichip(2)
