"""Training-loop smoke tests on the 8-device CPU mesh (mock batches)."""

import os
from dataclasses import replace as dataclasses_replace

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


def test_tp_shardings_actually_applied(tmp_path):
    """--tp N must lay the Megatron-ruled params out over the tp axis of
    the live state, not merely compute the specs (regression: the specs
    were built and then the state was device_put replicated)."""
    cfg = ExperimentConfig(
        d_model=32, nhead=4, num_layers=1, d_ff=64, max_seq=1408, epochs=1,
        batch_size=1, output_dir=str(tmp_path), bf16=False, tp=2,
    )
    trainer = Trainer(cfg)
    found = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(trainer.state.params):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "ff/fc1/kernel" in p:
            found.append(tuple(leaf.sharding.spec))
    assert found and all("tp" in spec for spec in found), found
    # adam mu mirrors the param layout
    mu_specs = [
        tuple(leaf.sharding.spec)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            trainer.state.opt_state[0].mu
        )
        if "ff/fc1/kernel" in "/".join(str(getattr(k, "key", k)) for k in path)
    ]
    assert mu_specs == found


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

    # the inference path restores the same params WITHOUT deserializing
    # (or allocating) the optimizer state
    from smer_music_generation_tpu.train.checkpoint import restore_params_only

    abstract = jax.eval_shape(lambda: trainer.state)
    p_only, epoch_po = restore_params_only(latest, abstract)
    assert epoch_po == 1
    for a, b in zip(leaves_a, jax.tree.leaves(p_only)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # committable params-only snapshot: export casts f32 -> bf16 (the
    # decode compute dtype), import restores the f32 structure; round
    # trip is exact at bf16 resolution
    from smer_music_generation_tpu.train.checkpoint import (
        export_params_msgpack,
        import_params_msgpack,
    )

    snap = os.path.join(tiny_cfg.output_dir, "params.msgpack")
    export_params_msgpack(snap, trainer.state.params, meta={"epoch": 1})
    assert os.path.exists(snap) and os.path.exists(snap + ".json")
    back = import_params_msgpack(snap, abstract.params)
    for a, b in zip(leaves_a, jax.tree.leaves(back)):
        a = np.asarray(a)
        b = np.asarray(b)
        assert b.dtype == a.dtype  # cast back to the abstract (f32) dtype
        np.testing.assert_allclose(
            a, b, rtol=2 ** -8, atol=2 ** -14
        )  # bf16 has an 8-bit mantissa


def test_snapshot_warm_start_and_inference_load(tiny_cfg, mock_groups, tmp_path):
    """A params-only .msgpack snapshot warm-starts the trainer (fresh
    optimizer) and loads through load_inference_model like an orbax dir."""
    from smer_music_generation_tpu.train.checkpoint import export_params_msgpack
    from smer_music_generation_tpu.train.state import load_inference_model

    trainer = Trainer(tiny_cfg)
    snap = str(tmp_path / "warm.msgpack")
    export_params_msgpack(
        snap, trainer.state.params, meta={"epoch": 1, "final_norm": True}
    )

    cfg2 = dataclasses_replace(tiny_cfg, resume_from=snap,
                               output_dir=str(tmp_path / "warm_run"))
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 0
    for a, b in zip(
        jax.tree.leaves(trainer.state.params), jax.tree.leaves(trainer2.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2 ** -8, atol=2 ** -14
        )

    model, params, epoch = load_inference_model(
        tiny_cfg, trainer.vocab.vocab_size, snap, jax.numpy.float32
    )
    assert epoch == 1
    for a, b in zip(
        jax.tree.leaves(trainer.state.params), jax.tree.leaves(params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2 ** -8, atol=2 ** -14
        )

    # layout mismatch is a descriptive error, not a flax structure dump
    bad_meta_snap = str(tmp_path / "bad.msgpack")
    export_params_msgpack(
        bad_meta_snap, trainer.state.params, meta={"final_norm": False}
    )
    with pytest.raises(ValueError, match="final_norm"):
        Trainer(dataclasses_replace(tiny_cfg, resume_from=bad_meta_snap,
                                    output_dir=str(tmp_path / "bad_run")))


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


def test_convergence_overfit(tmp_path, mock_groups):
    """Overfit one batch: loss must collapse and argmax accuracy must
    approach 1 — fails on any gradient/loss-sign regression (VERDICT r1:
    no prior test asserted the step actually learns)."""
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        d_model=32, nhead=4, num_layers=1, d_ff=64, max_seq=1408,
        batch_size=1, output_dir=str(tmp_path), bf16=False,
        dropout=0.0, lr=3e-3, seed=3,
    )
    trainer = Trainer(cfg)
    batch = next(iter(trainer.make_loader(mock_groups[:1], pretraining=False)))
    dev_batch = trainer._device_batch(batch)
    rng = jax.random.PRNGKey(0)

    first_loss = None
    for _ in range(150):
        rng, sub = jax.random.split(rng)
        trainer.state, m = trainer._train_step(
            trainer.state, dev_batch, jnp.float32(1.0), sub
        )
        if first_loss is None:
            first_loss = float(m["loss"])
    final = trainer._eval_step(trainer.state.params, dev_batch, jnp.float32(1.0))
    final_loss = float(final["loss"])
    assert np.isfinite(first_loss) and np.isfinite(final_loss)
    assert final_loss < 0.25 * first_loss, (first_loss, final_loss)
    assert float(final["accuracy"]) > 0.85, float(final["accuracy"])


def test_restore_final_norm_mismatch_raises(tmp_path, mock_groups):
    """A checkpoint written with final_norm=True must refuse to restore
    into a final_norm=False model with a descriptive error (ADVICE r1)."""
    from smer_music_generation_tpu.train.checkpoint import (
        checkpoint_has_final_norm,
    )
    from smer_music_generation_tpu.train.state import TrainState, build_model
    import jax.numpy as jnp

    model = build_model(309, d_model=32, nhead=4, num_layers=1, d_ff=64,
                        max_len=64, dropout=0.0, final_norm=True)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        np.ones((1, 8), np.int32), np.ones((1, 8), np.int32))
    state = TrainState.create(params, lr=1e-4)
    path = save_checkpoint(str(tmp_path), 0, state, 1.0)
    assert checkpoint_has_final_norm(path) is True

    old_model = build_model(309, d_model=32, nhead=4, num_layers=1, d_ff=64,
                            max_len=64, dropout=0.0, final_norm=False)
    old_params = old_model.init({"params": jax.random.PRNGKey(0)},
                                np.ones((1, 8), np.int32), np.ones((1, 8), np.int32))
    old_state = TrainState.create(old_params, lr=1e-4)
    with pytest.raises(ValueError, match="final_norm"):
        restore_checkpoint(path, old_state)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must compile and execute on the
    virtual CPU mesh.  (The flagship 8-device shape runs in
    tests/test_entry.py; this covers the degenerate 2-device mesh.)"""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)


def test_numerics_determinism_golden(mock_groups):
    """Committed golden loss sequences pin the train-step numerics.

    VERDICT r2 weak #2: the r4->r5 REMI replay drifted at the 3rd decimal
    with no test to localize which commit changed numerics.  This test
    runs N seeded steps (masking -> collation -> f32 and bf16 train step,
    threefry RNG) on CPU and asserts the exact loss floats and the masked
    batch-stream hashes against tests/golden/determinism.json, so any
    future change to the data pipeline or the step math fails in pytest
    with the first diverging step named.  Regenerate the golden (after an
    INTENTIONAL numerics change, in the same environment) by updating the
    json with the printed actuals.
    """
    import hashlib
    import json

    import jax.numpy as jnp

    from smer_music_generation_tpu.data.loader import BatchLoader, LoaderConfig
    from smer_music_generation_tpu.data.masking import MaskingConfig
    from smer_music_generation_tpu.train.loss import build_loss_tables
    from smer_music_generation_tpu.train.state import (
        TrainState,
        build_model,
        make_train_step,
    )
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    score = make_two_track_score(bars=24, seed=13)
    events, _ = midi_to_events(score)
    windows = process_song(events, augment=False)
    groups, _ = pack_windows(windows * 8)
    vocab = WordVocab(0, CONTROL_SETS[5])
    tables = build_loss_tables(vocab)
    golden_path = os.path.join(os.path.dirname(__file__), "golden", "determinism.json")
    with open(golden_path) as f:
        golden = json.load(f)

    for case, dtype, n_steps in (
        ("f32", jnp.float32, 6),
        ("bf16", jnp.bfloat16, 3),
    ):
        model = build_model(
            vocab.vocab_size, d_model=32, nhead=4, num_layers=1, d_ff=64,
            max_len=1408, dropout=0.1, dtype=dtype,
        )
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)},
            np.ones((1, 16), np.int32), np.ones((1, 16), np.int32),
        )
        state = TrainState.create(params, lr=1e-3)
        step = jax.jit(make_train_step(model, tables, dropout=True))
        rng = jax.random.PRNGKey(42)

        def batches():
            for ep in range(10):
                loader = BatchLoader(
                    vocab, groups,
                    LoaderConfig(
                        batch_size=1, max_src=1408, max_tgt=1408,
                        pretraining=(ep % 2 == 0), bucket=256, row_bucket=8,
                    ),
                    MaskingConfig(
                        total_mask_ratio=0.15, bar_track_control=True,
                        bar_control_at_end=True,
                    ),
                    seed=123 + ep,
                )
                yield from loader

        losses, hashes = [], []
        for i, batch in enumerate(batches()):
            if i >= n_steps:
                break
            hb = hashlib.sha256()
            for k in sorted(batch):
                hb.update(k.encode())
                hb.update(np.asarray(batch[k]).tobytes())
            hashes.append(hb.hexdigest()[:16])
            rng, sub = jax.random.split(rng)
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, dev, jnp.float32(1.0), sub)
            losses.append(float(np.asarray(m["loss"], np.float64)))

        assert hashes == golden[case]["batch_hashes"], (
            f"{case}: masked batch stream diverged at step "
            f"{next(i for i, (a, b) in enumerate(zip(hashes, golden[case]['batch_hashes'])) if a != b)}; "
            f"actual hashes: {hashes}"
        )
        golden_losses = [float(x) for x in golden[case]["losses"]]
        assert losses == golden_losses, (
            f"{case}: loss sequence diverged at step "
            f"{next(i for i, (a, b) in enumerate(zip(losses, golden_losses)) if a != b)}; "
            f"actual: {[repr(l) for l in losses]}"
        )


# ----------------------------------------------------------------------
# shape-binned batching + gated metrics (PERFORMANCE.md Finding 8)


def _row_set(loader):
    """Multiset of real (loss-bearing) rows as bytes keys."""
    rows = []
    for batch in loader:
        tgt = batch["target_out"]
        real = (tgt != 0).any(axis=1)
        for i in np.where(real)[0]:
            src = batch["input"][i]
            rows.append(
                (src[src != 0].tobytes(), tgt[i][tgt[i] != 0].tobytes())
            )
    return sorted(rows)


def test_binned_loader_same_rows_less_padding(mock_groups):
    """bin_rows=True must train on exactly the same masked rows as the
    group-per-batch path (same loader seed -> same masking stream), only
    recomposed into fuller fixed-shape batches."""
    from smer_music_generation_tpu.data.loader import BatchLoader, LoaderConfig
    from smer_music_generation_tpu.data.masking import MaskingConfig
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    mc = MaskingConfig(
        total_mask_ratio=0.15, bar_track_control=True, bar_control_at_end=True
    )
    groups = mock_groups * 3

    def make(binned):
        return BatchLoader(
            vocab, groups,
            LoaderConfig(
                batch_size=1, max_src=1408, max_tgt=1408, pretraining=False,
                bucket=256, row_bucket=8, bin_rows=binned,
            ),
            mc, seed=77,
        )

    rows_plain = _row_set(make(False))
    rows_binned = _row_set(make(True))
    assert rows_plain == rows_binned and rows_plain

    # batches carry uniform bucketed shapes with <= rows_per_batch rows
    def waste(loader):
        slots = real = n_batches = 0
        for batch in loader:
            assert batch["input"].shape[0] == 8
            assert batch["input"].shape[1] % 256 == 0
            slots += batch["target_out"].size
            real += int((batch["target_out"] != 0).sum())
            n_batches += 1
        return real / slots, n_batches

    util_plain, nb_plain = waste(make(False))
    util_binned, nb_binned = waste(make(True))
    assert util_binned >= util_plain
    assert nb_binned <= nb_plain

    # deterministic: same seed -> identical batch stream
    import hashlib

    def stream_hash(loader):
        h = hashlib.sha256()
        for batch in loader:
            for k in sorted(batch):
                h.update(np.asarray(batch[k]).tobytes())
        return h.hexdigest()

    assert stream_hash(make(True)) == stream_hash(make(True))


def test_lean_step_identical_update(mock_groups):
    """make_train_step(with_metrics=False) must produce bit-identical
    parameters to the full step; only the metrics dict shrinks."""
    import jax.numpy as jnp

    from smer_music_generation_tpu.data.loader import BatchLoader, LoaderConfig
    from smer_music_generation_tpu.data.masking import MaskingConfig
    from smer_music_generation_tpu.train.loss import build_loss_tables
    from smer_music_generation_tpu.train.state import (
        TrainState, build_model, make_train_step,
    )
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    tables = build_loss_tables(vocab)
    model = build_model(
        vocab.vocab_size, d_model=32, nhead=4, num_layers=1, d_ff=64,
        max_len=1408, dropout=0.1, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        np.ones((1, 16), np.int32), np.ones((1, 16), np.int32),
    )
    loader = BatchLoader(
        vocab, mock_groups,
        LoaderConfig(batch_size=1, max_src=1408, max_tgt=1408,
                     pretraining=False, bucket=256, row_bucket=8),
        MaskingConfig(total_mask_ratio=0.15, bar_track_control=True,
                      bar_control_at_end=True),
        seed=5,
    )
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    full = jax.jit(make_train_step(model, tables, dropout=True))
    lean = jax.jit(make_train_step(model, tables, dropout=True,
                                   with_metrics=False))
    rng = jax.random.PRNGKey(9)
    s_full, m_full = full(TrainState.create(params, lr=1e-3), batch,
                          jnp.float32(1.0), rng)
    s_lean, m_lean = lean(TrainState.create(params, lr=1e-3), batch,
                          jnp.float32(1.0), rng)
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_lean.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_full["loss"]) == float(m_lean["loss"])
    assert "param_norm" in m_full and "param_norm" not in m_lean
    assert "correct_per_class" not in m_lean
    assert "grad_norm" in m_lean


def test_trainer_binned_gated_run(tmp_path, mock_groups):
    """End-to-end: a binned + gated_metrics trainer completes two epochs,
    logs metrics, and saves checkpoints."""
    cfg = ExperimentConfig(
        d_model=32, nhead=4, num_layers=1, d_ff=64, max_seq=1408,
        epochs=2, pretraining_epochs=1, batch_size=1, print_every=4,
        output_dir=str(tmp_path), bf16=False, dropout=0.1,
        binned_batching=True, gated_metrics=True,
    )
    trainer = Trainer(cfg)
    trainer.run(mock_groups, mock_groups)
    assert os.path.exists(os.path.join(cfg.output_dir, "metrics.jsonl"))
    latest = latest_checkpoint(os.path.join(cfg.output_dir, cfg.checkpoint_dir))
    assert latest is not None and latest.endswith("checkpoint_1")


def test_tensile_head_scale():
    """head_scales multiplies exactly the named head's loss (VERDICT r4 #7
    recipe lever) and leaves every other head at reference parity."""
    import jax
    import jax.numpy as jnp
    import pytest

    from smer_music_generation_tpu.train.loss import build_loss_tables, multihead_ce
    from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab

    vocab = WordVocab(0, CONTROL_SETS[5])
    t1 = build_loss_tables(vocab)
    t3 = build_loss_tables(vocab, head_scales={"tensile": 3.0})
    i = t1["heads"].index("tensile")
    np.testing.assert_allclose(
        t3["head_weights"][i], 3.0 * t1["head_weights"][i]
    )
    other = [j for j in range(len(t1["heads"])) if j != i]
    np.testing.assert_array_equal(
        t3["head_weights"][other], t1["head_weights"][other]
    )
    with pytest.raises(ValueError):
        build_loss_tables(vocab, head_scales={"not_a_head": 2.0})

    rng = jax.random.PRNGKey(3)
    logits = jax.random.normal(rng, (2, 16, vocab.vocab_size))
    tgt = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 1, vocab.vocab_size)
    _, ph1 = multihead_ce(logits, tgt, t1, 1.0)
    _, ph3 = multihead_ce(logits, tgt, t3, 1.0)
    np.testing.assert_allclose(
        float(ph3["tensile"]), 3.0 * float(ph1["tensile"]), rtol=1e-6
    )
    np.testing.assert_allclose(float(ph3["pitch"]), float(ph1["pitch"]), rtol=1e-6)
