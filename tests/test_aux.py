"""Auxiliary components: classifier model, ordinal loss, profiling, config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.models.classifier import ClassifyTransformer
from smer_music_generation_tpu.models.transformer import ModelConfig
from smer_music_generation_tpu.train.loss import ordinal_loss, soft_label_weights
from smer_music_generation_tpu.utils.config import ExperimentConfig
from smer_music_generation_tpu.utils.logging import MetricsLogger, logger_init
from smer_music_generation_tpu.utils.profiling import StepTimer, device_memory_stats


def test_classifier_shapes():
    cfg = ModelConfig(vocab_size=50, d_model=16, nhead=2, num_encoder_layers=2,
                      d_ff=32, max_len=64, dropout=0.0, pos_dropout=0.0)
    model = ClassifyTransformer(cfg)
    src = jnp.ones((3, 20), dtype=jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src)
    out1, out2 = model.apply(params, src)
    assert out1.shape == (3, 2) and out2.shape == (3, 2)
    # pad mask changes pooling
    mask = jnp.zeros((3, 20), bool).at[:, 10:].set(True)
    m1, _ = model.apply(params, src, mask)
    assert m1.shape == (3, 2)


def test_classifier_learns_token_presence():
    """Overfit the two binary heads on a token-derivable task: a model
    with any gradient/pooling regression cannot reach high accuracy."""
    import optax

    cfg = ModelConfig(vocab_size=30, d_model=32, nhead=2, num_encoder_layers=1,
                      d_ff=64, max_len=32, dropout=0.0, pos_dropout=0.0)
    model = ClassifyTransformer(cfg)
    rng = np.random.default_rng(0)
    src = rng.integers(2, 30, size=(64, 16))
    # head0: does token 7 appear; head1: is the sequence mostly high tokens
    y0 = (src == 7).any(axis=1).astype(np.int32)
    y1 = (src > 15).sum(axis=1) > 8
    src = jnp.asarray(src)
    y = (jnp.asarray(y0), jnp.asarray(y1.astype(np.int32)))
    params = model.init({"params": jax.random.PRNGKey(0)}, src)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, src)
        return sum(
            optax.softmax_cross_entropy_with_integer_labels(l, t).mean()
            for l, t in zip(logits, y)
        )

    step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(jax.grad(loss_fn)(p)))
    first = float(loss_fn(params))
    for _ in range(150):
        updates, opt_state = step(params, opt_state)
        params = optax.apply_updates(params, updates)
    final = float(loss_fn(params))
    assert final < first * 0.2
    logits = model.apply(params, src)
    for l, t in zip(logits, y):
        acc = float((jnp.argmax(l, -1) == t).mean())
        assert acc >= 0.9


def test_soft_label_weights():
    w = soft_label_weights(10, (2, 5), "medium")
    assert w.shape == (10, 10)
    block = w[2:6, 2:6]
    np.testing.assert_allclose(block.sum(axis=0), 1.0, rtol=1e-6)
    # nearest ordinal gets the highest weight
    assert np.argmax(block[:, 0]) == 0 and np.argmax(block[:, 3]) == 3
    assert w[:2].sum() == 0 and w[6:].sum() == 0


def test_ordinal_loss_prefers_near_miss():
    w = soft_label_weights(8, (0, 7), "medium")
    targets = jnp.array([4])
    near = jnp.full((1, 8), -5.0).at[0, 5].set(5.0)  # predicts 5 (near 4)
    far = jnp.full((1, 8), -5.0).at[0, 0].set(5.0)  # predicts 0 (far)
    assert float(ordinal_loss(near, targets, w)) < float(ordinal_loss(far, targets, w))


def test_step_timer():
    t = StepTimer("x")
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["x_count"] == 3 and s["x_p50_s"] >= 0


def test_config_roundtrip(tmp_path):
    cfg = ExperimentConfig(control_number=3, control_mode=1)
    assert cfg.control_list == ["key", "polyphony"]
    assert cfg.bar_track_control and not cfg.bar_control_at_end
    p = str(tmp_path / "c.json")
    cfg.save(p)
    cfg2 = ExperimentConfig.load(p)
    assert cfg2 == cfg
    cfg3 = ExperimentConfig.from_args(["-m", "1", "-t", "2", "-w", "0"])
    assert cfg3.vocab_mode == 1 and cfg3.control_list == ["key", "density"]


def test_logger_and_metrics(tmp_path):
    log = logger_init(str(tmp_path / "log.txt"))
    log.info("hello")
    m = MetricsLogger(str(tmp_path / "m.jsonl"))
    m.log({"loss": 1.5}, step=3)
    m.close()
    import json

    rec = json.loads(open(tmp_path / "m.jsonl").read().strip())
    assert rec["loss"] == 1.5 and rec["_step"] == 3


def test_run_identity_resume_and_config_diff(tmp_path):
    """run.json: fresh run gets an id; reopening resumes with the same id
    and surfaces config overrides (reference wandb resume semantics,
    train.py:202-222)."""
    import json

    from smer_music_generation_tpu.utils.logging import RunIdentity

    r1 = RunIdentity(str(tmp_path), config={"lr": 1e-4, "epochs": 10})
    assert not r1.resumed and len(r1.run_id) == 8

    r2 = RunIdentity(str(tmp_path), config={"lr": 5e-5, "epochs": 10})
    assert r2.resumed and r2.run_id == r1.run_id
    assert r2.config_diff == {"lr": (1e-4, 5e-5)}

    meta = json.load(open(tmp_path / "run.json"))
    assert meta["config"]["lr"] == 5e-5  # override wins
    assert len(meta["resumes"]) == 1

    # config=None means "no override": no spurious every-key-to-None diff
    r3 = RunIdentity(str(tmp_path))
    assert r3.resumed and r3.config_diff == {}
    meta = json.load(open(tmp_path / "run.json"))
    assert meta["config"]["lr"] == 5e-5  # unchanged


def test_metrics_logger_degrades_on_unserializable(tmp_path):
    """Non-JSON values (arrays) must degrade to repr, not raise out of
    log() and kill the training step."""
    import json

    import numpy as np

    m = MetricsLogger(str(tmp_path / "m.jsonl"))
    m.log({"loss": 1.0, "per_class": np.arange(3)}, step=1)
    m.close()
    rec = json.loads(open(tmp_path / "m.jsonl").read().strip())
    assert rec["loss"] == 1.0 and "per_class" in rec
