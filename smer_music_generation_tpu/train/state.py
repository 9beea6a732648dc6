"""Train state, pjit-sharded train/eval steps, plateau LR schedule.

Replaces the reference's torch training internals (``train.py:555-786``)
with a functional JAX step: one fused loss (see ``train/loss.py``), Adam
via optax with an injectable learning rate, and a host-side
reduce-on-plateau controller mirroring ``ReduceLROnPlateau(patience=2,
factor=0.5, min_lr=1e-7)`` (``train.py:663``).

The step is jit-compiled with explicit shardings from ``parallel/mesh``:
batch sharded over ``dp``, params replicated (or TP-sharded under the
optional rules) — XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.transformer import ModelConfig, ScoreTransformer
from .loss import multihead_ce, per_class_accuracy


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array
    lr: jax.Array

    @classmethod
    def create(cls, params, lr: float):
        tx = make_optimizer()
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(lr, jnp.float32),
        )


def make_optimizer():
    # lr injected per step through the state so plateau decay needs no
    # re-jit (optax scale_by_learning_rate with a passed-in scalar)
    return optax.chain(
        optax.scale_by_adam(),
        optax.scale(-1.0),
    )


def make_train_step(
    model: ScoreTransformer,
    tables: Dict,
    dropout: bool = True,
    with_metrics: bool = True,
):
    """Returns step(state, batch, eos_weight, rng) -> (state, metrics).

    ``with_metrics=False`` builds the lean variant (ExperimentConfig
    ``gated_metrics``): identical parameter update, but per-class
    accuracy, per-head losses and per-module norm summaries are dropped
    from the compiled program — only the loss and the global grad norm
    (needed by the per-epoch gradient-health summary) are returned.  The
    reference likewise computes ``accuracy()`` only on wandb-logged
    steps (train.py:800-880).
    """

    def step_fn(state: TrainState, batch: Dict, eos_weight, rng):
        def loss_fn(params):
            logits, _ = model.apply(
                params,
                batch["input"],
                batch["target_in"],
                src_pad_mask=batch["input_pad_mask"],
                tgt_pad_mask=batch["target_pad_mask"],
                deterministic=not dropout,
                rngs={"dropout": rng} if dropout else {},
            )
            total, per_head = multihead_ce(logits, batch["target_out"], tables, eos_weight)
            return total, (per_head, logits)

        (loss, (per_head, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # Gradient/parameter observability (reference: wandb.watch(model,
        # ..., log="all"), train.py:661, logs grad/param histograms).  The
        # TPU-shaped equivalent is norm summaries computed inside the same
        # fused step program: a global L2 over each tree plus one L2 per
        # top-level module, all scalars in the existing metrics fetch.
        def _sumsq(tree):
            return sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(tree)
            )

        norm_metrics = {"grad_norm": jnp.sqrt(_sumsq(grads))}
        if with_metrics:
            norm_metrics["param_norm"] = jnp.sqrt(_sumsq(state.params))
            for name, sub in grads["params"].items():
                norm_metrics[f"gnorm/{name}"] = jnp.sqrt(_sumsq(sub))
            for name, sub in state.params["params"].items():
                norm_metrics[f"pnorm/{name}"] = jnp.sqrt(_sumsq(sub))

        tx = make_optimizer()
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr, updates)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {"loss": loss, **norm_metrics}
        if with_metrics:
            correct_pc, count_pc, total_correct, total_count = per_class_accuracy(
                logits, batch["target_out"], tables
            )
            metrics.update(
                {
                    "accuracy": total_correct / jnp.maximum(total_count, 1),
                    "correct_per_class": correct_pc,
                    "count_per_class": count_pc,
                    **{f"loss/{k}": v for k, v in per_head.items()},
                }
            )
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, metrics

    return step_fn


def make_eval_step(model: ScoreTransformer, tables: Dict):
    def eval_fn(params, batch, eos_weight):
        logits, _ = model.apply(
            params,
            batch["input"],
            batch["target_in"],
            src_pad_mask=batch["input_pad_mask"],
            tgt_pad_mask=batch["target_pad_mask"],
            deterministic=True,
        )
        total, per_head = multihead_ce(logits, batch["target_out"], tables, eos_weight)
        correct_pc, count_pc, total_correct, total_count = per_class_accuracy(
            logits, batch["target_out"], tables
        )
        return {
            "loss": total,
            "accuracy": total_correct / jnp.maximum(total_count, 1),
            "correct_per_class": correct_pc,
            "count_per_class": count_pc,
            **{f"loss/{k}": v for k, v in per_head.items()},
        }

    return eval_fn


@dataclasses.dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (patience 2, x0.5, min 1e-7).

    ``threshold`` is torch's default rel-mode threshold (1e-4): an epoch
    only counts as an improvement when loss < best * (1 - threshold), so
    runs creeping down by negligible amounts still decay the LR exactly
    as the reference scheduler (train.py:663-664) would.
    """

    patience: int = 2
    factor: float = 0.5
    min_lr: float = 1e-7
    threshold: float = 1e-4
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, lr: float, epoch_loss: float) -> float:
        if epoch_loss < self.best * (1.0 - self.threshold):
            self.best = epoch_loss
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr


def build_model(
    vocab_size: int,
    d_model: int = 512,
    nhead: int = 8,
    num_layers: int = 4,
    d_ff: int = 2048,
    max_len: int = 2400,
    dropout: float = 0.1,
    dtype=jnp.float32,
    flash_training: bool = False,
    final_norm: bool = True,
    remat: bool = False,
    bf16_attn_residual: bool = True,
    fused_attn_bwd: bool = True,
    fused_attn_train: bool = False,
) -> ScoreTransformer:
    """The flagship config (reference ``config/config.yaml:26-43``)."""
    cfg = ModelConfig(
        vocab_size=vocab_size,
        d_model=d_model,
        nhead=nhead,
        num_encoder_layers=num_layers,
        num_decoder_layers=num_layers,
        d_ff=d_ff,
        max_len=max_len,
        dropout=dropout,
        pos_dropout=dropout,
        dtype=dtype,
        flash_training=flash_training,
        final_norm=final_norm,
        remat=remat,
        bf16_attn_residual=bf16_attn_residual,
        fused_attn_bwd=fused_attn_bwd,
        fused_attn_train=fused_attn_train,
    )
    return ScoreTransformer(cfg)


def default_flagship_snapshot() -> str | None:
    """Path of the committed trained-flagship snapshot, if it exists.

    ``assets/flagship_params.msgpack`` (repo root; see
    ``scripts/export_params.py``) ships the best trained checkpoint as
    bf16 params so serving/generation works out of the box on a fresh
    host.  CLIs fall back to it when invoked with NO --checkpoint and NO
    --config (a custom config implies a custom model the snapshot would
    not fit); pass ``--checkpoint random`` to force random weights.
    """
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "assets", "flagship_params.msgpack",
    )
    return path if os.path.isfile(path) else None


def load_inference_model(cfg, vocab_size: int, checkpoint: str | None, dtype):
    """Build the flagship model and restore ``checkpoint`` into it.

    ``checkpoint`` may be an orbax run directory OR a committed
    params-only ``.msgpack`` snapshot (``checkpoint.export_params_msgpack``
    / ``scripts/export_params.py``) — the latter survives ephemeral-host
    wipes, so generate/serve/eval/bench stay reproducible with trained
    weights on a fresh machine.

    Auto-detects the checkpoint's ``final_norm`` layout (the default
    flipped to True mid-round-1; pre-flip checkpoints lack norm_e/norm_d —
    ADVICE r1) so old artifacts restore without an explicit flag.  Returns
    ``(model, params, epoch)``; epoch is -1 with no checkpoint.
    """
    is_snapshot = bool(checkpoint) and os.path.isfile(checkpoint)
    snapshot_meta = {}
    final_norm = True
    if is_snapshot:
        sidecar = checkpoint + ".json"
        if os.path.isfile(sidecar):
            import json

            with open(sidecar) as fh:
                snapshot_meta = json.load(fh)
            final_norm = bool(snapshot_meta.get("final_norm", True))
    elif checkpoint:
        from .checkpoint import checkpoint_has_final_norm

        detected = checkpoint_has_final_norm(checkpoint)
        if detected is not None:
            final_norm = detected
    model = build_model(
        vocab_size, d_model=cfg.d_model, nhead=cfg.nhead,
        num_layers=cfg.num_layers, d_ff=cfg.d_ff, max_len=cfg.max_seq,
        dropout=0.0, dtype=dtype, final_norm=final_norm,
    )
    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.ones((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32),
        )

    if is_snapshot:
        from .checkpoint import import_params_msgpack

        abstract_params = jax.eval_shape(init_fn)
        params = import_params_msgpack(checkpoint, abstract_params)
        epoch = int(snapshot_meta.get("epoch", -1))
    elif checkpoint:
        from .checkpoint import restore_params_only

        # abstract trees only: neither the random init nor the optimizer's
        # mu/nu (~2x param bytes) are materialized on the inference path —
        # the checkpoint's params are the only real allocation
        abstract_state = jax.eval_shape(
            lambda: TrainState.create(init_fn(), lr=cfg.lr)
        )
        params, epoch = restore_params_only(checkpoint, abstract_state)
    else:
        params, epoch = jax.jit(init_fn)(), -1
    return model, params, epoch
