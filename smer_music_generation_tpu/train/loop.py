"""Training driver: the ``train.py`` equivalent, pjit-sharded.

Reference call stack (SURVEY.md §3.3): 2 pretraining epochs (span
corruption, eos weight 0.8) then finetuning epochs (bar/track masks, eos
weight 1.0), per-class losses/accuracies every ``print_every`` steps,
ReduceLROnPlateau on the epoch train loss, a checkpoint per epoch, and a
``-x`` test mode computing loss/accuracy on the held-out split.

TPU-first mechanics: batches are padded to shape buckets (bounded
recompiles), the batch axis is padded to a multiple of the dp mesh axis and
sharded over it, the train step is one fused jit program per bucket.
"""

from __future__ import annotations

import dataclasses
import os
from collections import defaultdict
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import BatchLoader, LoaderConfig
from ..data.masking import MaskingConfig
from ..data.pack import load_batches
from ..parallel.mesh import batch_sharding, make_mesh, train_state_shardings
from ..utils.config import ExperimentConfig
from ..utils.logging import MetricsLogger, logger_init
from ..vocab import WordVocab
from .checkpoint import restore_checkpoint, save_checkpoint
from .loss import build_loss_tables
from .state import (
    PlateauScheduler,
    TrainState,
    build_model,
    make_eval_step,
    make_train_step,
)


def pad_batch_rows(batch: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad the batch (row) axis to a multiple of the dp axis; all-pad rows
    contribute nothing to the loss (pad targets are ignored)."""
    B = batch["input"].shape[0]
    target = int(np.ceil(B / multiple)) * multiple
    if target == B:
        return batch
    out = {}
    for k, v in batch.items():
        pad_val = True if v.dtype == bool else 0
        pad = np.full((target - B,) + v.shape[1:], pad_val, dtype=v.dtype)
        out[k] = np.concatenate([v, pad], axis=0)
    return out


class Trainer:
    def __init__(self, cfg: ExperimentConfig, logger=None):
        self.cfg = cfg
        # append when re-entering an output_dir (resume or an existing
        # run.json): mode='w' would truncate the previous run's log
        self.logger = logger or logger_init(
            os.path.join(cfg.output_dir, "logging.log"),
            append=bool(cfg.resume_from)
            or os.path.exists(os.path.join(cfg.output_dir, "run.json")),
        )
        from ..utils.logging import RunIdentity

        self.run_identity = RunIdentity(
            cfg.output_dir, config=dataclasses.asdict(cfg), logger=self.logger
        )
        self.metrics = MetricsLogger(
            os.path.join(cfg.output_dir, "metrics.jsonl"),
            run_id=self.run_identity.run_id,
        )

        self.vocab = WordVocab(cfg.vocab_mode, cfg.control_list)
        dtype = jnp.bfloat16 if cfg.bf16 and jax.default_backend() == "tpu" else jnp.float32
        self.model = build_model(
            self.vocab.vocab_size,
            d_model=cfg.d_model,
            nhead=cfg.nhead,
            num_layers=cfg.num_layers,
            d_ff=cfg.d_ff,
            max_len=cfg.max_seq,
            dropout=cfg.dropout,
            dtype=dtype,
            flash_training=cfg.flash_training,
            remat=cfg.remat,
            bf16_attn_residual=cfg.bf16_attn_residual,
            fused_attn_bwd=cfg.fused_attn_bwd,
            fused_attn_train=cfg.fused_attn_train,
        )
        self.tables = build_loss_tables(
            self.vocab,
            head_scales=(
                {"tensile": cfg.tensile_weight}
                if cfg.tensile_weight != 1.0 else None
            ),
        )
        self.mesh = make_mesh(
            cfg.n_devices or None, tp=cfg.tp, dcn_slices=cfg.dcn_slices
        )
        # total data-parallel width (batch rows pad to a multiple of it);
        # with a dcn axis the batch shards over (dcn, dp) hierarchically
        self.dp = self.mesh.shape["dp"] * self.mesh.shape.get("dcn", 1)

        rng = jax.random.PRNGKey(cfg.seed)
        src = jnp.ones((2, 16), dtype=jnp.int32)
        tgt = jnp.ones((2, 16), dtype=jnp.int32)
        # jit the init: eager tracing dispatches hundreds of individual ops,
        # each a full round trip over a tunnelled backend (measured: minutes
        # vs seconds jitted)
        params = jax.jit(self.model.init)({"params": rng}, src, tgt)
        self.state = TrainState.create(params, lr=cfg.lr)
        self.start_epoch = 0
        if cfg.resume_from and os.path.isfile(cfg.resume_from):
            # params-only .msgpack snapshot (checkpoint.export_params_msgpack):
            # warm-start the weights with a FRESH optimizer — finetune
            # experiments stay reproducible after ephemeral-host wipes,
            # where orbax run dirs are gone.  Epoch always resets (there
            # is no opt_state/epoch continuity to preserve).
            from .checkpoint import import_params_msgpack

            sidecar = cfg.resume_from + ".json"
            if os.path.isfile(sidecar):
                import json

                with open(sidecar) as fh:
                    snap_norm = json.load(fh).get("final_norm")
                model_norm = "norm_e" in self.state.params.get("params", {})
                if snap_norm is not None and bool(snap_norm) != model_norm:
                    raise ValueError(
                        f"snapshot {cfg.resume_from!r} was exported with "
                        f"final_norm={snap_norm} but the model was built "
                        f"with final_norm={model_norm}"
                    )
            params = import_params_msgpack(
                cfg.resume_from, jax.eval_shape(lambda: self.state.params)
            )
            self.state = TrainState.create(params, lr=cfg.lr)
            self.logger.info(
                f"warm-started params from snapshot {cfg.resume_from} "
                "(fresh optimizer, epoch 0)"
            )
        elif cfg.resume_from:
            self.state, epoch, loss = restore_checkpoint(cfg.resume_from, self.state)
            self.start_epoch = 0 if cfg.reset_epoch else epoch + 1
            self.logger.info(f"resumed from {cfg.resume_from} (epoch {epoch}, loss {loss:.4f})")

        # shard: params replicated (or the TP rules when tp > 1), batch
        # over dp.  device_put with the full state sharding tree IS the
        # TP application — jit propagates the input shardings through the
        # step so the state stays sharded across epochs.
        self._state_shard = train_state_shardings(self.mesh, self.state)
        self._data_shard = batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, self._state_shard)

        # NO buffer donation: over a tunnelled/relayed backend (axon)
        # donating the state forces a full host round-trip of params +
        # opt_state every step — measured 6 s/step vs 18 ms/step without
        # (r2 bisect, docs/PERFORMANCE.md).  At this model size (~360 MB
        # of f32 state) donation saves nothing on a 16 GB chip.
        self._train_step = jax.jit(
            make_train_step(self.model, self.tables, dropout=cfg.dropout > 0)
        )
        # lean twin for non-logged steps under gated_metrics: same update,
        # no accuracy/per-module-norm computation or transfer
        self._train_step_lean = (
            jax.jit(
                make_train_step(
                    self.model, self.tables, dropout=cfg.dropout > 0,
                    with_metrics=False,
                )
            )
            if cfg.gated_metrics
            else None
        )
        self._eval_step = jax.jit(make_eval_step(self.model, self.tables))
        self._rng = jax.random.PRNGKey(cfg.seed + 17)

    # ------------------------------------------------------------------
    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        batch = pad_batch_rows(batch, self.dp)
        # device_put straight from numpy: one host->devices transfer per
        # leaf (jnp.asarray first would land the batch on device 0 and
        # then reshard device-to-device); ONE pytree call, not one dispatch
        # per leaf — dispatch overhead is per-call on a tunnelled backend
        return jax.device_put(
            {k: np.asarray(v) for k, v in batch.items()}, self._data_shard
        )

    def make_loader(
        self, groups, pretraining: bool, seed_offset: int = 0,
        binned: bool = False,
    ) -> BatchLoader:
        cfg = self.cfg
        return BatchLoader(
            self.vocab,
            groups,
            LoaderConfig(
                batch_size=cfg.batch_size,
                max_src=cfg.max_seq,
                max_tgt=cfg.max_seq,
                pretraining=pretraining,
                bucket=cfg.seq_bucket,
                row_bucket=cfg.row_bucket,
                # binned batching applies to the train stream only: valid/
                # test keep the group-per-batch layout so their loss curves
                # stay comparable across runs
                bin_rows=binned,
                rows_per_batch=cfg.rows_per_batch,
            ),
            MaskingConfig(
                total_mask_ratio=cfg.total_mask_ratio,
                bar_track_control=cfg.bar_track_control,
                bar_control_at_end=cfg.bar_control_at_end,
            ),
            seed=cfg.seed + seed_offset,
        )

    # ------------------------------------------------------------------
    def train_epoch(self, loader: Iterable, eos_weight: float, epoch: int) -> float:
        from ..utils.profiling import StepTimer

        losses = []
        grad_norms = []
        acc_correct = defaultdict(float)
        acc_count = defaultdict(float)
        names = self.tables["class_names"]
        timer = StepTimer("train_step")
        from ..data.loader import Prefetcher

        for step, batch in enumerate(Prefetcher(iter(loader), depth=2)):
            self._rng, sub = jax.random.split(self._rng)
            # logged steps must carry full metrics; everything else may
            # take the lean step (gated_metrics)
            logged = (
                step < 3
                or step % self.cfg.print_every == self.cfg.print_every - 1
            )
            step_fn = (
                self._train_step_lean
                if (self._train_step_lean is not None and not logged)
                else self._train_step
            )
            try:
                with timer:
                    new_state, m = step_fn(
                        self.state, self._device_batch(batch), jnp.float32(eos_weight), sub
                    )
                    # materialize INSIDE both blocks: dispatch is async, so
                    # device-side errors surface here (where the catch can
                    # skip the batch with self.state still unpoisoned) and
                    # the timer brackets real execution, not just dispatch.
                    # ONE device_get for the whole metrics dict: per-leaf
                    # float()/asarray() fetches are each a device round trip
                    # (~11 on logging steps), and over a tunnelled backend
                    # those round trips — not masking/collation — dominate
                    # the wall-clock step
                    m = jax.device_get(m)
                    loss_val = float(m["loss"])
            except Exception as e:  # failure containment: skip the batch
                # (reference behaviour: blanket try/except + continue,
                # train.py:917-926; here scoped to the device step)
                self.logger.error(f"step {step} failed: {type(e).__name__}: {e}")
                continue
            self.state = new_state
            losses.append(loss_val)
            grad_norms.append(float(m["grad_norm"]))
            if "param_norm" in m:
                last_param_norm = float(m["param_norm"])
                for n, c, k in zip(names, m["correct_per_class"], m["count_per_class"]):
                    acc_correct[n] += c
                    acc_count[n] += k
            if logged:
                # the first steps are logged unconditionally: they carry the
                # per-bucket-shape compile cost, and a silent first epoch
                # reads as a hang on slow-compile backends
                record = {
                    "epoch": epoch,
                    "train_loss": float(np.mean(losses[-self.cfg.print_every:])),
                    "total_accuracy": float(m["accuracy"]),
                    "lr": float(self.state.lr),
                }
                record.update(
                    {
                        k: float(v)
                        for k, v in m.items()
                        if k.startswith(("loss/", "gnorm/", "pnorm/"))
                        or k in ("grad_norm", "param_norm")
                    }
                )
                self.metrics.log(record, step=int(self.state.step))
                self.logger.info(
                    f"epoch {epoch + 1} step {step + 1}: loss {record['train_loss']:.4f} "
                    f"acc {record['total_accuracy']:.4f}"
                )
        for n in names:
            if acc_count[n] > 0:
                self.metrics.log(
                    {f"ave_epoch_train_{n}_acc": acc_correct[n] / acc_count[n], "epoch": epoch},
                    step=int(self.state.step),
                )
        if timer.durations:
            self.metrics.log({**timer.summary(), "epoch": epoch}, step=int(self.state.step))
        if grad_norms:
            # per-epoch gradient-health summary (the wandb.watch gap,
            # reference train.py:661): mean/max grad norm over the epoch
            # plus the end-of-epoch global param norm
            self.metrics.log(
                {
                    "epoch_grad_norm_mean": float(np.mean(grad_norms)),
                    "epoch_grad_norm_max": float(np.max(grad_norms)),
                    "epoch_param_norm": last_param_norm,
                    "epoch": epoch,
                },
                step=int(self.state.step),
            )
        return float(np.mean(losses)) if losses else float("inf")

    def evaluate(self, loader: Iterable, eos_weight: float) -> Dict[str, float]:
        losses = []
        head_losses = defaultdict(list)
        correct = defaultdict(float)
        count = defaultdict(float)
        names = self.tables["class_names"]
        from ..data.loader import Prefetcher

        # same host/device overlap as train_epoch: collation of batch k+1
        # proceeds while the device runs eval step k
        for batch in Prefetcher(iter(loader), depth=2):
            # one device_get per batch (see train_epoch): per-leaf fetches
            # cost ~11 round trips each eval step over a tunnelled backend
            m = jax.device_get(
                self._eval_step(
                    self.state.params, self._device_batch(batch), jnp.float32(eos_weight)
                )
            )
            losses.append(float(m["loss"]))
            for k, v in m.items():
                if k.startswith("loss/"):
                    head_losses[k].append(float(v))
            for n, c, k in zip(names, m["correct_per_class"], m["count_per_class"]):
                correct[n] += c
                count[n] += k
        out = {"total": float(np.mean(losses)) if losses else float("inf")}
        for k, v in head_losses.items():
            out[k.split("/", 1)[1]] = float(np.mean(v))
        for n in names:
            if count[n] > 0:
                out[f"{n}_accuracy"] = correct[n] / count[n]
        return out

    # ------------------------------------------------------------------
    def run(self, train_groups, valid_groups) -> None:
        cfg = self.cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.output_dir, "config.json"))
        scheduler = PlateauScheduler()

        for epoch in range(self.start_epoch, cfg.epochs):
            pretraining = epoch < cfg.pretraining_epochs
            eos_weight = cfg.eos_weight if pretraining else 1.0
            phase = "pretraining" if pretraining else "finetuning"
            self.logger.info(f"{phase} epoch {epoch + 1}/{cfg.epochs}")

            train_loader = self.make_loader(
                train_groups, pretraining, seed_offset=epoch,
                binned=cfg.binned_batching,
            )
            valid_loader = self.make_loader(valid_groups, pretraining, seed_offset=1000 + epoch)

            train_loss = self.train_epoch(train_loader, eos_weight, epoch)
            val = self.evaluate(valid_loader, eos_weight)
            for k, v in val.items():
                self.metrics.log({f"val_{k}": v, "epoch": epoch}, step=int(self.state.step))
            self.logger.info(
                f"epoch {epoch + 1}: train {train_loss:.4f} valid {val['total']:.4f}"
            )

            new_lr = scheduler.update(float(self.state.lr), train_loss)
            if new_lr != float(self.state.lr):
                self.logger.info(f"plateau: lr -> {new_lr}")
                self.state = self.state.replace(lr=jnp.asarray(new_lr, jnp.float32))

            ckpt_dir = os.path.join(cfg.output_dir, cfg.checkpoint_dir)
            path = save_checkpoint(ckpt_dir, epoch, self.state, val["total"])
            self.logger.info(f"saved {path}")

    def test(self, test_groups) -> Dict[str, float]:
        loader = self.make_loader(test_groups, pretraining=False, seed_offset=31337)
        result = self.evaluate(loader, eos_weight=1.0)
        for k, v in result.items():
            self.logger.info(f"test {k}: {v:.4f}")
        return result


def main(argv=None):
    cfg = ExperimentConfig.from_args(argv)
    if cfg.rbg_rng:
        # 2x full-step throughput at real packed shapes (dropout mask
        # generation dominates threefry; see ExperimentConfig.rbg_rng)
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    trainer = Trainer(cfg)
    if cfg.is_test:
        groups, _ = load_batches(cfg.test_batches)
        trainer.test(groups)
    else:
        train_groups, _ = load_batches(cfg.train_batches)
        valid_groups, _ = load_batches(cfg.valid_batches)
        trainer.run(train_groups, valid_groups)


if __name__ == "__main__":
    main()
