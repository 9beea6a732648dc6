"""One dataclass config for the whole experiment matrix.

Collapses the reference's scattered flag surfaces — argparse per CLI,
hard-coded config dict (``train.py:151-161``), wandb snapshot
(``config/config.yaml``) and absolute paths — into a single serializable
config (SURVEY.md §5.6).  The de-facto experiment axes are preserved:

* ``vocab_mode``: 0 = SMER, 1 = REMI (reference ``-m``);
* ``control_number``: 0..5 control-set selection (``train.py:1393-1405``);
* ``control_mode``: 0 = track controls only, 1 = + bar controls,
  2 = + bar controls copied to span ends (``train.py:471-479``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import List, Optional

from ..vocab import CONTROL_SETS


@dataclasses.dataclass
class ExperimentConfig:
    # data
    vocab_mode: int = 0
    control_number: int = 5
    control_mode: int = 2
    batch_size: int = 2  # packed groups per step
    max_token_length: int = 2200
    train_batches: str = ""
    valid_batches: str = ""
    test_batches: str = ""

    # model (flagship artifact: config/config.yaml:26-43)
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 4
    d_ff: int = 2048
    max_seq: int = 2400
    dropout: float = 0.1
    # fused flash attention with VJP for the train step (off by default:
    # measured slower than XLA at the flagship shape; see models/transformer)
    flash_training: bool = False
    # rematerialize encoder/decoder layers in bwd (saves the O(S^2) f32
    # attention temporaries; extends the trainable envelope — see
    # docs/PERFORMANCE.md remat section)
    remat: bool = False
    # bf16 softmax residual in attention backward (+7-35% step throughput
    # at packed shapes; gradients round through bf16 — flip off to replay
    # runs trained before the flag; docs/PERFORMANCE.md Finding 5)
    bf16_attn_residual: bool = True
    # fused softmax->dropout->V-matmul backward: one bf16 residual plus
    # the RNG key instead of three (B, H, T, S) residuals; forward
    # bit-identical, gradients rounding-equal to the unfused path
    # (docs/PERFORMANCE.md Finding 6)
    fused_attn_bwd: bool = True
    # full pallas fused dropout-attention (fwd + recompute bwd, in-kernel
    # counter-hash dropout RNG): no O(T*S) residual reaches HBM at all,
    # but MEASURED 2.1x slower than XLA at the flagship shapes — keep
    # off except for long-sequence variants; also a different dropout
    # stream than jax.random (docs/PERFORMANCE.md Finding 7)
    fused_attn_train: bool = False

    # optimisation
    lr: float = 1e-4
    epochs: int = 10
    pretraining_epochs: int = 2
    eos_weight: float = 0.8
    total_mask_ratio: float = 0.15
    seed: int = 99
    # tensile loss-head multiplier (steering-recipe lever, VERDICT r4 #7;
    # 1.0 = reference parity — every reference head weighs 1)
    tensile_weight: float = 1.0

    # runtime
    checkpoint_dir: str = "checkpoints"
    resume_from: Optional[str] = None
    reset_epoch: bool = False
    output_dir: str = "runs/default"
    print_every: int = 100
    is_debug: bool = False
    is_test: bool = False
    n_devices: int = 0  # 0 = all
    tp: int = 1
    # multi-slice data parallelism: split dp hierarchically over
    # (DCN slices, ICI) — SURVEY §2.5.  1 = single slice (flat ICI mesh).
    dcn_slices: int = 1
    bf16: bool = True
    # hardware-counter-based PRNG for dropout masks: measured 2x the full
    # train step vs threefry at the real packed shapes (36 -> 18 ms,
    # docs/PERFORMANCE.md).  Applied by the train CLI (global jax config),
    # not by library code — flip off to reproduce threefry-exact runs.
    rbg_rng: bool = True
    # shape-bucket granularity for collated batches.  Finetuning masks
    # draw continuously-varying target lengths; 128-token buckets produce
    # ~100+ distinct (rows, src, tgt) shapes x ~90 s remote compile each
    # on a tunnelled backend.  256 cuts the shape count ~8x for ~10% pad
    # waste (steps are 18-40 ms; compiles are the epoch-1 bottleneck).
    seq_bucket: int = 256
    row_bucket: int = 8
    # shape-binned batching (PERFORMANCE.md Finding 8): pool masked rows
    # across pack groups into per-shape bins — FLOP utilization 0.19 ->
    # 0.68 on the real corpus (scripts/padding_audit.py).  Train loader
    # only.  DEFAULT since round 5: the rows_per_batch=4 full-recipe run
    # (flagship_r10_binned4, docs/TRAINING.md) matches the plain-loader
    # valid curve within seed noise (best 0.5883 vs 0.5656/0.5783) at
    # ~1/2.5 the wall-clock; r8 (rows 8) and r9 (rows 8, lr x1.6) did
    # NOT and stayed opt-in — the flip follows the same frozen-defaults
    # policy as every numerics change.  --no-binned restores the
    # reference's per-group batching exactly.
    binned_batching: bool = True
    rows_per_batch: int = 4  # 0 = row_bucket (binned mode only)
    # compute per-class accuracy + per-module norm summaries only on
    # logged steps (the reference computes accuracy on wandb.log steps,
    # train.py:800-880, not every step); loss and global grad norm stay
    # per-step.  Identical parameter trajectory either way.
    gated_metrics: bool = True

    @property
    def control_list(self) -> List[str]:
        return CONTROL_SETS[self.control_number]

    @property
    def bar_track_control(self) -> bool:
        return self.control_mode >= 1

    @property
    def bar_control_at_end(self) -> bool:
        return self.control_mode == 2

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls(**json.load(f))

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "ExperimentConfig":
        parser = argparse.ArgumentParser(description="SMER TPU training")
        defaults = cls()
        parser.add_argument("-m", "--vocab_mode", type=int, default=defaults.vocab_mode)
        parser.add_argument("-t", "--control_number", type=int, default=defaults.control_number)
        parser.add_argument("-w", "--control_mode", type=int, default=defaults.control_mode)
        parser.add_argument("-c", "--resume_from", type=str, default=None)
        parser.add_argument("-a", "--reset_epoch", action="store_true")
        parser.add_argument("-x", "--is_test", action="store_true")
        parser.add_argument("-d", "--is_debug", action="store_true")
        parser.add_argument("-e", "--epochs", type=int, default=defaults.epochs)
        parser.add_argument("-l", "--lr", type=float, default=defaults.lr)
        parser.add_argument("--train_batches", type=str, default="")
        parser.add_argument("--valid_batches", type=str, default="")
        parser.add_argument("--test_batches", type=str, default="")
        parser.add_argument("--output_dir", type=str, default=defaults.output_dir)
        parser.add_argument("--d_model", type=int, default=defaults.d_model)
        parser.add_argument("--nhead", type=int, default=defaults.nhead)
        parser.add_argument("--num_layers", type=int, default=defaults.num_layers)
        parser.add_argument("--flash_training", action="store_true")
        parser.add_argument("--remat", action="store_true")
        parser.add_argument("--batch_size", type=int, default=defaults.batch_size)
        parser.add_argument("--tp", type=int, default=defaults.tp)
        parser.add_argument("--dcn_slices", type=int, default=defaults.dcn_slices,
                            help="multi-slice dp: split the batch over "
                            "(dcn, dp) with gradient reduction across "
                            "slices on DCN")
        parser.add_argument("--no_bf16", action="store_true")
        parser.add_argument("--no_rbg_rng", action="store_true")
        parser.add_argument("--no_bf16_attn_residual", action="store_true")
        parser.add_argument("--no_fused_attn_bwd", action="store_true")
        parser.add_argument("--fused_attn_train", action="store_true")
        parser.add_argument("--pretraining_epochs", type=int,
                            default=defaults.pretraining_epochs)
        parser.add_argument("--print_every", type=int, default=defaults.print_every)
        parser.add_argument("--seed", type=int, default=defaults.seed,
                            help="init + masking RNG seed (reference "
                            "train.py fixes 99; vary for replicate runs)")
        parser.add_argument("--binned", action=argparse.BooleanOptionalAction,
                            default=defaults.binned_batching,
                            help="shape-binned train batching (Finding 8; "
                            "default on — --no-binned restores the "
                            "reference's per-group batching)")
        parser.add_argument("--rows_per_batch", type=int,
                            default=defaults.rows_per_batch)
        parser.add_argument("--gated_metrics",
                            action=argparse.BooleanOptionalAction,
                            default=defaults.gated_metrics,
                            help="per-class accuracy/module norms on "
                            "logged steps only")
        parser.add_argument("--tensile_weight", type=float,
                            default=defaults.tensile_weight,
                            help="tensile loss-head multiplier "
                            "(steering-recipe experiments)")
        args = parser.parse_args(argv)
        cfg = cls(
            vocab_mode=args.vocab_mode,
            control_number=args.control_number,
            control_mode=args.control_mode,
            resume_from=args.resume_from,
            reset_epoch=args.reset_epoch,
            is_test=args.is_test,
            is_debug=args.is_debug,
            epochs=args.epochs,
            lr=args.lr,
            train_batches=args.train_batches,
            valid_batches=args.valid_batches,
            test_batches=args.test_batches,
            output_dir=args.output_dir,
            d_model=args.d_model,
            nhead=args.nhead,
            num_layers=args.num_layers,
            flash_training=args.flash_training,
            remat=args.remat,
            batch_size=args.batch_size,
            tp=args.tp,
            dcn_slices=args.dcn_slices,
            bf16=not args.no_bf16,
            rbg_rng=not args.no_rbg_rng,
            bf16_attn_residual=not args.no_bf16_attn_residual,
            fused_attn_bwd=not args.no_fused_attn_bwd,
            fused_attn_train=args.fused_attn_train,
            pretraining_epochs=args.pretraining_epochs,
            print_every=args.print_every,
            seed=args.seed,
            binned_batching=args.binned,
            rows_per_batch=args.rows_per_batch,
            gated_metrics=args.gated_metrics,
            tensile_weight=args.tensile_weight,
        )
        return cfg
