#!/bin/bash
# Round-5 TPU work queue, part 3: the rows_per_batch=4 binned variant —
# the second arm of the Finding-8 defaults-flip experiment.  r8 (binned
# rows=8, lr 1e-4) and r9 (binned rows=8, lr 1.6e-4) both plateau at
# best valid ~0.610-0.612 vs the plain runs' 0.566/0.578: LR scaling
# does not close the per-epoch gap, so the remaining lever VERDICT r4 #2
# names is halving the effective batch (rows_per_batch 4 -> ~1.4x rows
# per update, ~1,480 updates/epoch vs plain's 2,030).  Full recipe +
# held-out test + 144-window eval at the standard settings.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step r10_rows4_train
timeout 10800 python -m smer_music_generation_tpu.train.loop \
  --train_batches corpus/data/smer_training \
  --valid_batches corpus/data/smer_validation \
  -e 20 --batch_size 1 --seed 99 --binned --gated_metrics \
  --rows_per_batch 4 \
  --output_dir runs/flagship_r10_binned4 > /tmp/r5_r10train.log 2>&1 || true

step r10_test
timeout 1800 python -m smer_music_generation_tpu.train.loop \
  -x --test_batches corpus/data/smer_test \
  -c runs/flagship_r10_binned4/checkpoints/checkpoint_19 --seed 99 \
  --output_dir runs/flagship_r10_binned4 > /tmp/r5_r10test.log 2>&1 || true

step r10_eval
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/flagship_r10_binned4/checkpoints/checkpoint_19 \
  --config runs/flagship_r10_binned4/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --output runs/flagship_r10_binned4/eval3_ckpt19.json > /tmp/r5_r10eval.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN3 DONE ==="
