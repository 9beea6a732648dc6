#!/bin/bash
# Round-5 TPU work queue, part 1: the LR-scaled shape-binned companion
# run (VERDICT r4 next-round #2).  Same full recipe as flagship_r8_binned
# (20 epochs, seed 99, --binned --gated_metrics) with lr x1.6 (1.6e-4,
# sqrt of the 2030/739 updates-per-epoch ratio) to compensate the
# 2.75x-larger effective batch, then the held-out test leg and the
# 144-window controllability eval.  If per-epoch valid loss matches the
# plain r6/r7 curves, binned batching becomes the default (Finding 8).
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step r9_binned_lr_train
timeout 10800 python -m smer_music_generation_tpu.train.loop \
  --train_batches corpus/data/smer_training \
  --valid_batches corpus/data/smer_validation \
  -e 20 --batch_size 1 --seed 99 --binned --gated_metrics -l 1.6e-4 \
  --output_dir runs/flagship_r9_binned_lr > /tmp/r5_r9train.log 2>&1 || true

step r9_test
timeout 1800 python -m smer_music_generation_tpu.train.loop \
  -x --test_batches corpus/data/smer_test \
  -c runs/flagship_r9_binned_lr/checkpoints/checkpoint_19 --seed 99 \
  --output_dir runs/flagship_r9_binned_lr > /tmp/r5_r9test.log 2>&1 || true

step r9_eval
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/flagship_r9_binned_lr/checkpoints/checkpoint_19 \
  --config runs/flagship_r9_binned_lr/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --output runs/flagship_r9_binned_lr/eval3_ckpt19.json > /tmp/r5_r9eval.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN1 DONE ==="
