#!/bin/bash
# Round-4 TPU work queue, part 3: shape-binned batcher validation run.
# Waits for chain2 (PID in /tmp/chain2.pid), then trains the full
# 20-epoch SMER flagship under --binned --gated_metrics (same corpus,
# seed 99) so the 4.2x Finding-8 throughput claim gets loss-parity
# evidence against r6, plus the held-out test leg and the 144-window
# controllability eval.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step wait_chain2
while kill -0 "$(cat /tmp/chain2.pid)" 2>/dev/null; do sleep 60; done

# 0b. spec-decode per-token A/B at real session content (Finding 9
#     addendum): fused v3 baseline vs v5 kernel-verify, greedy + nucleus
step spec_micro
for flags in "--greedy" "--greedy --draft-k 8" "" "--draft-k 8" "--draft-k 4"; do
  timeout 1800 python scripts/microbench_decode.py --r6 --full-only $flags \
    >> /tmp/r4_specmicro.log 2>&1 || true
done

step r8_binned_train
timeout 10800 python -m smer_music_generation_tpu.train.loop \
  --train_batches corpus/data/smer_training \
  --valid_batches corpus/data/smer_validation \
  -e 20 --batch_size 1 --seed 99 --binned --gated_metrics \
  --output_dir runs/flagship_r8_binned > /tmp/r4_r8train.log 2>&1 || true

step r8_test
timeout 1800 python -m smer_music_generation_tpu.train.loop \
  -x --test_batches corpus/data/smer_test \
  -c runs/flagship_r8_binned/checkpoints/checkpoint_19 --seed 99 \
  --output_dir runs/flagship_r8_binned > /tmp/r4_r8test.log 2>&1 || true

step r8_eval
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/flagship_r8_binned/checkpoints/checkpoint_19 \
  --config runs/flagship_r8_binned/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --output runs/flagship_r8_binned/eval3_ckpt19.json > /tmp/r4_r8eval.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN3 DONE ==="
