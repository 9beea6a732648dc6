#!/bin/bash
# Round-4 TPU work queue, part 2 (single chip — serialize all device work).
# Waits for the running r7 train (PID in /tmp/r7.pid), then drains the
# remaining VERDICT-item evals.  Each step logs to /tmp/r4_<step>.log and
# the chain continues on failure.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

# 0. wait for the resumed r7 train to finish
step wait_r7
while kill -0 "$(cat /tmp/r7.pid)" 2>/dev/null; do sleep 60; done

# 1. r7 held-out test leg
step r7test
timeout 1800 python -m smer_music_generation_tpu.train.loop \
  -x --test_batches corpus/data/smer_test \
  -c runs/flagship_r7/checkpoints/checkpoint_19 --seed 7 \
  --output_dir runs/flagship_r7 > /tmp/r4_r7test.log 2>&1 || true

# 1b. bench refresh: new legs (tension, batch-64, spec decode A/B with
#     trained weights, binned/gated train corpus slices)
step bench_all
timeout 7200 python bench.py --all > /tmp/r4_bench_all.log 2>&1 || true

# 2. r7 controllability, same 144 seeded windows as r5/r6 (polyphony cell)
step r7eval
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/flagship_r7/checkpoints/checkpoint_19 \
  --config runs/flagship_r7/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --output runs/flagship_r7/eval3_ckpt19.json > /tmp/r4_r7eval.log 2>&1 || true

# 3-4. 144-window RANDOM-weights legs, both encodings (VERDICT #5)
step rand_smer
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --config runs/flagship_r6/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --output runs/flagship_r6/eval3_random.json > /tmp/r4_rand_smer.log 2>&1 || true
step rand_remi
timeout 7200 python -m smer_music_generation_tpu.eval.eval_cli \
  --config runs/flagship_r6_remi/config.json \
  --test_batches corpus/data_remi/remi_test --max_windows 144 --seed 5 \
  --output runs/flagship_r6_remi/eval3_random.json > /tmp/r4_rand_remi.log 2>&1 || true

# 5. tensile_r3 contrast-corpus RANDOM anchor, 48 windows (same-corpus
#    baseline for the tensile_r3 verdict — VERDICT #1)
step tensile_random
timeout 3600 python -m smer_music_generation_tpu.eval.eval_cli \
  --config runs/tensile_r3/config.json \
  --test_batches /tmp/tc/data/smer_test --max_windows 48 --seed 5 \
  --output runs/tensile_r3/eval_random.json > /tmp/r4_tensile_random.log 2>&1 || true

# 6. adversarial-corpus random anchor, 48 windows (VERDICT #7)
step adv_random
timeout 3600 python -m smer_music_generation_tpu.eval.eval_cli \
  --config runs/adv_r3/config.json \
  --test_batches /tmp/adv/data/smer_test --max_windows 48 --seed 5 \
  --output runs/adv_r3/eval_random.json > /tmp/r4_adv_random.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN DONE ==="
