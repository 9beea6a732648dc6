#!/bin/bash
# Round-5 TPU work queue, part 5 (fresh-host replay after the VM wipe):
# after the r10 eval drains, run the tensile_w3 loss-head experiment
# (VERDICT r4 #7) from the r10 base, then the idle-chip session-overhead
# probe (Finding 10), then the headline bench (validates the hardened
# bench.py and warms the compile caches the driver's round-end capture
# hits), then the full --all leg refresh.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step wait_r10_eval
while [ ! -s runs/flagship_r10_binned4/eval3_ckpt19.json ]; do sleep 60; done
sleep 30

step tensile_w3_finetune
timeout 5400 python -m smer_music_generation_tpu.train.loop \
  --train_batches corpus/data/smer_training \
  --valid_batches corpus/data/smer_validation \
  -c runs/flagship_r10_binned4/checkpoints/checkpoint_19 -a \
  -e 6 --pretraining_epochs 0 --batch_size 1 --seed 99 \
  --tensile_weight 3.0 \
  --output_dir runs/tensile_r5_w3 > /tmp/r5_tw3train.log 2>&1 || true

step tensile_w3_eval
timeout 5400 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/tensile_r5_w3/checkpoints/checkpoint_5 \
  --config runs/tensile_r5_w3/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --kinds tensile \
  --output runs/tensile_r5_w3/eval3_tensile.json > /tmp/r5_tw3eval.log 2>&1 || true

step session_overhead
timeout 2400 python scripts/session_overhead.py > /tmp/r5_probe.log 2>&1 || true

step bench_headline
timeout 3600 python bench.py > /tmp/r5_bench_headline.log 2>&1 || true

step bench_all
timeout 10800 python bench.py --all > /tmp/r5_bench_all.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN5 DONE ==="
