#!/bin/bash
# Round-5 TPU work queue, part 2: the tensile-steering recipe experiment
# (VERDICT r4 next-round #7).  tensile_r3 showed a widened s_* output
# distribution does not convert into steering (random anchor 2.46 beats
# trained 3.19); the orthogonal lever is the LOSS side — finetune the r6
# flagship with the tensile head weighted 3x (--tensile_weight 3.0) and
# re-run the 144-window tensile eval at the same settings (seed 5) as
# eval3_ckpt19/tensile_r3 so all three columns are comparable.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step wait_chain3
while kill -0 "$(cat /tmp/r5_chain3.pid)" 2>/dev/null; do sleep 60; done

step tensile_w3_finetune
timeout 5400 python -m smer_music_generation_tpu.train.loop \
  --train_batches corpus/data/smer_training \
  --valid_batches corpus/data/smer_validation \
  -c runs/flagship_r6/checkpoints/checkpoint_19 -a \
  -e 6 --pretraining_epochs 0 --batch_size 1 --seed 99 \
  --binned --gated_metrics --tensile_weight 3.0 \
  --output_dir runs/tensile_r5_w3 > /tmp/r5_tw3train.log 2>&1 || true

step tensile_w3_eval
timeout 5400 python -m smer_music_generation_tpu.eval.eval_cli \
  --checkpoint runs/tensile_r5_w3/checkpoints/checkpoint_5 \
  --config runs/tensile_r5_w3/config.json \
  --test_batches corpus/data/smer_test --max_windows 144 --seed 5 \
  --kinds tensile \
  --output runs/tensile_r5_w3/eval3_tensile.json > /tmp/r5_tw3eval.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN2 DONE ==="
