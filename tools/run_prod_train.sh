#!/bin/bash
# Production-scale DMD training run (VERDICT r3 item 2): the real product
# training loop — loader -> on-device Real-ESRGAN degradation -> DMD step
# (generator + fake score, two optimizers, EMA) -> checkpoint -> resume —
# at 512^2 on the real chip with the measured single-chip recipe
# (BENCH.md: batch 2, lowmem, remat=dots).
# Usage: tools/run_prod_train.sh [phase1|resume]
set -u
cd "$(dirname "$0")/.."
OUT=runs/dmd_prod_r4
PHASE="${1:-phase1}"
if [ "$PHASE" = "phase1" ]; then
  python train.py --task dmd --config configs/instarevive_v1.yaml \
    --data data_train --out "$OUT" \
    --batch_size 2 --crop_size 512 --steps 300 --bf16 --lowmem --remat_policy dots \
    --lr 1e-5 --warmup 100 --checkpointing_steps 100 --log_every 10 --seed 0 \
    & echo $! > /tmp/train_prod.pid
  wait
else
  python train.py --task dmd --config configs/instarevive_v1.yaml \
    --data data_train --out "$OUT" \
    --batch_size 2 --crop_size 512 --steps 300 --bf16 --lowmem --remat_policy dots \
    --lr 1e-5 --warmup 100 --checkpointing_steps 100 --log_every 10 --seed 0 \
    --resume "$OUT/step_100"
fi
