#!/bin/bash
# Round-5 generator-realism probes (VERDICT r4 item 6) — three from-scratch
# scale runs at the ceiling-probe protocol (14k steps, batch 32, crop 96,
# 1024 images, lr 2.5e-4, ema 0.999, clip 1.0, seed 51), varying ONLY the
# data recipe:
#   A. control: v1 generator, box-only       (the r4 recipe re-run)
#   B. realism: v2 generator + filter pool   (the ceiling lever)
#   C. realism + JPEG noise mix 0.25         (the robustness variant)
# Serial — one TPU process at a time (stale-lease discipline).
set -u
cd "$(dirname "$0")/.."
COMMON="--kind scale --steps 14000 --batch 32 --crop 96 --images 1024 \
  --lr 0.00025 --ema 0.999 --clip 1.0 --workers 10 --seed 51 \
  --eval_every 1000"

echo "=== A: v1 control ==="
timeout 5400 python tools/train_demo.py $COMMON \
  --out /tmp/r5_scale_v1_control.json 2>&1 | tail -40
echo "=== B: v2 + pool ==="
timeout 5400 python tools/train_demo.py $COMMON \
  --gen v2 --filters box,blackman \
  --out /tmp/r5_scale_v2_pool.json 2>&1 | tail -40
echo "=== C: v2 + pool + noise mix ==="
timeout 5400 python tools/train_demo.py $COMMON \
  --gen v2 --filters box,blackman --noise_mix 0.25 \
  --out /tmp/r5_scale_v2_noise.json 2>&1 | tail -40
echo "=== queue done ==="
