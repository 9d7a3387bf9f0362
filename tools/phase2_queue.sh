#!/bin/bash
# Phase-2 TPU queue: L7-fold A/B, best-tile combination, then TPU training
# of shippable demo models. Run after tools/tpu_return_queue.sh completes.
# Usage: bash tools/phase2_queue.sh [TILE]   (TILE like 88x128, optional —
# pass the tile_sweep winner; omit to skip the combined run)
cd /root/repo || exit 1
set -x
TILE="$1"

# 1. L7 fold A/B on the headline workload (kernel change only; the xcol/uv
#    prep programs are shape-identical and stay compile-cached)
W2X_L7_FOLD=1 timeout 2400 python bench.py > /tmp/q2_fold_scale512.log 2>&1
W2X_L7_FOLD=1 timeout 2400 python bench.py --workload noise256 \
    > /tmp/q2_fold_noise256.log 2>&1

# 2. fold x best-tile combination
if [ -n "$TILE" ]; then
    W2X_L7_FOLD=1 timeout 2400 python bench.py --tile "$TILE" \
        > /tmp/q2_fold_tile.log 2>&1
    W2X_ALIAS_SCRATCH=1 W2X_L7_FOLD=1 timeout 2400 python bench.py \
        --tile "$TILE" > /tmp/q2_fold_alias_tile.log 2>&1
fi

# 3. shippable demo models trained on TPU (synthetic data; written to
#    models/*_demo.json so the identity placeholders stay untouched)
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q2_train_scale.log 2>&1
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q2_train_n1.log 2>&1
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q2_train_n2.log 2>&1

echo "PHASE2 DONE $(date)" >> /tmp/q_status.log
