#!/bin/bash
# Q3 TPU queue (post narrow-fetch): wide-tile retries + pending phase-2 items.
# Wide tiles cut per-cell fixed overhead (open item (a)) and column-pad work:
#   work/px (tr+4.5)(tc+8)/(tr*tc): 64x128=1.137, 64x256=1.104, 128x256=1.068
# 128x128 measured SLOWER (183.8 vs 190) despite half the cells, so rows
# stay at 64 for the first try; 128x256 is the stretch shot.
cd /root/repo || exit 1
set -x

# 1. 64x256: 64 cells/4f (half of default), less pad work
W2X_L7_FOLD=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 > /tmp/q3_t64x256.log 2>&1
echo "Q3 64x256 exit $?" >> /tmp/q_status.log

# 2. 128x256: 32 cells/4f, least pad work (stretch; long compile likely)
W2X_L7_FOLD=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 128x256 > /tmp/q3_t128x256.log 2>&1
echo "Q3 128x256 exit $?" >> /tmp/q_status.log

# 3. fold A/B on noise256 (phase-2 pending)
W2X_L7_FOLD=1 timeout 2400 python bench.py --workload noise256 \
    > /tmp/q3_fold_noise256.log 2>&1
echo "Q3 fold_noise256 exit $?" >> /tmp/q_status.log

# 4. shippable demo models trained on TPU (phase-2 pending)
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q3_train_scale.log 2>&1
echo "Q3 train_scale exit $?" >> /tmp/q_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q3_train_n1.log 2>&1
echo "Q3 train_n1 exit $?" >> /tmp/q_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q3_train_n2.log 2>&1
echo "Q3 train_n2 exit $?" >> /tmp/q_status.log

echo "Q3 DONE $(date)" >> /tmp/q_status.log
