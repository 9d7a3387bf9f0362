#!/bin/bash
# Q8 TPU queue: close the 3.11 MB VMEM gap on the 64x256 tile.
# alias-scratch @64x256 compiled to 131.11M of 128M (65M of it register
# spill slots); PAIR_DIRECT frees the ~9 MB pair-layer concat temps.
# Usage: q8_queue.sh [WAIT_PID] — waits for an in-flight bench first.
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# alias is default-on now; 1. the fit attempt
W2X_PAIR_DIRECT=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 --psnr > /tmp/q8_pd_t64x256.log 2>&1
echo "Q8 pd_t64x256 exit $?" >> /tmp/q8_status.log

# 2. pair_direct A/B at the default tile (time-neutral pre-alias; recheck)
W2X_PAIR_DIRECT=1 timeout 2400 python bench.py > /tmp/q8_pd_default.log 2>&1
echo "Q8 pd_default exit $?" >> /tmp/q8_status.log

# 3. fallback wide tiles if #1 is still over budget
W2X_PAIR_DIRECT=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 56x256 > /tmp/q8_pd_t56x256.log 2>&1
echo "Q8 pd_t56x256 exit $?" >> /tmp/q8_status.log
W2X_PAIR_DIRECT=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 48x256 > /tmp/q8_pd_t48x256.log 2>&1
echo "Q8 pd_t48x256 exit $?" >> /tmp/q8_status.log

# 4. batch 32 at the (current) best default config
timeout 2400 python bench.py --batch 32 > /tmp/q8_b32.log 2>&1
echo "Q8 b32 exit $?" >> /tmp/q8_status.log

# 5. stale re-measures with the aligned pick_tile + alias default
timeout 3600 python bench.py --workload mixed64 > /tmp/q8_mixed64.log 2>&1
echo "Q8 mixed64 exit $?" >> /tmp/q8_status.log
timeout 3600 python bench.py --workload stream4k > /tmp/q8_stream4k.log 2>&1
echo "Q8 stream4k exit $?" >> /tmp/q8_status.log

# 6. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q8_train_scale.log 2>&1
echo "Q8 train_scale exit $?" >> /tmp/q8_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q8_train_n1.log 2>&1
echo "Q8 train_n1 exit $?" >> /tmp/q8_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q8_train_n2.log 2>&1
echo "Q8 train_n2 exit $?" >> /tmp/q8_status.log

echo "Q8 DONE $(date)" >> /tmp/q8_status.log
