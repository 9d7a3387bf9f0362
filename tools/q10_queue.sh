#!/bin/bash
# Q10 TPU queue: 64x256 fit retry at the full 128M scoped limit (q9's
# attempt compiled to scoped 127.95M but our soft limit was 124M), then
# the remaining q9 items. Usage: q10_queue.sh [WAIT_PID]
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1. fit retry: scoped limit = physical 128M (127.95M measured need)
W2X_PAIR_DIRECT=1 W2X_UVP_BF16=1 W2X_VMEM_LIMIT_MB=128 timeout 2400 \
    python bench.py --tile 64x256 --psnr > /tmp/q10_fit64x256.log 2>&1
echo "Q10 fit64x256 exit $?" >> /tmp/q10_status.log

# 2. batch 32 at the current best default config
timeout 2400 python bench.py --batch 32 > /tmp/q10_b32.log 2>&1
echo "Q10 b32 exit $?" >> /tmp/q10_status.log

# 3. stale re-measures with the aligned pick_tile + alias default
timeout 3600 python bench.py --workload mixed64 > /tmp/q10_mixed64.log 2>&1
echo "Q10 mixed64 exit $?" >> /tmp/q10_status.log
timeout 3600 python bench.py --workload stream4k > /tmp/q10_stream4k.log 2>&1
echo "Q10 stream4k exit $?" >> /tmp/q10_status.log

# 4. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json \
    > /tmp/q10_train_scale.log 2>&1
echo "Q10 train_scale exit $?" >> /tmp/q10_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q10_train_n1.log 2>&1
echo "Q10 train_n1 exit $?" >> /tmp/q10_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q10_train_n2.log 2>&1
echo "Q10 train_n2 exit $?" >> /tmp/q10_status.log

echo "Q10 DONE $(date)" >> /tmp/q10_status.log
