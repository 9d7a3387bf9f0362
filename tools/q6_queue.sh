#!/bin/bash
# Q6 TPU queue: q5 reordered — the decisive wide-tile experiments moved
# ahead of the (slow) training demos. Usage: q6_queue.sh [WAIT_PID]
# waits for an in-flight bench PID to release the chip first.
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1. wide-tile retries (fold is default now; the narrow stripe fetch cut
#    the window VMEM that blew earlier compiles). work/px: 64x128=1.137,
#    64x256=1.104, 128x256=1.068; fewer cells amortize per-pass fixed cost.
W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 > /tmp/q6_t64x256.log 2>&1
echo "Q6 64x256 exit $?" >> /tmp/q6_status.log
W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 128x256 > /tmp/q6_t128x256.log 2>&1
echo "Q6 128x256 exit $?" >> /tmp/q6_status.log

# 2. stale re-measures post-l1_direct + fold-default: mixed64, stream4k
timeout 3600 python bench.py --workload mixed64 > /tmp/q6_mixed64.log 2>&1
echo "Q6 mixed64 exit $?" >> /tmp/q6_status.log
timeout 3600 python bench.py --workload stream4k > /tmp/q6_stream4k.log 2>&1
echo "Q6 stream4k exit $?" >> /tmp/q6_status.log

# 3. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q6_train_scale.log 2>&1
echo "Q6 train_scale exit $?" >> /tmp/q6_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q6_train_n1.log 2>&1
echo "Q6 train_n1 exit $?" >> /tmp/q6_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q6_train_n2.log 2>&1
echo "Q6 train_n2 exit $?" >> /tmp/q6_status.log

echo "Q6 DONE $(date)" >> /tmp/q6_status.log
