#!/bin/bash
# Q9 TPU queue: the UVP_BF16 64x256 fit attempt (129.95M - ~8M ~= 122M,
# should fit), then the remaining re-measures + demo training.
# Usage: q9_queue.sh [WAIT_PID]
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1. THE fit attempt: alias(default) + pair_direct + bf16 uvp @ 64x256
W2X_PAIR_DIRECT=1 W2X_UVP_BF16=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 --psnr > /tmp/q9_fit64x256.log 2>&1
echo "Q9 fit64x256 exit $?" >> /tmp/q9_status.log

# 2. uvp-bf16 alone at the default tile (PSNR + does the VMEM relief help
#    speed like alias did?)
W2X_UVP_BF16=1 timeout 2400 python bench.py --psnr \
    > /tmp/q9_uvp_default.log 2>&1
echo "Q9 uvp_default exit $?" >> /tmp/q9_status.log

# 3. if the fit worked, try the stretch 72x256 variant of it
if grep -q '"metric"' /tmp/q9_fit64x256.log; then
    W2X_PAIR_DIRECT=1 W2X_UVP_BF16=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
        python bench.py --tile 72x256 > /tmp/q9_fit72x256.log 2>&1
    echo "Q9 fit72x256 exit $?" >> /tmp/q9_status.log
fi

# 4. batch 32 at the current best default config
timeout 2400 python bench.py --batch 32 > /tmp/q9_b32.log 2>&1
echo "Q9 b32 exit $?" >> /tmp/q9_status.log

# 5. stale re-measures with the aligned pick_tile + alias default
timeout 3600 python bench.py --workload mixed64 > /tmp/q9_mixed64.log 2>&1
echo "Q9 mixed64 exit $?" >> /tmp/q9_status.log
timeout 3600 python bench.py --workload stream4k > /tmp/q9_stream4k.log 2>&1
echo "Q9 stream4k exit $?" >> /tmp/q9_status.log

# 6. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q9_train_scale.log 2>&1
echo "Q9 train_scale exit $?" >> /tmp/q9_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q9_train_n1.log 2>&1
echo "Q9 train_n1 exit $?" >> /tmp/q9_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q9_train_n2.log 2>&1
echo "Q9 train_n2 exit $?" >> /tmp/q9_status.log

echo "Q9 DONE $(date)" >> /tmp/q9_status.log
