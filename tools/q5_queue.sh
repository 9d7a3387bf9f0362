#!/bin/bash
# Q5 TPU queue: consolidated restart of q3+q4 after the session drop.
# Order: cheap high-value measurements first, shippable training demos
# second, risky long-compile tile retries last.
cd /root/repo || exit 1
set -x

# 1. headline A/B: stream batching to amortize relay dispatch.
#    Prior note says scan serialises the dispatch pipeline; re-check with
#    the folded L7 tail on (the fold changed per-dispatch compute time).
W2X_L7_FOLD=1 timeout 2400 python bench.py --stream 4 \
    > /tmp/q5_scale512_s4.log 2>&1
echo "Q5 scale512_s4 exit $?" >> /tmp/q5_status.log

# 2. noise256 stream batching (compute ~7 ms/batch -> dispatch-bound)
W2X_L7_FOLD=1 timeout 2400 python bench.py --workload noise256 --stream 8 \
    > /tmp/q5_noise256_s8.log 2>&1
echo "Q5 noise256_s8 exit $?" >> /tmp/q5_status.log

# 3. fold A/B on noise256 (no stream; pending from phase-2)
W2X_L7_FOLD=1 timeout 2400 python bench.py --workload noise256 \
    > /tmp/q5_fold_noise256.log 2>&1
echo "Q5 fold_noise256 exit $?" >> /tmp/q5_status.log

# 4. stale re-measures post-l1_direct (+fold): ns1080, mixed64, stream4k
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload ns1080 \
    > /tmp/q5_ns1080.log 2>&1
echo "Q5 ns1080 exit $?" >> /tmp/q5_status.log
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload mixed64 \
    > /tmp/q5_mixed64.log 2>&1
echo "Q5 mixed64 exit $?" >> /tmp/q5_status.log
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload stream4k \
    > /tmp/q5_stream4k.log 2>&1
echo "Q5 stream4k exit $?" >> /tmp/q5_status.log

# 5. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q5_train_scale.log 2>&1
echo "Q5 train_scale exit $?" >> /tmp/q5_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q5_train_n1.log 2>&1
echo "Q5 train_n1 exit $?" >> /tmp/q5_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q5_train_n2.log 2>&1
echo "Q5 train_n2 exit $?" >> /tmp/q5_status.log

# 6. wide-tile retries (risky long compiles; work/px favors wide cols:
#    64x128=1.137, 64x256=1.104, 128x256=1.068)
W2X_L7_FOLD=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 > /tmp/q5_t64x256.log 2>&1
echo "Q5 64x256 exit $?" >> /tmp/q5_status.log
W2X_L7_FOLD=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 128x256 > /tmp/q5_t128x256.log 2>&1
echo "Q5 128x256 exit $?" >> /tmp/q5_status.log

echo "Q5 DONE $(date)" >> /tmp/q5_status.log
