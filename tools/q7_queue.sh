#!/bin/bash
# Q7 TPU queue: post-wide-tile-VMEM-wall experiments.
# 64x256 needs 150.25M VMEM (compiler-reported) vs the 128M chip limit;
# ALIAS_SCRATCH saves ~40% of activation VMEM (est. -18M at 64x256), so
# item 2 is the one-shot gamble that the est. +15% tile actually fits.
cd /root/repo || exit 1
set -x

# 1. alias-scratch A/B at the default tile (bit-exact in interpret mode;
#    never TPU-validated — both perf and output sanity)
W2X_ALIAS_SCRATCH=1 timeout 2400 python bench.py --psnr \
    > /tmp/q7_alias.log 2>&1
echo "Q7 alias exit $?" >> /tmp/q7_status.log

# 2. the gamble: alias + 124M scoped limit + 64x256 (16 cells/4f vs 128)
W2X_ALIAS_SCRATCH=1 W2X_VMEM_LIMIT_MB=124 timeout 2400 \
    python bench.py --tile 64x256 > /tmp/q7_alias_t64x256.log 2>&1
echo "Q7 alias_t64x256 exit $?" >> /tmp/q7_status.log

# 3. scoped-VMEM headroom alone (deeper Mosaic pipelining?)
W2X_VMEM_LIMIT_MB=124 timeout 2400 python bench.py \
    > /tmp/q7_vmem124.log 2>&1
echo "Q7 vmem124 exit $?" >> /tmp/q7_status.log

# 4. batch 32 (grid-edge/dispatch amortization)
timeout 2400 python bench.py --batch 32 > /tmp/q7_b32.log 2>&1
echo "Q7 b32 exit $?" >> /tmp/q7_status.log

# 5. fallback wide tile: 48x256 est. ~116M VMEM without alias
W2X_VMEM_LIMIT_MB=124 timeout 2400 python bench.py --tile 48x256 \
    > /tmp/q7_t48x256.log 2>&1
echo "Q7 t48x256 exit $?" >> /tmp/q7_status.log

# 6. stale re-measures (now also exercising the aligned pick_tile fix)
timeout 3600 python bench.py --workload mixed64 > /tmp/q7_mixed64.log 2>&1
echo "Q7 mixed64 exit $?" >> /tmp/q7_status.log
timeout 3600 python bench.py --workload stream4k > /tmp/q7_stream4k.log 2>&1
echo "Q7 stream4k exit $?" >> /tmp/q7_status.log

# 7. shippable demo models trained on TPU
timeout 3600 python tools/train_demo.py --kind scale --steps 3000 \
    --images 256 --out models/scale2.0x_demo.json > /tmp/q7_train_scale.log 2>&1
echo "Q7 train_scale exit $?" >> /tmp/q7_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 1 \
    --steps 2000 --images 256 --out models/noise1_demo.json \
    > /tmp/q7_train_n1.log 2>&1
echo "Q7 train_n1 exit $?" >> /tmp/q7_status.log
timeout 3600 python tools/train_demo.py --kind noise --noise_level 2 \
    --steps 2000 --images 256 --out models/noise2_demo.json \
    > /tmp/q7_train_n2.log 2>&1
echo "Q7 train_n2 exit $?" >> /tmp/q7_status.log

echo "Q7 DONE $(date)" >> /tmp/q7_status.log
