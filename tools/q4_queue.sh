#!/bin/bash
# Q4 TPU queue: relay-dispatch amortization + stale-number re-measures.
# Run after tools/q3_queue.sh. Assumes the q3 tile verdict; pass the
# winning tile as $1 (e.g. 64x256) to pin it, omit to use the default.
cd /root/repo || exit 1
set -x
TILE_ARG=""
[ -n "$1" ] && TILE_ARG="--tile $1"

# 1. headline with stream batching: lax.scan over frame batches -> one
#    relay dispatch per N batches (bench already supports --stream).
W2X_L7_FOLD=1 timeout 3000 python bench.py --stream 4 $TILE_ARG \
    > /tmp/q4_scale512_s4.log 2>&1
echo "Q4 scale512_s4 exit $?" >> /tmp/q4_status.log

# 2. noise256 with stream batching (compute is ~7 ms/batch; dispatch-bound)
W2X_L7_FOLD=1 timeout 3000 python bench.py --workload noise256 --stream 8 \
    > /tmp/q4_noise256_s8.log 2>&1
echo "Q4 noise256_s8 exit $?" >> /tmp/q4_status.log

# 3. re-measure ns1080 and mixed64 post-l1_direct (+fold) — docs numbers
#    are stale ("pre-l1_direct")
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload ns1080 \
    > /tmp/q4_ns1080.log 2>&1
echo "Q4 ns1080 exit $?" >> /tmp/q4_status.log
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload mixed64 \
    > /tmp/q4_mixed64.log 2>&1
echo "Q4 mixed64 exit $?" >> /tmp/q4_status.log

# 4. stream4k re-measure with fold
W2X_L7_FOLD=1 timeout 3600 python bench.py --workload stream4k \
    > /tmp/q4_stream4k.log 2>&1
echo "Q4 stream4k exit $?" >> /tmp/q4_status.log

echo "Q4 DONE $(date)" >> /tmp/q4_status.log
