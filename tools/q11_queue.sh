#!/bin/bash
# Q11 TPU queue: post-alias re-measures of the pre-alias numbers and a
# tile micro-revalidation around (64,128) under the new defaults.
# Usage: q11_queue.sh [WAIT_PID]
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 0. mixed64 re-run on the pinned-128-column pick_tile (the 160-col pick
#    hit the XLA lanes-on-taps OOM at 720p batch 8)
timeout 3600 python bench.py --workload mixed64 > /tmp/q11_mixed64.log 2>&1
echo "Q11 mixed64 exit $?" >> /tmp/q11_status.log

# 1. noise256 + ns1080 were measured pre-alias-default
timeout 2400 python bench.py --workload noise256 > /tmp/q11_noise256.log 2>&1
echo "Q11 noise256 exit $?" >> /tmp/q11_status.log
timeout 3600 python bench.py --workload ns1080 > /tmp/q11_ns1080.log 2>&1
echo "Q11 ns1080 exit $?" >> /tmp/q11_status.log

# 2. tile micro-sweep: is (64,128) still the best under alias+fold?
for t in 56x128 72x128 80x128; do
    timeout 2400 python bench.py --tile $t > /tmp/q11_t$t.log 2>&1
    echo "Q11 t$t exit $?" >> /tmp/q11_status.log
done

# 3. stream4k re-measure on the pinned-128-column picks
timeout 3600 python bench.py --workload stream4k > /tmp/q11_stream4k.log 2>&1
echo "Q11 stream4k exit $?" >> /tmp/q11_status.log

echo "Q11 DONE $(date)" >> /tmp/q11_status.log
