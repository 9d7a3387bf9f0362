#!/bin/bash
# Q12 TPU queue: XCOL_SAFE validation — does the layout-safe im2col fix
# mixed64's HBM OOM, and what does it cost on the headline?
# Usage: q12_queue.sh [WAIT_PID]
cd /root/repo || exit 1
set -x

if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1. the fix validation
W2X_XCOL_SAFE=1 timeout 3600 python bench.py --workload mixed64 \
    > /tmp/q12_mixed64_safe.log 2>&1
echo "Q12 mixed64_safe exit $?" >> /tmp/q12_status.log

# 2. headline cost A/B
W2X_XCOL_SAFE=1 timeout 2400 python bench.py > /tmp/q12_scale512_safe.log 2>&1
echo "Q12 scale512_safe exit $?" >> /tmp/q12_status.log

echo "Q12 DONE $(date)" >> /tmp/q12_status.log
