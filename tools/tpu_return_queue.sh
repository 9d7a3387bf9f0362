#!/bin/bash
# Experiment queue to run the moment the TPU relay comes back.
# Order: cheap cached sanity first, then the tile ladder (small increments
# most likely to compile), then the expensive big-tile shots, then bench
# refreshes. Everything under timeouts; logs to /tmp/q_*.log.
cd /root/repo || exit 1
set -x

# 1. headline sanity (program should be compile-cached)
timeout 1800 python bench.py > /tmp/q_bench_scale512.log 2>&1

# 2. tile ladder incl. aliased-scratch variants (per-shape budget inside)
timeout 7200 python tools/tile_sweep.py \
    64x128+a 72x128 80x128+a 88x128+a+v120 \
    > /tmp/q_tile_sweep.log 2>&1

# 3. big-tile shots (each capped; persistent cache keeps any success)
timeout 2400 python tools/bigtile_probe.py 128 128 4 > /tmp/q_big128.log 2>&1
W2X_ALIAS_SCRATCH=1 W2X_VMEM_LIMIT_MB=127 \
    timeout 2400 python tools/bigtile_probe.py 128 128 4 \
    > /tmp/q_big128_alias.log 2>&1

# 4. post-l1_direct refresh of the secondary workloads
timeout 3600 python bench.py --workload ns1080  > /tmp/q_bench_ns1080.log 2>&1
timeout 3600 python bench.py --workload mixed64 > /tmp/q_bench_mixed64.log 2>&1

echo "QUEUE DONE $(date)" >> /tmp/q_status.log
