#!/bin/sh
# Round-3d TPU measurement queue: serving numbers after the admission
# prep-ahead + depth-1 segment pipeline (cbatch.py), plus batch-16.
# One process at a time (axon rule):  sh tools/r3d_bench_queue.sh >> /tmp/r3d.out 2>&1
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== cbatch: 4 slots (A/B vs 639 tok/s pre-pipeline) ==="
timeout 3000 python tools/bench_cbatch.py --slots 4 --requests 12 --steps 256
echo "=== cbatch: 8 slots (A/B vs 909 tok/s pre-pipeline) ==="
timeout 3000 python tools/bench_cbatch.py --slots 8 --requests 24 --steps 256
echo "=== cbatch: 8 slots, saturating offered load (capacity, not arrival-limited) ==="
timeout 3000 python tools/bench_cbatch.py --slots 8 --requests 48 --steps 256 --arrival-ms 60
echo "=== batch 16 int8 aggregate ==="
timeout 3600 python bench.py --batch 16 --int8
echo "=== DONE ==="
