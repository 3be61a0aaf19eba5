#!/bin/sh
# Round-3c TPU measurement queue (run after bench.py lands the headline):
# continuous-batching serving numbers + batched KV-int8 aggregate.
# One process at a time (axon rule):  sh tools/r3c_bench_queue.sh >> /tmp/r3c.out 2>&1
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== cbatch: 4 slots, open-loop arrivals ==="
timeout 3000 python tools/bench_cbatch.py --slots 4 --requests 12 --steps 256
echo "=== cbatch: 8 slots ==="
timeout 3000 python tools/bench_cbatch.py --slots 8 --requests 24 --steps 256
echo "=== batch8 int8 (now with int8 KV cache) ==="
timeout 3000 python bench.py --batch 8 --int8
echo "=== single-stream slope pair ==="
timeout 3000 python bench.py --steps 256 --int8
timeout 3000 python bench.py --steps 1024 --int8
echo "=== DONE ==="
