#!/bin/sh
# Round-3 TPU measurement queue — one process at a time (axon rule).
# Run:  sh tools/r3_bench_queue.sh >> /tmp/r3_queue.out 2>&1
# Each section prints a banner so partial output is attributable.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== pruned: block50 ==="
timeout 3000 python bench.py --pruned block50
echo "=== pruned: block70 ==="
timeout 3000 python bench.py --pruned block70
echo "=== pruned: shrink-ffn ==="
timeout 3000 python bench.py --pruned shrink-ffn
echo "=== pruned: shrink-heads ==="
timeout 3000 python bench.py --pruned shrink-heads
echo "=== pruned: unstructured50 ==="
timeout 3000 python bench.py --pruned unstructured50
echo "=== spec_cost ==="
timeout 3600 python tools/spec_cost.py
echo "=== batch4 int8 ==="
timeout 3000 python bench.py --batch 4 --int8
echo "=== batch8 int8 ==="
timeout 3000 python bench.py --batch 8 --int8
echo "=== batch8 bf16 ==="
timeout 3000 python bench.py --batch 8 --no-int8
echo "=== DONE ==="
