#!/bin/sh
# Round-5 TPU queue C: scan-unroll experiment on the int4 decode step.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=tools/r5
for U in 2 3; do
  DIA_SCAN_UNROLL=$U timeout 1800 python bench.py --int4 full --steps 271 \
    > $OUT/unroll${U}_271.json 2>$OUT/log_unroll${U}a.err || echo FAIL >> $OUT/unroll${U}_271.json
  DIA_SCAN_UNROLL=$U timeout 1800 python bench.py --int4 full --steps 783 \
    > $OUT/unroll${U}_783.json 2>$OUT/log_unroll${U}b.err || echo FAIL >> $OUT/unroll${U}_783.json
done
# control same-day at unroll 1
timeout 1800 python bench.py --int4 full --steps 271 > $OUT/unroll1_271.json 2>/dev/null || true
timeout 1800 python bench.py --int4 full --steps 783 > $OUT/unroll1_783.json 2>/dev/null || true
echo done
