#!/bin/sh
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=tools/r5
timeout 2400 python bench.py --int4 full --steps 783 > $OUT/kng_783.json 2>$OUT/log_kng.err || echo FAIL >> $OUT/kng_783.json
timeout 1800 python bench.py --int4 full --steps 271 > $OUT/kng_271.json 2>/dev/null || echo FAIL >> $OUT/kng_271.json
timeout 1800 python bench.py --int4 hybrid --steps 783 > $OUT/kng_hybrid_783.json 2>/dev/null || echo FAIL >> $OUT/kng_hybrid_783.json
echo done
