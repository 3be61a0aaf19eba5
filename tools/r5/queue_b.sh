#!/bin/sh
# Round-5 TPU queue B: int4-cbatch regression A/B + batch-8 workaround.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=tools/r5

# 1. same-day int8 cbatch baseline (r4's 2142 tok/s may have drifted)
timeout 2400 python tools/bench_cbatch.py --saturate --slots 16 \
  > $OUT/cbatch_int8_s16_r5.json 2>$OUT/log_cb16_int8.err \
  || echo "FAILED rc=$?" >> $OUT/cbatch_int8_s16_r5.json

# 2. int4 cbatch with doubled segment (amortize per-dispatch S4 unpack)
timeout 2400 python tools/bench_cbatch.py --saturate --slots 16 --int4 full --segment-steps 128 \
  > $OUT/cbatch_int4full_s16_seg128.json 2>$OUT/log_cb16_seg128.err \
  || echo "FAILED rc=$?" >> $OUT/cbatch_int4full_s16_seg128.json

# 3. int8 cbatch with segment 128 (control for #2)
timeout 2400 python tools/bench_cbatch.py --saturate --slots 16 --segment-steps 128 \
  > $OUT/cbatch_int8_s16_seg128.json 2>$OUT/log_cb16_int8_128.err \
  || echo "FAILED rc=$?" >> $OUT/cbatch_int8_s16_seg128.json

# 4. batch-8 int4-full via the nibble (no in-jit S4) path: different program,
#    may dodge the MSA CHECK crash
DIA_INT4_S4=0 timeout 1800 python bench.py --batch 8 --int4 full \
  >> $OUT/int4_batch_sweep.jsonl 2>$OUT/log_full8_nibble.err \
  || echo "# int4-full batch 8 nibble FAILED rc=$?" >> $OUT/int4_batch_sweep.jsonl

echo "# queue_b done $(date +%H:%M:%S)" >> $OUT/int4_batch_sweep.jsonl
