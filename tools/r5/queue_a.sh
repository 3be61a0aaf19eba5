#!/bin/sh
# Round-5 TPU measurement queue A (serial: one TPU process at a time).
# Fills the remaining int4 serving matrix, the int4 decode decomposition,
# and the pipelined-streaming measurement.  Appends to tools/r5/*.jsonl.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=tools/r5

echo "# queue_a started $(date +%H:%M:%S)" >> $OUT/int4_batch_sweep.jsonl

# 1. missing sweep cell: int4-hybrid batch 32
timeout 1800 python bench.py --batch 32 --int4 hybrid \
  >> $OUT/int4_batch_sweep.jsonl 2>$OUT/log_hybrid32.err \
  || echo "# int4-hybrid batch 32 FAILED rc=$?" >> $OUT/int4_batch_sweep.jsonl

# 2. saturated cbatch with int4 weights (the serving-matrix cbatch rows)
timeout 2400 python tools/bench_cbatch.py --saturate --slots 8 --int4 full \
  > $OUT/cbatch_int4full_s8.json 2>$OUT/log_cb8.err \
  || echo "cbatch int4full s8 FAILED rc=$?" >> $OUT/cbatch_int4full_s8.json
timeout 2400 python tools/bench_cbatch.py --saturate --slots 16 --int4 full \
  > $OUT/cbatch_int4full_s16.json 2>$OUT/log_cb16.err \
  || echo "cbatch int4full s16 FAILED rc=$?" >> $OUT/cbatch_int4full_s16.json
timeout 2400 python tools/bench_cbatch.py --saturate --slots 8 --int4 hybrid \
  > $OUT/cbatch_int4hybrid_s8.json 2>$OUT/log_cbh8.err \
  || echo "cbatch int4hybrid s8 FAILED rc=$?" >> $OUT/cbatch_int4hybrid_s8.json

# 3. int4 decode-step decomposition (VERDICT item 4)
timeout 2400 python tools/trace_decode.py --variant int4/scan --kv-int8 \
  > $OUT/trace_int4_kvq.txt 2>&1 || echo "TRACE int4 kvq FAILED" >> $OUT/trace_int4_kvq.txt
timeout 2400 python tools/trace_decode.py --variant int8/scan --kv-int8 \
  > $OUT/trace_int8_kvq.txt 2>&1 || echo "TRACE int8 kvq FAILED" >> $OUT/trace_int8_kvq.txt

# 4. pipelined streaming vs monolithic (VERDICT item 6 measurement)
timeout 2400 python tools/bench_stream.py --int8 \
  > $OUT/stream_pipelined.json 2>$OUT/log_stream.err \
  || echo "bench_stream FAILED rc=$?" >> $OUT/stream_pipelined.json
DIA_STREAM_PIPELINE=0 timeout 2400 python tools/bench_stream.py --int8 \
  > $OUT/stream_serial.json 2>$OUT/log_stream0.err \
  || echo "bench_stream serial FAILED rc=$?" >> $OUT/stream_serial.json

# 5. batch-8 int4-full retry with smaller alternate-memory budget
#    (stock compile dies: MSA CHECK peak 118.0MB > 112MB VMEM budget)
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
timeout 1800 python bench.py --batch 8 --int4 full \
  >> $OUT/int4_batch_sweep.jsonl 2>$OUT/log_full8_retry.err \
  || echo "# int4-full batch 8 retry (scoped_vmem 32M) FAILED rc=$?" >> $OUT/int4_batch_sweep.jsonl

echo "# queue_a done $(date +%H:%M:%S)" >> $OUT/int4_batch_sweep.jsonl
