"""Capture a device trace of the decode loop and print the per-op breakdown.

Answers "where do the milliseconds go?" for the real decode step: runs the
int8/scan (or bf16/unroll) step in a fori_loop under ``jax.profiler``, then
converts the xplane dump with xprof's ``raw_to_tool_data`` into hlo_stats
and prints the top ops by self time.

Variants: ``bf16/unroll``, ``int8/scan`` (the int8 serving default),
``int4/scan`` / ``hybrid/scan`` (the S4 serving path: nibble-packed params
unpacked to XLA-native S4 INSIDE the jit, exactly like
generate._maybe_unpack_s4), each with ``--kv-int8`` to match the serving
cache format.  This is the round-5 decomposition harness for the int4
roofline residual (1.46 ms/step vs the ≈1.1–1.2 ms HBM roof).

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/trace_decode.py [--variant int4/scan --kv-int8]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", type=str, default="int8/scan")
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (QuantKVCache), the TPU serving default")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--tool", type=str, default="hlo_stats")
    args = p.parse_args()

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import (
        KVCache, decode_step, decode_step_fused, decode_step_scan, init_params,
        new_self_cache,
    )
    from dia_tts_prune_tpu.ops.quant import (
        quantize_params_int4_packed,
        quantize_params_int8_packed,
        unpack_params_s4,
    )

    config = dia_1_6b_config(weight_dtype="bfloat16")
    dtype = jnp.bfloat16
    params = init_params(config, jax.random.PRNGKey(0), dtype)
    unpack_in_jit = False
    if args.variant.startswith("int8"):
        params = quantize_params_int8_packed(params)
    elif args.variant.startswith("int4"):
        params = quantize_params_int4_packed(params, nibble=True, halfsplit=True)
        unpack_in_jit = True  # nibble bytes cross the transfer; S4 is in-jit only
    elif args.variant.startswith("hybrid"):
        params = quantize_params_int8_packed(
            quantize_params_int4_packed(params, mlp_only=True, nibble=True,
                                        halfsplit=True), fused=False)
        unpack_in_jit = True
    step_fn = {"scan": decode_step_scan, "fused": decode_step_fused}.get(
        args.variant.split("/")[-1], decode_step)
    d = config.data
    dec = config.model.decoder
    B, S = 2, 128

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross = KVCache(k=ck, v=ck * 0.5)
    cmask = jnp.ones((B, 1, 1, S), jnp.bool_)

    @jax.jit
    def run(tokens0, cache, pp):
        if unpack_in_jit:
            pp = unpack_params_s4(pp)  # == generate._maybe_unpack_s4
        def body(i, carry):
            tok, cache = carry
            pos = jnp.full((B, 1), i + 1, jnp.int32)
            logits, cache = step_fn(
                pp, config, tok, pos, i.astype(jnp.int32), cache, cross,
                cmask, dtype)
            tok = jnp.argmax(logits[:, -1:, :, :], axis=-1).astype(jnp.int32)
            return tok, cache
        tok, cache = jax.lax.fori_loop(0, args.steps, body, (tokens0, cache))
        return tok

    cache = new_self_cache(config, B, max_len=args.cache_len, dtype=dtype,
                           quant=args.kv_int8)
    tok0 = jnp.full((B, 1, d.channels), 100, jnp.int32)
    np.asarray(run(tok0, cache, params))  # compile

    trace_dir = "/tmp/jax-trace-decode"
    jax.profiler.start_trace(trace_dir)
    np.asarray(run(tok0, cache, params))
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("NO XPLANE CAPTURED — device tracing unsupported on this backend?")
        return
    xplane = xplanes[-1]
    print("xplane:", xplane)

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], args.tool, {})
    tag = args.variant.replace("/", "_") + ("_kvq" if args.kv_int8 else "")
    out = Path(f"/tmp/decode_{args.tool.replace('^', '')}_{tag}.out")
    if isinstance(data, bytes):
        out.write_bytes(data)
    else:
        out.write_text(str(data))
    print("tool output written:", out, "bytes:", out.stat().st_size)

    # hlo_stats arrives as JSON-ish table; print top rows by self time
    try:
        blob = data.decode() if isinstance(data, (bytes, bytearray)) else str(data)
        parsed = json.loads(blob)
        # tensorboard "data table" format: {"p": cols..., "rows": ...} varies;
        # just dump the first chunk if structure is unknown
        print(json.dumps(parsed, indent=1)[:4000])
    except Exception:
        print(blob[:4000])


if __name__ == "__main__":
    main()
