"""Diagnose the int4 fused-kernel RESOURCE_EXHAUSTED (queue4).

Separates the two suspects with full tracebacks:
1. pack build — ``repack_decoder_fused(mlp_int4=True)`` runs eager jnp
   quantization over [18, 2048, 8192] tensors on the device; transients may
   exhaust HBM alongside the bf16 params + int8 pack.
2. kernel launch — the int4 MLP phases unpack nibble planes in VMEM; the
   scoped-memory request may exceed what the chip can grant.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_int4_fused.py [--mt N] [--vmem MB]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mt", type=int, default=8)
    p.add_argument("--vmem", type=int, default=0, help="override DIA_FUSED_VMEM_MB")
    p.add_argument("--cache-len", type=int, default=1024)
    args = p.parse_args()
    if args.vmem:
        import os
        os.environ["DIA_FUSED_VMEM_MB"] = str(args.vmem)

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import init_params, new_self_cache
    from dia_tts_prune_tpu.ops.kernels.fused_step import (
        fused_decode_step, repack_decoder_fused,
    )

    config = dia_1_6b_config(weight_dtype="bfloat16")
    m = config.model
    dec = config.model.decoder
    params = init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
    jax.block_until_ready(params)
    print("params built", flush=True)

    t0 = time.time()
    try:
        pack = repack_decoder_fused(params, mlp_int4=True, mlp_tiles=args.mt)
        jax.block_until_ready(pack)
        print(f"PACK BUILD OK in {time.time()-t0:.1f}s  "
              f"wm={pack.wm.shape} sm={pack.sm.shape}", flush=True)
    except Exception:
        print("PACK BUILD FAILED:", flush=True)
        traceback.print_exc()
        return

    # free the f32 staging by dropping params? keep: production keeps params.
    B, S, T = 2, 128, args.cache_len
    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim),
        jnp.bfloat16)
    cmask = jnp.ones((B, S), jnp.bool_)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (B, dec.n_embd), jnp.bfloat16)
    cache = new_self_cache(config, B, max_len=T, dtype=jnp.bfloat16)

    t0 = time.time()
    try:
        out = fused_decode_step(
            pack, x0, jnp.int32(17), jnp.int32(16), cache.k, cache.v, ck,
            ck * 0.5, cmask, eps=m.normalization_layer_epsilon,
            rope_min=m.rope_min_timescale, rope_max=m.rope_max_timescale,
            mlp_tiles=args.mt)
        jax.block_until_ready(out)
        print(f"KERNEL OK in {time.time()-t0:.1f}s (compile+run)", flush=True)
    except Exception:
        print(f"KERNEL FAILED after {time.time()-t0:.1f}s:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
