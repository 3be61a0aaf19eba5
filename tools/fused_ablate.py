"""Per-phase cost attribution for the fused decode-step kernel.

Compiles ablated kernel variants (attention compute skipped / cross skipped /
different MLP tilings) and reports the slope-measured step time of each.
DMA traffic is IDENTICAL across ablations (BlockSpec fetches are pipeline-
driven, not use-driven), so deltas attribute pure compute/serialization cost.

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/fused_ablate.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=256)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--variants", type=str,
                   default="full,noattn,nocross,noboth,mt2,mt8")
    args = p.parse_args()

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import init_params, new_self_cache
    from dia_tts_prune_tpu.ops.kernels.fused_step import (
        fused_decode_step, repack_decoder_fused,
    )

    config = dia_1_6b_config(weight_dtype="bfloat16")
    m = config.model
    dec = m.decoder
    dtype = jnp.bfloat16
    params = init_params(config, jax.random.PRNGKey(0), dtype)
    pack8 = None  # lazy: int4-only runs must not carry the unused int8 pack
    pack4 = {}  # built lazily per mlp_tiles (wm nibble pairing is per-K-tile)
    B, S, T = 2, 128, args.cache_len

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cmask = jnp.ones((B, S), jnp.bool_)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (B, dec.n_embd), jnp.bfloat16)

    setups = {
        "full": dict(),
        "noattn": dict(ablate="attn"),
        "nocross": dict(ablate="cross"),
        "noboth": dict(ablate="attn,cross"),
        "mt2": dict(mlp_tiles=2),
        "mt8": dict(mlp_tiles=8),
        "kvseg": dict(attn_impl="kvseg"),          # per-kv-head segment dots
        "blockdiag": dict(attn_impl="blockdiag"),  # 1 block-diag dot per row
        "skipuncond": dict(skip_uncond=True),      # cond-half-only cross cache
        "int4": dict(_pack="int4"),                # nibble-packed MLP weights
        "int4skip": dict(_pack="int4", skip_uncond=True),
        "int4noboth": dict(_pack="int4", ablate="attn,cross"),
        # int4 + 8 MLP tiles: halves the int4 phase's live VMEM blocks
        "int4mt8": dict(_pack="int4", mlp_tiles=8),
        "kvsegskip": dict(attn_impl="kvseg", skip_uncond=True),
        "int4kvseg": dict(_pack="int4", attn_impl="kvseg", mlp_tiles=8,
                          skip_uncond=True),
        # zero-micro-dot attention (elementwise q·K + head-sum contraction)
        "vpu": dict(attn_impl="vpu"),
        "vpuskip": dict(attn_impl="vpu", skip_uncond=True),
        "int4vpu": dict(_pack="int4", attn_impl="vpu", mlp_tiles=8,
                        skip_uncond=True),
    }

    def measure(kw):
        nonlocal pack8
        kw = dict(kw)
        if kw.pop("_pack", None) == "int4":
            mt = kw.get("mlp_tiles", 4)
            if mt not in pack4:
                pack4[mt] = repack_decoder_fused(params, mlp_int4=True,
                                                 mlp_tiles=mt)
            pack = pack4[mt]
        else:
            if pack8 is None:
                pack8 = repack_decoder_fused(params)
            pack = pack8
        def make(steps):
            @jax.jit
            def run(x, kc, vc):
                def body(i, carry):
                    x, kc, vc = carry
                    xo, kn, vn = fused_decode_step(
                        pack, x.astype(jnp.bfloat16), i + 1, i, kc, vc, ck,
                        ck * 0.5, cmask, eps=m.normalization_layer_epsilon,
                        rope_min=m.rope_min_timescale,
                        rope_max=m.rope_max_timescale, **kw)
                    kc = jax.lax.dynamic_update_slice(
                        kc, kn[:, :, None].astype(kc.dtype), (0, 0, i, 0, 0))
                    vc = jax.lax.dynamic_update_slice(
                        vc, vn[:, :, None].astype(vc.dtype), (0, 0, i, 0, 0))
                    return xo.astype(jnp.bfloat16) * 1e-3, kc, vc
                x, kc, vc = jax.lax.fori_loop(0, steps, body, (x, kc, vc))
                return x
            return run

        times = {}
        for steps in (args.lo, args.hi):
            run = make(steps)
            cache = new_self_cache(config, B, max_len=T, dtype=dtype)
            np.asarray(run(x0, cache.k, cache.v))
            best = np.inf
            for _ in range(3):
                cache = new_self_cache(config, B, max_len=T, dtype=dtype)
                t0 = time.perf_counter()
                np.asarray(run(x0, cache.k, cache.v))
                best = min(best, time.perf_counter() - t0)
            times[steps] = best
        return (times[args.hi] - times[args.lo]) / (args.hi - args.lo) * 1e3

    for name in args.variants.split(","):
        try:
            ms = measure(setups[name])
            print(f"{name:8s}: {ms:6.3f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
