"""Probe Mosaic's native int4 path for the decode GEMV.

Two questions, answered on the real TPU:

1. Semantics: what logical row order does ``pltpu.bitcast(int8 -> int4)``
   produce?  (Which nibble is row 0, and along which dimension does the
   unpacked axis grow?)  Needed to choose the weight packing so the
   kernel needs NO activation shuffles.
2. Speed: is ``bitcast -> astype(bf16)`` (one hardware convert, no shifts)
   faster than the shift-unpack (measured 1.01 ms/chain per-column vs the
   0.42 ms bandwidth roof), and what is the kernel's no-unpack DMA+dot
   floor?

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_int4_bitcast.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def probe_semantics():
    """bitcast an int8 pattern whose low nibble = 2*i, high = 2*i+1 mod 8."""

    def kernel(b_ref, o_ref):
        w4 = pltpu.bitcast(b_ref[:], jnp.int4)
        o_ref[:] = w4.astype(jnp.int32)

    S, L = 8, 128
    lo = (np.arange(S * L, dtype=np.int64).reshape(S, L) % 7).astype(np.int8)
    hi = ((np.arange(S * L, dtype=np.int64).reshape(S, L) % 5) - 4).astype(np.int8)
    b = ((hi << 4) | (lo & 0x0F)).astype(np.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.int32),
    )(jnp.asarray(b))
    out = np.asarray(jax.device_get(out))
    # candidate orders
    cands = {
        "rows_interleaved_lo_first": np.stack([lo, hi], 1).reshape(2 * S, L),
        "rows_interleaved_hi_first": np.stack([hi, lo], 1).reshape(2 * S, L),
        "halves_lo_then_hi": np.concatenate([lo, hi], 0),
        "halves_hi_then_lo": np.concatenate([hi, lo], 0),
    }
    verdict = [k for k, v in cands.items() if np.array_equal(out, v.astype(np.int32))]
    print(json.dumps({"bitcast_order": verdict or "UNKNOWN"}))
    if not verdict:
        print("sample out[:4, :6]:\n", out[:4, :6])
        print("lo[:2, :6]:\n", lo[:2, :6], "\nhi[:2, :6]:\n", hi[:2, :6])
    return verdict


def _mk_gemv(mode: str, K2: int, tiled: bool):
    def kernel(x_ref, w_ref, s_ref, o_ref):
        x = x_ref[:]
        wb = w_ref[0] if tiled else w_ref[:]
        if mode.startswith("floor"):  # no unpack: half-K raw-byte dot (wrong math)
            w = wb.astype(x.dtype)
            acc = jax.lax.dot_general(
                x[:, :K2], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:  # bitcast unpack: one convert, no shifts
            w4 = pltpu.bitcast(wb, jnp.int4)        # [K, TN]
            w = w4.astype(x.dtype)
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        sv = s_ref[0, 0] if tiled else s_ref[0]
        o_ref[:] = (acc * sv[None, :]).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "tile_n"))
def gemv(x, w_b, scale, mode: str, tile_n: int = 512):
    B, K = x.shape
    if "wide" in mode:
        tile_n = 2048
    tiled = "contig" in mode
    if tiled:
        nt, K2, tile_n = w_b.shape
        N = nt * tile_n
    else:
        K2, N = w_b.shape
        while K2 * tile_n > 2 * 1024 * 1024 and tile_n > 128:
            tile_n //= 2
        tile_n = min(tile_n, N)
    if tiled:
        in_specs = [
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2, tile_n), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_n), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        _mk_gemv(mode, K2, tiled),
        grid=(pl.cdiv(N, tile_n),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
    )(x, w_b, scale)


def bench_chain(mode: str, L=18, D=2048, F=8192, iters=(32, 128)):
    key = jax.random.PRNGKey(0)
    b1 = jax.random.randint(key, (L, D // 2, F), -128, 127, jnp.int8)
    b2 = jax.random.randint(key, (L, F // 2, D), -128, 127, jnp.int8)
    s1 = jnp.ones((L, 1, F), jnp.float32) * 0.01
    s2 = jnp.ones((L, 1, D), jnp.float32) * 0.01
    if "contig" in mode:  # pre-tile: [L, K2, N] -> [L, N/tn, K2, tn] contiguous
        def tile(b, tn=512):
            Lw, K2, N = b.shape
            return jnp.ascontiguousarray(
                b.reshape(Lw, K2, N // tn, tn).transpose(0, 2, 1, 3))
        def tile_s(s, tn=512):
            Lw, _, N = s.shape
            return jnp.ascontiguousarray(
                s.reshape(Lw, 1, N // tn, tn).transpose(0, 2, 1, 3))
        b1, b2, s1, s2 = tile(b1), tile(b2), tile_s(s1), tile_s(s2)
    x0 = jax.random.normal(key, (2, D), jnp.bfloat16)

    def chain(x, packs):
        def layer(x, ws):
            ba, sa, bb, sb = ws
            h = jnp.maximum(gemv(x, ba, sa, mode), 0) * 0.01
            return gemv(h, bb, sb, mode).astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    @jax.jit
    def run(x, n, packs):
        return jax.lax.fori_loop(0, n, lambda i, x: chain(x * 0.5, packs), x)

    packs = (b1, s1, b2, s2)
    ts = {}
    for n in iters:
        jax.device_get(run(x0, n, packs))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(run(x0, n, packs))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0]) * 1e3


def main():
    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=str,
                    default="floor,bitcast")
    ap.add_argument("--skip-semantics", action="store_true")
    a = ap.parse_args()
    order = None if a.skip_semantics else probe_semantics()
    out = {"bitcast_order": order}
    for mode in a.modes.split(","):
        try:
            out[mode] = round(bench_chain(mode), 4)
            print(f"# {mode}: {out[mode]} ms/chain", flush=True)
        except Exception as e:  # keep the other variant's number
            out[mode] = f"FAIL: {str(e)[:300]}"
            print(f"# {mode} FAILED: {str(e)[:300]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
