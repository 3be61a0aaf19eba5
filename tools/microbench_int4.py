"""Does XLA fuse int4→bf16 weight converts into the dot's operand read the
way it does for int8?  If yes, weight-only int4 halves the decode loop's
dominant HBM traffic again (int8 already streams 1.26 GB/step).

Measures a GEMV chain shaped like the 18-layer decoder MLP (the decode
bottleneck): x[2, D] @ W[D, F] @ Wo[F, D] per layer, weights in bf16 / int8 /
int4 (per-column scales) / int4 grouped (per-[G,N]-group scales, the
quality-preserving layout).

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/microbench_int4.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=18)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--f", type=int, default=8192)
    p.add_argument("--group", type=int, default=128)
    p.add_argument("--iters", type=int, nargs=2, default=[32, 128])
    p.add_argument("--only", type=str, default=None,
                   help="comma list of variants to run (bf16,int8,nibble,"
                   "nibble_grouped,int4,int4_grouped); default: all but the "
                   "S4-dtype ones (broken transfer on axon)")
    args = p.parse_args()

    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    L, D, F, G = args.layers, args.d, args.f, args.group
    key = jax.random.PRNGKey(0)
    w1 = jax.random.normal(key, (L, D, F), jnp.float32) * 0.02
    w2 = jax.random.normal(key, (L, F, D), jnp.float32) * 0.02

    def pack_int8(w):
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s

    def pack_int4(w):
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 7.0
        q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int4)
        return q, s

    def pack_int4_grouped(w):
        # w [L, K, N] → groups of G along K with their own scale
        Lw, K, N = w.shape
        wg = w.reshape(Lw, K // G, G, N)
        s = jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0  # [L, K/G, 1, N]
        q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int4)
        return q, s

    def pack_nibble(w):
        # int4 stored as int8 BYTES (no S4 dtype — dodges the axon
        # device_put bug): byte[k2, n] = (q[2k2+1] << 4) | (q[2k2] & 0xF).
        # Unpack needs NO interleave when the dot is split by row parity:
        #   y = x[0::2] @ sext(b << 4 >> 4) + x[1::2] @ (b >> 4)
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 7.0
        q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int8)
        lo = q[:, 0::2, :]
        hi = q[:, 1::2, :]
        b = ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)
        return b, s

    def pack_nibble_grouped(w):
        # per-[G,N]-group scales on the ORIGINAL K axis (G even, so a
        # group's even/odd rows are contiguous in the packed array)
        Lw, K, N = w.shape
        wg = w.reshape(Lw, K // G, G, N)
        s = jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0  # [L, K/G, 1, N]
        q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8).reshape(Lw, K, N)
        b = ((q[:, 1::2, :] << 4) | (q[:, 0::2, :] & 0x0F)).astype(jnp.int8)
        return b, s

    def chain_nibble(x, packs):
        def layer(x, ws):
            ba, sa, bb, sb = ws  # ba [D/2, F] int8 bytes; sa [1, F]
            wl = ((ba << 4) >> 4).astype(jnp.bfloat16)
            wh = (ba >> 4).astype(jnp.bfloat16)
            h = (x[:, 0::2] @ wl + x[:, 1::2] @ wh) * sa[0].astype(jnp.bfloat16)
            h = jnp.maximum(h, 0)
            wl2 = ((bb << 4) >> 4).astype(jnp.bfloat16)
            wh2 = (bb >> 4).astype(jnp.bfloat16)
            y = (h[:, 0::2] @ wl2 + h[:, 1::2] @ wh2) * sb[0].astype(jnp.bfloat16)
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    def chain_nibble_grouped(x, packs):
        def layer(x, ws):
            ba, sa, bb, sb = ws  # ba [K/2, N] bytes; sa [K/G, 1, N]
            def gemv(xv, b, s):
                wl = ((b << 4) >> 4).astype(jnp.bfloat16)
                wh = (b >> 4).astype(jnp.bfloat16)
                ng = s.shape[0]
                xe = xv[:, 0::2].reshape(xv.shape[0], ng, G // 2)
                xo = xv[:, 1::2].reshape(xv.shape[0], ng, G // 2)
                part = jnp.einsum("bkg,kgn->bkn", xe, wl.reshape(ng, G // 2, -1))
                part += jnp.einsum("bkg,kgn->bkn", xo, wh.reshape(ng, G // 2, -1))
                return jnp.einsum("bkn,kn->bn", part, s[:, 0].astype(jnp.bfloat16))
            h = jnp.maximum(gemv(x, ba, sa), 0)
            return gemv(h, bb, sb).astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    from dia_tts_prune_tpu.ops.kernels.int4_gemv import int4_gemv_halfsplit
    from dia_tts_prune_tpu.ops.kernels.int4_matmul import (
        int4_matmul_halfsplit_grouped,
    )
    from dia_tts_prune_tpu.ops.quant import quantize_int4

    def pack_halfsplit(w, group=G):  # [L,K,N] -> bytes [L,K/2,N], scale [L,K/G,N]
        qk = quantize_int4(w, stacked=True, group=group, nibble=True,
                           halfsplit=True)
        assert qk.halfsplit, "halfsplit pack fell back (group misalignment?)"
        return qk.values, qk.scale

    def make_chain_halfsplit_pallas(**kw):
        def chain(x, packs):
            def layer(x, ws):
                ba, sa, bb, sb = ws
                h = jnp.maximum(int4_gemv_halfsplit(x, ba, sa, **kw), 0)
                return int4_gemv_halfsplit(h, bb, sb, **kw).astype(x.dtype), None
            x, _ = jax.lax.scan(layer, x, packs)
            return x
        return chain

    chain_halfsplit_pallas = make_chain_halfsplit_pallas()

    def chain_halfsplit_xla(x, packs):
        def layer(x, ws):
            ba, sa, bb, sb = ws
            h = jnp.maximum(int4_matmul_halfsplit_grouped(x, ba, sa), 0)
            return int4_matmul_halfsplit_grouped(h, bb, sb).astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    q1_8, s1_8 = pack_int8(w1)
    q2_8, s2_8 = pack_int8(w2)
    b1, sb1 = pack_nibble(w1)
    b2, sb2 = pack_nibble(w2)
    b1g, sb1g = pack_nibble_grouped(w1)
    b2g, sb2g = pack_nibble_grouped(w2)
    # S4-dtype packs are built lazily: creating them touches the broken
    # axon int4 device path even when the variant isn't benchmarked
    if {"int4", "int4_grouped"} & set((args.only or "").split(",")):
        q1_4, s1_4 = pack_int4(w1)
        q2_4, s2_4 = pack_int4(w2)
        q1_4g, s1_4g = pack_int4_grouped(w1)
        q2_4g, s2_4g = pack_int4_grouped(w2)
    w1_bf = w1.astype(jnp.bfloat16)
    w2_bf = w2.astype(jnp.bfloat16)

    def chain_bf16(x, packs):
        def layer(x, ws):
            a, b = ws
            h = jnp.maximum(x @ a, 0)
            return (h @ b).astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    def chain_q(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws
            h = jnp.maximum((x @ qa.astype(jnp.bfloat16)) * sa.astype(jnp.bfloat16), 0)
            return ((h @ qb.astype(jnp.bfloat16)) * sb.astype(jnp.bfloat16)).astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    def chain_q_grouped(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws  # qa [K/G, G, N], sa [K/G, 1, N]
            xa = x.reshape(x.shape[0], qa.shape[0], G)
            part = jnp.einsum("bkg,kgn->bkn", xa, qa.astype(jnp.bfloat16))
            h = jnp.maximum(jnp.einsum("bkn,kn->bn", part, sa[:, 0].astype(jnp.bfloat16)), 0)
            hb = h.reshape(h.shape[0], qb.shape[0], G)
            part2 = jnp.einsum("bkg,kgn->bkn", hb, qb.astype(jnp.bfloat16))
            y = jnp.einsum("bkn,kn->bn", part2, sb[:, 0].astype(jnp.bfloat16))
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x


    # ------------------------------------------------------------------
    # S4-layout ablations (round 5): production converts nibble bytes to
    # XLA-native S4 ONCE inside the jit (generate._maybe_unpack_s4) and the
    # hlo decomposition shows the GEMV fusions at ~74%% of the HBM roof.
    # These variants unpack to S4 in DIFFERENT memory layouts before an
    # identical scan, asking whether contraction-dim-minor (kng) or a plain
    # 2-D (kn) layout streams better than the current [K/G, G, N].
    def _unpack_s4(b):  # bytes [L, K/2, N] -> s4 [L, K, N]
        lo = (b << 4) >> 4
        hi = b >> 4
        Lw, K2, N = b.shape
        q = jnp.stack([lo, hi], axis=2).reshape(Lw, 2 * K2, N)
        return q.astype(jnp.int4)

    def chain_s4_kgn(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws  # qa s4 [K, N] viewed grouped
            K = qa.shape[0]
            xa = x.reshape(x.shape[0], K // G, G)
            part = jnp.einsum("bkg,kgn->bkn", xa,
                              qa.reshape(K // G, G, -1).astype(jnp.bfloat16))
            h = jnp.maximum(jnp.einsum("bkn,kn->bn", part,
                                       sa[:, 0].astype(jnp.bfloat16)), 0)
            Kb = qb.shape[0]
            hb = h.reshape(h.shape[0], Kb // G, G)
            part2 = jnp.einsum("bkg,kgn->bkn", hb,
                               qb.reshape(Kb // G, G, -1).astype(jnp.bfloat16))
            y = jnp.einsum("bkn,kn->bn", part2, sb[:, 0].astype(jnp.bfloat16))
            return y.astype(x.dtype), None

        def run(x, bs):
            b1_, s1_, b2_, s2_ = bs
            packs4 = (_unpack_s4(b1_), s1_, _unpack_s4(b2_), s2_)
            xx, _ = jax.lax.scan(layer, x, packs4)
            return xx
        return run(x, packs)

    def chain_s4_kng(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws  # qa s4 [K/G, N, G]
            xa = x.reshape(x.shape[0], qa.shape[0], G)
            part = jnp.einsum("bkg,kng->bkn", xa, qa.astype(jnp.bfloat16))
            h = jnp.maximum(jnp.einsum("bkn,kn->bn", part,
                                       sa[:, 0].astype(jnp.bfloat16)), 0)
            hb = h.reshape(h.shape[0], qb.shape[0], G)
            part2 = jnp.einsum("bkg,kng->bkn", hb, qb.astype(jnp.bfloat16))
            y = jnp.einsum("bkn,kn->bn", part2, sb[:, 0].astype(jnp.bfloat16))
            return y.astype(x.dtype), None

        def run(x, bs):
            b1_, s1_, b2_, s2_ = bs
            Lw, K2, N = b1_.shape
            qa = _unpack_s4(b1_).reshape(Lw, K2 * 2 // G, G, N).transpose(0, 1, 3, 2)
            Lw2, K22, N2 = b2_.shape
            qb = _unpack_s4(b2_).reshape(Lw2, K22 * 2 // G, G, N2).transpose(0, 1, 3, 2)
            xx, _ = jax.lax.scan(layer, x, (qa, s1_, qb, s2_))
            return xx
        return run(x, packs)

    def chain_s4_flat(x, packs):
        """Single [K, N] dot, scales applied by pre-scaling x per group
        against a REFERENCE scale row then fixing per-n remainder — not
        exactly the grouped math, so benchmark-only (upper bound for a
        single-fusion layout)."""
        def layer(x, ws):
            qa, sa, qb, sb = ws
            h = jnp.maximum(
                (x @ qa.astype(jnp.bfloat16)) * sa[0, 0].astype(jnp.bfloat16), 0)
            y = (h @ qb.astype(jnp.bfloat16)) * sb[0, 0].astype(jnp.bfloat16)
            return y.astype(x.dtype), None

        def run(x, bs):
            b1_, s1_, b2_, s2_ = bs
            packs4 = (_unpack_s4(b1_), s1_, _unpack_s4(b2_), s2_)
            xx, _ = jax.lax.scan(layer, x, packs4)
            return xx
        return run(x, packs)

    def _s4_kng_layout(b):
        q = _unpack_s4(b)
        Lw, K, N = q.shape
        return q.reshape(Lw, K // G, G, N).transpose(0, 1, 3, 2)

    def chain_s4_kgn_res(x, packs4):
        def layer(x, ws):
            qa, sa, qb, sb = ws
            K = qa.shape[0]
            xa = x.reshape(x.shape[0], K // G, G)
            part = jnp.einsum("bkg,kgn->bkn", xa,
                              qa.reshape(K // G, G, -1).astype(jnp.bfloat16))
            h = jnp.maximum(jnp.einsum("bkn,kn->bn", part,
                                       sa[:, 0].astype(jnp.bfloat16)), 0)
            Kb = qb.shape[0]
            hb = h.reshape(h.shape[0], Kb // G, G)
            part2 = jnp.einsum("bkg,kgn->bkn", hb,
                               qb.reshape(Kb // G, G, -1).astype(jnp.bfloat16))
            y = jnp.einsum("bkn,kn->bn", part2, sb[:, 0].astype(jnp.bfloat16))
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs4)
        return x

    def chain_s4_kng_res(x, packs4):
        def layer(x, ws):
            qa, sa, qb, sb = ws  # qa s4 [K/G, N, G]
            xa = x.reshape(x.shape[0], qa.shape[0], G)
            part = jnp.einsum("bkg,kng->bkn", xa, qa.astype(jnp.bfloat16))
            h = jnp.maximum(jnp.einsum("bkn,kn->bn", part,
                                       sa[:, 0].astype(jnp.bfloat16)), 0)
            hb = h.reshape(h.shape[0], qb.shape[0], G)
            part2 = jnp.einsum("bkg,kng->bkn", hb, qb.astype(jnp.bfloat16))
            y = jnp.einsum("bkn,kn->bn", part2, sb[:, 0].astype(jnp.bfloat16))
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs4)
        return x

    def chain_s4_flat_res(x, packs4):
        def layer(x, ws):
            qa, sa, qb, sb = ws
            h = jnp.maximum(
                (x @ qa.astype(jnp.bfloat16)) * sa[0, 0].astype(jnp.bfloat16), 0)
            y = (h @ qb.astype(jnp.bfloat16)) * sb[0, 0].astype(jnp.bfloat16)
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs4)
        return x

    x0 = jax.random.normal(key, (2, D), jnp.bfloat16)

    def bench(fn, packs, prep=None):
        # packs MUST be jit arguments, not a closure: closed-over arrays
        # embed in the HLO as constants and the remote-compile request body
        # blows past the tunnel's length limit (HTTP 413)
        @jax.jit
        def run(x, n, packs):
            if prep is not None:
                packs = prep(packs)  # once per dispatch, outside the loop
            return jax.lax.fori_loop(0, n, lambda i, x: fn(x * 0.5, packs), x)

        lo, hi = args.iters
        ts = {}
        for n in (lo, hi):
            # device_get, NOT block_until_ready: on the remote axon backend
            # block_until_ready returns at enqueue time — only a host fetch
            # observes execution completion
            jax.device_get(run(x0, n, packs))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(run(x0, n, packs))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[hi] - ts[lo]) / (hi - lo) * 1e3

    out = {"metric": "int4_microbench_ms_per_chain", "layers": L, "d": D, "f": F}
    variants = {
        # cheapest-information-first: the nibble vs int8 question is the one
        # this tool exists to answer; S4-dtype variants are opt-in (their
        # device transfer is broken on axon — PERF.md)
        "nibble": lambda: bench(chain_nibble, (b1, sb1, b2, sb2)),
        "nibble_grouped": lambda: bench(
            chain_nibble_grouped, (b1g, sb1g, b2g, sb2g)),
        "int8": lambda: bench(chain_q, (q1_8, s1_8, q2_8, s2_8)),
        "bf16": lambda: bench(chain_bf16, (w1_bf, w2_bf)),
        "int4": lambda: bench(chain_q, (q1_4, s1_4, q2_4, s2_4)),
        "int4_grouped": lambda: bench(
            chain_q_grouped, (q1_4g, s1_4g, q2_4g, s2_4g)),
        "halfsplit_pallas": lambda: bench(
            chain_halfsplit_pallas, pack_halfsplit(w1) + pack_halfsplit(w2)),
        # ablations: i16 unpack (half the shift register traffic), per-column
        # scales (no in-register group multiply), bigger streaming tiles
        "halfsplit_pallas_i16": lambda: bench(
            make_chain_halfsplit_pallas(shift_width=16),
            pack_halfsplit(w1) + pack_halfsplit(w2)),
        "halfsplit_pallas_pc": lambda: bench(
            make_chain_halfsplit_pallas(),
            pack_halfsplit(w1, group=None) + pack_halfsplit(w2, group=None)),
        "halfsplit_pallas_big": lambda: bench(
            make_chain_halfsplit_pallas(tile_n=2048, tile_cap=8 * 1024 * 1024),
            pack_halfsplit(w1) + pack_halfsplit(w2)),
        "halfsplit_pallas_i16_pc_big": lambda: bench(
            make_chain_halfsplit_pallas(shift_width=16, tile_n=2048,
                                        tile_cap=8 * 1024 * 1024),
            pack_halfsplit(w1, group=None) + pack_halfsplit(w2, group=None)),
        "halfsplit_xla": lambda: bench(
            chain_halfsplit_xla, pack_halfsplit(w1) + pack_halfsplit(w2)),
        # round-5 S4 layout ablations (nibble bytes cross the wire; unpack
        # in-jit exactly like production)
        "s4_kgn": lambda: bench(chain_s4_kgn, (b1g, sb1g, b2g, sb2g)),
        "s4_kng": lambda: bench(chain_s4_kng, (b1g, sb1g, b2g, sb2g)),
        "s4_flat": lambda: bench(chain_s4_flat, (b1g, sb1g, b2g, sb2g)),
        # resident: unpack ONCE per dispatch (== production generate paths)
        "s4_kgn_res": lambda: bench(
            chain_s4_kgn_res, (b1g, sb1g, b2g, sb2g),
            prep=lambda bs: (_unpack_s4(bs[0]), bs[1], _unpack_s4(bs[2]), bs[3])),
        "s4_kng_res": lambda: bench(
            chain_s4_kng_res, (b1g, sb1g, b2g, sb2g),
            prep=lambda bs: (_s4_kng_layout(bs[0]), bs[1],
                             _s4_kng_layout(bs[2]), bs[3])),
        "s4_flat_res": lambda: bench(
            chain_s4_flat_res, (b1g, sb1g, b2g, sb2g),
            prep=lambda bs: (_unpack_s4(bs[0]), bs[1], _unpack_s4(bs[2]), bs[3])),
    }
    run_set = (args.only.split(",") if args.only
               else ["nibble", "nibble_grouped", "int8", "bf16"])
    for name in run_set:
        out[name] = round(variants[name](), 4)
        print(f"# {name}: {out[name]} ms/chain", flush=True)
    # quality proxy: relative RMS error of the packed formats (nibble packs
    # share the S4 grids — int4_rms == nibble rms, int4_grouped_rms ==
    # nibble_grouped rms — so compute them from float re-quantization, not
    # from the possibly-unbuilt S4 arrays)
    def rms(deq):
        rel = jnp.sqrt(jnp.mean((deq - w1) ** 2)) / jnp.sqrt(jnp.mean(w1 ** 2))
        return round(float(rel), 5)

    out["int8_rms"] = rms(q1_8.astype(jnp.float32) * s1_8)
    s4 = jnp.maximum(jnp.max(jnp.abs(w1), axis=-2, keepdims=True), 1e-12) / 7.0
    out["int4_rms"] = rms(jnp.clip(jnp.round(w1 / s4), -7, 7) * s4)
    w1g = w1.reshape(L, D // G, G, F)
    s4g = jnp.maximum(jnp.max(jnp.abs(w1g), axis=2, keepdims=True), 1e-12) / 7.0
    out["int4_grouped_rms"] = rms(
        (jnp.clip(jnp.round(w1g / s4g), -7, 7) * s4g).reshape(w1.shape))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
