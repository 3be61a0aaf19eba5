"""Bisect the real decode step's cost: re-run `decode_step_scan`'s exact body
with individual components disabled and report the per-step slope for each.

The synthetic decomposition (tools/microbench_decode.py) shows the op mix
should run at ~1.3 ms/step (773 GB/s effective), but the real step measures
2.88 ms — this tool attributes the difference to real-code structures the
synthetic bench doesn't have (per-channel embedding gathers, logits head,
fp32 sdpa bookkeeping, cache commit, separate 3-D-kernel projections).

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/bisect_step.py
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dia_tts_prune_tpu.models.dia import KVCache, _embed_channels  # noqa: E402
from dia_tts_prune_tpu.ops.modules import (  # noqa: E402
    attention_qkv, dense_general, rms_norm, rope, sdpa,
)


def make_step(config, compute_dtype, *, embed=True, self_attn=True,
              cross_attn=True, head=True, commit=True):
    """A decode_step_scan clone with toggles. Mirrors models/dia.py:467-566."""
    m = config.model
    dec = m.decoder
    eps = m.normalization_layer_epsilon
    H = dec.gqa_head_dim
    scale = 1.0 / math.sqrt(H)

    def step(params, tgt, position, write_slot, self_cache, cross_cache, cmask):
        B = tgt.shape[0]
        Tmax = self_cache.k.shape[2]
        if embed:
            x = _embed_channels(params, tgt, compute_dtype)
        else:
            x = jnp.full((B, 1, dec.n_embd), 0.01, compute_dtype)

        slot_ids = jnp.arange(Tmax, dtype=jnp.int32)
        prefix_mask = (slot_ids < write_slot)[None, None, None, :]
        neg = jnp.float32(jnp.finfo(jnp.float32).min)

        def layer_fn(x, xs):
            lp, kc, vc, ck, cv = xs
            h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
            q, k_new, v_new = attention_qkv(
                lp["self_attention"], h, h, position, position,
                m.rope_min_timescale, m.rope_max_timescale)
            if self_attn:
                Nq = q.shape[2]
                Nkv = k_new.shape[2]
                G = Nq // Nkv
                qg = q.reshape(B, 1, Nkv, G, H)
                s_pre = jnp.einsum("btngh,bsnh->bngts", qg,
                                   kc.astype(compute_dtype),
                                   preferred_element_type=jnp.float32) * scale
                s_pre = jnp.where(prefix_mask[:, :, None, :, :], s_pre, neg)
                s_cur = jnp.einsum("btngh,btnh->bngt", qg,
                                   k_new.astype(compute_dtype),
                                   preferred_element_type=jnp.float32)[..., None] * scale
                m_all = jnp.maximum(jnp.max(s_pre, -1, keepdims=True), s_cur)
                p_pre = jnp.exp(s_pre - m_all)
                p_cur = jnp.exp(s_cur - m_all)
                denom = jnp.sum(p_pre, -1, keepdims=True) + p_cur
                acc = jnp.einsum("bngts,bsnh->btngh",
                                 p_pre.astype(compute_dtype),
                                 vc.astype(compute_dtype))
                acc = acc + p_cur[..., 0].transpose(0, 3, 1, 2)[..., None] * \
                    v_new[:, :, :, None, :]
                sa = (acc / denom[..., 0].transpose(0, 3, 1, 2)[..., None]
                      ).astype(compute_dtype).reshape(B, 1, Nq, H)
                x = x + dense_general(sa, lp["self_attention"]["o_proj"]["kernel"],
                                      axis=(-2, -1)).astype(x.dtype)
            else:
                x = x + dense_general(
                    jnp.broadcast_to(v_new[:, :, :1, :], (B, 1, q.shape[2], H)),
                    lp["self_attention"]["o_proj"]["kernel"], axis=(-2, -1)
                ).astype(x.dtype)

            h = rms_norm(x, lp["pre_ca_norm"]["scale"], eps)
            cq = dense_general(h, lp["cross_attention"]["q_proj"]["kernel"])
            cq = rope(cq, position, m.rope_min_timescale, m.rope_max_timescale)
            if cross_attn:
                ca = sdpa(cq, ck, cv, None)
            else:
                ca = cq
            x = x + dense_general(ca, lp["cross_attention"]["o_proj"]["kernel"],
                                  axis=(-2, -1)).astype(x.dtype)

            h = rms_norm(x, lp["pre_mlp_norm"]["scale"], eps)
            fused = dense_general(h, lp["mlp"]["wi_fused"]["kernel"])
            hidden = jax.nn.silu(fused[..., 0, :].astype(jnp.float32)).astype(x.dtype) \
                * fused[..., 1, :]
            x = x + dense_general(hidden, lp["mlp"]["wo"]["kernel"]).astype(x.dtype)
            return x, (k_new.astype(self_cache.k.dtype),
                       v_new.astype(self_cache.v.dtype))

        x, (ks, vs) = jax.lax.scan(
            layer_fn, x,
            (params["decoder"]["layers"], self_cache.k, self_cache.v,
             cross_cache.k, cross_cache.v))
        if commit:
            new_cache = KVCache(
                k=jax.lax.dynamic_update_slice(
                    self_cache.k, ks, (0, 0, write_slot.astype(jnp.int32), 0, 0)),
                v=jax.lax.dynamic_update_slice(
                    self_cache.v, vs, (0, 0, write_slot.astype(jnp.int32), 0, 0)))
        else:
            new_cache = self_cache
        x = rms_norm(x, params["decoder"]["norm"]["scale"], eps)
        if head:
            logits = dense_general(
                x, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
        else:
            logits = jnp.zeros(
                (x.shape[0], 1, config.data.channels, 1028), jnp.float32)
        return logits, new_cache

    return step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=256)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--cross-len", type=int, default=128)
    args = p.parse_args()

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import init_params, new_self_cache
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    config = dia_1_6b_config(weight_dtype="bfloat16")
    dtype = jnp.bfloat16
    params = quantize_params_int8_packed(
        init_params(config, jax.random.PRNGKey(0), dtype))
    d = config.data
    dec = config.model.decoder
    B, S = 2, args.cross_len

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross = KVCache(k=ck, v=ck * 0.5)
    cmask = jnp.ones((B, 1, 1, S), jnp.bool_)

    def timeit(step):
        import functools

        def make(steps):
            @jax.jit
            def run(tokens0, cache, pp):
                def body(i, carry):
                    tok, cache = carry
                    pos = jnp.full((B, 1), i + 1, jnp.int32)
                    logits, cache = step(pp, tok, pos, i.astype(jnp.int32),
                                         cache, cross, cmask)
                    tok = jnp.argmax(logits[:, -1:, :, :], -1).astype(jnp.int32)
                    return tok, cache
                tok, _ = jax.lax.fori_loop(0, steps, body, (tokens0, cache))
                return tok
            return run

        times = {}
        for steps in (args.lo, args.hi):
            run = make(steps)
            cache = new_self_cache(config, B, max_len=args.cache_len, dtype=dtype)
            tok0 = jnp.full((B, 1, d.channels), 100, jnp.int32)
            np.asarray(run(tok0, cache, params))
            best = np.inf
            for _ in range(3):
                cache = new_self_cache(config, B, max_len=args.cache_len, dtype=dtype)
                t0 = time.perf_counter()
                np.asarray(run(tok0, cache, params))
                best = min(best, time.perf_counter() - t0)
            times[steps] = best
        return (times[args.hi] - times[args.lo]) / (args.hi - args.lo) * 1e3

    variants = {
        "full": {},
        "-selfattn": {"self_attn": False},
        "-crossattn": {"cross_attn": False},
        "-head": {"head": False},
        "-embed": {"embed": False},
        "-commit": {"commit": False},
        "-head-embed": {"head": False, "embed": False},
    }
    for name, kw in variants.items():
        ms = timeit(make_step(config, dtype, **kw))
        print(f"{name:12s}: {ms:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
