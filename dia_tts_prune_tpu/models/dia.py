"""Dia 1.6B text→dialogue-speech model, TPU-native.

Functional re-design of the reference encoder/decoder stack
(dia/layers.py:349-814): parameters are a pytree of stacked per-layer arrays
(leading ``L`` axis) so the transformer stacks compile as ``lax.scan`` over
layers — one layer trace instead of N, fast compiles, and clean sharding
annotations on a single stacked tensor per weight.

Model structure (per the reference):
* Encoder: byte embedding → N pre-norm blocks {RMSNorm → MHA self-attn (RoPE,
  segment mask) → RMSNorm → SwiGLU MLP} → final RMSNorm
  (dia/layers.py:419-462).
* Decoder: 9 per-channel embeddings summed → N blocks {RMSNorm → GQA causal
  self-attn (KV cache) → RMSNorm → MHA cross-attn over static encoder KV →
  RMSNorm → SwiGLU MLP} → final RMSNorm → logits head to (channels, vocab)
  (dia/layers.py:465-766).

KV-cache layout is time-major ``[L, B, T, N, H]`` so a single-step write is a
contiguous ``dynamic_update_slice`` and the decode-step attention consumes the
cache without transposition.  ``decode_step`` unrolls layers in Python (tiny
per-token graph; lets XLA update each cache buffer in place inside the
``lax.while_loop`` carry), while full-sequence passes scan over layers.
"""

from __future__ import annotations

import math
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DiaConfig
from ..ops.modules import (
    attention,
    attention_out,
    attention_qkv,
    dense_general,
    full_attention,
    mlp_block,
    rms_norm,
    rope,
    sdpa,
)

Params = dict[str, Any]


class KVCache(NamedTuple):
    """Stacked per-layer KV cache: k/v of shape [L, B, T, N, H]."""

    k: jax.Array
    v: jax.Array


class QuantKVCache(NamedTuple):
    """int8 self-attention cache: the decode loop re-reads the whole cache
    every token on a bandwidth-bound path, so storing K/V as int8 with
    per-(token, head) symmetric scales halves the cache bytes vs bf16
    (~75 → ~37 MB/step at the 1024 bucket).  The int8→f32 convert fuses into
    the attention dot's operand read (same trick as the packed int8 weights);
    scales are applied OUTSIDE the contractions: scores scale by ``ks[t, n]``
    after the q·K dot, and probabilities are pre-scaled by ``vs[t, n]``
    before the p·V dot.  Per-token scales make this near-lossless (each
    128-value head row gets its own range).

    k/v: int8 [L, B, T, N, H];  ks/vs: f32 [L, B, T, N]."""

    k: jax.Array
    v: jax.Array
    ks: jax.Array
    vs: jax.Array


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 over the trailing (head-dim) axis: [..., H] →
    (int8 [..., H], f32 scales [...])."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax, 1e-12).astype(jnp.float32) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def _sdpa_quant(q, k8, v8, kscale, vscale, mask):
    """``ops.modules.sdpa`` over an int8-quantized KV block (GQA, fp32
    softmax): key scales apply to the scores AFTER the q·K contraction and
    value scales pre-scale the probabilities before p·V, so both dots stream
    raw int8 codes (the convert fuses into the operand read).  Preserves
    sdpa's exact-zero fully-masked-row rule (ops/modules.py:262-277 — torch
    SDPA parity on the CFG unconditional branch).

    q [B,Tq,Nq,H]; k8/v8 int8 [B,S,Nkv,H]; scales f32 [B,S,Nkv];
    mask bool broadcastable to [B,1,Tq,S] or None."""
    B, Tq, Nq, H = q.shape
    Nkv = k8.shape[2]
    G = Nq // Nkv
    qg = q.reshape(B, Tq, Nkv, G, H)
    scores = jnp.einsum(
        "btngh,bsnh->bngts", qg.astype(jnp.float32), k8.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(H))
    scores = scores * kscale.transpose(0, 2, 1)[:, :, None, None, :]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    if mask is not None:
        m = mask[:, :, None, :, :] if mask.ndim == 4 else mask
        scores = jnp.where(m, scores, neg)
    row_max = jnp.max(scores, axis=-1, keepdims=True)
    row_max = jnp.where(row_max <= neg * 0.5, 0.0, row_max)
    unnorm = jnp.exp(scores - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = unnorm / jnp.maximum(denom, jnp.float32(1e-30))
    w_v = weights * vscale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bngts,bsnh->btngh", w_v, v8.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, Nq, H).astype(q.dtype)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _dense_init(key, shape, dtype, fan_in_axes):
    fan_in = 1
    for ax in fan_in_axes:
        fan_in *= shape[ax]
    scale = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(config: DiaConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (the reference relies on checkpoint loads;
    this initializer exists for tests, training-from-scratch and benchmarks).
    """
    m = config.model
    enc, dec = m.encoder, m.decoder
    C = config.data.channels
    keys = iter(jax.random.split(key, 64))

    def dense(shape, n_in_axes=1):
        return {"kernel": _dense_init(next(keys), shape, dtype, tuple(range(n_in_axes)))}

    enc_layers = {
        "pre_sa_norm": {"scale": jnp.ones((enc.n_layer, enc.n_embd), dtype)},
        "self_attention": {
            "q_proj": dense((enc.n_layer, enc.n_embd, enc.n_head, enc.head_dim), 2),
            "k_proj": dense((enc.n_layer, enc.n_embd, enc.n_head, enc.head_dim), 2),
            "v_proj": dense((enc.n_layer, enc.n_embd, enc.n_head, enc.head_dim), 2),
            "o_proj": dense((enc.n_layer, enc.n_head, enc.head_dim, enc.n_embd), 3),
        },
        "post_sa_norm": {"scale": jnp.ones((enc.n_layer, enc.n_embd), dtype)},
        "mlp": {
            "wi_fused": dense((enc.n_layer, enc.n_embd, 2, enc.n_hidden), 2),
            "wo": dense((enc.n_layer, enc.n_hidden, enc.n_embd), 2),
        },
    }
    dec_layers = {
        "pre_sa_norm": {"scale": jnp.ones((dec.n_layer, dec.n_embd), dtype)},
        "self_attention": {
            "q_proj": dense((dec.n_layer, dec.n_embd, dec.gqa_query_heads, dec.gqa_head_dim), 2),
            "k_proj": dense((dec.n_layer, dec.n_embd, dec.kv_heads, dec.gqa_head_dim), 2),
            "v_proj": dense((dec.n_layer, dec.n_embd, dec.kv_heads, dec.gqa_head_dim), 2),
            "o_proj": dense((dec.n_layer, dec.gqa_query_heads, dec.gqa_head_dim, dec.n_embd), 3),
        },
        "pre_ca_norm": {"scale": jnp.ones((dec.n_layer, dec.n_embd), dtype)},
        "cross_attention": {
            "q_proj": dense((dec.n_layer, dec.n_embd, dec.cross_query_heads, dec.cross_head_dim), 2),
            "k_proj": dense((dec.n_layer, enc.n_embd, dec.cross_query_heads, dec.cross_head_dim), 2),
            "v_proj": dense((dec.n_layer, enc.n_embd, dec.cross_query_heads, dec.cross_head_dim), 2),
            "o_proj": dense((dec.n_layer, dec.cross_query_heads, dec.cross_head_dim, dec.n_embd), 3),
        },
        "pre_mlp_norm": {"scale": jnp.ones((dec.n_layer, dec.n_embd), dtype)},
        "mlp": {
            "wi_fused": dense((dec.n_layer, dec.n_embd, 2, dec.n_hidden), 2),
            "wo": dense((dec.n_layer, dec.n_hidden, dec.n_embd), 2),
        },
    }
    return {
        "encoder": {
            "embedding": {
                "embedding": (
                    jax.random.normal(next(keys), (m.src_vocab_size, enc.n_embd), jnp.float32) * 0.02
                ).astype(dtype)
            },
            "layers": enc_layers,
            "norm": {"scale": jnp.ones((enc.n_embd,), dtype)},
        },
        "decoder": {
            "embeddings": {
                "embedding": (
                    jax.random.normal(next(keys), (C, m.tgt_vocab_size, dec.n_embd), jnp.float32) * 0.02
                ).astype(dtype)
            },
            "layers": dec_layers,
            "norm": {"scale": jnp.ones((dec.n_embd,), dtype)},
            "logits_dense": dense((dec.n_embd, C, m.tgt_vocab_size), 1),
        },
    }


def _layer_slice(layers: Params, i) -> Params:
    return jax.tree.map(lambda a: a[i], layers)


def _decode_attn_impl() -> str:
    """'pallas' = valid-prefix decode-attention kernel (reads only generated
    slots); 'xla' = full-length masked attention. Env-gated for A/B tuning;
    pallas only makes sense on TPU backends."""
    import os

    impl = os.environ.get("DIA_DECODE_ATTN", "xla")
    if impl == "pallas" and jax.default_backend() not in ("tpu", "axon"):
        return "xla"
    return impl


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_forward(
    params: Params,
    config: DiaConfig,
    x_ids: jax.Array,  # [B, T] int
    positions: jax.Array,  # [B, T]
    attn_mask: jax.Array,  # bool [B, 1, T, T]
    compute_dtype=jnp.float32,
    remat: bool = False,
    use_flash: bool = True,
) -> jax.Array:
    """Encoder stack (reference: dia/layers.py:445-462). Returns [B, T, D].

    ``remat=True`` rematerializes each layer in the backward pass (training
    memory / FLOPs trade — SURVEY.md §7 hard part 6).  ``use_flash=False``
    forces the masked-XLA path — required under autodiff (the Pallas flash
    kernel has no backward; a flash VJP kernel is future work)."""
    m = config.model
    x = params["encoder"]["embedding"]["embedding"][x_ids].astype(compute_dtype)
    eps = m.normalization_layer_epsilon
    # padding mask doubles as the segment ids the flash kernel consumes
    seg = (x_ids != config.data.text_pad_value).astype(jnp.int32) if use_flash else None

    def layer_fn(x, lp):
        h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
        sa = attention(
            lp["self_attention"], h, h, positions, positions, attn_mask,
            m.rope_min_timescale, m.rope_max_timescale, is_causal=False,
            q_segment_ids=seg, kv_segment_ids=seg,
        )
        x = x + sa.astype(x.dtype)
        h = rms_norm(x, lp["post_sa_norm"]["scale"], eps)
        x = x + mlp_block(lp["mlp"], h).astype(x.dtype)
        return x, None

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    x, _ = jax.lax.scan(layer_fn, x, params["encoder"]["layers"])
    return rms_norm(x, params["encoder"]["norm"]["scale"], eps)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _embed_channels(params: Params, tgt_BxTxC: jax.Array, compute_dtype) -> jax.Array:
    """Sum the 9 per-channel codebook embeddings (reference: dia/layers.py:690-697)."""
    embs = params["decoder"]["embeddings"]["embedding"]  # [C, V, D]

    def one(emb_VxD, ids_BxT):
        return emb_VxD[ids_BxT]

    per_channel = jax.vmap(one, in_axes=(0, 2))(embs, tgt_BxTxC)  # [C, B, T, D]
    return jnp.sum(per_channel, axis=0).astype(compute_dtype)


def precompute_cross_cache(
    params: Params,
    config: DiaConfig,
    enc_out: jax.Array,  # [B, S, E]
    enc_positions: jax.Array,  # [B, S]
) -> KVCache:
    """Static cross-attention KV for all layers (reference: dia/layers.py:632-669).

    RoPE is applied to keys with encoder positions; values are raw projections.
    Returns k/v of shape [L, B, S, N, H].
    """
    m = config.model

    def per_layer(lp):
        k = dense_general(enc_out, lp["cross_attention"]["k_proj"]["kernel"])
        v = dense_general(enc_out, lp["cross_attention"]["v_proj"]["kernel"])
        k = rope(k, enc_positions, m.rope_min_timescale, m.rope_max_timescale)
        return k, v

    k, v = jax.vmap(per_layer)(params["decoder"]["layers"])
    return KVCache(k=k, v=v)


def new_self_cache(
    config: DiaConfig, batch: int, max_len: int | None = None, dtype=jnp.float32,
    quant: bool = False,
) -> KVCache | QuantKVCache:
    """Preallocate the decoder self-attention cache [L, B, T, Nkv, H]
    (reference: dia/state.py:72-109, with time-major layout for contiguous
    single-step writes).  ``quant`` allocates the int8 + per-token-scale
    layout (QuantKVCache) — half the cache HBM traffic per decode step."""
    dec = config.model.decoder
    T = max_len if max_len is not None else config.data.audio_length
    shape = (dec.n_layer, batch, T, dec.kv_heads, dec.gqa_head_dim)
    if quant:
        return QuantKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(shape[:-1], jnp.float32),
            vs=jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _decoder_layer_full(
    lp: Params,
    m,
    x: jax.Array,
    dec_positions: jax.Array,
    self_mask: jax.Array | None,
    cross_k: jax.Array,
    cross_v: jax.Array,
    enc_positions_unused: jax.Array,
    cross_mask: jax.Array | None,
    is_causal: bool,
    dec_segment_ids: jax.Array | None = None,
    enc_segment_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder block on a full sequence. Returns (x, self_k, self_v)."""
    eps = m.normalization_layer_epsilon
    h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
    q, k, v = attention_qkv(
        lp["self_attention"], h, h, dec_positions, dec_positions,
        m.rope_min_timescale, m.rope_max_timescale,
    )
    sa = full_attention(q, k, v, self_mask, is_causal, dec_segment_ids, dec_segment_ids)
    x = x + attention_out(lp["self_attention"], sa).astype(x.dtype)

    h = rms_norm(x, lp["pre_ca_norm"]["scale"], eps)
    cq = dense_general(h, lp["cross_attention"]["q_proj"]["kernel"])
    cq = rope(cq, dec_positions, m.rope_min_timescale, m.rope_max_timescale)
    ones = None if dec_segment_ids is None else jnp.ones_like(dec_segment_ids)
    ca = full_attention(cq, cross_k, cross_v, cross_mask, False, ones, enc_segment_ids)
    x = x + attention_out(lp["cross_attention"], ca).astype(x.dtype)

    h = rms_norm(x, lp["pre_mlp_norm"]["scale"], eps)
    x = x + mlp_block(lp["mlp"], h).astype(x.dtype)
    return x, k, v


def decoder_forward(
    params: Params,
    config: DiaConfig,
    tgt_BxTxC: jax.Array,
    enc_out: jax.Array,
    enc_positions: jax.Array,
    dec_positions: jax.Array,
    self_attn_mask: jax.Array | None,
    cross_attn_mask: jax.Array | None,
    compute_dtype=jnp.float32,
    return_kv: bool = False,
    remat: bool = False,
    enc_padding_mask: jax.Array | None = None,
    use_flash: bool = True,
):
    """Full-sequence decoder pass — teacher-forced training and prompt prefill
    (reference: dia/layers.py:722-766). Causal self-attention throughout.

    Returns logits [B, T, C, V] (float32), and stacked per-layer self-attn K/V
    ([L, B, T, Nkv, H]) when ``return_kv`` for cache prefill.
    ``enc_padding_mask`` enables the flash-attention path (segment ids).
    """
    m = config.model
    cross = precompute_cross_cache(params, config, enc_out, enc_positions)
    x = _embed_channels(params, tgt_BxTxC, compute_dtype)
    dec_seg = jnp.ones(tgt_BxTxC.shape[:2], jnp.int32) if use_flash else None
    enc_seg = (
        enc_padding_mask.astype(jnp.int32)
        if (use_flash and enc_padding_mask is not None) else None
    )

    def layer_fn(x, xs):
        lp, ck, cv = xs
        x, k, v = _decoder_layer_full(
            lp, m, x, dec_positions, self_attn_mask, ck, cv, enc_positions,
            cross_attn_mask, True, dec_segment_ids=dec_seg, enc_segment_ids=enc_seg,
        )
        return x, (k, v) if return_kv else None

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    x, kv = jax.lax.scan(layer_fn, x, (params["decoder"]["layers"], cross.k, cross.v))
    x = rms_norm(x, params["decoder"]["norm"]["scale"], eps=m.normalization_layer_epsilon)
    logits = dense_general(x, params["decoder"]["logits_dense"]["kernel"])
    logits = logits.astype(jnp.float32)
    if return_kv:
        return logits, KVCache(k=kv[0], v=kv[1])
    return logits


def decoder_prefill(
    params: Params,
    config: DiaConfig,
    tgt_BxTxC: jax.Array,  # [B, P, C] (static P)
    dec_positions: jax.Array,  # [B, P]
    prefill_mask: jax.Array,  # bool [B, 1, P, P]: causal AND valid-length
    cross_cache: KVCache,
    cross_attn_mask: jax.Array | None,
    self_cache: KVCache,
    compute_dtype=jnp.float32,
    dec_segment_ids: jax.Array | None = None,
    enc_segment_ids: jax.Array | None = None,
) -> tuple[jax.Array, KVCache]:
    """Prefill the self-attention cache from prompt tokens.

    Replaces the reference's decoder.forward prefill (dia/model.py:403-419 →
    dia/layers.py:722-766) with a static-shape pass: P is padded to a fixed
    bucket and invalid positions are masked.  Writes K/V into cache slots
    [0, P) in one ``dynamic_update_slice`` per tensor.  Fixes reference quirk
    Q5 (prefill current_idx off-by-one overwriting the last prompt KV slot).
    """
    m = config.model
    x = _embed_channels(params, tgt_BxTxC, compute_dtype)

    def layer_fn(x, xs):
        lp, ck, cv = xs
        x, k, v = _decoder_layer_full(
            lp, m, x, dec_positions, prefill_mask, ck, cv, None,
            cross_attn_mask, False, dec_segment_ids=dec_segment_ids,
            enc_segment_ids=enc_segment_ids,
        )
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(layer_fn, x, (params["decoder"]["layers"], cross_cache.k, cross_cache.v))
    if isinstance(self_cache, QuantKVCache):
        kq, kss = quantize_kv(ks)
        vq, vss = quantize_kv(vs)
        new_cache = QuantKVCache(
            k=jax.lax.dynamic_update_slice(self_cache.k, kq, (0, 0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(self_cache.v, vq, (0, 0, 0, 0, 0)),
            ks=jax.lax.dynamic_update_slice(self_cache.ks, kss, (0, 0, 0, 0)),
            vs=jax.lax.dynamic_update_slice(self_cache.vs, vss, (0, 0, 0, 0)),
        )
    else:
        ks = ks.astype(self_cache.k.dtype)
        vs = vs.astype(self_cache.v.dtype)
        new_cache = KVCache(
            k=jax.lax.dynamic_update_slice(self_cache.k, ks, (0, 0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(self_cache.v, vs, (0, 0, 0, 0, 0)),
        )
    x = rms_norm(x, params["decoder"]["norm"]["scale"], eps=m.normalization_layer_epsilon)
    logits = dense_general(x, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
    return logits, new_cache


def decode_step(
    params: Params,
    config: DiaConfig,
    tgt_Bx1xC: jax.Array,  # [B, 1, C]
    position: jax.Array,  # [B, 1] RoPE position of this token
    write_slot: jax.Array,  # scalar int32: cache slot to write (== #valid slots - 1)
    self_cache: KVCache,
    cross_cache: KVCache,
    cross_attn_mask: jax.Array | None,  # bool [B, 1, 1, S]
    compute_dtype=jnp.float32,
    valid_from: jax.Array | None = None,  # int32 [B]: first valid cache slot
    skip_uncond_cross: bool = False,
) -> tuple[jax.Array, KVCache]:
    """Single autoregressive decode step (reference: dia/layers.py:671-720).

    ``skip_uncond_cross``: the generation loops run a CFG batch whose first
    half is the UNCONDITIONAL rows — all-padding text, so their
    cross-attention mask is all-False and the output is exactly zero (the
    masked-softmax exact-zero property, ops/modules.py::sdpa).  Setting this
    skips the cross-attention compute AND the cross-cache key/value reads for
    that half — on the bandwidth-bound decode path the skipped reads are
    ~38 MB/step at a 256-token text bucket — and writes the zeros directly.
    Bit-exact with the unskipped path.

    The hot per-token path: 9 embedding lookups summed, L decoder blocks with
    cached self-attention over slots [0, write_slot], static cross-attention,
    final norm, logits head.  Layers are unrolled in Python so each cache
    buffer is a distinct in-place ``dynamic_update_slice`` in the while-loop
    carry — no cache copies per step.

    ``valid_from`` (batched voice-clone): per-row first valid cache slot —
    streams with shorter audio prompts are left-padded so all prompts END at
    the same slot, and the pad slots must stay masked out of attention.

    Returns (logits [B, 1, C, V] fp32, updated cache).
    """
    m = config.model
    dec = m.decoder
    eps = m.normalization_layer_epsilon
    L = dec.n_layer
    B = tgt_Bx1xC.shape[0]
    Tmax = self_cache.k.shape[2]

    x = _embed_channels(params, tgt_Bx1xC, compute_dtype)  # [B, 1, D]

    # Valid-slot mask over the static-length cache: slots [0, write_slot].
    slot_ids = jnp.arange(Tmax, dtype=jnp.int32)
    self_mask = (slot_ids <= write_slot)[None, None, None, :]  # [1,1,1,Tmax]
    if valid_from is not None:
        self_mask = self_mask & (
            slot_ids[None, :] >= valid_from[:, None]
        )[:, None, None, :]  # [B,1,1,Tmax]

    new_k = self_cache.k
    new_v = self_cache.v
    for i in range(L):
        lp = _layer_slice(params["decoder"]["layers"], i)
        h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
        q, k, v = attention_qkv(
            lp["self_attention"], h, h, position, position,
            m.rope_min_timescale, m.rope_max_timescale,
        )  # q [B,1,Nq,H], k/v [B,1,Nkv,H]
        k = k.astype(new_k.dtype)
        v = v.astype(new_v.dtype)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None], (i, 0, write_slot.astype(jnp.int32), 0, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None], (i, 0, write_slot.astype(jnp.int32), 0, 0)
        )
        if _decode_attn_impl() == "pallas":
            from ..ops.kernels.decode_attention import decode_attention

            sa = decode_attention(
                q[:, 0], new_k[i].astype(compute_dtype), new_v[i].astype(compute_dtype),
                write_slot + 1,
            )[:, None]
        else:
            sa = sdpa(q, new_k[i].astype(compute_dtype), new_v[i].astype(compute_dtype), self_mask)
        x = x + attention_out(lp["self_attention"], sa)

        h = rms_norm(x, lp["pre_ca_norm"]["scale"], eps)
        cq = dense_general(h, lp["cross_attention"]["q_proj"]["kernel"])
        cq = rope(cq, position, m.rope_min_timescale, m.rope_max_timescale)
        if skip_uncond_cross:
            Bh = B // 2
            ca_c = sdpa(cq[Bh:], cross_cache.k[i][Bh:], cross_cache.v[i][Bh:],
                        cross_attn_mask[Bh:] if cross_attn_mask is not None else None)
            ca = jnp.concatenate([jnp.zeros_like(ca_c), ca_c], axis=0)
        else:
            ca = sdpa(cq, cross_cache.k[i], cross_cache.v[i], cross_attn_mask)
        x = x + attention_out(lp["cross_attention"], ca)

        h = rms_norm(x, lp["pre_mlp_norm"]["scale"], eps)
        x = x + mlp_block(lp["mlp"], h)

    x = rms_norm(x, params["decoder"]["norm"]["scale"], eps)
    logits = dense_general(x, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
    return logits, KVCache(k=new_k, v=new_v)


def decode_step_scan(
    params: Params,
    config: DiaConfig,
    tgt_Bx1xC: jax.Array,  # [B, 1, C]
    position: jax.Array,  # [B, 1]
    write_slot: jax.Array,  # int32 scalar (shared) or [B] (per-row slots)
    self_cache: KVCache,
    cross_cache: KVCache,
    cross_attn_mask: jax.Array | None,
    compute_dtype=jnp.float32,
    valid_from: jax.Array | None = None,  # int32 [B]: first valid cache slot
    n_layers: int | None = None,  # static: run only the FIRST n layers (early exit)
    skip_uncond_cross: bool = False,  # see decode_step — exact CFG-half skip
) -> tuple[jax.Array, KVCache]:
    """``decode_step`` with layers scanned instead of unrolled.

    ``write_slot`` may be a per-row [B] vector (continuous batching: each
    slot lives on its own local timeline): row b attends cache slots
    ``< write_slot[b]`` and commits its new K/V at ``write_slot[b]`` (a
    vmapped per-row dynamic_update_slice; the update is one [L, 1, Nkv, H]
    row so the scatter it lowers to is tiny).

    One layer trace instead of L → ~L× faster compiles and a much smaller
    executable.  The KV cache stays OUT of the scan carry (a scan output of
    updated caches would copy the whole cache every step): each layer attends
    the cache *prefix* (slots < write_slot) with an unnormalized accumulator,
    adds the current token's contribution analytically, and emits only its
    one-step K/V; a single stacked ``dynamic_update_slice`` commits all
    layers' K/V after the scan.

    ``n_layers`` truncates the stack to an early-exit draft model
    (speculative.py layer-skip self-draft): only the first ``n_layers``
    layers run and only their cache slots are written; the shared final norm
    + logits head produce the draft distribution.
    """
    m = config.model
    dec = m.decoder
    eps = m.normalization_layer_epsilon
    B = tgt_Bx1xC.shape[0]
    Tmax = self_cache.k.shape[2]
    H = dec.gqa_head_dim
    scale = 1.0 / math.sqrt(H)

    layer_params = params["decoder"]["layers"]
    quant = isinstance(self_cache, QuantKVCache)
    quant_cross = isinstance(cross_cache, QuantKVCache)
    sck, scv, crk, crv = self_cache.k, self_cache.v, cross_cache.k, cross_cache.v
    scks = self_cache.ks if quant else None
    scvs = self_cache.vs if quant else None
    crks = cross_cache.ks if quant_cross else None
    crvs = cross_cache.vs if quant_cross else None
    if n_layers is not None:
        layer_params = jax.tree.map(lambda a: a[:n_layers], layer_params)
        sck, scv, crk, crv = (sck[:n_layers], scv[:n_layers],
                              crk[:n_layers], crv[:n_layers])
        if quant:
            scks, scvs = scks[:n_layers], scvs[:n_layers]
        if quant_cross:
            crks, crvs = crks[:n_layers], crvs[:n_layers]

    x = _embed_channels(params, tgt_Bx1xC, compute_dtype)  # [B, 1, D]

    slot_ids = jnp.arange(Tmax, dtype=jnp.int32)
    if write_slot.ndim == 1:  # per-row timelines (continuous batching)
        prefix_mask = (slot_ids[None, :] < write_slot[:, None])[:, None, None, :]
    else:
        prefix_mask = (slot_ids < write_slot)[None, None, None, :]  # [1,1,1,Tmax]
    if valid_from is not None:
        prefix_mask = prefix_mask & (
            slot_ids[None, :] >= valid_from[:, None]
        )[:, None, None, :]  # [B,1,1,Tmax]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    def layer_fn(x, xs):
        # xs layout varies with cache quantization: scale slices [B, T, N]
        # ride alongside their int8 cache slices
        lp, kc, vc = xs[0], xs[1], xs[2]
        i = 3
        if quant:
            kcs, vcs = xs[i], xs[i + 1]
            i += 2
        ck, cv = xs[i], xs[i + 1]
        if quant_cross:
            ckks, ckvs = xs[i + 2], xs[i + 3]
        h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
        q, k_new, v_new = attention_qkv(
            lp["self_attention"], h, h, position, position,
            m.rope_min_timescale, m.rope_max_timescale,
        )  # q [B,1,Nq,H], k/v [B,1,Nkv,H]

        # prefix attention (slots < write_slot), unnormalized + running max
        Nq = q.shape[2]
        Nkv = k_new.shape[2]
        G = Nq // Nkv
        qg = q.reshape(B, 1, Nkv, G, H)
        s_pre = jnp.einsum(
            "btngh,bsnh->bngts", qg, kc.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * scale  # [B,Nkv,G,1,T]
        if quant:
            # int8 cache: the convert fused into the dot read raw int8 codes;
            # apply the per-(token, head) scales to the scores
            s_pre = s_pre * kcs.transpose(0, 2, 1)[:, :, None, None, :]
        s_pre = jnp.where(prefix_mask[:, :, None, :, :], s_pre, neg)
        # current-token score: q·k_new per kv-head group → [B,Nkv,G,1,1]
        s_cur = jnp.einsum(
            "btngh,btnh->bngt", qg, k_new.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )[..., None] * scale
        m_all = jnp.maximum(jnp.max(s_pre, axis=-1, keepdims=True), s_cur)
        p_pre = jnp.exp(s_pre - m_all)  # masked slots underflow to 0
        p_cur = jnp.exp(s_cur - m_all)  # [B,Nkv,G,1,1]
        denom = jnp.sum(p_pre, axis=-1, keepdims=True) + p_cur
        p_v = p_pre if not quant else (
            p_pre * vcs.transpose(0, 2, 1)[:, :, None, None, :])
        acc = jnp.einsum(
            "bngts,bsnh->btngh", p_v.astype(compute_dtype), vc.astype(compute_dtype),
        ) + p_cur[..., 0].transpose(0, 3, 1, 2)[..., None] * v_new[:, :, :, None, :]
        sa = (acc / denom[..., 0].transpose(0, 3, 1, 2)[..., None]).astype(compute_dtype)
        sa = sa.reshape(B, 1, Nq, H)
        x = x + attention_out(lp["self_attention"], sa).astype(x.dtype)

        h = rms_norm(x, lp["pre_ca_norm"]["scale"], eps)
        cq = dense_general(h, lp["cross_attention"]["q_proj"]["kernel"])
        cq = rope(cq, position, m.rope_min_timescale, m.rope_max_timescale)
        if quant_cross:
            attend = lambda sl: _sdpa_quant(  # noqa: E731
                cq[sl], ck[sl], cv[sl], ckks[sl], ckvs[sl],
                cross_attn_mask[sl] if cross_attn_mask is not None else None)
        else:
            attend = lambda sl: sdpa(  # noqa: E731
                cq[sl], ck[sl], cv[sl],
                cross_attn_mask[sl] if cross_attn_mask is not None else None)
        if skip_uncond_cross:
            Bh = B // 2
            ca_c = attend(slice(Bh, None))
            ca = jnp.concatenate([jnp.zeros_like(ca_c), ca_c], axis=0)
        else:
            ca = attend(slice(None))
        x = x + attention_out(lp["cross_attention"], ca).astype(x.dtype)

        h = rms_norm(x, lp["pre_mlp_norm"]["scale"], eps)
        x = x + mlp_block(lp["mlp"], h).astype(x.dtype)
        if quant:
            return x, (k_new, v_new)
        return x, (k_new.astype(self_cache.k.dtype), v_new.astype(self_cache.v.dtype))

    xs_in = (layer_params, sck, scv)
    if quant:
        xs_in += (scks, scvs)
    xs_in += (crk, crv)
    if quant_cross:
        xs_in += (crks, crvs)
    # DIA_SCAN_UNROLL>1 unrolls that many layer iterations per scan step —
    # fewer loop-body launches and cross-layer scheduling slack for XLA at
    # the cost of a bigger program (read at trace time; default 1; measured
    # round 5, see docs/PERF.md).
    unroll = int(os.environ.get("DIA_SCAN_UNROLL", "1") or 1)
    x, (ks, vs) = jax.lax.scan(layer_fn, x, xs_in, unroll=unroll)
    w = write_slot.astype(jnp.int32)
    if w.ndim == 1:
        # per-row commit slots: vmap the update over the batch axis (row b's
        # [L, 1, ...] slice lands at its own slot w[b])
        def _commit(buf, upd):
            return jax.vmap(
                lambda c, u, wi: jax.lax.dynamic_update_slice(
                    c, u, (0, wi) + (0,) * (c.ndim - 2)),
                in_axes=(1, 1, 0), out_axes=1,
            )(buf, upd, w)
    else:
        def _commit(buf, upd):
            return jax.lax.dynamic_update_slice(
                buf, upd, (0, 0, w) + (0,) * (buf.ndim - 3))
    if quant:
        kq, kss = quantize_kv(ks)  # [L,B,1,N,H] → int8 + [L,B,1,N]
        vq, vss = quantize_kv(vs)
        new_cache = QuantKVCache(
            k=_commit(self_cache.k, kq), v=_commit(self_cache.v, vq),
            ks=_commit(self_cache.ks, kss), vs=_commit(self_cache.vs, vss),
        )
    else:
        new_cache = KVCache(
            k=_commit(self_cache.k, ks), v=_commit(self_cache.v, vs),
        )
    x = rms_norm(x, params["decoder"]["norm"]["scale"], eps)
    logits = dense_general(x, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
    return logits, new_cache


def decode_window(
    params: Params,
    config: DiaConfig,
    tgt_BxWxC: jax.Array,  # [B, W, C] token rows [s, s+W)
    start_row: jax.Array,  # scalar int32 s: first window row (= first write slot)
    self_cache: KVCache,
    cross_cache: KVCache,
    cross_attn_mask: jax.Array | None,  # bool [B, 1, 1, S]
    compute_dtype=jnp.float32,
    skip_uncond_cross: bool = False,  # see decode_step — exact CFG-half skip
) -> tuple[jax.Array, KVCache]:
    """W-token teacher-forced decode at a dynamic cache offset — the
    speculative-decoding VERIFY pass (speculative.py).

    Window row ``s+i`` replays the loop's step ``t = s+i+1`` exactly: RoPE
    position ``t``, KV written to slot ``s+i``, attention over cache slots
    ``<= s+i`` (prefix read from the buffer, within-window part computed
    analytically with a shared running max — same two-part softmax as
    ``decode_step_scan``, generalized from 1 to W query tokens).  One pass
    produces the full model's logits for the W drafted positions, so W
    tokens are verified for one stack of weight reads — the weight-bandwidth
    economics that make self-drafted speculation pay on TPU.

    Returns (logits [B, W, C, V] fp32, cache with slots [s, s+W) committed).
    """
    m = config.model
    dec = m.decoder
    eps = m.normalization_layer_epsilon
    B, W = tgt_BxWxC.shape[:2]
    Tmax = self_cache.k.shape[2]
    H = dec.gqa_head_dim
    scale = 1.0 / math.sqrt(H)

    x = _embed_channels(params, tgt_BxWxC, compute_dtype)  # [B, W, D]
    # loop-step parity: row r carries RoPE position r+1 (the step index that
    # consumes it — see generate.py loop body / reference prepare_step)
    positions = (start_row + 1 + jnp.arange(W, dtype=jnp.int32))[None]  # [1, W]
    positions = jnp.broadcast_to(positions, (B, W))

    slot_ids = jnp.arange(Tmax, dtype=jnp.int32)
    prefix_mask = (slot_ids[None, :] < start_row)[None, None, :, :]  # [1,1,1,Tmax]→bcast [*,W,Tmax]
    win_causal = jnp.tril(jnp.ones((W, W), jnp.bool_))[None, None]  # row i sees slots s..s+i
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    def layer_fn(x, xs):
        lp, kc, vc, ck, cv = xs  # per-layer cache slices [B, T, N, H]
        h = rms_norm(x, lp["pre_sa_norm"]["scale"], eps)
        q, k_new, v_new = attention_qkv(
            lp["self_attention"], h, h, positions, positions,
            m.rope_min_timescale, m.rope_max_timescale,
        )  # q [B,W,Nq,H], k/v [B,W,Nkv,H]
        Nq, Nkv = q.shape[2], k_new.shape[2]
        G = Nq // Nkv
        qg = q.reshape(B, W, Nkv, G, H)
        # prefix: cache slots < s (stale slots >= s masked out)
        s_pre = jnp.einsum(
            "btngh,bsnh->bngts", qg, kc.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * scale  # [B,Nkv,G,W,Tmax]
        s_pre = jnp.where(prefix_mask[:, :, None, :, :], s_pre, neg)
        # within-window causal part against the fresh K
        s_win = jnp.einsum(
            "btngh,bwnh->bngtw", qg, k_new.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * scale  # [B,Nkv,G,W,W]
        s_win = jnp.where(win_causal[:, :, None], s_win, neg)
        m_all = jnp.maximum(
            jnp.max(s_pre, axis=-1, keepdims=True), jnp.max(s_win, axis=-1, keepdims=True)
        )
        m_all = jnp.maximum(m_all, neg * 0.5)  # guard fully-masked rows (i=0, s=0)
        p_pre = jnp.exp(s_pre - m_all)
        p_win = jnp.exp(s_win - m_all)
        denom = jnp.sum(p_pre, -1, keepdims=True) + jnp.sum(p_win, -1, keepdims=True)
        acc = jnp.einsum("bngts,bsnh->btngh", p_pre.astype(compute_dtype),
                         vc.astype(compute_dtype))
        acc = acc + jnp.einsum("bngtw,bwnh->btngh", p_win.astype(compute_dtype),
                               v_new.astype(compute_dtype))
        denom_t = denom[..., 0].transpose(0, 3, 1, 2)[..., None]  # [B,W,Nkv,G,1]
        sa = (acc / jnp.maximum(denom_t, 1e-30)).astype(compute_dtype).reshape(B, W, Nq, H)
        x = x + attention_out(lp["self_attention"], sa).astype(x.dtype)

        h = rms_norm(x, lp["pre_ca_norm"]["scale"], eps)
        cq = dense_general(h, lp["cross_attention"]["q_proj"]["kernel"])
        cq = rope(cq, positions, m.rope_min_timescale, m.rope_max_timescale)
        if skip_uncond_cross:
            Bh = B // 2
            ca_c = sdpa(cq[Bh:], ck[Bh:], cv[Bh:],
                        cross_attn_mask[Bh:] if cross_attn_mask is not None else None)
            ca = jnp.concatenate([jnp.zeros_like(ca_c), ca_c], axis=0)
        else:
            ca = sdpa(cq, ck, cv, cross_attn_mask)
        x = x + attention_out(lp["cross_attention"], ca).astype(x.dtype)

        h = rms_norm(x, lp["pre_mlp_norm"]["scale"], eps)
        x = x + mlp_block(lp["mlp"], h).astype(x.dtype)
        return x, (k_new.astype(self_cache.k.dtype), v_new.astype(self_cache.v.dtype))

    x, (ks, vs) = jax.lax.scan(
        layer_fn, x,
        (params["decoder"]["layers"], self_cache.k, self_cache.v,
         cross_cache.k, cross_cache.v),
    )
    new_cache = KVCache(
        k=jax.lax.dynamic_update_slice(
            self_cache.k, ks, (0, 0, start_row.astype(jnp.int32), 0, 0)),
        v=jax.lax.dynamic_update_slice(
            self_cache.v, vs, (0, 0, start_row.astype(jnp.int32), 0, 0)),
    )
    x = rms_norm(x, params["decoder"]["norm"]["scale"], eps)
    logits = dense_general(x, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
    return logits, new_cache


def decode_step_fused(
    params: Params,
    config: DiaConfig,
    tgt_Bx1xC: jax.Array,  # [B, 1, C]
    position: jax.Array,  # [B, 1] (all rows equal on this path)
    write_slot: jax.Array,  # scalar int32
    self_cache: KVCache,
    cross_cache: KVCache,
    cross_attn_mask: jax.Array,  # bool [B, 1, 1, S]
    compute_dtype=jnp.float32,
    valid_from: jax.Array | None = None,
    skip_uncond_cross: bool = False,  # exact CFG-half skip — the kernel
    # fetches only the cond half of the cross cache (see fused_step.py)
) -> tuple[jax.Array, KVCache]:
    """``decode_step_scan`` semantics via the single-Pallas-call fused kernel.

    The whole 18-layer stack runs as ONE kernel (grid over layers×phases,
    int8 weights double-buffered through VMEM, norm gains folded at repack) —
    see ops/kernels/fused_step.py.  Requires ``params["decoder"]["fused_pack"]``
    (built by ``ops.quant.quantize_params_int8_packed``).  Batched rows carry
    per-row RoPE positions and ``valid_from`` windows (right-aligned
    voice-clone prompts) straight into the kernel's SMEM scalars."""
    import os

    from ..ops.kernels.fused_step import fused_decode_step

    m = config.model
    pack = params["decoder"]["fused_pack"]
    x = _embed_channels(params, tgt_Bx1xC, compute_dtype)  # [B, 1, D]
    interpret = os.environ.get("DIA_FUSED_INTERPRET") == "1"
    quant = isinstance(self_cache, QuantKVCache)
    quant_kw = {}
    if quant:
        assert isinstance(cross_cache, QuantKVCache), (
            "quant self-cache implies quant cross-cache (same serving flag)")
        quant_kw = dict(self_ks=self_cache.ks, self_vs=self_cache.vs,
                        cross_ks=cross_cache.ks, cross_vs=cross_cache.vs)
    x_out, ks, vs = fused_decode_step(
        pack, x[:, 0], position[:, 0], write_slot.astype(jnp.int32),
        self_cache.k, self_cache.v, cross_cache.k, cross_cache.v,
        cross_attn_mask[:, 0, 0, :],
        eps=m.normalization_layer_epsilon,
        rope_min=m.rope_min_timescale, rope_max=m.rope_max_timescale,
        interpret=interpret,
        # perf-tuning knobs (tools/fused_ablate.py / A/B sweeps).  int4 packs
        # fix the MLP tiling at repack time (wm nibble pairing is per-K-tile),
        # so derive it from the pack; DIA_FUSED_MT only steers int8 packs.
        mlp_tiles=(pack.sm.shape[1] // 2 if pack.mlp_int4
                   else int(os.environ.get("DIA_FUSED_MT", "4"))),
        ablate=os.environ.get("DIA_FUSED_ABLATE", ""),
        attn_impl=os.environ.get("DIA_FUSED_ATTN", "headloop"),
        skip_uncond=skip_uncond_cross,
        valid_from=valid_from,
        **quant_kw,
    )
    w = write_slot.astype(jnp.int32)
    if quant:
        kq, kss = quantize_kv(ks[:, :, None])  # [L,B,1,N,H] → int8 + [L,B,1,N]
        vq, vss = quantize_kv(vs[:, :, None])
        new_cache = QuantKVCache(
            k=jax.lax.dynamic_update_slice(self_cache.k, kq, (0, 0, w, 0, 0)),
            v=jax.lax.dynamic_update_slice(self_cache.v, vq, (0, 0, w, 0, 0)),
            ks=jax.lax.dynamic_update_slice(self_cache.ks, kss, (0, 0, w, 0)),
            vs=jax.lax.dynamic_update_slice(self_cache.vs, vss, (0, 0, w, 0)),
        )
    else:
        new_cache = KVCache(
            k=jax.lax.dynamic_update_slice(
                self_cache.k, ks[:, :, None].astype(self_cache.k.dtype),
                (0, 0, w, 0, 0)),
            v=jax.lax.dynamic_update_slice(
                self_cache.v, vs[:, :, None].astype(self_cache.v.dtype),
                (0, 0, w, 0, 0)),
        )
    h = rms_norm(x_out[:, None].astype(compute_dtype),
                 params["decoder"]["norm"]["scale"],
                 m.normalization_layer_epsilon)
    logits = dense_general(h, params["decoder"]["logits_dense"]["kernel"]).astype(jnp.float32)
    return logits, new_cache


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
