"""Fused whole-decoder-step Pallas kernel (int8 weights, single query token).

The decode step is bandwidth-bound: ~1.26 GB of int8 weights stream from HBM
per token.  The XLA scan-over-layers path runs each dot as its own fusion at
570–690 GB/s with a ~200 µs small-op tail (hlo_stats via
tools/trace_decode.py); this kernel runs the ENTIRE 18-layer stack as ONE
``pallas_call`` — grid ``(L, phases)``, weights double-buffered through VMEM
by the Pallas pipeline, activations carried in VMEM scratch across phases —
so the weight stream never stalls between ops.

Replaces: the per-token decoder stack of the reference
(/root/reference/dia/layers.py:671-720), redesigned for TPU as a single
streaming kernel instead of 100+ separate CUDA kernel launches.

Weight repack (``repack_decoder_fused``, from UNQUANTIZED params):
* RMSNorm gains are FOLDED into the following projection's rows
  (``rms(x)*g @ W == rms(x) @ diag(g)W``) — removes the per-layer gain
  fetches and multiplies entirely.
* q/k/v are merged into one ``[D, (Nq+2*Nkv)*H]`` matrix (one dot).
* ``wi_fused [D,2,F]`` is split into gate/up ``[D,F]`` halves so the MLP can
  be tiled over F with silu·gate fused per tile.
* Everything is then quantized symmetric per-output-column int8 (same scheme
  as ops/quant.py).

Phases per layer (MT = MLP tiles):
  p0: folded-norm → qkv dot → RoPE(q,k) → cached GQA self-attention
      (prefix < write_slot, plus current token) → o_proj → residual;
      emits this layer's k/v to the outputs.
  p1: folded-norm → cq dot → RoPE → cross-attention (masked) → co_proj →
      residual.
  p2..p1+MT: folded-norm (cached once) → gate/up tile dots → silu·gate →
      immediately contract with the matching wo K-tile → accumulate;
      last tile adds the residual.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]

MLP_TILES = 4  # F split for VMEM budget: 8192/4 = 2048-column tiles
NEG = -1e30  # python float: jnp constants would be captured consts in the kernel


class FusedPack(NamedTuple):
    """Decoder weights repacked for the fused step kernel (all stacked [L,...]).

    When ``mlp_int4`` repacking is used, the MLP fields hold NIBBLE-PACKED
    int4: two 4-bit values per int8 byte, paired across contraction halves
    (byte[k, n] = hi(w[k + K/2, n]) << 4 | lo(w[k, n])) so the kernel unpacks
    with shifts only — no lane/sublane shuffles — and contracts each half of
    the activations against its own nibble plane.  The packed block streams
    HALF the int8 bytes and is read ONCE from HBM, which is the trick XLA's
    fused-convert dot cannot express (two XLA dots over the same array read
    it twice).  Scales become per-(half, column): wg/wu ``[L, 2, F]``; wm is
    packed within each of the MLP_TILES K-tiles, scales ``[L, 2*MT, D]``."""

    wqkv: jax.Array   # s8 [L, D, (Nq+2Nkv)H], pre_sa_norm folded
    sqkv: jax.Array   # f32 [L, 1, (Nq+2Nkv)H]
    wo: jax.Array     # s8 [L, NqH, D]
    so: jax.Array     # f32 [L, 1, D]
    wcq: jax.Array    # s8 [L, D, NcqH], pre_ca_norm folded
    scq: jax.Array    # f32 [L, 1, NcqH]
    wco: jax.Array    # s8 [L, NcqH, D]
    sco: jax.Array    # f32 [L, 1, D]
    wg: jax.Array     # s8 [L, D, F] (int8) | [L, D//2, F] nibble-int4 (gate)
    sg: jax.Array     # f32 [L, 1, F] (int8) | [L, 2, F] (int4)
    wu: jax.Array     # s8 [L, D, F] | [L, D//2, F] nibble-int4 (up)
    su: jax.Array     # f32 [L, 1, F] | [L, 2, F]
    wm: jax.Array     # s8 [L, F, D] | [L, F//2, D] nibble-int4, tile-paired
    sm: jax.Array     # f32 [L, 1, D] | [L, MT, 2, D] nibble-int4
    jq: jax.Array     # bf16 [NqH, NqH] RoPE half-swap permutation (also cq)
    jk: jax.Array     # bf16 [NkvH, NkvH]

    @property
    def mlp_int4(self) -> bool:
        return self.sg.shape[1] == 2


def _head_sum_matrix(NH: int, H: int) -> jax.Array:
    """0/1 matrix M [NH, N] with M[h*H + j, h] = 1: a dot with M sums each
    head's H lanes into one score column (block-segmented lane reduction —
    the reduction Mosaic can't express as a sub-128-lane reshape, done as a
    single tiny MXU contraction instead).  Mᵀ broadcasts per-head scalars
    back to head lanes.  f32 so score accumulation matches the headloop
    path's f32 dots."""
    import numpy as np

    m = np.zeros((NH, NH // H), np.float32)
    m[np.arange(NH), np.arange(NH) // H] = 1.0
    return jnp.asarray(m)


def _rope_swap_matrix(NH: int, H: int) -> jax.Array:
    """Permutation matrix P with (x @ P)[j] = x[partner(j)], partner = the
    other RoPE half within the same head.  Mosaic can't lower the 64-lane
    reshape/shuffle the swap needs, but a [NH, NH] constant matmul is a
    trivial MXU op and the matrix lives in VMEM once (constant block index)."""
    import numpy as np

    half = H // 2
    idx = np.arange(NH)
    d = idx % H
    p = np.where(d < half, idx + half, idx - half)
    m = np.zeros((NH, NH), np.float32)
    m[p, idx] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


def _q8(w2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-column symmetric int8 over a stacked [L, K, N] matrix."""
    absmax = jnp.max(jnp.abs(w2), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w2 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _q4_nibble(w2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Nibble-pack a stacked [L, K, N] matrix across contraction halves.

    Returns (packed s8 [L, K//2, N], scales f32 [L, 2, N]) — row k of the
    packed matrix carries original row k in its low nibble and row k + K/2 in
    its high nibble, each half symmetric int4 with per-(half, column) scales.

    Mapped per layer (``lax.map``): the whole-stack int32 intermediates of a
    1.6B MLP matrix are ~1.2 GB each and several live at once — enough to
    RESOURCE_EXHAUST a 16 GB chip alongside the bf16 params + int8 pack."""
    L, K, N = w2.shape

    def one(w):  # [K, N]
        halves = w.reshape(2, K // 2, N)
        absmax = jnp.max(jnp.abs(halves), axis=1, keepdims=True)  # [2, 1, N]
        scale = jnp.maximum(absmax, 1e-12) / 7.0
        q = jnp.clip(jnp.round(halves / scale), -7, 7).astype(jnp.int32)
        packed = ((q[1] << 4) | (q[0] & 0xF)).astype(jnp.int8)    # [K/2, N]
        return packed, scale[:, 0, :].astype(jnp.float32)         # [2, N]

    return jax.lax.map(one, w2)


def _q4_nibble_tiled(w2: jax.Array, tiles: int) -> tuple[jax.Array, jax.Array]:
    """Nibble-pack [L, K, N] where K is consumed in ``tiles`` kernel K-tiles:
    rows are paired WITHIN each tile (local row r ↔ r + tile/2) so a packed
    K-tile block still matches its activation tile.  Scales [L, tiles, 2, N]
    (lo, hi per tile; tiles is a SEPARATE axis so the kernel's per-tile block
    (1, 1, 2, N) satisfies the Mosaic last-two-dims rule).  Per-layer mapped
    — see _q4_nibble."""
    L, K, N = w2.shape
    tile = K // tiles

    def one(w):  # [K, N]
        wt = w.reshape(tiles, 2, tile // 2, N)
        absmax = jnp.max(jnp.abs(wt), axis=2, keepdims=True)      # [T, 2, 1, N]
        scale = jnp.maximum(absmax, 1e-12) / 7.0
        q = jnp.clip(jnp.round(wt / scale), -7, 7).astype(jnp.int32)
        packed = ((q[:, 1] << 4) | (q[:, 0] & 0xF)).astype(jnp.int8)
        return (packed.reshape(K // 2, N),
                scale[:, :, 0, :].astype(jnp.float32))  # [tiles, 2, N]

    return jax.lax.map(one, w2)


def repack_decoder_fused(params: Params, mlp_int4: bool = False,
                         mlp_tiles: int = MLP_TILES) -> FusedPack:
    """Build the fused-kernel weight pack from UNQUANTIZED decoder params.

    Norm gains are folded in fp32 BEFORE quantization, so the fold costs no
    extra quantization error.  ``mlp_int4`` stores the three MLP matrices
    (73% of per-step weight bytes) nibble-packed int4 — see FusedPack;
    ``mlp_tiles`` must then match the kernel's MLP tiling (wm's nibble
    pairing is per-K-tile)."""
    layers = params["decoder"]["layers"]
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

    g_sa = f32(layers["pre_sa_norm"]["scale"])    # [L, D]
    g_ca = f32(layers["pre_ca_norm"]["scale"])    # [L, D]
    g_mlp = f32(layers["pre_mlp_norm"]["scale"])  # [L, D]

    sa = layers["self_attention"]
    L, D = g_sa.shape
    wq = f32(sa["q_proj"]["kernel"]).reshape(L, D, -1)   # [L, D, NqH]
    wk = f32(sa["k_proj"]["kernel"]).reshape(L, D, -1)   # [L, D, NkvH]
    wv = f32(sa["v_proj"]["kernel"]).reshape(L, D, -1)
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1) * g_sa[:, :, None]
    wo = f32(sa["o_proj"]["kernel"]).reshape(L, -1, D)   # [L, NqH, D]

    ca = layers["cross_attention"]
    wcq = f32(ca["q_proj"]["kernel"]).reshape(L, D, -1) * g_ca[:, :, None]
    wco = f32(ca["o_proj"]["kernel"]).reshape(L, -1, D)

    wi = f32(layers["mlp"]["wi_fused"]["kernel"])        # [L, D, 2, F]
    wg = wi[:, :, 0, :] * g_mlp[:, :, None]
    wu = wi[:, :, 1, :] * g_mlp[:, :, None]
    wm = f32(layers["mlp"]["wo"]["kernel"])              # [L, F, D]

    NqH = wq.shape[-1]
    NkvH = wk.shape[-1]
    NcqH = wcq.shape[-1]
    H = sa["q_proj"]["kernel"].shape[-1]
    assert NcqH == NqH, "fused kernel shares the q RoPE swap matrix with cq"

    qs = [_q8(w) for w in (wqkv, wo, wcq, wco)]
    if mlp_int4:
        ms = [_q4_nibble(wg), _q4_nibble(wu), _q4_nibble_tiled(wm, mlp_tiles)]
    else:
        ms = [_q8(w) for w in (wg, wu, wm)]
    return FusedPack(
        wqkv=qs[0][0], sqkv=qs[0][1], wo=qs[1][0], so=qs[1][1],
        wcq=qs[2][0], scq=qs[2][1], wco=qs[3][0], sco=qs[3][1],
        wg=ms[0][0], sg=ms[0][1], wu=ms[1][0], su=ms[1][1],
        wm=ms[2][0], sm=ms[2][1],
        jq=_rope_swap_matrix(NqH, H), jk=_rope_swap_matrix(NkvH, H),
    )


# ---------------------------------------------------------------------------
# Shared math (used by both the kernel body and the pure-JAX reference)
# ---------------------------------------------------------------------------


def _rms_nogain(x32: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + eps)


def _rope_trig(B: int, NH: int, H: int, position, min_ts: float, max_ts: float):
    """cos and SIGNED sin vectors for head-flattened RoPE.

    Lane l belongs to head l//H at in-head index d = l%H; frequency index
    i = d % (H/2); the first half (d < H/2) carries -sin, the second +sin."""
    half = H // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, NH), 1)
    d = lane % H
    i = (d % half).astype(jnp.float32)
    fraction = (2.0 * i) / H
    inv_freq = 1.0 / (min_ts * (max_ts / min_ts) ** fraction)
    theta = position.astype(jnp.float32) * inv_freq
    sin = jnp.sin(theta)
    return jnp.cos(theta), jnp.where(d < half, -sin, sin)


def _rope_flat(x32: jax.Array, position, H: int, min_ts: float, max_ts: float):
    """Split-half RoPE on a head-flattened [B, N*H] fp32 array (reference
    path: explicit half-swap; equivalent to ops.modules.rope on [B, N, H])."""
    B, NH = x32.shape
    cos, ssin = _rope_trig(B, NH, H, position, min_ts, max_ts)
    xm = x32.reshape(B, NH // H, 2, H // 2)
    partner = jnp.concatenate([xm[:, :, 1:2], xm[:, :, 0:1]], axis=2).reshape(B, NH)
    return x32 * cos + partner * ssin


def _rope_mat(x32: jax.Array, jmat, position, H: int, min_ts: float, max_ts: float):
    """RoPE with the half-swap done as a permutation-matrix matmul (kernel
    path — Mosaic can't lower sub-128-lane reshapes/shuffles)."""
    B, NH = x32.shape
    cos, ssin = _rope_trig(B, NH, H, position, min_ts, max_ts)
    partner = jax.lax.dot_general(
        x32.astype(jnp.bfloat16), jmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return x32 * cos + partner * ssin


def _silu(x32):
    return x32 * jax.nn.sigmoid(x32)


def _dotf(a_bf, b_bf):
    return jax.lax.dot_general(a_bf, b_bf, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _unpack4(w8: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a nibble-packed int8 block into (lo, hi) bf16 planes.

    Pure shift arithmetic (no lane shuffles, Mosaic-friendly): the int8→int32
    convert sign-extends the byte, so ``>> 4`` yields the signed high nibble
    directly and ``(<< 28) >> 28`` sign-extends the low nibble."""
    w32 = w8.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    return lo, hi


# ---------------------------------------------------------------------------
# Pure-JAX reference (numerics oracle for the kernel; also the CPU fallback)
# ---------------------------------------------------------------------------


def fused_step_reference(
    pack: FusedPack,
    x_emb: jax.Array,       # [B, D] fp32 summed channel embeddings
    position: jax.Array,    # int32 RoPE position: scalar or per-row [B]
    write_slot: jax.Array,  # scalar int32
    self_k: jax.Array,      # [L, B, T, Nkv, H]
    self_v: jax.Array,
    cross_k: jax.Array,     # [L, B, S, Ncq, H]
    cross_v: jax.Array,
    cross_mask: jax.Array,  # [B, S] bool
    eps: float,
    rope_min: float,
    rope_max: float,
    valid_from: jax.Array | None = None,  # int32 [B] first valid cache slot
    self_ks: jax.Array | None = None,   # f32 [L, B, T, Nkv] int8-cache scales
    self_vs: jax.Array | None = None,
    cross_ks: jax.Array | None = None,  # f32 [L, B, S, Ncq]
    cross_vs: jax.Array | None = None,
):
    """Layer-scan reference with EXACTLY the kernel's math/dtype order.

    When the scale arrays are given, self_k/v and cross_k/v hold int8 codes
    (QuantKVCache layout): key scales apply to scores after the q·K
    contraction, value scales fold into the probabilities before p·V."""
    L, B, T, Nkv, H = self_k.shape
    Ncq = cross_k.shape[3]
    Nq = pack.wo.shape[1] // H
    G = Nq // Nkv
    D = x_emb.shape[-1]
    kv_quant = self_ks is not None
    scale = 1.0 / math.sqrt(H)
    slot_ids = jnp.arange(T, dtype=jnp.int32)
    # per-row RoPE positions + valid-prefix window (batched voice-clone rows
    # have row-local positions and right-padded prompt starts)
    position = jnp.broadcast_to(jnp.ravel(jnp.asarray(position)), (B,))[:, None]
    prefix = (slot_ids < write_slot)[None, :]  # [1, T]
    if valid_from is not None:
        prefix = prefix & (slot_ids[None, :] >= valid_from[:, None])  # [B, T]

    def dot8(xbf, w8, s):
        y = jnp.dot(xbf, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return y * s[0]

    def layer(x32, xs):
        (wqkv, sqkv, wo, so, wcq, scq, wco, sco, wg, sg, wu, su, wm, sm,
         kc, vc, ck, cv) = xs[:18]
        if kv_quant:
            kcs, vcs, cks, cvs = xs[18:]  # [B, T, Nkv] / [B, S, Ncq]
        xn = _rms_nogain(x32, eps).astype(jnp.bfloat16)
        qkv = dot8(xn, wqkv, sqkv)  # f32 [B, (Nq+2Nkv)H]
        q = _rope_flat(qkv[:, : Nq * H], position, H, rope_min, rope_max)
        k_new = _rope_flat(qkv[:, Nq * H: (Nq + Nkv) * H], position, H, rope_min, rope_max)
        v_new = qkv[:, (Nq + Nkv) * H:]

        qg = q.reshape(B, Nkv, G, H)
        kn = k_new.reshape(B, Nkv, H)
        vn = v_new.reshape(B, Nkv, H)
        # scores vs cache prefix + current token, merged softmax (fp32)
        s_pre = jnp.einsum("bngh,btnh->bngt", qg, kc.astype(jnp.float32)) * scale
        if kv_quant:
            s_pre = s_pre * kcs.transpose(0, 2, 1)[:, :, None, :]
        s_pre = jnp.where(prefix[:, None, None, :], s_pre, NEG)
        s_cur = jnp.einsum("bngh,bnh->bng", qg, kn)[..., None] * scale
        m_all = jnp.maximum(jnp.max(s_pre, -1, keepdims=True), s_cur)
        p_pre = jnp.exp(s_pre - m_all)
        p_cur = jnp.exp(s_cur - m_all)
        denom = jnp.sum(p_pre, -1, keepdims=True) + p_cur
        p_v = p_pre if not kv_quant else p_pre * vcs.transpose(0, 2, 1)[:, :, None, :]
        acc = jnp.einsum("bngt,btnh->bngh", p_v, vc.astype(jnp.float32))
        acc = acc + p_cur * vn[:, :, None, :]
        sa = (acc / denom).reshape(B, Nq * H).astype(jnp.bfloat16)
        x32 = x32 + dot8(sa, wo, so)

        xn = _rms_nogain(x32, eps).astype(jnp.bfloat16)
        cq = _rope_flat(dot8(xn, wcq, scq), position, H, rope_min, rope_max)
        cqh = cq.reshape(B, Ncq, H)
        s_c = jnp.einsum("bnh,bsnh->bns", cqh, ck.astype(jnp.float32)) * scale
        if kv_quant:
            s_c = s_c * cks.transpose(0, 2, 1)
        s_c = jnp.where(cross_mask[:, None, :], s_c, NEG)
        m_c = jnp.max(s_c, -1, keepdims=True)
        m_c = jnp.where(m_c <= NEG * 0.5, 0.0, m_c)
        p_c = jnp.exp(s_c - m_c)
        p_cv = p_c if not kv_quant else p_c * cvs.transpose(0, 2, 1)
        ca = jnp.einsum("bns,bsnh->bnh", p_cv, cv.astype(jnp.float32))
        ca = ca / jnp.maximum(jnp.sum(p_c, -1, keepdims=True), 1e-30)
        ca = ca.reshape(B, Ncq * H).astype(jnp.bfloat16)
        x32 = x32 + dot8(ca, wco, sco)

        xn = _rms_nogain(x32, eps).astype(jnp.bfloat16)
        F = wg.shape[-1]
        acc_m = jnp.zeros((B, D), jnp.float32)
        if pack.mlp_int4:
            tiles = sm.shape[0]
            tile = F // tiles
            xl, xh = xn[:, : D // 2], xn[:, D // 2:]
            for t in range(tiles):
                sl = slice(t * tile, (t + 1) * tile)
                glo, ghi = _unpack4(wg[:, sl])
                g = _dotf(xl, glo) * sg[0:1, sl] + _dotf(xh, ghi) * sg[1:2, sl]
                ulo, uhi = _unpack4(wu[:, sl])
                u = _dotf(xl, ulo) * su[0:1, sl] + _dotf(xh, uhi) * su[1:2, sl]
                h = (_silu(g) * u).astype(jnp.bfloat16)
                hl, hh = h[:, : tile // 2], h[:, tile // 2:]
                mlo, mhi = _unpack4(wm[t * (tile // 2): (t + 1) * (tile // 2), :])
                acc_m = acc_m + (_dotf(hl, mlo) * sm[t, 0:1]
                                 + _dotf(hh, mhi) * sm[t, 1:2])
        else:
            tile = F // MLP_TILES
            for t in range(MLP_TILES):
                sl = slice(t * tile, (t + 1) * tile)
                g = dot8(xn, wg[:, sl], sg[:, sl])
                u = dot8(xn, wu[:, sl], su[:, sl])
                h = (_silu(g) * u).astype(jnp.bfloat16)
                acc_m = acc_m + dot8(h, wm[sl, :], sm)
        x32 = x32 + acc_m
        # under quant caches the int8 dtype is codes, not values — emit f32
        # new rows and let the caller quantize before the cache commit
        out_dt = jnp.float32 if kv_quant else self_k.dtype
        return x32, (kn.astype(out_dt), vn.astype(out_dt))

    xs_in = (pack.wqkv, pack.sqkv, pack.wo, pack.so, pack.wcq, pack.scq,
             pack.wco, pack.sco, pack.wg, pack.sg, pack.wu, pack.su,
             pack.wm, pack.sm, self_k, self_v, cross_k, cross_v)
    if kv_quant:
        xs_in += (self_ks, self_vs, cross_ks, cross_vs)
    x32, (ks, vs) = jax.lax.scan(layer, x_emb.astype(jnp.float32), xs_in)
    return x32, ks, vs  # ks/vs: [L, B, Nkv, H]


# ---------------------------------------------------------------------------
# The Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(scalars_ref,  # SMEM int32 [1+2B]: (write_slot, pos[B], valid_from[B])
            x_ref, mask_ref, maskt_ref, jq_ref, jk_ref, hs_ref, hst_ref,
            wqkv_ref, sqkv_ref, wo_ref, so_ref,
            wcq_ref, scq_ref, wco_ref, sco_ref,
            wg_ref, sg_ref, wu_ref, su_ref, wm_ref, sm_ref,
            kc_ref, vc_ref, ck_ref, cv_ref,
            *rest,  # [+4 scale refs when kv_quant] then outputs and scratch
            L, B, D, T, S, Nq, Nkv, Ncq, H, F, eps, rope_min, rope_max,
            mlp_tiles, ablate, skip_uncond, mlp_int4, attn_impl, kv_quant):
    if kv_quant:
        # int8 KV caches: scales transposed lane-major — ksc [1,B,Nkv,T],
        # csc [1,Bc,Ncq,S] — so a per-(row, head) scale line is a [1, T/S]
        # lane vector
        (ksc_ref, vsc_ref, cks_ref, cvs_ref,
         xo_ref, kn_ref, vn_ref, x_scr, xn_scr, acc_scr) = rest
    else:
        ksc_ref = vsc_ref = cks_ref = cvs_ref = None
        (xo_ref, kn_ref, vn_ref, x_scr, xn_scr, acc_scr) = rest
    l = pl.program_id(0)
    p = pl.program_id(1)
    ablate_set = set(ablate.split(","))  # exact tokens ("mergecross" != "cross")
    write_slot = scalars_ref[0]
    scale = 1.0 / math.sqrt(H)
    G = Nq // Nkv
    tile = F // mlp_tiles

    def _row_bcast(base, lanes):
        """[B, lanes] int32 with row b filled from scalars_ref[base + b].

        Mosaic has no SMEM gather; B is small (2 single-stream CFG, 2N
        batched) so an unrolled select per row is cheap VPU work."""
        row = jax.lax.broadcasted_iota(jnp.int32, (B, lanes), 0)
        out = jnp.zeros((B, lanes), jnp.int32)
        for b in range(B):
            out = jnp.where(row == b, scalars_ref[1 + b], out)
        return out

    def _vf(b):
        """Row b's first valid self-cache slot (batched voice-clone rows are
        right-aligned: slots before the prompt start are garbage)."""
        return scalars_ref[1 + B + b]

    @pl.when((l == 0) & (p == 0))
    def _init():
        x_scr[:] = x_ref[:].astype(jnp.float32)

    def dot8(xbf, w8, s):
        y = jax.lax.dot_general(
            xbf, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y * s

    @pl.when(p == 0)
    def _self_attn():
        xn = _rms_nogain(x_scr[:], eps).astype(jnp.bfloat16)
        qkv = dot8(xn, wqkv_ref[0], sqkv_ref[0])  # [B, (Nq+2Nkv)H] f32
        pos_q = _row_bcast(1, Nq * H)
        pos_k = _row_bcast(1, Nkv * H)
        q = _rope_mat(qkv[:, : Nq * H], jq_ref[:], pos_q, H, rope_min, rope_max)
        k_new = _rope_mat(qkv[:, Nq * H: (Nq + Nkv) * H], jk_ref[:], pos_k, H,
                          rope_min, rope_max)
        v_new = qkv[:, (Nq + Nkv) * H:]
        # k/v outputs stay head-flattened [B, Nkv*H]; the wrapper reshapes on
        # the XLA side (in-kernel lane→sublane reshapes don't lower)
        kn_ref[0] = k_new.astype(kn_ref.dtype)
        vn_ref[0] = v_new.astype(vn_ref.dtype)

        if "attn" in ablate_set:  # perf ablation: weight stream without attention
            sa = qkv[:, : Nq * H].astype(jnp.bfloat16)
            x_scr[:] = x_scr[:] + dot8(sa, wo_ref[0], so_ref[0])
            return
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        base_valid = t_ids < write_slot  # [1, T]
        if attn_impl == "vpu":
            # all-heads-at-once, zero micro-dots: scores live [T, Nq]
            # (cache positions in SUBLANES, heads in lanes).  The GQA cache
            # is lane-tiled to query-head layout (128-aligned block concats),
            # q·K is ONE elementwise multiply, and the per-head H-lane sums
            # are ONE tiny constant-matrix contraction (hs_ref — Mosaic
            # can't reduce over sub-128-lane groups, but an MXU dot with a
            # 0/1 head-sum matrix can).  Softmax reduces over sublanes;
            # probs·V is the mirror image via hst_ref.  ~8 large ops per
            # batch row instead of Nq serial [1,H] dot chains.
            t_col = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
            out_rows = []
            for b in range(B):
                valid_col = (t_col < write_slot) & (t_col >= _vf(b))  # [T, 1]
                kcb, vcb = kc_ref[0, b], vc_ref[0, b]  # [T, NkvH]
                kce = jnp.concatenate(
                    [kcb[:, (h // G) * H: (h // G + 1) * H] for h in range(Nq)],
                    axis=1).astype(jnp.float32)                   # [T, NqH]
                vce = jnp.concatenate(
                    [vcb[:, (h // G) * H: (h // G + 1) * H] for h in range(Nq)],
                    axis=1).astype(jnp.float32)
                kne = jnp.concatenate(
                    [k_new[b: b + 1, (h // G) * H: (h // G + 1) * H]
                     for h in range(Nq)], axis=1)                 # [1, NqH]
                vne = jnp.concatenate(
                    [v_new[b: b + 1, (h // G) * H: (h // G + 1) * H]
                     for h in range(Nq)], axis=1)
                qb = q[b: b + 1]                                  # [1, NqH]
                s_pre = jax.lax.dot_general(
                    qb * kce, hs_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale   # [T, Nq]
                s_pre = jnp.where(valid_col, s_pre, NEG)
                s_cur = jax.lax.dot_general(
                    qb * kne, hs_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale   # [1, Nq]
                m_all = jnp.maximum(jnp.max(s_pre, 0, keepdims=True), s_cur)
                p_pre = jnp.exp(s_pre - m_all)                    # [T, Nq]
                p_cur = jnp.exp(s_cur - m_all)                    # [1, Nq]
                denom = jnp.sum(p_pre, 0, keepdims=True) + p_cur  # [1, Nq]
                pe = jax.lax.dot_general(
                    p_pre, hst_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [T, NqH]
                acc = jnp.sum(pe * vce, 0, keepdims=True)         # [1, NqH]
                pce = jax.lax.dot_general(
                    p_cur, hst_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                de = jax.lax.dot_general(
                    1.0 / denom, hst_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_rows.append((acc + pce * vne) * de)
        elif attn_impl == "headloop":
            # per-head micro-dot path (B*Nq serial [1,H] dots) — the one
            # formulation PROVEN to compile through the remote Mosaic
            # pipeline (r2 default); measured the kernel's bottleneck (the
            # full-vs-both-attn-ablated gap in docs/PERF.md)
            out_rows = []
            for b in range(B):
                valid = base_valid & (t_ids >= _vf(b))                 # [1, T]
                head_parts = []
                for h in range(Nq):
                    n = h // G  # kv head for this query head
                    qh = q[b: b + 1, h * H: (h + 1) * H]               # [1, H]
                    kcb = kc_ref[0, b, :, n * H: (n + 1) * H].astype(jnp.float32)
                    vcb = vc_ref[0, b, :, n * H: (n + 1) * H].astype(jnp.float32)
                    s_pre = jax.lax.dot_general(
                        qh, kcb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale    # [1, T]
                    if kv_quant:
                        s_pre = s_pre * ksc_ref[0, b, n: n + 1, :]
                    s_pre = jnp.where(valid, s_pre, NEG)
                    knb = k_new[b: b + 1, n * H: (n + 1) * H]          # [1, H]
                    vnb = v_new[b: b + 1, n * H: (n + 1) * H]
                    s_cur = jnp.sum(qh * knb, -1, keepdims=True) * scale  # [1, 1]
                    m_all = jnp.maximum(jnp.max(s_pre, -1, keepdims=True), s_cur)
                    p_pre = jnp.exp(s_pre - m_all)
                    p_cur = jnp.exp(s_cur - m_all)
                    denom = jnp.sum(p_pre, -1, keepdims=True) + p_cur
                    p_v = (p_pre if not kv_quant
                           else p_pre * vsc_ref[0, b, n: n + 1, :])
                    a = jax.lax.dot_general(
                        p_v, vcb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)            # [1, H]
                    head_parts.append((a + p_cur * vnb) / denom)
                out_rows.append(jnp.concatenate(head_parts, axis=1))
        elif attn_impl == "kvseg":
            # per-kv-head segments: the G=Nq/Nkv query heads sharing kv head
            # n batch into ONE [G,H]×[H,T] score dot and ONE [G,T]×[T,H]
            # probs·V dot — B*Nkv*2 dots total (vs headloop's B*Nq*2), no
            # zero-padding FLOPs, and far less slice/concat IR than
            # blockdiag.  All slices are H=128-lane aligned; the [1,H] row
            # extracts are sublane slices (both lower in Mosaic).
            out_rows = []
            for b in range(B):
                valid = base_valid & (t_ids >= _vf(b))                 # [1, T]
                segs = []
                for n in range(Nkv):
                    q_seg = jnp.concatenate(
                        [q[b: b + 1, h * H: (h + 1) * H]
                         for h in range(n * G, (n + 1) * G)], axis=0)  # [G, H]
                    kcb = kc_ref[0, b, :, n * H: (n + 1) * H].astype(jnp.float32)
                    vcb = vc_ref[0, b, :, n * H: (n + 1) * H].astype(jnp.float32)
                    s_pre = jax.lax.dot_general(
                        q_seg, kcb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale    # [G, T]
                    if kv_quant:
                        s_pre = s_pre * ksc_ref[0, b, n: n + 1, :]
                    s_pre = jnp.where(valid, s_pre, NEG)
                    knb = k_new[b: b + 1, n * H: (n + 1) * H]          # [1, H]
                    vnb = v_new[b: b + 1, n * H: (n + 1) * H]
                    s_cur = jnp.sum(q_seg * knb, -1, keepdims=True) * scale  # [G, 1]
                    m_all = jnp.maximum(jnp.max(s_pre, -1, keepdims=True), s_cur)
                    p_pre = jnp.exp(s_pre - m_all)
                    p_cur = jnp.exp(s_cur - m_all)                     # [G, 1]
                    denom = jnp.sum(p_pre, -1, keepdims=True) + p_cur
                    p_v = (p_pre if not kv_quant
                           else p_pre * vsc_ref[0, b, n: n + 1, :])
                    o = jax.lax.dot_general(
                        p_v, vcb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)            # [G, H]
                    o = (o + p_cur * vnb) / denom
                    segs.append(jnp.concatenate(
                        [o[g: g + 1] for g in range(G)], axis=1))      # [1, GH]
                out_rows.append(jnp.concatenate(segs, axis=1))         # [1, NqH]
        else:  # "blockdiag"
            # ONE block-diagonal-q score dot and ONE probs·V dot per batch
            # row: Qbd [Nq, Nkv*H] carries q head h in column block h//G,
            # zeros elsewhere, so Qbd @ Kᵀ computes every head's scores in a
            # single MXU contraction (16× redundant FLOPs on an op that was
            # latency-bound, not FLOP-bound).  NOTE: this formulation broke
            # the remote compile pipeline (45-min Mosaic compile → tunnel
            # death) — kept for A/B on stacks that can compile it.
            out_rows = []
            for b in range(B):
                valid = base_valid & (t_ids >= _vf(b))                 # [1, T]
                q_rows = jnp.concatenate(
                    [q[b: b + 1, h * H: (h + 1) * H] for h in range(Nq)], axis=0)
                blocks = []
                for n in range(Nkv):
                    seg = [jnp.zeros((n * G, H), jnp.float32),
                           q_rows[n * G: (n + 1) * G],
                           jnp.zeros(((Nkv - 1 - n) * G, H), jnp.float32)]
                    blocks.append(jnp.concatenate([s for s in seg if s.shape[0]], axis=0))
                qbd = jnp.concatenate(blocks, axis=1)                  # [Nq, NkvH]
                kcb = kc_ref[0, b].astype(jnp.float32)                 # [T, NkvH]
                vcb = vc_ref[0, b].astype(jnp.float32)
                s_pre = jax.lax.dot_general(
                    qbd, kcb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale        # [Nq, T]
                if kv_quant:
                    s_pre = s_pre * jnp.concatenate(
                        [ksc_ref[0, b, h // G: h // G + 1, :] for h in range(Nq)],
                        axis=0)                                        # [Nq, T]
                s_pre = jnp.where(valid, s_pre, NEG)
                kn_rows = jnp.concatenate(
                    [k_new[b: b + 1, (h // G) * H: (h // G + 1) * H] for h in range(Nq)],
                    axis=0)                                            # [Nq, H]
                vn_rows = jnp.concatenate(
                    [v_new[b: b + 1, (h // G) * H: (h // G + 1) * H] for h in range(Nq)],
                    axis=0)
                s_cur = jnp.sum(q_rows * kn_rows, -1, keepdims=True) * scale  # [Nq, 1]
                m_all = jnp.maximum(jnp.max(s_pre, -1, keepdims=True), s_cur)
                p_pre = jnp.exp(s_pre - m_all)
                p_cur = jnp.exp(s_cur - m_all)
                denom = jnp.sum(p_pre, -1, keepdims=True) + p_cur
                p_v = p_pre if not kv_quant else p_pre * jnp.concatenate(
                    [vsc_ref[0, b, h // G: h // G + 1, :] for h in range(Nq)],
                    axis=0)
                o2 = jax.lax.dot_general(
                    p_v, vcb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)                # [Nq, NkvH]
                o_rows = jnp.concatenate(
                    [o2[h: h + 1, (h // G) * H: (h // G + 1) * H] for h in range(Nq)],
                    axis=0)                                            # [Nq, H]
                o_rows = (o_rows + p_cur * vn_rows) / denom
                out_rows.append(jnp.concatenate(
                    [o_rows[h: h + 1] for h in range(Nq)], axis=1))    # [1, NqH]
        sa = jnp.concatenate(out_rows, axis=0).astype(jnp.bfloat16)
        x_scr[:] = x_scr[:] + dot8(sa, wo_ref[0], so_ref[0])

    merged = "mergecross" in ablate_set
    mlp_off = 1 if merged else 2

    def _cross_attn_row(cq, mask, b, bc):
        """One batch row's cross-attention, vectorized over all Ncq heads:
        block-diagonal q (head n in column block n) → one score dot, one
        probs·V dot, then extract each head's diagonal block.  ``b`` indexes
        cq/mask; ``bc`` indexes the (possibly cond-half-only) cache blocks."""
        rows = [cq[b: b + 1, n * H: (n + 1) * H] for n in range(Ncq)]
        blocks = []
        for n in range(Ncq):
            seg = [jnp.zeros((n, H), jnp.float32), rows[n],
                   jnp.zeros((Ncq - 1 - n, H), jnp.float32)]
            blocks.append(jnp.concatenate([s for s in seg if s.shape[0]], axis=0))
        qbd = jnp.concatenate(blocks, axis=1)                      # [Ncq, NcqH]
        ckb = ck_ref[0, bc].astype(jnp.float32)                    # [S, NcqH]
        cvb = cv_ref[0, bc].astype(jnp.float32)
        s_c = jax.lax.dot_general(
            qbd, ckb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale            # [Ncq, S]
        if kv_quant:
            s_c = s_c * cks_ref[0, bc]                             # [Ncq, S]
        s_c = jnp.where(mask[b: b + 1], s_c, NEG)
        m_c = jnp.max(s_c, -1, keepdims=True)
        m_c = jnp.where(m_c <= NEG * 0.5, 0.0, m_c)
        p_c = jnp.exp(s_c - m_c)                                   # [Ncq, S]
        p_cv = p_c if not kv_quant else p_c * cvs_ref[0, bc]
        o2 = jax.lax.dot_general(
            p_cv, cvb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                    # [Ncq, NcqH]
        o_rows = jnp.concatenate(
            [o2[n: n + 1, n * H: (n + 1) * H] for n in range(Ncq)], axis=0)
        o_rows = o_rows / jnp.maximum(jnp.sum(p_c, -1, keepdims=True), 1e-30)
        return jnp.concatenate([o_rows[n: n + 1] for n in range(Ncq)], axis=1)

    def _cross_row_micro(cq, mask, b, bc):
        """One batch row's cross-attention via per-head micro-dots (the
        compile-proven formulation).  ``b`` indexes cq/mask; ``bc`` indexes
        the (possibly cond-half-only) cache blocks."""
        head_parts = []
        for n in range(Ncq):
            qn = cq[b: b + 1, n * H: (n + 1) * H]              # [1, H]
            ckb = ck_ref[0, bc, :, n * H: (n + 1) * H].astype(jnp.float32)
            cvb = cv_ref[0, bc, :, n * H: (n + 1) * H].astype(jnp.float32)
            s_c = jax.lax.dot_general(
                qn, ckb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [1, S]
            if kv_quant:
                s_c = s_c * cks_ref[0, bc, n: n + 1, :]
            s_c = jnp.where(mask[b: b + 1], s_c, NEG)
            m_c = jnp.max(s_c, -1, keepdims=True)
            m_c = jnp.where(m_c <= NEG * 0.5, 0.0, m_c)
            p_c = jnp.exp(s_c - m_c)                           # [1, S]
            p_cv = p_c if not kv_quant else p_c * cvs_ref[0, bc, n: n + 1, :]
            a = jax.lax.dot_general(
                p_cv, cvb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [1, H]
            a = a / jnp.maximum(jnp.sum(p_c, -1, keepdims=True), 1e-30)
            head_parts.append(a)
        return jnp.concatenate(head_parts, axis=1)

    def _cross_row_vpu(cq, mask, b, bc):
        """One batch row's cross-attention, all Ncq heads in one op chain:
        [S, Ncq]-oriented scores (source positions in sublanes), head sums
        via the hs_ref constant contraction, sublane softmax — the same
        zero-micro-dot formulation as the "vpu" self-attention (MHA, so no
        lane tiling needed).  Keeps the exact-zero fully-masked-row rule."""
        ckb = ck_ref[0, bc].astype(jnp.float32)                # [S, NcqH]
        cvb = cv_ref[0, bc].astype(jnp.float32)
        cqb = cq[b: b + 1]                                     # [1, NcqH]
        mask_col = maskt_ref[:, b: b + 1] != 0                 # [S, 1]
        s_c = jax.lax.dot_general(
            cqb * ckb, hs_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [S, Ncq]
        s_c = jnp.where(mask_col, s_c, NEG)
        m_c = jnp.max(s_c, 0, keepdims=True)                   # [1, Ncq]
        m_c = jnp.where(m_c <= NEG * 0.5, 0.0, m_c)
        p_c = jnp.exp(s_c - m_c)                               # [S, Ncq]
        pe = jax.lax.dot_general(
            p_c, hst_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [S, NcqH]
        acc = jnp.sum(pe * cvb, 0, keepdims=True)              # [1, NcqH]
        denom = jnp.maximum(jnp.sum(p_c, 0, keepdims=True), 1e-30)
        de = jax.lax.dot_general(
            1.0 / denom, hst_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [1, NcqH]
        return acc * de

    # cross heads each own their kv head (MHA): "kvseg" degenerates to the
    # per-head loop; "blockdiag" uses the block-diagonal-q single dot; "vpu"
    # uses the elementwise + head-sum-contraction chain
    cross_row = {"blockdiag": _cross_attn_row,
                 "vpu": _cross_row_vpu}.get(attn_impl, _cross_row_micro)

    def _cross_body():
        xn = _rms_nogain(x_scr[:], eps).astype(jnp.bfloat16)
        cq = _rope_mat(dot8(xn, wcq_ref[0], scq_ref[0]), jq_ref[:],
                       _row_bcast(1, Ncq * H), H, rope_min, rope_max)
        if "cross" in ablate_set:  # perf ablation: weight stream without attention
            ca = cq.astype(jnp.bfloat16)
            x_scr[:] = x_scr[:] + dot8(ca, wco_ref[0], sco_ref[0])
            return
        mask = mask_ref[:] != 0  # [B, S]
        if skip_uncond:
            # CFG uncond rows (first half) are fully masked → exact zeros;
            # the cache blocks carry only the cond half (halved DMA)
            out_rows = [jnp.zeros((B // 2, Ncq * H), jnp.float32)]
            for b in range(B // 2, B):
                out_rows.append(cross_row(cq, mask, b, b - B // 2))
        else:
            out_rows = [cross_row(cq, mask, b, b) for b in range(B)]
        ca = jnp.concatenate(out_rows, axis=0).astype(jnp.bfloat16)
        x_scr[:] = x_scr[:] + dot8(ca, wco_ref[0], sco_ref[0])

    if merged:
        @pl.when(p == 0)
        def _cross_in_p0():
            _cross_body()
    else:
        @pl.when(p == 1)
        def _cross_phase():
            _cross_body()

    @pl.when(p >= mlp_off)
    def _mlp_tile():
        t = p - mlp_off

        @pl.when(t == 0)
        def _():
            xn_scr[:] = _rms_nogain(x_scr[:], eps).astype(jnp.bfloat16)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        xn = xn_scr[:]
        if mlp_int4:
            # nibble-packed MLP: each packed block is read from HBM ONCE and
            # contributes BOTH contraction halves (lo/hi planes) — half the
            # weight bytes of int8; scales are per-(half, column) so they
            # apply per tile here, not at the end.
            xl, xh = xn[:, : D // 2], xn[:, D // 2:]
            glo, ghi = _unpack4(wg_ref[0])
            g = _dotf(xl, glo) * sg_ref[0, 0:1] + _dotf(xh, ghi) * sg_ref[0, 1:2]
            ulo, uhi = _unpack4(wu_ref[0])
            u = _dotf(xl, ulo) * su_ref[0, 0:1] + _dotf(xh, uhi) * su_ref[0, 1:2]
            h = (_silu(g) * u).astype(jnp.bfloat16)
            hl, hh = h[:, : tile // 2], h[:, tile // 2:]
            mlo, mhi = _unpack4(wm_ref[0])
            acc_scr[:] = acc_scr[:] + (_dotf(hl, mlo) * sm_ref[0, 0, 0:1]
                                       + _dotf(hh, mhi) * sm_ref[0, 0, 1:2])
        else:
            g = dot8(xn, wg_ref[0], sg_ref[0])
            u = dot8(xn, wu_ref[0], su_ref[0])
            h = (_silu(g) * u).astype(jnp.bfloat16)
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                h, wm_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(t == mlp_tiles - 1)
        def _():
            if mlp_int4:
                x_scr[:] = x_scr[:] + acc_scr[:]
            else:
                x_scr[:] = x_scr[:] + acc_scr[:] * sm_ref[0]
            xo_ref[:] = x_scr[:].astype(xo_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "rope_min", "rope_max", "interpret", "mlp_tiles",
                     "ablate", "skip_uncond", "attn_impl"),
)
def fused_decode_step(
    pack: FusedPack,
    x_emb: jax.Array,       # [B, D] bf16/f32
    position: jax.Array,    # int32 RoPE position: scalar or per-row [B]
    write_slot: jax.Array,  # scalar int32
    self_k: jax.Array,      # [L, B, T, Nkv, H]
    self_v: jax.Array,
    cross_k: jax.Array,     # [L, B, S, Ncq, H]
    cross_v: jax.Array,
    cross_mask: jax.Array,  # [B, S] bool
    eps: float = 1e-5,
    rope_min: float = 1.0,
    rope_max: float = 10000.0,
    interpret: bool = False,
    mlp_tiles: int = MLP_TILES,
    ablate: str = "",
    skip_uncond: bool = False,
    attn_impl: str = "headloop",  # headloop | kvseg | blockdiag | vpu (see _kernel)
    valid_from: jax.Array | None = None,  # int32 [B] first valid cache slot
    self_ks: jax.Array | None = None,   # f32 [L, B, T, Nkv] int8-cache scales
    self_vs: jax.Array | None = None,
    cross_ks: jax.Array | None = None,  # f32 [L, B, S, Ncq]
    cross_vs: jax.Array | None = None,
):
    """Run the full decoder stack for one token.  Returns
    (x_out [B, D] f32 pre-final-norm, k_new [L, B, Nkv, H], v_new [L, B, Nkv, H]).

    ``skip_uncond``: the CFG layout (uncond rows = first B/2, fully masked
    text) lets the kernel fetch only the conditional half of the cross KV
    cache (halved cross-cache DMA) and write the exact zeros the masked
    softmax would produce — bit-exact with the unskipped path (the same
    invariant as models/dia.py::decode_step's ``skip_uncond_cross``)."""
    L, B, T, Nkv, H = self_k.shape
    S, Ncq = cross_k.shape[2], cross_k.shape[3]
    D = x_emb.shape[-1]
    NqH = pack.wo.shape[1]
    Nq = NqH // H
    F = pack.wg.shape[-1]
    tile = F // mlp_tiles
    mlp_off = 1 if "mergecross" in ablate else 2
    nph = mlp_off + mlp_tiles
    mlp_int4 = pack.mlp_int4
    if mlp_int4:
        assert pack.sm.shape[1] == mlp_tiles and pack.sm.shape[2] == 2, (
            f"int4 pack was nibble-paired for {pack.sm.shape[1]} MLP "
            f"K-tiles; kernel called with mlp_tiles={mlp_tiles}")
    kv_quant = self_ks is not None
    if kv_quant:
        assert attn_impl != "vpu", (
            "the vpu attention's [T, heads] score orientation has no "
            "lane-major per-(token, head) scale line; use headloop/kvseg")
        assert self_vs is not None and cross_ks is not None and cross_vs is not None

    # per-layer blocks; index maps keep an input's block index constant until
    # the phase that uses it, so each is fetched once per layer, and the
    # Pallas pipeline overlaps the fetch with earlier phases' compute.
    def per_layer(shape):
        return pl.BlockSpec(shape, lambda l, p, *_: (l,) + (0,) * (len(shape) - 1))

    # int4 packs halve the K axis of each MLP block (two nibbles per byte)
    kdiv = 2 if mlp_int4 else 1

    def mlp_tiled_in(kdim_first):
        if kdim_first:  # wm [L, F(/2), D] → K tiles
            return pl.BlockSpec((1, tile // kdiv, D),
                                lambda l, p, *_: (l, jnp.maximum(p - mlp_off, 0), 0))
        return pl.BlockSpec((1, D // kdiv, tile),
                            lambda l, p, *_: (l, 0, jnp.maximum(p - mlp_off, 0)))

    def mlp_scale(n):
        return pl.BlockSpec((1, kdiv, n),
                            lambda l, p, *_: (l, 0, jnp.maximum(p - mlp_off, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, nph),
        in_specs=[
            pl.BlockSpec((B, D), lambda l, p, *_: (0, 0)),        # x_emb
            pl.BlockSpec((B, S), lambda l, p, *_: (0, 0)),        # cross mask (i32)
            pl.BlockSpec((S, B), lambda l, p, *_: (0, 0)),        # cross mask ᵀ (i32)
            pl.BlockSpec((Nq * H, Nq * H), lambda l, p, *_: (0, 0)),   # RoPE swap (q/cq)
            pl.BlockSpec((Nkv * H, Nkv * H), lambda l, p, *_: (0, 0)),  # RoPE swap (k)
            pl.BlockSpec((Nq * H, Nq), lambda l, p, *_: (0, 0)),  # head-sum M
            pl.BlockSpec((Nq, Nq * H), lambda l, p, *_: (0, 0)),  # head-sum Mᵀ
            per_layer((1, D, (Nq + 2 * Nkv) * H)),            # wqkv
            per_layer((1, 1, (Nq + 2 * Nkv) * H)),            # sqkv
            per_layer((1, NqH, D)), per_layer((1, 1, D)),     # wo, so
            per_layer((1, D, Ncq * H)), per_layer((1, 1, Ncq * H)),  # wcq, scq
            per_layer((1, Ncq * H, D)), per_layer((1, 1, D)),  # wco, sco
            mlp_tiled_in(False), mlp_scale(tile),             # wg, sg
            mlp_tiled_in(False), mlp_scale(tile),             # wu, su
            mlp_tiled_in(True),                               # wm
            # sm int4: [L, MT, 2, D] with a (1, 1, 2, D) block — the tile
            # axis is separate so the last two block dims equal the array's
            # (Mosaic's divisibility rule rejects a (…, 2, D) block of a
            # (…, 2·MT, D) array)
            pl.BlockSpec((1, 1, 2, D),
                         lambda l, p, *_: (l, jnp.maximum(p - mlp_off, 0), 0, 0))
            if mlp_int4 else per_layer((1, 1, D)),            # sm
            per_layer((1, B, T, Nkv * H)),                    # self k cache (flat)
            per_layer((1, B, T, Nkv * H)),                    # self v cache (flat)
            # cross caches: cond-half rows only when skip_uncond (block index
            # 1 along the B axis selects rows [B/2, B) — halved DMA)
            pl.BlockSpec((1, B // 2, S, Ncq * H), lambda l, p, *_: (l, 1, 0, 0))
            if skip_uncond else per_layer((1, B, S, Ncq * H)),  # cross k (flat)
            pl.BlockSpec((1, B // 2, S, Ncq * H), lambda l, p, *_: (l, 1, 0, 0))
            if skip_uncond else per_layer((1, B, S, Ncq * H)),  # cross v (flat)
        ] + ([
            # int8-cache scales, lane-major: ksc/vsc [L,B,Nkv,T], csc [L,B(c),Ncq,S]
            per_layer((1, B, Nkv, T)), per_layer((1, B, Nkv, T)),
            pl.BlockSpec((1, B // 2, Ncq, S), lambda l, p, *_: (l, 1, 0, 0))
            if skip_uncond else per_layer((1, B, Ncq, S)),
            pl.BlockSpec((1, B // 2, Ncq, S), lambda l, p, *_: (l, 1, 0, 0))
            if skip_uncond else per_layer((1, B, Ncq, S)),
        ] if kv_quant else []),
        out_specs=[
            pl.BlockSpec((B, D), lambda l, p, *_: (0, 0)),            # x_out
            pl.BlockSpec((1, B, Nkv * H), lambda l, p, *_: (l, 0, 0)),  # k_new (flat)
            pl.BlockSpec((1, B, Nkv * H), lambda l, p, *_: (l, 0, 0)),  # v_new (flat)
        ],
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),      # x carry
            pltpu.VMEM((B, D), jnp.bfloat16),     # mlp input norm cache
            pltpu.VMEM((B, D), jnp.float32),      # mlp accumulator
        ],
    )

    kernel = functools.partial(
        _kernel, L=L, B=B, D=D, T=T, S=S, Nq=Nq, Nkv=Nkv, Ncq=Ncq, H=H, F=F,
        eps=eps, rope_min=rope_min, rope_max=rope_max, mlp_tiles=mlp_tiles,
        ablate=ablate, skip_uncond=skip_uncond, mlp_int4=mlp_int4,
        attn_impl=attn_impl, kv_quant=kv_quant)

    # SMEM scalar layout: [write_slot, pos_0..pos_{B-1}, vf_0..vf_{B-1}] —
    # positions/valid windows are per-row on the batched voice-clone path
    # (row-local RoPE, right-aligned prompts); the single-stream path
    # broadcasts its scalar position and zero valid_from.
    pos_rows = jnp.broadcast_to(
        jnp.ravel(jnp.asarray(position, jnp.int32)), (B,))
    vf_rows = (jnp.zeros((B,), jnp.int32) if valid_from is None
               else jnp.ravel(valid_from).astype(jnp.int32))
    scalars = jnp.concatenate(
        [jnp.asarray(write_slot, jnp.int32).reshape(1), pos_rows, vf_rows])
    hs = _head_sum_matrix(NqH, H)
    mask_i32 = cross_mask.astype(jnp.int32)
    operands = [
        scalars, x_emb, mask_i32, mask_i32.T, pack.jq, pack.jk, hs, hs.T,
        pack.wqkv, pack.sqkv, pack.wo, pack.so,
        pack.wcq, pack.scq, pack.wco, pack.sco,
        pack.wg, pack.sg, pack.wu, pack.su, pack.wm, pack.sm,
        self_k.reshape(L, B, T, Nkv * H), self_v.reshape(L, B, T, Nkv * H),
        cross_k.reshape(L, B, S, Ncq * H), cross_v.reshape(L, B, S, Ncq * H),
    ]
    if kv_quant:
        # transpose the QuantKVCache scale layout ([.., T/S, N] → [.., N, T/S])
        # so a per-(row, head) scale line is a lane vector in the kernel
        operands += [
            jnp.swapaxes(self_ks, 2, 3), jnp.swapaxes(self_vs, 2, 3),
            jnp.swapaxes(cross_ks, 2, 3), jnp.swapaxes(cross_vs, 2, 3),
        ]
    # under quant caches the int8 cache dtype holds codes; new rows emit f32
    # for the caller to quantize before the cache commit
    out_dt = jnp.float32 if kv_quant else self_k.dtype
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Nkv * H), out_dt),
            jax.ShapeDtypeStruct((L, B, Nkv * H), out_dt),
        ],
        # ~70 MB of double-buffered weight blocks + caches: v5e has 128 MiB
        # VMEM; the 16 MiB default scoped limit is for small kernels
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get("DIA_FUSED_VMEM_MB", "100")) * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return (x_out, k_new.reshape(L, B, Nkv, H), v_new.reshape(L, B, Nkv, H))
