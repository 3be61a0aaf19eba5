"""Speculative decoding: layer-skip self-draft + batched-window verify.

Beyond-reference capability in service of the RTF north star (BASELINE.md).
The decode loop is weight-bandwidth-bound: one 18-layer step costs one full
read of the decoder weights whether it scores 1 token or W tokens.  A cheap
draft (the FIRST ``n_draft_layers`` of the same decoder — early exit through
the shared final norm + logits head, no separate draft model) proposes W-1
tokens one at a time, then ONE full-model window pass (models/dia.py::
decode_window) scores all of them: accepted tokens cost ``Ld/L + 1/W`` of a
full step's weight traffic instead of 1.

Output-distribution correctness (the property the harness proves):

* **greedy** — token-exact vs the baseline loop: drafts are accepted only
  while the full model's constrained CFG argmax equals the draft, the first
  mismatch is replaced by the full model's own argmax, and any step whose
  full-model token is EOS is deferred to the normal loop so the EOS-delay
  state machine (generate.py) sees it exactly as in the baseline
  (tests/test_speculative.py::test_greedy_token_exact).
* **sampled** — channelwise rejection sampling: Dia samples its 9 codebook
  channels independently per step, so each channel applies the standard
  accept-with-p/q-else-residual rule (Leviathan et al. speculative sampling,
  per channel); every emitted step is an EXACT sample from the full model's
  filtered distribution regardless of accept/reject
  (tests/test_speculative.py::test_rejection_sampling_matches_target).

The window driver is host-paced (one device dispatch per window, like the
streaming generator); the EOS tail and the BOS write-protect window run
through the unmodified ``decode_segment`` loop, which keeps the state-machine
semantics bit-identical to ``generate_fused``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiaConfig
from .generate import (
    CFG_BATCH,
    _bucket,
    _cache_len_for,
    _cross_window_for,
    _dtype_of,
    _loop_entry_carries,
    _maybe_unpack_s4,
    _resolve_seed,
    decode_segment,
    prepare_stream,
)
from .models.dia import decode_step_scan, decode_window
from .ops.delay import revert_audio_delay_np
from .ops.sampling import NEG, apply_constraints, cfg_combine
from .state import DecodeLoopState, prepare_audio_prompt
from .tokenizer import build_effective_text, encode_cfg_batch


def filtered_probs(logits, temperature, top_p, cfg_filter_top_k: int):
    """Full-vocab probabilities of the EXACT sampling distribution used by
    ``ops.sampling.sample_next_token_traced`` (temperature → top-k → top-p).

    Rejection sampling needs p and q as distributions, not draws; tokens
    outside the filter carry probability 0.  Shape-preserving over leading
    dims: [..., V] → [..., V].
    """
    V = logits.shape[-1]
    scaled = logits / temperature
    vals, idx = jax.lax.top_k(scaled, cfg_filter_top_k)  # sorted desc [..., K]
    probs_k = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs_k, axis=-1)
    remove = jnp.roll(cum > top_p, 1, axis=-1).at[..., 0].set(False)
    vals = jnp.where(remove, NEG, vals)
    probs_k = jax.nn.softmax(vals, axis=-1)  # renormalized over the nucleus

    lead = logits.shape[:-1]
    flat_idx = idx.reshape(-1, cfg_filter_top_k)
    flat_p = probs_k.reshape(-1, cfg_filter_top_k)
    full = jax.vmap(lambda i, p: jnp.zeros((V,), p.dtype).at[i].set(p))(flat_idx, flat_p)
    return full.reshape(*lead, V)


def rejection_sample_channel(key, draft_token, q_probs, p_probs):
    """One channel's accept-or-residual step (exact target-distribution draw).

    Accept the drafted token with probability min(1, p(x)/q(x)); otherwise
    draw from the residual ``max(p - q, 0)`` (renormalized).  The returned
    token is distributed exactly ~ p either way (speculative-sampling lemma).
    Returns (token, accepted: bool).
    """
    u_key, r_key = jax.random.split(key)
    q_x = q_probs[draft_token]
    p_x = p_probs[draft_token]
    u = jax.random.uniform(u_key)
    accept = u * q_x < p_x  # u < p/q without the divide (q_x >= 0)
    residual = jnp.maximum(p_probs - q_probs, 0.0)
    total = jnp.sum(residual)
    safe = jnp.where(total > 0, residual, p_probs)  # p==q ⇒ accept was certain
    resampled = jax.random.categorical(r_key, jnp.log(jnp.maximum(safe, 1e-30)))
    token = jnp.where(accept, draft_token, resampled.astype(jnp.int32))
    return token, accept


class SpecWindowResult(NamedTuple):
    state: DecodeLoopState
    advance: jax.Array  # int32: accepted tokens this window (0 → defer to loop)
    drafted: jax.Array  # int32: drafts proposed (== window - 1)
    accepted_drafts: jax.Array  # int32: drafts kept verbatim


@partial(
    jax.jit,
    static_argnames=("config", "window", "n_draft_layers", "greedy",
                     "cfg_filter_top_k", "compute_dtype_name"),
    donate_argnames=("state",),
)
def spec_window(
    params,
    config: DiaConfig,
    state: DecodeLoopState,
    cross_cache,
    cross_mask,
    cfg_scale: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    window: int,
    n_draft_layers: int,
    greedy: bool,
    cfg_filter_top_k: int,
    compute_dtype_name: str,
) -> SpecWindowResult:
    """Draft ``window-1`` tokens with the early-exit model, verify all of
    them (plus one bonus position) in ONE full-model window pass, and accept
    the longest output-distribution-preserving prefix.

    EOS never enters the token buffer here: any step whose full-model token
    would be EOS stops the window (advance excludes it) so the caller's
    normal loop regenerates it and runs the EOS-delay machine — exact parity
    with the baseline loop's state machine.
    """
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)
    d = config.data
    C = d.channels
    eos = d.audio_eos_value
    W = window
    t0 = state.dec_step + 1  # first token index this window generates

    # ---- draft W-1 tokens with the first n_draft_layers layers ----
    def draft_body(i, carry):
        tokens, cache, key = carry
        t = t0 + i
        prev = jax.lax.dynamic_slice(tokens, (t - 1, 0), (1, C))
        tgt = jnp.broadcast_to(prev[None], (CFG_BATCH, 1, C))
        position = jnp.broadcast_to(t[None, None], (CFG_BATCH, 1)).astype(jnp.int32)
        logits, cache = decode_step_scan(
            params, config, tgt, position, (t - 1).astype(jnp.int32),
            cache, cross_cache, cross_mask, compute_dtype,
            n_layers=n_draft_layers, skip_uncond_cross=True,
        )
        guided = cfg_combine(logits[:, -1], cfg_scale)
        guided = apply_constraints(guided, eos, d.audio_pad_value, d.audio_bos_value)
        if greedy:
            pred = jnp.argmax(guided, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            q = filtered_probs(guided, temperature, top_p, cfg_filter_top_k)
            pred = jax.random.categorical(
                sub, jnp.log(jnp.maximum(q, 1e-30)), axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, pred[None], (t, 0))
        return tokens, cache, key

    tokens, cache, key = jax.lax.fori_loop(
        0, W - 1, draft_body, (state.tokens, state.cache, state.key))

    # ---- one full-model verify pass over rows [t0-1, t0+W-2] ----
    rows = jax.lax.dynamic_slice(tokens, ((t0 - 1).astype(jnp.int32), 0), (W, C))
    tgt = jnp.broadcast_to(rows[None], (CFG_BATCH, W, C))
    v_logits, cache = decode_window(
        params, config, tgt, (t0 - 1).astype(jnp.int32),
        cache, cross_cache, cross_mask, compute_dtype, skip_uncond_cross=True,
    )  # [2, W, C, V]
    guided = v_logits[1] + cfg_scale * (v_logits[1] - v_logits[0])  # [W, C, V]
    guided = jax.vmap(
        lambda g: apply_constraints(g, eos, d.audio_pad_value, d.audio_bos_value)
    )(guided)

    drafts = jax.lax.dynamic_slice(tokens, (t0.astype(jnp.int32), 0), (W - 1, C))

    if greedy:
        ver = jnp.argmax(guided, axis=-1).astype(jnp.int32)  # [W, C]
        final = ver
        match = jnp.all(ver[: W - 1] == drafts, axis=1)  # [W-1]
    else:
        p = filtered_probs(guided, temperature, top_p, cfg_filter_top_k)  # [W, C, V]
        # re-derive the drafts' q distributions is 1 more Ld-layer window pass;
        # instead the draft loop could carry them — for mechanics simplicity we
        # recompute q from a draft-model window pass over the same rows.
        q_logits, _ = decode_step_scan_window_q(
            params, config, tgt, (t0 - 1).astype(jnp.int32),
            cache, cross_cache, cross_mask, compute_dtype, n_draft_layers)
        gq = q_logits[1] + cfg_scale * (q_logits[1] - q_logits[0])
        gq = jax.vmap(
            lambda g: apply_constraints(g, eos, d.audio_pad_value, d.audio_bos_value)
        )(gq)
        q = filtered_probs(gq, temperature, top_p, cfg_filter_top_k)
        key, accept_key, bonus_key = jax.random.split(key, 3)
        ch_keys = jax.random.split(accept_key, (W - 1) * C).reshape(W - 1, C, 2)
        tok, acc = jax.vmap(jax.vmap(rejection_sample_channel))(
            ch_keys, drafts, q[: W - 1], p[: W - 1])
        bonus = jax.random.categorical(
            bonus_key, jnp.log(jnp.maximum(p[W - 1], 1e-30)), axis=-1
        ).astype(jnp.int32)
        final = jnp.concatenate([tok, bonus[None]], axis=0)  # [W, C]
        match = jnp.all(acc, axis=1)  # fully accepted steps keep the draft tuple

    final_is_eos = final[:, 0] == eos  # [W]
    ok = match & ~final_is_eos[: W - 1]
    any_stop = jnp.any(~ok)
    j = jnp.where(any_stop, jnp.argmax(~ok), W - 1)
    take_extra = ~final_is_eos[j]
    advance = j + take_extra.astype(jnp.int32)

    # write the correction/bonus/resampled tuple at row t0+j (when taken)
    row = (t0 + j).astype(jnp.int32)
    cur = jax.lax.dynamic_slice(tokens, (row, 0), (1, C))[0]
    write = jnp.where(take_extra, final[j], cur)
    tokens = jax.lax.dynamic_update_slice(tokens, write[None], (row, 0))

    # re-derive the loop perf carries at the new position: prev_tok is the
    # last accepted row, bos_rows the buffer content the resumed loop's
    # BOS-masked write would have read (stale draft rows included — identical
    # to what a buffer-reading loop would see, so parity is preserved)
    dec_new = (t0 - 1 + advance).astype(jnp.int32)
    prev_tok, bos_rows = _loop_entry_carries(config, tokens, dec_new)
    new_state = DecodeLoopState(
        tokens=tokens, cache=cache, key=key,
        dec_step=dec_new,
        eos_detected=state.eos_detected, eos_countdown=state.eos_countdown,
        bos_countdown=state.bos_countdown, stop=state.stop,
        prev_tok=prev_tok, bos_rows=bos_rows,
    )
    return SpecWindowResult(
        state=new_state, advance=advance,
        drafted=jnp.asarray(W - 1, jnp.int32),
        accepted_drafts=jnp.minimum(j, W - 1).astype(jnp.int32),
    )


def decode_step_scan_window_q(params, config, tgt, start_row, cache,
                              cross_cache, cross_mask, compute_dtype, n_layers):
    """Draft-model (early-exit) logits over a W-token window — used to
    reconstruct the q distributions for rejection sampling.  Reuses
    ``decode_window`` on the truncated stack; the cache is NOT updated (the
    verify pass owns the real commit)."""
    from .models.dia import KVCache

    sliced = dict(params)
    dec = dict(params["decoder"])
    dec["layers"] = jax.tree.map(lambda a: a[:n_layers], params["decoder"]["layers"])
    sliced["decoder"] = dec
    sub_cache = KVCache(k=cache.k[:n_layers], v=cache.v[:n_layers])
    sub_cross = KVCache(k=cross_cache.k[:n_layers], v=cross_cache.v[:n_layers])
    logits, _ = decode_window(sliced, config, tgt, start_row, sub_cache,
                              sub_cross, cross_mask, compute_dtype,
                              skip_uncond_cross=True)
    return logits, None


class SpeculativeGenerator:
    """Host-paced speculative generation driver (greedy and sampled).

    Wraps the same compiled primitives as ``DiaGenerator`` — conditioning +
    prefill (``prepare_stream``), the normal resumable loop
    (``decode_segment``) for the BOS window and the EOS tail, and
    ``spec_window`` for the bulk of the sequence.
    """

    def __init__(self, params, config: DiaConfig, compute_dtype: str = "float32",
                 n_draft_layers: int | None = None, window: int = 8):
        self.params = params
        self.config = config
        self.compute_dtype = compute_dtype
        L = config.model.decoder.n_layer
        self.n_draft_layers = n_draft_layers or max(1, L // 3)
        self.window = int(window)
        self.stats = {"windows": 0, "drafted": 0, "accepted_drafts": 0,
                      "tokens": 0, "fallback_steps": 0}

    def generate_tokens(
        self,
        text: str,
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 0.0,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompt_codes: np.ndarray | None = None,
        audio_prompt_text: str | None = None,
        seed: int | None = None,
    ) -> np.ndarray:
        cfg = self.config
        d = cfg.data
        max_tokens = d.audio_length if max_tokens is None else min(max_tokens, d.audio_length)
        W = self.window
        if audio_prompt_codes is not None and not audio_prompt_text:
            raise ValueError("`audio_prompt_text` is required when `audio_prompt_codes` is provided.")

        effective_text = build_effective_text(text, audio_prompt_text)
        enc_input = encode_cfg_batch(effective_text, d.text_length, d.text_pad_value)
        delayed, prefill_step = prepare_audio_prompt(cfg, audio_prompt_codes)
        tokens_buf = np.full((d.audio_length, d.channels), -1, dtype=np.int32)
        tokens_buf[: delayed.shape[0]] = delayed

        window = None
        if prefill_step > 1:
            window = _bucket(prefill_step - 1, 128, d.audio_length)
        state, cross_cache, cross_mask = prepare_stream(
            self.params, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray([prefill_step, _resolve_seed(seed)], jnp.int32),
            prefill_window=window, compute_dtype_name=self.compute_dtype,
            cross_window=_cross_window_for(enc_input, cfg),
            cache_len=_cache_len_for(max_tokens, window or 0, cfg),
            # the verify pass replays the cache through decode_window, which
            # speaks only the bf16 KVCache layout
            kv_quant=False,
        )
        greedy = temperature == 0.0
        f_cfg = jnp.asarray(cfg_scale, jnp.float32)
        f_temp = jnp.asarray(temperature, jnp.float32)
        f_topp = jnp.asarray(top_p, jnp.float32)
        mt = jnp.asarray(max_tokens, jnp.int32)

        def run_segment(s, seg_end):
            before = int(s.dec_step)
            s = decode_segment(
                self.params, cfg, s, cross_cache, cross_mask,
                jnp.asarray(seg_end, jnp.int32), mt, f_cfg, f_temp, f_topp,
                greedy=greedy, cfg_filter_top_k=cfg_filter_top_k,
                compute_dtype_name=self.compute_dtype,
            )
            self.stats["fallback_steps"] += int(s.dec_step) - before
            return s

        # 1) BOS write-protect window runs through the normal loop
        state = run_segment(state, prefill_step - 1 + d.max_delay + 1)

        # 2) speculative windows over the bulk
        spec_limit = max_tokens - d.max_delay - W - 2
        while (not bool(state.stop)
               and not bool(state.eos_detected)
               and int(state.dec_step) < spec_limit):
            res = spec_window(
                self.params, cfg, state, cross_cache, cross_mask,
                f_cfg, f_temp, f_topp,
                window=W, n_draft_layers=self.n_draft_layers, greedy=greedy,
                cfg_filter_top_k=cfg_filter_top_k,
                compute_dtype_name=self.compute_dtype,
            )
            state = res.state
            adv = int(res.advance)
            self.stats["windows"] += 1
            self.stats["drafted"] += int(res.drafted)
            self.stats["accepted_drafts"] += int(res.accepted_drafts)
            self.stats["tokens"] += adv
            if adv == 0:  # full model wants EOS here → let the loop do it
                break

        # 3) EOS tail / remaining budget through the normal loop
        while not bool(state.stop) and int(state.dec_step) < max_tokens - 1:
            state = run_segment(state, int(state.dec_step) + 64)

        final_step = int(state.dec_step)
        tokens = np.asarray(state.tokens)
        generated = tokens[prefill_step: final_step + 1]
        if generated.shape[0] == 0:
            return np.zeros((0, d.channels), dtype=np.int32)
        reverted = revert_audio_delay_np(
            generated[None], d.audio_pad_value, tuple(d.delay_pattern), generated.shape[0]
        )[0]
        reverted = reverted[: max(0, reverted.shape[0] - d.max_delay)]
        return np.where((reverted < 0) | (reverted > 1023), 0, reverted).astype(np.int32)

    @property
    def acceptance_rate(self) -> float:
        drafted = self.stats["drafted"]
        return self.stats["accepted_drafts"] / drafted if drafted else float("nan")
