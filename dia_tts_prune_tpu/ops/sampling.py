"""CFG combination, constraint masking, and token sampling — fully traced.

The reference samples on the host each step (dia/model.py:32-82, 429-488),
forcing a device→host sync per token.  Here every piece is jit-safe jnp code
that runs inside the device-resident decode loop: classifier-free guidance,
the EOS/PAD/BOS constraint masks, temperature → top-k → top-p filtering (in
the reference's exact order, dia/model.py:43-70), and Gumbel/categorical
sampling with explicit `jax.random` keys instead of global torch seeding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = jnp.float32(jnp.finfo(jnp.float32).min)


def cfg_combine(logits_2xCxV: jax.Array, cfg_scale: float) -> jax.Array:
    """guided = cond + scale * (cond - uncond)  (reference: dia/model.py:449-457)."""
    uncond = logits_2xCxV[0]
    cond = logits_2xCxV[1]
    return cond + cfg_scale * (cond - uncond)


def apply_constraints(
    logits_CxV: jax.Array,
    eos_value: int,
    pad_value: int,
    bos_value: int,
) -> jax.Array:
    """Ban EOS outside channel 0 and PAD/BOS everywhere
    (reference: dia/model.py:460-478)."""
    C, V = logits_CxV.shape
    col = jnp.arange(V)
    chan = jnp.arange(C)[:, None]
    ban = (col[None, :] == eos_value) & (chan > 0)
    ban = ban | (col[None, :] == pad_value) | (col[None, :] == bos_value)
    return jnp.where(ban, NEG, logits_CxV)


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits per row, others -> -inf
    (reference: dia/model.py:46-52)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG, logits)


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering with the reference's shift-by-one keep rule
    (reference: dia/model.py:55-70): drop a token iff the total probability
    mass of tokens ranked strictly above it already exceeds top_p; the top-1
    is always kept (its mass-above is 0).

    Sort-free: a vocab-wide ``argsort`` is a bitonic sort — milliseconds per
    step on TPU — so the mass-above-each-token is computed as one [V, V]
    comparison matvec that rides the MXU instead.  Identical to the reference
    recipe except on exact float-equal probability ties, where the reference's
    outcome depends on (unstable CUDA) sort order anyway; here all tied tokens
    at the boundary are kept.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # gt[..., t, j] = 1 where p_j > p_t; mass_above[t] = sum_j gt * p_j
    gt = (probs[..., :, None] < probs[..., None, :]).astype(jnp.float32)
    mass_above = jnp.einsum(
        "...tj,...j->...t", gt, probs, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.where(mass_above > top_p, NEG, logits)


def sample_next_token_traced(key, logits, temperature, top_p, cfg_filter_top_k: int):
    """Traced-temperature/top_p sampler used inside the decode loop (no
    recompiles on parameter sweeps; top-k static — lax.top_k requires it).

    Hot-loop note: a vocab-wide ``argsort`` costs milliseconds per step on TPU
    (bitonic sort).  With top-k active (reference default, k=35) ``lax.top_k``
    already returns values sorted descending, so the nucleus rule runs on just
    those k values — exactly equivalent to the reference's sort-based recipe
    (dia/model.py:44-70) because excluded tokens carry zero probability."""
    logits = logits / temperature
    if cfg_filter_top_k is not None and cfg_filter_top_k > 0:
        vals, idx = jax.lax.top_k(logits, cfg_filter_top_k)  # sorted desc [..., K]
        probs = jax.nn.softmax(vals, axis=-1)  # == softmax of the masked vocab
        cum = jnp.cumsum(probs, axis=-1)
        remove = jnp.roll(cum > top_p, 1, axis=-1).at[..., 0].set(False)
        vals = jnp.where(remove, NEG, vals)
        choice = jax.random.categorical(key, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
    logits = top_p_filter(logits, top_p)  # rare path: full-vocab nucleus
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("temperature", "top_p", "cfg_filter_top_k"))
def sample_next_token(
    key: jax.Array,
    logits_CxV: jax.Array,
    temperature: float,
    top_p: float,
    cfg_filter_top_k: int | None,
) -> jax.Array:
    """Temperature → top-k → top-p → categorical, argmax at temperature 0
    (reference: dia/model.py:32-82).  Returns int32 [C]."""
    if temperature == 0.0:
        return jnp.argmax(logits_CxV, axis=-1).astype(jnp.int32)
    return sample_next_token_traced(key, logits_CxV, temperature, top_p, cfg_filter_top_k)
