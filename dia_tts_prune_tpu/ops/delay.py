"""Delay-pattern codec transforms as pure, jit-safe JAX gathers.

The Dia decoder emits 9 codebook streams staggered in time by a per-channel
delay (reference semantics: dia/audio.py:6-163).  The reference precomputes
flat gather indices on the host; here both transforms are single fused
``take_along_axis`` gathers that trace cleanly under ``jit``/``vmap`` and
compile to one XLA gather each — no host round-trips, usable inside the
device-resident generation loop and the training data pipeline.

Forward  (apply): ``out[t, c] = in[t - delay[c], c]`` with BOS where the
source index is negative and PAD where it runs past ``T``.
Inverse (revert): ``out[t, c] = in[min(t + delay[c], T-1), c]`` with PAD
where the clamped index reaches ``T`` (the reference clamps *before* the PAD
comparison, making the PAD mask active only when the caller passes a ``T``
smaller than the array length — we preserve that exact semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("pad_value", "bos_value", "delay_pattern"))
def apply_audio_delay(
    audio_BxTxC: jax.Array,
    pad_value: int,
    bos_value: int,
    delay_pattern: tuple[int, ...],
) -> jax.Array:
    """Apply the per-channel delay pattern (reference: dia/audio.py:6-86).

    Args:
        audio_BxTxC: integer codes [B, T, C].
        pad_value / bos_value: special token ids.
        delay_pattern: per-channel delays, length C.

    Returns:
        Delayed codes [B, T, C].
    """
    B, T, C = audio_BxTxC.shape
    delay = jnp.asarray(delay_pattern, dtype=jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None] - delay[None, None, :]  # [1,T,C]
    t_clamped = jnp.clip(t_idx, 0, T - 1)
    gathered = jnp.take_along_axis(
        audio_BxTxC, jnp.broadcast_to(t_clamped, (B, T, C)), axis=1
    )
    bos = jnp.asarray(bos_value, dtype=audio_BxTxC.dtype)
    pad = jnp.asarray(pad_value, dtype=audio_BxTxC.dtype)
    return jnp.where(t_idx < 0, bos, jnp.where(t_idx >= T, pad, gathered))


@partial(jax.jit, static_argnames=("pad_value", "delay_pattern", "T"))
def revert_audio_delay(
    audio_BxTxC: jax.Array,
    pad_value: int,
    delay_pattern: tuple[int, ...],
    T: int | None = None,
) -> jax.Array:
    """Invert the delay pattern (reference: dia/audio.py:88-163).

    ``T`` is the logical length used for the PAD comparison; the gather index
    is always clamped to the array length, exactly mirroring the reference's
    clamp-then-compare order.
    """
    B, T_arr, C = audio_BxTxC.shape
    if T is None:
        T = T_arr
    delay = jnp.asarray(delay_pattern, dtype=jnp.int32)
    t_idx = jnp.minimum(
        jnp.arange(T_arr, dtype=jnp.int32)[None, :, None] + delay[None, None, :],
        T_arr - 1,
    )  # [1, T, C]
    gathered = jnp.take_along_axis(
        audio_BxTxC, jnp.broadcast_to(t_idx, (B, T_arr, C)), axis=1
    )
    pad = jnp.asarray(pad_value, dtype=audio_BxTxC.dtype)
    return jnp.where(t_idx >= T, pad, gathered)


def apply_audio_delay_np(audio_BxTxC, pad_value: int, bos_value: int, delay_pattern):
    """Host (numpy) apply — identical semantics to ``apply_audio_delay``.

    Prompt templates are tiny ([P+max_delay, C] ints) and built once per
    request on the host; the jitted gather would cost a device round trip
    (~25 ms through the remote-TPU tunnel) plus a fresh XLA compile for
    every distinct prompt length (~2 s each)."""
    import numpy as np

    audio = np.asarray(audio_BxTxC)
    B, T, C = audio.shape
    delay = np.asarray(delay_pattern, dtype=np.int32)
    t_idx = np.arange(T, dtype=np.int32)[None, :, None] - delay[None, None, :]
    t_clamped = np.clip(t_idx, 0, T - 1)
    gathered = np.take_along_axis(audio, np.broadcast_to(t_clamped, (B, T, C)), axis=1)
    bos = np.asarray(bos_value, audio.dtype)
    pad = np.asarray(pad_value, audio.dtype)
    return np.where(t_idx < 0, bos, np.where(t_idx >= T, pad, gathered))


def revert_audio_delay_np(audio_BxTxC, pad_value: int, delay_pattern, T: int | None = None):
    """Host (numpy) revert — identical semantics to ``revert_audio_delay``.

    The generated length varies per call; running the gather on host avoids
    recompiling a jitted gather for every distinct length (a fresh XLA compile
    per generate call measured ~2s on remote-attached TPUs).
    """
    import numpy as np

    audio = np.asarray(audio_BxTxC)
    B, T_arr, C = audio.shape
    if T is None:
        T = T_arr
    delay = np.asarray(delay_pattern, dtype=np.int32)
    t_idx = np.minimum(np.arange(T_arr, dtype=np.int32)[None, :, None] + delay[None, None, :], T_arr - 1)
    gathered = np.take_along_axis(audio, np.broadcast_to(t_idx, (B, T_arr, C)), axis=1)
    return np.where(t_idx >= T, np.asarray(pad_value, audio.dtype), gathered)
