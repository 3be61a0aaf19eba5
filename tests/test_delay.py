"""Delay/revert transform parity vs the torch reference (dia/audio.py:6-163)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.ops.delay import (
    apply_audio_delay,
    apply_audio_delay_np,
    revert_audio_delay,
)

from .ref_loader import load_reference, reference_available

DELAY = (0, 8, 9, 10, 11, 12, 13, 14, 15)


def test_apply_delay_basic():
    B, T, C = 1, 20, 3
    delay = (0, 1, 2)
    x = np.arange(B * T * C, dtype=np.int32).reshape(B, T, C)
    out = np.asarray(apply_audio_delay(jnp.asarray(x), 1025, 1026, delay))
    # channel 0: unchanged
    np.testing.assert_array_equal(out[0, :, 0], x[0, :, 0])
    # channel 1: shifted by 1, BOS at t=0
    assert out[0, 0, 1] == 1026
    np.testing.assert_array_equal(out[0, 1:, 1], x[0, :-1, 1])
    # channel 2: BOS at t<2
    assert (out[0, :2, 2] == 1026).all()


def test_apply_np_matches_jax():
    """Host apply (used by prepare_audio_prompt — no device round trip)
    must be bit-identical to the jitted gather."""
    rng = np.random.default_rng(1)
    for T in (16, 21, 64):
        x = rng.integers(0, 1024, (2, T, 9)).astype(np.int32)
        a = np.asarray(apply_audio_delay(jnp.asarray(x), 1025, 1026, DELAY))
        b = apply_audio_delay_np(x, 1025, 1026, DELAY)
        np.testing.assert_array_equal(a, b)


def test_revert_inverts_apply():
    rng = np.random.default_rng(0)
    B, T, C = 2, 64, 9
    x = rng.integers(0, 1024, (B, T, C)).astype(np.int32)
    delayed = apply_audio_delay(jnp.asarray(x), 1025, 1026, DELAY)
    reverted = np.asarray(revert_audio_delay(delayed, 1025, DELAY, T))
    # positions t < T - delay[c] must round-trip exactly
    for c, d in enumerate(DELAY):
        valid = T - d
        np.testing.assert_array_equal(reverted[:, :valid, c], x[:, :valid, c])


@pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")
def test_apply_delay_matches_reference():
    import torch

    _, _, _, au = load_reference()
    rng = np.random.default_rng(1)
    B, T, C = 2, 48, 9
    x = rng.integers(0, 1024, (B, T, C)).astype(np.int32)
    precomp = au.build_delay_indices(B, T, C, list(DELAY))
    ref = au.apply_audio_delay(torch.from_numpy(x), 1025, 1026, precomp).numpy()
    ours = np.asarray(apply_audio_delay(jnp.asarray(x), 1025, 1026, DELAY))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")
def test_revert_delay_matches_reference():
    import torch

    _, _, _, au = load_reference()
    rng = np.random.default_rng(2)
    B, T, C = 1, 48, 9
    x = rng.integers(0, 1028, (B, T, C)).astype(np.int32)
    precomp = au.build_revert_indices(B, T, C, list(DELAY))
    ref = au.revert_audio_delay(torch.from_numpy(x), 1025, precomp, T).numpy()
    ours = np.asarray(revert_audio_delay(jnp.asarray(x), 1025, DELAY, T))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")
def test_revert_delay_matches_reference_smaller_T():
    """The reference clamps indices before the PAD comparison; the PAD mask
    only activates when the caller passes T smaller than the array length."""
    import torch

    _, _, _, au = load_reference()
    rng = np.random.default_rng(3)
    B, T_arr, C = 1, 48, 9
    T_logical = 40
    x = rng.integers(0, 1028, (B, T_arr, C)).astype(np.int32)
    precomp = au.build_revert_indices(B, T_arr, C, list(DELAY))
    ref = au.revert_audio_delay(torch.from_numpy(x), 1025, precomp, T_logical).numpy()
    ours = np.asarray(revert_audio_delay(jnp.asarray(x), 1025, DELAY, T_logical))
    np.testing.assert_array_equal(ours, ref)


def test_delay_revert_property_fuzz():
    """Random channel counts / delay patterns / lengths: revert∘apply restores
    every position with full context, and the jnp/np revert variants agree."""
    from dia_tts_prune_tpu.ops.delay import revert_audio_delay_np

    rng = np.random.default_rng(42)
    for _ in range(10):
        C = int(rng.integers(1, 12))
        T = int(rng.integers(20, 100))
        delays = tuple(int(d) for d in rng.integers(0, min(T - 1, 18), C))
        x = rng.integers(0, 1024, (2, T, C)).astype(np.int32)
        delayed = apply_audio_delay(jnp.asarray(x), 1025, 1026, delays)
        rev_j = np.asarray(revert_audio_delay(delayed, 1025, delays, T))
        rev_n = revert_audio_delay_np(np.asarray(delayed), 1025, delays, T)
        np.testing.assert_array_equal(rev_j, rev_n)
        for c, d in enumerate(delays):
            np.testing.assert_array_equal(rev_j[:, : T - d, c], x[:, : T - d, c])
