"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by the bench/profile tooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.ops.kernels.decode_attention import (
    decode_attention,
    decode_attention_reference,
)


@pytest.mark.parametrize("valid", [1, 5, 500, 511, 512, 513, 1024])
def test_decode_attention_matches_reference(valid):
    rng = np.random.default_rng(0)
    B, T, Nkv, G, H = 2, 1024, 4, 4, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))

    out = decode_attention(q, k, v, jnp.asarray(valid, jnp.int32), chunk=512, interpret=True)
    ref = decode_attention_reference(q, k, v, jnp.asarray(valid, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_attention_bf16():
    rng = np.random.default_rng(1)
    B, T, Nkv, G, H = 2, 512, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)), dtype=jnp.bfloat16)
    out = decode_attention(q, k, v, jnp.asarray(100, jnp.int32), chunk=256, interpret=True)
    ref = decode_attention_reference(q, k, v, jnp.asarray(100, jnp.int32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_decode_attention_ignores_garbage_past_valid():
    """Slots >= valid_len must not affect the output."""
    rng = np.random.default_rng(2)
    B, T, Nkv, G, H = 1, 512, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    out1 = decode_attention(q, k, v, jnp.asarray(60, jnp.int32), chunk=128, interpret=True)
    k2 = k.at[:, 60:].set(1e4)
    v2 = v.at[:, 60:].set(-1e4)
    out2 = decode_attention(q, k2, v2, jnp.asarray(60, jnp.int32), chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
