"""Attention mask parity vs the torch reference (dia/state.py:8-39)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.ops.masks import create_attn_mask

from .ref_loader import load_reference, reference_available


def test_pad_pad_attends():
    q = jnp.asarray([[True, True, False, False]])
    k = jnp.asarray([[True, False, False, True]])
    m = np.asarray(create_attn_mask(q, k))
    assert m.shape == (1, 1, 4, 4)
    # non-pad q attends non-pad k
    assert m[0, 0, 0, 0] and m[0, 0, 0, 3]
    assert not m[0, 0, 0, 1]
    # pad q attends pad k only
    assert m[0, 0, 2, 1] and m[0, 0, 2, 2]
    assert not m[0, 0, 2, 0]


def test_causal_mask():
    q = jnp.ones((1, 4), dtype=jnp.bool_)
    k = jnp.ones((1, 4), dtype=jnp.bool_)
    m = np.asarray(create_attn_mask(q, k, is_causal=True))[0, 0]
    assert m[0, 0] and not m[0, 1]
    assert m[3, :].all()


@pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")
@pytest.mark.parametrize("causal", [False, True])
def test_matches_reference(causal):
    import torch

    _, st, _, _ = load_reference()
    rng = np.random.default_rng(0)
    q = rng.random((2, 16)) > 0.3
    k = rng.random((2, 16)) > 0.3
    ref = st.create_attn_mask(
        torch.from_numpy(q), torch.from_numpy(k), torch.device("cpu"), is_causal=causal
    ).numpy()
    ours = np.asarray(create_attn_mask(jnp.asarray(q), jnp.asarray(k), is_causal=causal))
    np.testing.assert_array_equal(ours, ref)
