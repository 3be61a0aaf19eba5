"""Sampler tests: CFG formula, constraint masks, top-k/top-p filter parity with
the reference recipe (dia/model.py:32-82, 449-478)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.ops.sampling import (
    NEG,
    apply_constraints,
    cfg_combine,
    sample_next_token,
    top_k_filter,
    top_p_filter,
)


def test_cfg_combine_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 3, 10)).astype(np.float32)
    out = np.asarray(cfg_combine(jnp.asarray(logits), 3.0))
    expected = logits[1] + 3.0 * (logits[1] - logits[0])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_constraints():
    C, V = 4, 1028
    logits = jnp.zeros((C, V))
    out = np.asarray(apply_constraints(logits, 1024, 1025, 1026))
    assert out[0, 1024] == 0.0  # EOS allowed in channel 0
    assert (out[1:, 1024] == NEG).all()  # banned elsewhere
    assert (out[:, 1025] == NEG).all()  # PAD banned
    assert (out[:, 1026] == NEG).all()  # BOS banned


def test_top_k_filter():
    logits = jnp.asarray([[5.0, 1.0, 3.0, 2.0, 4.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert out[0, 0] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [1, 2, 3]] == NEG).all()


def test_top_p_matches_reference_recipe():
    """Mirror of dia/model.py:55-70 computed in numpy."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 50)).astype(np.float32) * 3
    top_p = 0.7

    def ref_top_p(row):
        probs = np.exp(row - row.max())
        probs = probs / probs.sum()
        order = np.argsort(-probs, kind="stable")
        cum = np.cumsum(probs[order])
        remove_sorted = cum > top_p
        remove_sorted = np.roll(remove_sorted, 1)
        remove_sorted[0] = False
        remove = np.zeros_like(remove_sorted)
        remove[order] = remove_sorted
        out = row.copy()
        out[remove] = np.float32(np.finfo(np.float32).min)
        return out

    expected = np.stack([ref_top_p(r) for r in logits])
    ours = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_greedy_is_argmax():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(9, 1028)).astype(np.float32))
    out = np.asarray(sample_next_token(jax.random.PRNGKey(0), logits, 0.0, 0.95, 35))
    np.testing.assert_array_equal(out, np.asarray(logits).argmax(-1))


def test_sampling_respects_filters():
    # After top-k=1, sampling must always return the argmax.
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(9, 100)).astype(np.float32))
    for seed in range(5):
        out = np.asarray(
            sample_next_token(jax.random.PRNGKey(seed), logits, 1.3, 1.0, 1)
        )
        np.testing.assert_array_equal(out, np.asarray(logits).argmax(-1))


def test_sampling_distribution_sanity():
    # Two peaked logits: samples should land on those tokens with ~right freq.
    logits = jnp.full((1, 10), -10.0)
    logits = logits.at[0, 3].set(1.0).at[0, 7].set(1.0)
    counts = np.zeros(10)
    for seed in range(200):
        tok = int(sample_next_token(jax.random.PRNGKey(seed), logits, 1.0, 1.0, 0)[0])
        counts[tok] += 1
    assert counts[3] + counts[7] == 200
    assert 60 < counts[3] < 140
