"""Speculative decoding correctness harness (VERDICT r2 task #5).

Two properties are the whole point:
* greedy speculative output is TOKEN-EXACT vs the baseline loop;
* the sampled path's accept-or-residual rule reproduces the target
  distribution exactly (statistical test on fixed logits).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.generate import DiaGenerator
from dia_tts_prune_tpu.models.dia import init_params
from dia_tts_prune_tpu.speculative import (
    SpeculativeGenerator,
    filtered_probs,
    rejection_sample_channel,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_filtered_probs_matches_sampler_distribution():
    """filtered_probs must be the exact distribution sample_next_token_traced
    draws from: renormalized softmax over the top-k → top-p survivors."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32) * 3)
    p = filtered_probs(logits, temperature=1.3, top_p=0.9, cfg_filter_top_k=8)
    assert p.shape == logits.shape
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)
    # at most k nonzero entries, all within the top-k of logits
    for row_p, row_l in zip(np.asarray(p), np.asarray(logits)):
        nz = np.nonzero(row_p)[0]
        assert len(nz) <= 8
        kth = np.sort(row_l)[-8]
        assert (row_l[nz] >= kth).all()
    # empirical check: categorical draws from the masked logits match p
    vals, idx = jax.lax.top_k(logits / 1.3, 8)
    probs_k = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs_k, axis=-1)
    remove = jnp.roll(cum > 0.9, 1, axis=-1).at[..., 0].set(False)
    masked = jnp.where(remove, jnp.finfo(jnp.float32).min, vals)
    draws = jax.vmap(
        lambda k_, m_, i_: i_[jax.random.categorical(k_, m_)]
    )(jax.random.split(jax.random.PRNGKey(1), 3), masked, idx)
    for d, row_p in zip(np.asarray(draws), np.asarray(p)):
        assert row_p[d] > 0


def test_rejection_sampling_matches_target():
    """Channelwise accept-or-residual must emit EXACT target-distribution
    samples on fixed (p, q): chi-square over many trials."""
    V = 16
    rng = np.random.default_rng(1)
    q = rng.dirichlet(np.ones(V)).astype(np.float32)
    p = rng.dirichlet(np.ones(V)).astype(np.float32)
    qj, pj = jnp.asarray(q), jnp.asarray(p)

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    draft_keys = jax.random.split(jax.random.PRNGKey(3), n)
    drafts = jax.vmap(lambda k: jax.random.categorical(k, jnp.log(qj)))(draft_keys)
    toks, acc = jax.vmap(
        lambda k, d: rejection_sample_channel(k, d.astype(jnp.int32), qj, pj)
    )(keys, drafts)
    toks = np.asarray(toks)
    counts = np.bincount(toks, minlength=V)
    expected = p * n
    chi2 = float(((counts - expected) ** 2 / np.maximum(expected, 1e-9)).sum())
    # dof = V-1 = 15; 99.9th percentile ≈ 37.7 — generous to avoid flakes
    assert chi2 < 40.0, f"chi2={chi2}, counts={counts}, expected={expected}"
    # acceptance rate should be 1 - TV(p, q)
    tv = 0.5 * float(np.abs(p - q).sum())
    assert abs(float(np.asarray(acc).mean()) - (1 - tv)) < 0.02


def test_rejection_identical_distributions_always_accept():
    V = 8
    p = jnp.asarray(np.full(V, 1 / V, np.float32))
    keys = jax.random.split(jax.random.PRNGKey(4), 500)
    toks, acc = jax.vmap(
        lambda k: rejection_sample_channel(k, jnp.asarray(3, jnp.int32), p, p)
    )(keys)
    assert bool(jnp.all(acc))
    assert bool(jnp.all(toks == 3))


def test_greedy_token_exact(tiny_setup):
    """Speculative greedy output == baseline greedy output, token for token,
    across draft depths and window sizes (incl. EOS-tail handoff via the
    near-max trigger)."""
    cfg, params = tiny_setup
    base = DiaGenerator(params, cfg)
    text = "[S1] speculative parity check"
    expected = base.generate_tokens(text, max_tokens=96, temperature=0.0)
    for n_draft, window in ((1, 4), (1, 8)):
        spec = SpeculativeGenerator(params, cfg, n_draft_layers=n_draft, window=window)
        got = spec.generate_tokens(text, max_tokens=96, temperature=0.0)
        np.testing.assert_array_equal(
            got, expected, err_msg=f"draft={n_draft} window={window}")
        assert spec.stats["windows"] > 0  # the spec path actually ran


def test_greedy_full_draft_always_accepts(tiny_setup):
    """Draft == full model (n_draft_layers = L) must accept every draft."""
    cfg, params = tiny_setup
    L = cfg.model.decoder.n_layer
    spec = SpeculativeGenerator(params, cfg, n_draft_layers=L, window=4)
    base = DiaGenerator(params, cfg)
    text = "[S1] full draft"
    expected = base.generate_tokens(text, max_tokens=64, temperature=0.0)
    got = spec.generate_tokens(text, max_tokens=64, temperature=0.0)
    np.testing.assert_array_equal(got, expected)
    assert spec.stats["drafted"] > 0
    assert spec.stats["accepted_drafts"] == spec.stats["drafted"]
    assert spec.acceptance_rate == 1.0


def test_greedy_token_exact_with_voice_clone(tiny_setup):
    """Speculative greedy with an audio prompt (prefill) == baseline."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 1024, (14, 9)).astype(np.int32)
    kwargs = dict(max_tokens=96, temperature=0.0,
                  audio_prompt_codes=prompt, audio_prompt_text="[S1] prompt words")
    base = DiaGenerator(params, cfg)
    expected = base.generate_tokens("[S2] continue", **kwargs)
    spec = SpeculativeGenerator(params, cfg, n_draft_layers=1, window=6)
    got = spec.generate_tokens("[S2] continue", **kwargs)
    np.testing.assert_array_equal(got, expected)
    assert spec.stats["windows"] > 0


def test_sampled_speculative_runs_valid(tiny_setup):
    """Sampled speculative generation produces valid in-range tokens and
    reports acceptance stats (distributional correctness is covered by the
    fixed-logits rejection test; random tiny weights make sequence-level
    statistical comparison meaningless)."""
    cfg, params = tiny_setup
    spec = SpeculativeGenerator(params, cfg, n_draft_layers=1, window=4)
    out = spec.generate_tokens("[S1] sampled spec", max_tokens=64,
                               temperature=1.2, seed=7)
    assert out.shape[1] == 9
    assert out.min() >= 0 and out.max() <= 1023
    assert spec.stats["windows"] > 0


def test_dia_api_speculative_greedy_token_exact(tiny_setup):
    """The user surface (VERDICT r3 item 2): Dia.generate_codes(speculative=W)
    is token-exact vs the normal loop, and the spec driver is cached until the
    params object is swapped."""
    from dia_tts_prune_tpu.api import Dia

    cfg, params = tiny_setup
    dia = Dia(cfg, params)
    ref = dia.generate_codes("[S1] surface spec", max_tokens=96, temperature=0.0,
                             seed=3)
    out = dia.generate_codes("[S1] surface spec", max_tokens=96, temperature=0.0,
                             seed=3, speculative=4, spec_draft_layers=1)
    np.testing.assert_array_equal(out, ref)
    g1 = dia.speculative_generator(4, 1)
    assert g1 is dia.speculative_generator(4, 1)
    assert g1 is not dia.speculative_generator(6, 1)
    assert g1.stats["windows"] > 0  # the spec path actually ran


def test_bench_spec_smoke(capsys):
    """bench.py --spec prints one JSON line with acceptance stats."""
    import json

    import bench

    bench.main(["--tiny", "--steps", "64", "--spec", "4", "--temperature", "0"])
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"].startswith("RTF_spec4-bf16")
    assert rec["spec_window"] == 4 and rec["spec_loop_steps"] > 0
