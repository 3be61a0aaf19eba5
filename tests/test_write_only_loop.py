"""Regression guard: the decode-loop body never READS the tokens buffer.

The write-only-buffer optimization (docs/PERF.md, "Write-only tokens
buffer") carries ``prev_tok`` and a rolling ``bos_rows`` window in
``DecodeLoopState`` so that each step's input does not wait on the previous
step's ``dynamic_update_slice`` of the full [audio_length, channels] buffer.
This test pins that property at the jaxpr level: in ``_make_loop_body``'s
traced body, the tokens-buffer input variable may be consumed ONLY by
``dynamic_update_slice`` (the per-step write).  Any reintroduced
``dynamic_slice``/``gather`` of the buffer — or passing it into a sub-call —
fails here long before it shows up as a bench regression.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.generate import _make_loop_body, prepare_stream
from dia_tts_prune_tpu.models.dia import init_params
from dia_tts_prune_tpu.state import prepare_audio_prompt
from dia_tts_prune_tpu.tokenizer import build_effective_text, encode_cfg_batch


def test_loop_body_never_reads_tokens_buffer():
    cfg = tiny_test_config()
    d = cfg.data
    params = init_params(cfg, jax.random.PRNGKey(0))
    enc = encode_cfg_batch(
        build_effective_text("[S1] write only", None), d.text_length, d.text_pad_value
    )
    delayed, prefill_step = prepare_audio_prompt(cfg, None)
    tbuf = np.full((d.audio_length, d.channels), -1, np.int32)
    tbuf[: delayed.shape[0]] = delayed
    state, cross_cache, cross_mask = prepare_stream(
        params, cfg, jnp.asarray(enc), jnp.asarray(tbuf),
        jnp.asarray([prefill_step, 0], jnp.int32),
        None, "float32",
    )
    body = _make_loop_body(
        params, cfg, cross_cache, cross_mask, max_tokens=64,
        cfg_scale=3.0, temperature=0.0, top_p=0.95, greedy=True,
        cfg_filter_top_k=35, compute_dtype=jnp.float32,
    )
    closed = jax.make_jaxpr(body)(state)

    # tokens is the first field of DecodeLoopState, hence invar 0
    tokens_var = closed.jaxpr.invars[0]
    assert tuple(tokens_var.aval.shape) == (d.audio_length, d.channels), (
        "DecodeLoopState field order changed — update the tracked invar"
    )

    consumers = [
        eqn.primitive.name
        for eqn in closed.jaxpr.eqns
        if any(v is tokens_var for v in eqn.invars)
    ]
    assert consumers == ["dynamic_update_slice"], (
        f"tokens buffer consumed by {consumers}: the loop body must stay "
        "write-only (reads belong in the prev_tok/bos_rows carries)"
    )
