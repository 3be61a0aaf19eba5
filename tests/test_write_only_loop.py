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


# --- the batched / continuous-batching loops (bodies are closures; check
# the while-loop carry inside the whole traced function instead) -----------

from jax._src.core import ClosedJaxpr as _ClosedJaxpr, Jaxpr as _Jaxpr


def _all_jaxprs(jaxpr):
    """jaxpr plus every sub-jaxpr reachable through eqn params."""
    yield jaxpr
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for x in vs:
                if isinstance(x, _ClosedJaxpr):
                    yield from _all_jaxprs(x.jaxpr)
                elif isinstance(x, _Jaxpr):
                    yield from _all_jaxprs(x)


def _assert_while_carry_write_only(closed, buf_shape, allowed):
    """Find the decode while-loop whose carry holds the int32 tokens buffer
    of ``buf_shape`` and assert the body consumes it only via ``allowed``
    write primitives."""
    hits = 0
    for j in _all_jaxprs(closed.jaxpr):
        for eqn in j.eqns:
            if eqn.primitive.name != "while":
                continue
            body = eqn.params["body_jaxpr"].jaxpr
            bn = eqn.params["body_nconsts"]
            targets = [
                v for v in body.invars[bn:]
                if getattr(v.aval, "shape", None) == buf_shape
                and v.aval.dtype == np.int32
            ]
            for tv in targets:
                hits += 1
                consumers = [
                    e.primitive.name for e in body.eqns
                    if any(iv is tv for iv in e.invars)
                ]
                assert consumers and set(consumers) <= allowed, (
                    f"while-carry tokens buffer consumed by {consumers}; "
                    f"allowed: {allowed}"
                )
    assert hits >= 1, "no while loop carrying the tokens buffer found"


def test_batched_loop_body_write_only():
    cfg = tiny_test_config()
    d = cfg.data
    N = 2
    params = init_params(cfg, jax.random.PRNGKey(0))
    from dia_tts_prune_tpu.generate import generate_fused_batch

    fn = generate_fused_batch.__wrapped__
    closed = jax.make_jaxpr(
        lambda p, e, tb, ps, sd, ia, fa: fn(
            p, cfg, e, tb, ps, sd, ia, fa,
            None, True, 35, "float32",
        )
    )(
        params,
        jnp.zeros((2 * N, d.text_length), jnp.int32),
        jnp.full((N, d.audio_length, d.channels), -1, jnp.int32),
        jnp.ones((N,), jnp.int32),
        jnp.zeros((N,), jnp.int32),
        jnp.asarray([64], jnp.int32),
        jnp.asarray([3.0, 1.0, 0.95], jnp.float32),
    )
    _assert_while_carry_write_only(
        closed, (N, d.audio_length, d.channels), {"dynamic_update_slice"}
    )


def test_cbatch_segment_body_write_only():
    cfg = tiny_test_config()
    d = cfg.data
    params = init_params(cfg, jax.random.PRNGKey(0))
    from dia_tts_prune_tpu.cbatch import cb_init, cb_segment

    state, cross, mask = cb_init(cfg, 2, 128, 128, "float32", False)
    fn = cb_segment.__wrapped__
    closed = jax.make_jaxpr(
        lambda p, s, cc, cm, ss: fn(p, cfg, s, cc, cm, ss, 35, "float32")
    )(params, state, cross, mask, jnp.asarray(8, jnp.int32))
    # per-lane write slots vmap the update into a scatter — still a write
    _assert_while_carry_write_only(
        closed, (2, d.audio_length, d.channels),
        {"dynamic_update_slice", "scatter"},
    )
