"""Continuous batching: requests join and leave a running batched decode.

The r2 serving layer (`serving.DynamicBatcher`) coalesces requests that
*arrive together* into one `generate_fused_batch` dispatch; a request that
arrives mid-flight waits for the whole batch to finish.  Continuous batching
removes that wait: the server keeps ``n_slots`` decode lanes resident on the
device and swaps a new request into a free lane at the next *segment*
boundary (a segment is ``segment_steps`` decode steps — one compiled
dispatch), while the other lanes keep generating.  This is the TPU-shaped
version of vLLM-style continuous batching: lane count, cache length and text
bucket are static (one executable, compiled once), and only lane *contents*
change — via donated-buffer row splices, never a reshape.

Design (all static shapes, three compiled functions total):

* ``prepare_stream`` (generate.py) runs per request off the batch — encoder
  conditioning + voice-clone prefill on its own CFG pair, producing the
  lane's token buffer, KV rows, cross rows and PRNG key.
* ``swap_in`` splices those rows into lane ``i`` of the batch state at a
  traced slot index (donated buffers — no copy of the other lanes).
* ``cb_segment`` advances every live lane ``seg_steps`` steps.  Each lane
  lives on its OWN local timeline: per-row write slots / RoPE positions
  (``decode_step_scan`` vector ``write_slot``), per-row EOS/BOS state
  machines, per-row sampling parameters and PRNG chains.  A lane therefore
  reproduces its single-stream run bit-for-bit regardless of what the other
  lanes are doing (test_cbatch.py), which also makes seeded requests
  reproducible under ANY admission order — the property the reference's
  sequential queue gets trivially (/root/reference/app.py:221-244) and
  batched servers usually lose.

Finished lanes keep stepping until harvested (their writes are frozen and
their cache re-commits are bit-identical no-ops), so the segment never
recompiles; the host harvests them at segment boundaries and refills.

Admissions are pipelined: while a segment executes on the device, the
worker speculatively runs host prep + ``prepare_stream`` dispatch for
queued requests (``_prep_pending``, capped at ``n_slots`` outstanding), so
their encoder/prefill compute overlaps the running segment and the next
boundary only pays the row splice.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass
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
    _dtype_of,
    _kv_cache_quant,
    _maybe_unpack_s4,
    _resolve_seed,
    prepare_stream,
)
from .models.dia import KVCache, QuantKVCache, decode_step_scan, new_self_cache
from .ops.delay import revert_audio_delay_np
from .parallel.sharding import constrain, cross_cache_spec, self_cache_spec
from .ops.sampling import (
    apply_constraints,
    sample_next_token_traced as _traced_sample,
)
from .state import prepare_audio_prompt
from .tokenizer import build_effective_text, encode_cfg_batch


class CBState(NamedTuple):
    """Carry of the continuous-batch loop: N lanes, each on its own local
    timeline (lane i's step counter/EOS machine/PRNG chain mirror the
    single-stream ``DecodeLoopState`` fields exactly)."""

    tokens: jax.Array  # int32 [N, T_max, C]
    cache: KVCache | QuantKVCache  # [L, 2N, T, Nkv, H] rows [uncond×N; cond×N]
    keys: jax.Array  # uint32 [N, 2] per-lane PRNG chains
    dec_step: jax.Array  # int32 [N] lane-local step index
    eos_detected: jax.Array  # bool [N]
    eos_countdown: jax.Array  # int32 [N]
    bos_countdown: jax.Array  # int32 [N]
    stop: jax.Array  # bool [N] — True: idle or finished (writes frozen)
    cap: jax.Array  # int32 [N] per-lane max_tokens
    cfg_scale: jax.Array  # f32 [N]
    temperature: jax.Array  # f32 [N]
    top_p: jax.Array  # f32 [N]
    greedy: jax.Array  # bool [N]
    # Perf carries (mirroring DecodeLoopState): the segment body never READS
    # the tokens buffer, so per-step writes stay off the serial critical path.
    prev_tok: jax.Array  # int32 [N, C] == tokens[i, dec_step_i] (next input;
    # for a stopped lane this is also the value its frozen write re-commits)
    bos_rows: jax.Array  # int32 [N, max_delay, C] rolling template window
    virgin: jax.Array  # bool [N] — True while tokens[i, dec_step_i+1] has
    # never been written by the loop (its content is still the template)


def cb_init(
    config: DiaConfig,
    n_slots: int,
    cache_len: int,
    cross_window: int,
    compute_dtype_name: str,
    kv_quant: bool,
):
    """Allocate the idle N-lane state (all lanes stopped) + batch cross
    cache/mask buffers.  One-time allocation; every later mutation is a
    donated-buffer splice or segment step."""
    d = config.data
    m = config.model
    N = int(n_slots)
    dtype = _dtype_of(compute_dtype_name)
    state = CBState(
        tokens=jnp.full((N, d.audio_length, d.channels), -1, jnp.int32),
        cache=new_self_cache(config, 2 * N, cache_len, dtype, quant=kv_quant),
        keys=jnp.zeros((N, 2), jnp.uint32),
        dec_step=jnp.ones((N,), jnp.int32),
        eos_detected=jnp.zeros((N,), jnp.bool_),
        eos_countdown=jnp.full((N,), -1, jnp.int32),
        bos_countdown=jnp.zeros((N,), jnp.int32),
        stop=jnp.ones((N,), jnp.bool_),
        cap=jnp.full((N,), 2, jnp.int32),
        cfg_scale=jnp.zeros((N,), jnp.float32),
        temperature=jnp.zeros((N,), jnp.float32),
        top_p=jnp.ones((N,), jnp.float32),
        greedy=jnp.ones((N,), jnp.bool_),
        prev_tok=jnp.full((N, d.channels), -1, jnp.int32),
        bos_rows=jnp.full((N, d.max_delay, d.channels), -1, jnp.int32),
        virgin=jnp.ones((N,), jnp.bool_),
    )
    dec = m.decoder
    S = int(cross_window)
    cross_shape = (dec.n_layer, 2 * N, S, dec.cross_query_heads, dec.cross_head_dim)
    if kv_quant:
        cross = QuantKVCache(
            k=jnp.zeros(cross_shape, jnp.int8), v=jnp.zeros(cross_shape, jnp.int8),
            ks=jnp.zeros(cross_shape[:-1], jnp.float32),
            vs=jnp.zeros(cross_shape[:-1], jnp.float32),
        )
    else:
        cross = KVCache(k=jnp.zeros(cross_shape, dtype), v=jnp.zeros(cross_shape, dtype))
    cross_mask = jnp.zeros((2 * N, 1, 1, S), jnp.bool_)
    return state, cross, cross_mask


def _constrain_cache(cache, spec_fn):
    """Pin a KV cache's shards to the TP head axis (`parallel.sharding`
    specs); identity without an active mesh.  Applied inside the jitted
    segment so the cache stays distributed through the while-loop carry —
    the same contract `generate_fused` keeps (generate.py)."""
    from jax.sharding import PartitionSpec as _P

    spec = spec_fn()
    if isinstance(cache, QuantKVCache):
        sspec = _P(*spec[:-1])  # scales: same layout minus H
        return QuantKVCache(k=constrain(cache.k, spec), v=constrain(cache.v, spec),
                            ks=constrain(cache.ks, sspec), vs=constrain(cache.vs, sspec))
    return KVCache(k=constrain(cache.k, spec), v=constrain(cache.v, spec))


@partial(jax.jit, donate_argnames=("state", "cross_cache", "cross_mask"),
         static_argnames=("max_delay",))
def swap_in(
    state: CBState,
    cross_cache,
    cross_mask: jax.Array,
    slot: jax.Array,  # scalar int32 lane index (traced — one executable)
    ss_tokens: jax.Array,  # [T_max, C] prefilled template (prepare_stream)
    ss_cache,  # [L, 2, T, ...] lane KV rows (prepare_stream state.cache)
    ss_cross,  # [L, 2, S, ...] lane cross rows
    ss_mask: jax.Array,  # [2, 1, 1, S]
    ss_key: jax.Array,  # uint32 [2]
    int_row: jax.Array,  # int32 [2]: (prefill_step, max_tokens cap)
    float_row: jax.Array,  # f32 [3]: (cfg_scale, temperature, top_p)
    greedy: jax.Array,  # bool scalar
    *,
    max_delay: int,
):
    """Splice one prepared request into lane ``slot`` (donated buffers).

    The lane's loop fields are initialized exactly as ``_decode_loop_core``
    initializes ``DecodeLoopState`` (generate.py), so the lane's subsequent
    steps replay the single-stream loop bit-for-bit."""
    N = state.tokens.shape[0]
    s = slot.astype(jnp.int32)

    def put_row(buf, val, row):
        # buf [N, ...] ← val [...] at index ``row`` (traced)
        return jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (row,) + (0,) * val.ndim)

    def put_pair(buf, val):
        # buf [L, 2N, ...] ← val [L, 2, ...]: CFG pair rows (s, N + s)
        zeros = (0,) * (buf.ndim - 2)
        buf = jax.lax.dynamic_update_slice(buf, val[:, :1].astype(buf.dtype),
                                           (0, s) + zeros)
        return jax.lax.dynamic_update_slice(buf, val[:, 1:].astype(buf.dtype),
                                            (0, N + s) + zeros)

    prefill_step = int_row[0]
    # loop perf carries at the lane's entry point (see _loop_entry_carries,
    # generate.py): the last prefill row and the BOS-window template rows
    lane_prev = jax.lax.dynamic_slice(
        ss_tokens, (prefill_step - 1, 0), (1, ss_tokens.shape[1]))[0]
    lane_bos = jax.lax.dynamic_slice(
        ss_tokens, (prefill_step, 0), (max_delay, ss_tokens.shape[1]))
    return (
        CBState(
            tokens=put_row(state.tokens, ss_tokens, s),
            cache=_constrain_cache(
                jax.tree.map(put_pair, state.cache, ss_cache), self_cache_spec),
            keys=put_row(state.keys, ss_key, s),
            dec_step=put_row(state.dec_step, prefill_step - 1, s),
            eos_detected=put_row(state.eos_detected, jnp.asarray(False), s),
            eos_countdown=put_row(state.eos_countdown, jnp.asarray(-1, jnp.int32), s),
            bos_countdown=put_row(state.bos_countdown,
                                  jnp.asarray(max_delay, jnp.int32), s),
            stop=put_row(state.stop, jnp.asarray(False), s),
            cap=put_row(state.cap, int_row[1], s),
            cfg_scale=put_row(state.cfg_scale, float_row[0], s),
            temperature=put_row(state.temperature, float_row[1], s),
            top_p=put_row(state.top_p, float_row[2], s),
            greedy=put_row(state.greedy, greedy, s),
            prev_tok=put_row(state.prev_tok, lane_prev, s),
            bos_rows=put_row(state.bos_rows, lane_bos, s),
            virgin=put_row(state.virgin, jnp.asarray(True), s),
        ),
        _constrain_cache(
            jax.tree.map(put_pair, cross_cache, ss_cross), cross_cache_spec),
        _put_mask(cross_mask, ss_mask, s, N),
    )


def _put_mask(cross_mask: jax.Array, ss_mask: jax.Array, s, N: int) -> jax.Array:
    """Splice the [2, 1, 1, S] request mask into rows (s, N+s) of [2N, 1, 1, S]."""
    cross_mask = jax.lax.dynamic_update_slice(cross_mask, ss_mask[:1], (s, 0, 0, 0))
    return jax.lax.dynamic_update_slice(cross_mask, ss_mask[1:], (N + s, 0, 0, 0))


@partial(
    jax.jit,
    static_argnames=("config", "cfg_filter_top_k", "compute_dtype_name"),
    donate_argnames=("state",),
)
def cb_segment(
    params,
    config: DiaConfig,
    state: CBState,
    cross_cache,
    cross_mask: jax.Array,
    seg_steps: jax.Array,  # scalar int32: advance live lanes this many steps
    cfg_filter_top_k: int,
    compute_dtype_name: str,
) -> CBState:
    """Advance every live lane up to ``seg_steps`` decode steps (one compiled
    dispatch; exits early when all lanes are stopped).

    Per-step semantics per lane mirror ``_make_loop_body`` (generate.py) —
    the single source of truth for the reference's token loop
    (/root/reference/dia/model.py:742-804) — with every scalar loop field
    promoted to an [N] lane vector and the cache written at per-lane slots
    (``decode_step_scan`` vector ``write_slot``).  Stopped lanes still step
    (constant batch shape → zero recompiles) but their token writes are
    frozen and their cache re-commits rewrite identical bytes."""
    d = config.data
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)
    delay = jnp.asarray(d.delay_pattern, dtype=jnp.int32)
    max_delay = d.max_delay
    eos, pad = d.audio_eos_value, d.audio_pad_value
    N, _, C = state.tokens.shape
    # TP: pin both caches to the head-sharded layout before and inside the
    # loop so SPMD never replicates them across the segment
    state = state._replace(cache=_constrain_cache(state.cache, self_cache_spec))
    cross_cache = _constrain_cache(cross_cache, cross_cache_spec)

    def body(carry):
        s, i = carry
        t = s.dec_step + 1  # [N] lane-local step
        prev = s.prev_tok  # [N, C] — carried, not re-read from the buffer
        tgt = jnp.concatenate([prev, prev], axis=0)[:, None, :]  # [2N, 1, C]
        t2 = jnp.concatenate([t, t], axis=0)  # [2N]
        logits, new_cache = decode_step_scan(
            params, config, tgt, t2[:, None], t2 - 1,
            s.cache, cross_cache, cross_mask, compute_dtype,
            skip_uncond_cross=True,
        )  # [2N, 1, C, V]
        new_cache = _constrain_cache(new_cache, self_cache_spec)
        uncond = logits[:N, 0]
        cond_l = logits[N:, 0]
        guided = cond_l + s.cfg_scale[:, None, None] * (cond_l - uncond)
        guided = jax.vmap(
            lambda g: apply_constraints(g, eos, pad, d.audio_bos_value))(guided)

        splits = jax.vmap(jax.random.split)(s.keys)  # [N, 2, 2]
        keys, subs = splits[:, 0], splits[:, 1]
        # greedy lanes route around the sampler (temperature 0 would divide
        # by zero); sampled lanes use their own chain + parameters
        safe_temp = jnp.where(s.greedy, 1.0, s.temperature)
        sampled = jax.vmap(
            lambda k, g, tp, pp: _traced_sample(k, g, tp, pp, cfg_filter_top_k)
        )(subs, guided, safe_temp, s.top_p)
        argm = jnp.argmax(guided, axis=-1).astype(jnp.int32)
        pred = jnp.where(s.greedy[:, None], argm, sampled)  # [N, C]

        # --- EOS state machine, vectorized over lanes (single-stream body) ---
        newly_eos = (~s.eos_detected) & (pred[:, 0] == eos)
        eos_detected = s.eos_detected | newly_eos
        countdown = jnp.where(newly_eos, max_delay, s.eos_countdown)
        active = countdown > 0
        step_after = (max_delay - countdown)[:, None]
        force_eos = active[:, None] & (step_after == delay[None, :])
        force_pad = active[:, None] & (step_after > delay[None, :]) & (pred != eos)
        pred = jnp.where(force_eos, eos, jnp.where(force_pad, pad, pred))
        countdown = jnp.where(active, countdown - 1, countdown)

        # --- BOS-window masked write; frozen lanes keep their rows ---
        # ``row`` == the buffer content at tokens[i, t] WITHOUT reading it:
        # while the position is virgin it is the template (the rolling
        # bos_rows window inside the BOS window, -1 beyond it); once written
        # (a lane frozen at a fixed t re-reads its own last write) it is
        # exactly prev_tok, because write == prev_tok is re-committed below.
        bos_countdown = jnp.maximum(0, s.bos_countdown - 1)
        row = jnp.where(
            s.virgin[:, None],
            jnp.where(s.bos_countdown[:, None] > 0, s.bos_rows[:, 0, :], -1),
            s.prev_tok,
        )  # [N, C]
        write = jnp.where((bos_countdown[:, None] > 0) & (row != -1), row, pred)
        write = jnp.where(s.stop[:, None], row, write)
        tokens = jax.vmap(
            lambda r, u, ti: jax.lax.dynamic_update_slice(r, u[None], (ti, 0))
        )(s.tokens, write, t)

        stop_now = countdown == 0
        hit_cap = t >= s.cap - 1
        near_max = (t >= s.cap - max_delay - 1) & (~eos_detected)
        eos_detected = eos_detected | near_max
        countdown = jnp.where(near_max, max_delay, countdown)

        frozen = s.stop
        # a lane advances its read position iff it is live and not stopping
        # via EOS this step (EOS stop leaves dec_step at t-1; cap stop at t)
        advancing = (~frozen) & (~stop_now)
        bos_rows = jnp.where(advancing[:, None, None],
                             jnp.roll(s.bos_rows, -1, axis=1), s.bos_rows)
        return (
            CBState(
                tokens=tokens,
                cache=new_cache,
                keys=keys,
                # stop via EOS: the loop's last counted step is t-1 (the
                # single-stream body freezes dec_step on the stop iteration);
                # stop via cap: step t counts (the single loop's exit leaves
                # dec_step == max_tokens-1 with row t written)
                dec_step=jnp.where(frozen, s.dec_step,
                                   jnp.where(stop_now, t - 1, t)),
                eos_detected=jnp.where(frozen, s.eos_detected, eos_detected),
                eos_countdown=jnp.where(frozen, s.eos_countdown, countdown),
                bos_countdown=jnp.where(frozen, s.bos_countdown, bos_countdown),
                stop=s.stop | stop_now | hit_cap,
                cap=s.cap, cfg_scale=s.cfg_scale, temperature=s.temperature,
                top_p=s.top_p, greedy=s.greedy,
                # prev_tok == the value at the lane's next read position
                # tokens[i, dec_step+1-1] for advancing lanes (== write at t),
                # and == the frozen write value otherwise (write == row there)
                prev_tok=write,
                bos_rows=bos_rows,
                virgin=advancing,
            ),
            i + 1,
        )

    def cond(carry):
        s, i = carry
        return (i < seg_steps) & jnp.any(~s.stop)

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
    return final


@dataclass
class _Lane:
    future: Future
    prefill_step: int
    text: str
    stream_q: queue.Queue | None = None  # set for submit_stream lanes
    emitted: int = 0  # finalized frames already streamed out


class ContinuousBatcher:
    """Slot-based scheduler: submit() returns a Future; a worker thread swaps
    requests into free device lanes at segment boundaries while other lanes
    keep decoding.  All device shapes are fixed at construction (one
    executable per function for the server's lifetime)."""

    def __init__(
        self,
        dia,
        n_slots: int = 4,
        segment_steps: int = 64,
        max_tokens: int = 1024,
        text_window: int | None = 256,
        cfg_filter_top_k: int = 35,
        mesh=None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` for tensor-parallel serving —
        pass TP-sharded params (``parallel.sharding.shard_params``) in
        ``dia.params``; the worker thread traces every device call under the
        mesh and the segment loop pins both KV caches to the head-sharded
        layout (1 KV head per chip on v5e-4), so lane tokens stay
        bit-identical to the single-device run (tests/test_cbatch.py)."""
        self._dia = dia
        self._mesh = mesh
        cfg = dia.config
        self.n_slots = int(n_slots)
        self.segment_steps = int(segment_steps)
        self.max_tokens = min(int(max_tokens), cfg.data.audio_length)
        self.cfg_filter_top_k = int(cfg_filter_top_k)
        self._quant = _kv_cache_quant(dia.params)
        self.cache_len = _cache_len_for(self.max_tokens, 0, cfg) or cfg.data.audio_length
        self.text_window = min(int(text_window or cfg.data.text_length),
                               cfg.data.text_length)
        with self._mesh_scope():
            self._state, self._cross, self._mask = cb_init(
                cfg, self.n_slots, self.cache_len, self.text_window,
                dia.compute_dtype, self._quant)
        self._lanes: list[_Lane | None] = [None] * self.n_slots
        self._q: deque = deque()
        self._cancel: dict[int, Future] = {}  # slot → future to cancel
        self._cond = threading.Condition()
        self._running = True
        self.stats = {"requests": 0, "segments": 0, "completed": 0,
                      "cancelled": 0, "max_live": 0,
                      # occupancy accounting: cb_segment computes ALL slots
                      # (static shapes), so vacant lanes are pure waste —
                      # occupied/capacity splits the preformed-batch gap into
                      # vacancy vs scheduling overhead (tools/bench_cbatch.py)
                      "lane_segments_occupied": 0, "lane_segments_capacity": 0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="dia-continuous-batcher")
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(
        self,
        text: str,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        seed: int | None = None,
        max_tokens: int | None = None,
        audio_prompt_codes: np.ndarray | None = None,
        audio_prompt_text: str | None = None,
        _stream_q: queue.Queue | None = None,
    ) -> Future:
        """Queue one request; resolves to undelayed codes [T, C] (int32).

        Seeded requests are reproducible regardless of admission order or
        lane assignment — each lane samples its own PRNG chain on its own
        local timeline."""
        if not self._running:
            raise RuntimeError("batcher is shut down")
        if audio_prompt_codes is not None and not audio_prompt_text:
            raise ValueError(
                "`audio_prompt_text` is required when `audio_prompt_codes` is provided.")
        fut: Future = Future()
        req = dict(
            text=text, cfg_scale=float(cfg_scale), temperature=float(temperature),
            top_p=float(top_p), seed=_resolve_seed(seed),
            max_tokens=min(int(max_tokens or self.max_tokens), self.max_tokens),
            audio_prompt_codes=audio_prompt_codes,
            audio_prompt_text=audio_prompt_text, future=fut, stream_q=_stream_q,
        )
        with self._cond:
            self._q.append(req)
            self.stats["requests"] += 1
            self._cond.notify_all()
        return fut

    def cancel(self, future: Future) -> bool:
        """Best-effort cancel of a ``submit``/``submit_stream`` request.

        A still-queued request is dropped immediately; an admitted lane is
        stopped (writes frozen) and freed at the next segment boundary —
        the slot becomes available for the next request instead of decoding
        to its cap for a client that left.  Returns True if the request
        will do no further device work."""
        with self._cond:
            for req in list(self._q):
                if req["future"] is future:
                    self._q.remove(req)
                    future.cancel()
                    self.stats["cancelled"] += 1
                    if req.get("stream_q") is not None:
                        req["stream_q"].put(None)
                    return True
            for i, lane in enumerate(self._lanes):
                if lane is not None and lane.future is future:
                    self._cancel[i] = future
                    self._cond.notify_all()
                    return True
        return False

    def _apply_cancels(self) -> None:
        """Free lanes whose futures were cancelled (worker thread; the
        future identity check guards against the slot having been harvested
        and reused since cancel() marked it)."""
        with self._cond:
            pending = list(self._cancel.items())
            self._cancel.clear()
        for i, fut in pending:
            lane = self._lanes[i]
            if lane is None or lane.future is not fut:
                continue  # finished (and possibly reused) before the cancel
            self._lanes[i] = None
            lane.future.cancel()
            self.stats["cancelled"] += 1
            if lane.stream_q is not None:
                lane.stream_q.put(None)
            # freeze the lane's writes until the slot is reused (tiny
            # host-side single-element update, outside any jit)
            self._state = self._state._replace(
                stop=self._state.stop.at[i].set(True))

    def submit_stream(self, text: str, **kwargs):
        """Stream one request's undelayed code chunks while it shares the
        device with the other lanes — a chunk of newly finalized frames
        arrives every ``segment_steps`` decode steps.  The concatenation of
        all chunks is bit-identical to ``submit(...).result()`` for the same
        arguments (same lane semantics, same finalization rule as
        ``DiaGenerator.generate_tokens_stream``)."""
        q: queue.Queue = queue.Queue()
        fut = self.submit(text, _stream_q=q, **kwargs)

        def _chunks():
            try:
                while True:
                    item = q.get()
                    if item is None:
                        if fut.cancelled():
                            return
                        if fut.done() and fut.exception() is not None:
                            raise fut.exception()
                        return
                    yield item
            except GeneratorExit:
                # consumer left mid-stream (e.g. HTTP client disconnected):
                # free the lane instead of decoding to the cap for nobody
                self.cancel(fut)
                raise

        return _chunks()

    def generate_stream(
        self,
        text: str,
        overlap_frames: int = 32,
        lookahead_frames: int = 32,
        audio_prompt=None,
        audio_prompt_text: str | None = None,
        **kwargs,
    ):
        """Stream audio chunks for one request of the resident batch —
        ``Dia.generate_stream`` semantics (incremental DAC decode with full
        receptive-field context; sample-exact vs the offline decode) on top
        of ``submit_stream``.  Lanes join/leave underneath; this lane's audio
        is unaffected."""
        from .api import stream_decode_wav

        prompt_codes = None
        if audio_prompt is not None:
            if isinstance(audio_prompt, (str, bytes)):
                prompt_codes = self._dia.load_audio(audio_prompt)
            else:
                prompt_codes = np.asarray(audio_prompt)
        chunks = self.submit_stream(
            text, audio_prompt_codes=prompt_codes,
            audio_prompt_text=audio_prompt_text, **kwargs)
        yield from stream_decode_wav(
            self._dia.dac_params, self._dia.dac_config, chunks,
            overlap_frames=overlap_frames, lookahead_frames=lookahead_frames)

    def generate(
        self,
        text: str,
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,  # fixed per server; kept for API compat
        audio_prompt=None,
        audio_prompt_text: str | None = None,
        seed: int | None = None,
        timeout: float = 600.0,
    ) -> np.ndarray | None:
        """Blocking waveform generate — drop-in for ``DynamicBatcher.generate``
        (serving.py) so the HTTP server can route per-request.  ``audio_prompt``
        may be a WAV path (encoded through the JAX DAC) or a [T, C] code array.

        ``cfg_filter_top_k`` is a compile-time constant of this batcher; a
        mismatching value raises rather than silently sampling differently."""
        if int(cfg_filter_top_k) != self.cfg_filter_top_k:
            raise ValueError(
                f"this batcher was compiled with cfg_filter_top_k="
                f"{self.cfg_filter_top_k}; per-request override to "
                f"{cfg_filter_top_k} is not supported")
        prompt_codes = None
        if audio_prompt is not None:
            if isinstance(audio_prompt, (str, bytes)):
                prompt_codes = self._dia.load_audio(audio_prompt)
            else:
                prompt_codes = np.asarray(audio_prompt)
        fut = self.submit(
            text, cfg_scale=cfg_scale, temperature=temperature, top_p=top_p,
            seed=seed, max_tokens=max_tokens,
            audio_prompt_codes=prompt_codes, audio_prompt_text=audio_prompt_text,
        )
        try:
            codes = fut.result(timeout)
        except TimeoutError:
            # the client gets the error either way — free the lane instead
            # of decoding to the cap for nobody
            self.cancel(fut)
            raise
        if codes.shape[0] == 0:
            return None
        return self._dia._decode_waveform(codes)

    def shutdown(self, wait: bool = True) -> None:
        with self._cond:
            self._running = False
            self._cond.notify_all()
        if wait:
            self._worker.join(timeout=60)

    # ------------------------------------------------------------------
    def _prepare_request(self, req: dict):
        """Host prep + conditioning/prefill dispatch for one request — no
        batch state touched, so it can run while a segment is in flight on
        the device (`_prep_pending`): the request's encoder + prefill
        compute lands on the device queue behind the running segment and the
        admission splice finds its rows already computed."""
        cfg = self._dia.config
        d = cfg.data
        effective_text = build_effective_text(req["text"], req["audio_prompt_text"])
        enc_input = encode_cfg_batch(effective_text, d.text_length, d.text_pad_value)
        # the batch shares ONE static cross window (compiled once at server
        # start); a longer text must be rejected loudly — slicing it to the
        # window would silently drop real conditioning
        text_len = int((np.asarray(enc_input) != d.text_pad_value).sum(axis=-1).max())
        if text_len > self.text_window:
            raise ValueError(
                f"effective text is {text_len} encoded bytes, over this "
                f"server's text window of {self.text_window}; chunk the text "
                f"or restart with a larger --cb-text-window")
        delayed, prefill_step = prepare_audio_prompt(cfg, req["audio_prompt_codes"])
        tokens_buf = np.full((d.audio_length, d.channels), -1, dtype=np.int32)
        tokens_buf[: delayed.shape[0]] = delayed
        window = None
        if prefill_step > 1:
            window = _bucket(prefill_step - 1, 128, d.audio_length)
        ss_state, ss_cross, ss_mask = prepare_stream(
            self._dia.params, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray([prefill_step, req["seed"]], jnp.int32),
            prefill_window=window, compute_dtype_name=self._dia.compute_dtype,
            cross_window=self.text_window, cache_len=self.cache_len,
            kv_quant=self._quant,
        )
        return ss_state, ss_cross, ss_mask, int(prefill_step)

    def _prep_pending(self) -> None:
        """Speculatively prepare queued requests while the just-dispatched
        segment is still executing: their prefill compute overlaps the
        segment on the device (it queues behind it), and the host work
        (tokenization, prompt transform, dispatch — tunnel round trips on a
        remote-attached TPU) overlaps it on the host.  Outstanding prepped
        requests are capped at ``n_slots`` to bound the extra device memory
        (each holds one lane's KV/cross rows).  A request whose prep fails
        resolves its future with the error and leaves the queue."""
        with self._cond:
            n_prepped = sum(1 for r in self._q if "prepped" in r)
            todo = [r for r in self._q
                    if "prepped" not in r][: max(0, self.n_slots - n_prepped)]
        for req in todo:
            try:
                req["prepped"] = self._prepare_request(req)
            except Exception as e:  # noqa: BLE001 — deliver, don't die
                with self._cond:
                    try:
                        self._q.remove(req)
                    except ValueError:
                        pass  # cancelled concurrently
                if not req["future"].cancelled():
                    req["future"].set_exception(e)
                if req.get("stream_q") is not None:
                    req["stream_q"].put(None)

    def _admit(self, slot: int, req: dict) -> None:
        """Splice one prepared request into lane ``slot`` (prefill happens in
        `_prepare_request` — already dispatched if `_prep_pending` got to
        this request while a previous segment was in flight)."""
        d = self._dia.config.data
        prepped = req.get("prepped")
        if prepped is None:
            prepped = self._prepare_request(req)
        ss_state, ss_cross, ss_mask, prefill_step = prepped
        self._state, self._cross, self._mask = swap_in(
            self._state, self._cross, self._mask, jnp.asarray(slot, jnp.int32),
            ss_state.tokens, ss_state.cache, ss_cross, ss_mask, ss_state.key,
            jnp.asarray([prefill_step, req["max_tokens"]], jnp.int32),
            jnp.asarray([req["cfg_scale"], req["temperature"], req["top_p"]],
                        jnp.float32),
            jnp.asarray(req["temperature"] == 0.0),
            max_delay=d.max_delay,
        )
        self._lanes[slot] = _Lane(req["future"], int(prefill_step), req["text"],
                                  stream_q=req.get("stream_q"))

    def _revert_prefix(self, raw: np.ndarray, n_final: int) -> np.ndarray:
        """Undelay ``raw`` rows and return the first ``n_final`` output frames
        (a frame is final once all raw rows it gathers from exist, i.e. the
        trailing ``max_delay`` rows stay pending — generate_tokens_stream's
        rule, so stream chunks concatenate to exactly the submit() result)."""
        d = self._dia.config.data
        reverted = revert_audio_delay_np(
            raw[None], d.audio_pad_value, tuple(d.delay_pattern),
            raw.shape[0])[0][: max(0, n_final)]
        return np.where((reverted < 0) | (reverted > 1023), 0, reverted)

    def _emit_streams(self, stop, dec_step, tokens, owners) -> None:
        """Push newly finalized frames to live streaming lanes (stopped lanes
        flush their tail in ``_harvest``).  ``owners`` is the (slot, lane)
        list captured when the segment was dispatched — a lane swapped out
        since (cancelled) must not consume another request's rows."""
        live = [(i, lane) for i, lane in owners
                if lane is self._lanes[i] and lane.stream_q is not None]
        if not live:
            return
        d = self._dia.config.data
        for i, lane in live:
            if bool(stop[i]):
                continue
            raw = tokens[i, lane.prefill_step: int(dec_step[i]) + 1]
            n_final = raw.shape[0] - d.max_delay
            if n_final <= lane.emitted:
                continue
            chunk = self._revert_prefix(raw, n_final)[lane.emitted:]
            lane.stream_q.put(chunk.astype(np.int32))
            lane.emitted = n_final

    def _harvest(self, stop, dec_step, tokens, owners) -> None:
        """Resolve futures for lanes that stopped during the segment whose
        results these are (``owners`` captured at dispatch — see
        ``_emit_streams``)."""
        done = [i for i, lane in enumerate(self._lanes)
                if lane is not None
                and any(i == j and lane is ln for j, ln in owners)
                and bool(stop[i])]
        if not done:
            return
        d = self._dia.config.data
        for i in done:
            lane = self._lanes[i]
            self._lanes[i] = None
            self.stats["completed"] += 1
            generated = tokens[i, lane.prefill_step: int(dec_step[i]) + 1]
            if generated.shape[0] == 0:
                codes = np.zeros((0, d.channels), np.int32)
            else:
                codes = self._revert_prefix(
                    generated, generated.shape[0] - d.max_delay).astype(np.int32)
            if lane.stream_q is not None:
                if codes.shape[0] > lane.emitted:
                    lane.stream_q.put(codes[lane.emitted:])
                lane.stream_q.put(None)  # close the chunk iterator
            lane.future.set_result(codes)

    def _mesh_scope(self):
        """The TP mesh context for the worker thread's device calls (mesh
        contexts are thread-local, so entering it at construction time would
        not cover the worker), or a no-op without a mesh."""
        import contextlib

        return self._mesh if self._mesh is not None else contextlib.nullcontext()

    def _fail_all(self, exc: BaseException) -> None:
        """Worker died (e.g. the device backend went away mid-serving):
        resolve every queued and in-flight request with the failure instead
        of leaving clients blocked on futures forever, and stop accepting."""
        with self._cond:
            self._running = False
            queued = list(self._q)
            self._q.clear()
        for req in queued:
            if not req["future"].done():
                req["future"].set_exception(exc)
            if req.get("stream_q") is not None:
                req["stream_q"].put(None)
        for i, lane in enumerate(self._lanes):
            if lane is None:
                continue
            self._lanes[i] = None
            if not lane.future.done():
                lane.future.set_exception(exc)
            if lane.stream_q is not None:
                lane.stream_q.put(None)

    def _run(self) -> None:
        try:
            self._run_loop()
        except Exception as e:  # noqa: BLE001 — deliver, don't hang clients
            self._fail_all(e)

    @staticmethod
    @jax.jit
    def _copy3(stop, dec_step, tokens):
        # device-side copies of a segment's result fields: they survive the
        # next cb_segment dispatch donating the state buffers they came from
        return jnp.copy(stop), jnp.copy(dec_step), jnp.copy(tokens)

    def _run_loop(self) -> None:
        cfg = self._dia.config
        seg = jnp.asarray(self.segment_steps, jnp.int32)
        # depth-1 segment pipeline: `pending` holds (device refs, owners) of
        # the dispatched-but-not-yet-harvested segment.  When the queue is
        # empty, the worker dispatches segment N+1 BEFORE fetching segment
        # N's results, so the per-segment device->host round trip (~25 ms on
        # the remote-attached TPU, vs ~150 ms of segment compute) overlaps
        # the next segment's execution instead of idling the device.  When
        # requests are queued (or cancels/shutdown are pending), it drains
        # synchronously so harvest->admit latency stays one segment.
        pending = None

        def fetch_and_harvest(p) -> None:
            refs, owners = p
            # ONE fetch per segment: the cost is the tunnel round trip, not
            # the bytes (tokens is N x 108 KB)
            stop, dec_step, tokens = jax.device_get(refs)
            self._emit_streams(stop, dec_step, tokens, owners)
            self._harvest(stop, dec_step, tokens, owners)

        while True:
            self._apply_cancels()
            with self._cond:
                have_work = bool(self._q) or any(
                    lane is not None for lane in self._lanes)
                if not self._running and not have_work and pending is None:
                    return
                if not have_work and pending is None:
                    self._cond.wait(timeout=0.1)
                    continue
                batch: list[tuple[int, dict]] = []
                for slot in range(self.n_slots):
                    if self._lanes[slot] is None and self._q:
                        batch.append((slot, self._q.popleft()))
            with self._mesh_scope():
                for slot, req in batch:
                    try:
                        self._admit(slot, req)
                    except Exception as e:  # noqa: BLE001 — deliver, don't die
                        req["future"].set_exception(e)
                        if req.get("stream_q") is not None:
                            req["stream_q"].put(None)
                live = sum(lane is not None for lane in self._lanes)
                self.stats["max_live"] = max(self.stats["max_live"], live)
                if live:
                    owners = [(i, lane) for i, lane in enumerate(self._lanes)
                              if lane is not None]
                    self._state = cb_segment(
                        self._dia.params, cfg, self._state, self._cross,
                        self._mask, seg, self.cfg_filter_top_k,
                        self._dia.compute_dtype)
                    self.stats["segments"] += 1
                    self.stats["lane_segments_occupied"] += live
                    self.stats["lane_segments_capacity"] += self.n_slots
                    new_pending = (self._copy3(
                        self._state.stop, self._state.dec_step,
                        self._state.tokens), owners)
                else:
                    new_pending = None
                # overlap: prep queued requests while the segment (dispatched
                # above, not yet fetched) executes on the device
                self._prep_pending()
                if pending is not None:
                    # previous segment finished before the new one started:
                    # this fetch returns in ~one round trip and overlaps the
                    # in-flight segment
                    fetch_and_harvest(pending)
                pending = new_pending
                with self._cond:
                    drain_now = (bool(self._q) or bool(self._cancel)
                                 or not self._running)
                if pending is not None and drain_now:
                    fetch_and_harvest(pending)
                    pending = None
