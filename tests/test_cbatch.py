"""Continuous batching (cbatch.py): lane-exact parity with single-stream
runs under staggered admissions, voice-clone prompts, the int8 KV cache,
queue overflow, and error delivery.

The core claim under test: a lane reproduces its single-stream run
bit-for-bit regardless of admission order, lane assignment, or what the
other lanes are doing — the reproducibility property the reference's
sequential queue gets trivially (/root/reference/app.py:221-244)."""

import time

import jax
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.cbatch import ContinuousBatcher
from dia_tts_prune_tpu.generate import DiaGenerator
from dia_tts_prune_tpu.models.dia import init_params

MT = 48


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))

    class _Dia:  # the slice of api.Dia the batcher consumes
        pass

    dia = _Dia()
    dia.config = cfg
    dia.params = params
    dia.compute_dtype = "float32"
    dia.generator = DiaGenerator(params, cfg)
    return dia


@pytest.fixture(autouse=True)
def _scan_step(monkeypatch):
    # cb_segment always decodes via decode_step_scan; pin the single-stream
    # reference runs to the same step function for bit-exact comparison
    monkeypatch.setenv("DIA_DECODE_IMPL", "scan")


def test_staggered_admission_matches_single_stream(tiny):
    """2 lanes, 4 requests (greedy + sampled mixed), late arrivals swap in
    mid-flight — every request equals its single-stream run."""
    gen = tiny.generator
    texts = ["[S1] Hello there.", "[S2] A second request.",
             "[S1] Third arrives late.", "[S1] Fourth, later still."]
    seeds = [11, 22, 33, 44]
    temps = [0.0, 1.1, 0.0, 1.1]
    refs = [gen.generate_tokens(t, max_tokens=MT, temperature=tp, top_p=0.9,
                                seed=s, cache_len=MT)
            for t, s, tp in zip(texts, seeds, temps)]

    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        futs = [cb.submit(texts[0], temperature=temps[0], top_p=0.9, seed=seeds[0]),
                cb.submit(texts[1], temperature=temps[1], top_p=0.9, seed=seeds[1])]
        time.sleep(0.3)  # let the first pair start decoding
        futs += [cb.submit(texts[2], temperature=temps[2], top_p=0.9, seed=seeds[2]),
                 cb.submit(texts[3], temperature=temps[3], top_p=0.9, seed=seeds[3])]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        cb.shutdown()
    for i, (o, r) in enumerate(zip(outs, refs)):
        np.testing.assert_array_equal(o, r, err_msg=f"request {i}")
    assert cb.stats["completed"] == 4
    assert cb.stats["max_live"] == 2


def test_admission_order_does_not_change_tokens(tiny):
    """The same seeded request returns identical tokens whether it is
    admitted first into an empty batch or last into a busy one."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        first = cb.submit("[S1] order probe", temperature=1.2, seed=9).result(600)
        fillers = [cb.submit(f"[S2] filler {i}", temperature=1.0, seed=i)
                   for i in range(3)]
        last = cb.submit("[S1] order probe", temperature=1.2, seed=9).result(600)
        for f in fillers:
            f.result(600)
    finally:
        cb.shutdown()
    np.testing.assert_array_equal(first, last)


def test_voice_clone_lane_matches_single_stream(tiny):
    """A prompted (voice-clone) request rides prepare_stream prefill into its
    lane and equals the single-stream prompted run."""
    gen = tiny.generator
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 1024, (12, 9)).astype(np.int32)
    ref = gen.generate_tokens(
        "[S2] continue the voice", max_tokens=MT, temperature=0.0, seed=1,
        audio_prompt_codes=prompt, audio_prompt_text="[S1] twelve frames",
        cache_len=MT)
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=16, max_tokens=MT,
                           text_window=128)
    try:
        out = cb.submit("[S2] continue the voice", temperature=0.0, seed=1,
                        audio_prompt_codes=prompt,
                        audio_prompt_text="[S1] twelve frames").result(600)
    finally:
        cb.shutdown()
    np.testing.assert_array_equal(out, ref)


def test_more_requests_than_slots_all_complete(tiny):
    """Queue overflow: 6 requests through 2 lanes all complete and match
    their single-stream runs (drain correctness, not just liveness)."""
    gen = tiny.generator
    texts = [f"[S1] request number {i}." for i in range(6)]
    refs = [gen.generate_tokens(t, max_tokens=MT, temperature=0.0, seed=i,
                                cache_len=MT)
            for i, t in enumerate(texts)]
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=16, max_tokens=MT,
                           text_window=128)
    try:
        futs = [cb.submit(t, temperature=0.0, seed=i)
                for i, t in enumerate(texts)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        cb.shutdown()
    for i, (o, r) in enumerate(zip(outs, refs)):
        np.testing.assert_array_equal(o, r, err_msg=f"request {i}")
    assert cb.stats["completed"] == 6


def test_kv_int8_lanes_match_single_stream(tiny, monkeypatch):
    """Packed-int8 weights + int8 KV caches through the continuous batch:
    lanes still equal their single-stream runs (same quant config)."""
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    monkeypatch.setenv("DIA_KV_INT8", "1")
    monkeypatch.delenv("DIA_DECODE_IMPL", raising=False)  # packed → scan anyway

    class _Dia:
        pass

    q = _Dia()
    q.config = tiny.config
    q.params = quantize_params_int8_packed(tiny.params)
    q.compute_dtype = "float32"
    gen = DiaGenerator(q.params, q.config)
    refs = [gen.generate_tokens("[S1] quant lane", max_tokens=MT,
                                temperature=0.0, seed=3, cache_len=MT),
            gen.generate_tokens("[S2] other quant lane", max_tokens=MT,
                                temperature=1.2, seed=4, cache_len=MT)]
    cb = ContinuousBatcher(q, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        assert cb._quant, "int8 KV cache should be active under DIA_KV_INT8=1"
        outs = [cb.submit("[S1] quant lane", temperature=0.0, seed=3).result(600),
                cb.submit("[S2] other quant lane", temperature=1.2,
                          seed=4).result(600)]
    finally:
        cb.shutdown()
    np.testing.assert_array_equal(outs[0], refs[0])
    np.testing.assert_array_equal(outs[1], refs[1])


def test_cancel_queued_and_running_requests(tiny):
    """cancel() drops a queued request immediately, frees a running lane at
    the next segment boundary, and the slot is reused by later requests."""
    from concurrent.futures import CancelledError

    cb = ContinuousBatcher(tiny, n_slots=1, segment_steps=4, max_tokens=MT,
                           text_window=128)
    try:
        running = cb.submit("[S1] long running lane", temperature=0.0, seed=1)
        queued = cb.submit("[S1] never admitted", temperature=0.0, seed=2)
        assert cb.cancel(queued), "queued request should be cancellable"
        assert queued.cancelled()
        assert cb.cancel(running), "running lane should be cancellable"
        with pytest.raises(CancelledError):
            running.result(300)
        # the freed slot serves the next request to completion
        after = cb.submit("[S1] after cancel", temperature=0.0, seed=3).result(300)
        assert after.shape[1] == 9
        assert not cb.cancel(after)  # already finished: nothing to do
    finally:
        cb.shutdown()


def test_stream_consumer_disconnect_frees_lane(tiny):
    """Closing a stream iterator mid-flight cancels its lane; the batcher
    keeps serving other requests."""
    cb = ContinuousBatcher(tiny, n_slots=1, segment_steps=4, max_tokens=MT,
                           text_window=128)
    try:
        it = cb.submit_stream("[S1] stream then vanish", temperature=0.0, seed=5)
        next(it)  # consume one chunk, then walk away
        it.close()
        # the single slot must come free for the next request
        after = cb.submit("[S1] next customer", temperature=0.0, seed=6).result(300)
        assert after.shape[1] == 9
    finally:
        cb.shutdown()


def test_text_over_window_rejected_not_truncated(tiny):
    """A text longer than the server's static cross window is rejected with
    a clear error instead of silently losing conditioning."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=64)
    try:
        long_text = "[S1] " + "word " * 40  # > 64 encoded bytes
        with pytest.raises(ValueError, match="text window"):
            cb.submit(long_text, temperature=0.0, seed=1).result(300)
        ok = cb.submit("[S1] short", temperature=0.0, seed=2).result(300)
        assert ok.shape[1] == 9  # still serving
    finally:
        cb.shutdown()


def test_prep_ahead_error_delivery(tiny):
    """A bad request queued BEHIND busy lanes (so its prep runs
    speculatively via `_prep_pending`, not at admission) resolves its own
    future with the error while the lanes keep decoding."""
    cb = ContinuousBatcher(tiny, n_slots=1, segment_steps=8, max_tokens=MT,
                           text_window=64)
    try:
        good = cb.submit("[S1] occupies the lane", temperature=0.0, seed=1)
        bad = cb.submit("[S1] " + "word " * 40,  # > 64 encoded bytes
                        temperature=0.0, seed=2)
        with pytest.raises(ValueError, match="text window"):
            bad.result(timeout=300)
        assert good.result(timeout=300).shape[1] == 9
    finally:
        cb.shutdown()
    assert cb.stats["completed"] == 1


def test_bad_request_delivers_exception_and_keeps_serving(tiny):
    """A request that fails at admission resolves ITS future with the error;
    the batcher keeps serving the rest."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=16, max_tokens=MT,
                           text_window=128)
    try:
        with pytest.raises(ValueError):
            cb.submit("[S1] x", audio_prompt_codes=np.zeros((4, 9), np.int32))
        ok = cb.submit("[S1] still serving", temperature=0.0, seed=0).result(600)
        assert ok.shape[0] > 0
    finally:
        cb.shutdown()


def test_generate_facade_waveform_matches_solo(tiny):
    """The blocking ``generate()`` facade (DynamicBatcher drop-in) produces
    the same waveform as ``Dia.generate`` end-to-end through the codec."""
    from dia_tts_prune_tpu import Dia
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    dia = Dia.random_init(tiny.config, seed=0)
    dia.params = tiny.params  # share the module fixture's weights
    dia.generator = DiaGenerator(dia.params, dia.config)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4),
                               decoder_dim=32, decoder_rates=(4, 2),
                               n_codebooks=9, codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    dia.compute_dtype = "float32"
    solo = dia.generate("[S1] end to end", max_tokens=MT, temperature=0.0, seed=2)
    cb = ContinuousBatcher(dia, n_slots=2, segment_steps=16, max_tokens=MT,
                           text_window=128)
    try:
        wav = cb.generate("[S1] end to end", max_tokens=MT, temperature=0.0,
                          seed=2)
        with pytest.raises(ValueError):
            cb.generate("[S1] x", cfg_filter_top_k=10)  # compile-time constant
    finally:
        cb.shutdown()
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(solo))


def test_stream_chunks_concatenate_to_submit_result(tiny):
    """A streaming lane's chunks concatenate bit-for-bit to the submit()
    codes, with other lanes decoding underneath, and chunks arrive
    incrementally (more than one)."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        solo = cb.submit("[S1] streaming lane", temperature=0.0, seed=7).result(300)
        chunks_iter = cb.submit_stream("[S1] streaming lane", temperature=0.0,
                                       seed=7)
        # companion request keeps the other lane busy while we stream
        companion = cb.submit("[S1] companion noise lane", temperature=1.1,
                              seed=9)
        chunks = list(chunks_iter)
        companion.result(300)
    finally:
        cb.shutdown()
    assert len(chunks) > 1, "expected incremental chunks, got one blob"
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), solo)


def test_stream_error_delivery(tiny):
    """A bad streaming request raises from the chunk iterator, not a hang."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        # fails at submit time (missing audio_prompt_text): raises directly
        with pytest.raises(ValueError):
            cb.submit_stream("[S1] bad", temperature=0.0,
                             audio_prompt_codes=np.zeros((8, 9), np.int32))
        # fails at admission time (channel-count mismatch in prefill): the
        # exception must surface from the chunk iterator, not hang the lane
        it = cb.submit_stream("[S1] bad", temperature=0.0,
                              audio_prompt_codes=np.zeros((8, 5), np.int32),
                              audio_prompt_text="[S1] prompt")
        with pytest.raises(Exception):
            list(it)
        # the batcher keeps serving after the failed admission
        ok = cb.submit("[S1] still alive", temperature=0.0, seed=1).result(300)
        assert ok.shape[1] == 9
    finally:
        cb.shutdown()


def test_generate_stream_facade_matches_offline_decode(tiny):
    """ContinuousBatcher.generate_stream audio == the offline waveform of the
    same request (sample-exact incremental DAC decode), while another lane
    runs."""
    from dia_tts_prune_tpu import Dia
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    dia = Dia.random_init(tiny.config, seed=0)
    dia.params = tiny.params
    dia.generator = DiaGenerator(dia.params, dia.config)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4),
                               decoder_dim=32, decoder_rates=(4, 2),
                               n_codebooks=9, codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    dia.compute_dtype = "float32"
    cb = ContinuousBatcher(dia, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)
    try:
        offline = cb.generate("[S1] stream me", max_tokens=MT,
                              temperature=0.0, seed=3)
        companion = cb.submit("[S1] other lane", temperature=0.0, seed=4)
        wav_chunks = list(cb.generate_stream("[S1] stream me", temperature=0.0,
                                             seed=3, max_tokens=MT))
        companion.result(300)
    finally:
        cb.shutdown()
    np.testing.assert_array_equal(np.concatenate(wav_chunks), np.asarray(offline))


def test_http_server_with_continuous_batching(tiny):
    """Two concurrent POSTs through the real HTTP server ride resident lanes
    of one ContinuousBatcher (the `app.py --continuous-batch` wiring)."""
    import http.client
    import json
    import threading as th

    from dia_tts_prune_tpu import Dia
    from dia_tts_prune_tpu.app import make_server
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    dia = Dia.random_init(tiny.config, seed=0)
    dia.params = tiny.params
    dia.generator = DiaGenerator(dia.params, dia.config)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4),
                               decoder_dim=32, decoder_rates=(4, 2),
                               n_codebooks=9, codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    dia.compute_dtype = "float32"
    batcher = ContinuousBatcher(dia, n_slots=2, segment_steps=16,
                                max_tokens=MT, text_window=128)
    server = make_server(dia, host="127.0.0.1", port=0, batcher=batcher)
    port = server.server_address[1]
    t = th.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        bodies: dict[int, bytes] = {}
        barrier = th.Barrier(2)

        def post(i):
            barrier.wait()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            payload = json.dumps({"text": f"[S1] Lane {i}.", "max_new_tokens": MT,
                                  "temperature": 0.0, "seed": i}).encode()
            conn.request("POST", "/generate", body=payload,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:200]
            bodies[i] = resp.read()
            conn.close()

        threads = [th.Thread(target=post, args=(i,)) for i in range(2)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=600)
        assert len(bodies) == 2
        assert all(b[:4] == b"RIFF" for b in bodies.values())

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        conn.close()
        assert stats["requests"] >= 2 and stats["completed"] >= 2
    finally:
        server.shutdown()
        batcher.shutdown()


def test_http_stream_endpoint_matches_offline(tiny):
    """POST /stream returns a live WAV whose PCM equals the offline result."""
    import http.client
    import json
    import threading as th

    from dia_tts_prune_tpu import Dia
    from dia_tts_prune_tpu.app import make_server
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    dia = Dia.random_init(tiny.config, seed=0)
    dia.params = tiny.params
    dia.generator = DiaGenerator(dia.params, dia.config)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4),
                               decoder_dim=32, decoder_rates=(4, 2),
                               n_codebooks=9, codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    dia.compute_dtype = "float32"
    batcher = ContinuousBatcher(dia, n_slots=2, segment_steps=16,
                                max_tokens=MT, text_window=128)
    server = make_server(dia, host="127.0.0.1", port=0, batcher=batcher)
    port = server.server_address[1]
    th.Thread(target=server.serve_forever, daemon=True).start()
    try:
        offline = batcher.generate("[S1] live stream", max_tokens=MT,
                                   temperature=0.0, seed=5)
        expected = (np.clip(offline, -1, 1) * 32767).astype(np.int16)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        payload = json.dumps({"text": "[S1] live stream", "max_new_tokens": MT,
                              "temperature": 0.0, "seed": 5}).encode()
        conn.request("POST", "/stream", body=payload,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        body = resp.read()  # read-until-close (no Content-Length)
        conn.close()
        assert body[:4] == b"RIFF" and len(body) > 44
        pcm = np.frombuffer(body[44:], np.int16)
        np.testing.assert_array_equal(pcm, expected)

        # invalid request still gets a JSON error status, not a broken stream
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/stream", body=json.dumps(
            {"text": "[S1] x", "audio_prompt_text": None,
             "audio_prompt": "/nonexistent.wav"}).encode())
        resp = conn.getresponse()
        assert resp.status in (400, 500)
        conn.close()
    finally:
        server.shutdown()
        batcher.shutdown()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_tensor_parallel_lanes_match_single_device():
    """Continuous batching on a (2,4) TP mesh: staggered lane tokens equal
    the unsharded batcher's, per request."""
    from dia_tts_prune_tpu.config import (
        DataConfig, DecoderConfig, DiaConfig, EncoderConfig, ModelConfig,
    )
    from dia_tts_prune_tpu.models.dia import init_params as _init
    from dia_tts_prune_tpu.parallel.sharding import make_mesh, shard_params

    cfg = DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=2, n_embd=64, n_hidden=256,
                                  n_head=8, head_dim=16),
            decoder=DecoderConfig(
                n_layer=2, n_embd=64, n_hidden=256, gqa_query_heads=8,
                kv_heads=4, gqa_head_dim=16, cross_query_heads=8,
                cross_head_dim=16,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
        ),
        data=DataConfig(text_length=128, audio_length=128),
    )
    params = _init(cfg, jax.random.PRNGKey(1))

    class _Dia:
        pass

    def run(p, mesh=None):
        dia = _Dia()
        dia.config = cfg
        dia.params = p
        dia.compute_dtype = "float32"
        cb = ContinuousBatcher(dia, n_slots=2, segment_steps=8,
                               max_tokens=MT, text_window=128, mesh=mesh)
        try:
            f0 = cb.submit("[S1] tp lane zero", temperature=0.0, seed=11)
            time.sleep(0.02)
            f1 = cb.submit("[S1] tp lane one differs", temperature=1.2, seed=12)
            return f0.result(600), f1.result(600)
        finally:
            cb.shutdown()

    ref0, ref1 = run(params)
    mesh = make_mesh(data=2, model=4)  # kv heads (4) → v5e-4 TP plan
    sp = shard_params(params, mesh, config=cfg)
    out0, out1 = run(sp, mesh=mesh)
    np.testing.assert_array_equal(out0, ref0)
    np.testing.assert_array_equal(out1, ref1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_cb_segment_cache_sharded_in_compiled_hlo():
    """Post-SPMD HLO evidence for the continuous-batch segment on a (2,4)
    mesh: the lane KV cache appears only at per-shard head shape inside the
    while-loop carry, and no collective ever materializes the full cache —
    the same contract test_sharding proves for generate_fused."""
    import jax.numpy as jnp

    from dia_tts_prune_tpu.cbatch import cb_init, cb_segment
    from dia_tts_prune_tpu.config import (
        DataConfig, DecoderConfig, DiaConfig, EncoderConfig, ModelConfig,
    )
    from dia_tts_prune_tpu.models.dia import init_params as _init
    from dia_tts_prune_tpu.parallel.sharding import make_mesh, shard_params

    cfg = DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=2, n_embd=64, n_hidden=256,
                                  n_head=8, head_dim=16),
            decoder=DecoderConfig(
                n_layer=2, n_embd=64, n_hidden=256, gqa_query_heads=8,
                kv_heads=4, gqa_head_dim=16, cross_query_heads=8,
                cross_head_dim=16,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
        ),
        data=DataConfig(text_length=128, audio_length=128),
    )
    params = _init(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    with mesh:
        state, cross, mask = cb_init(cfg, 2, 128, 128, "float32", False)
        lowered = cb_segment.lower(
            sp, cfg, state, cross, mask, jnp.asarray(8, jnp.int32),
            35, "float32")
        hlo = lowered.compile().as_text()

    L, N2, T = 2, 4, 128  # 2 lanes → 2N=4 cache rows
    kvh, hd = cfg.model.decoder.kv_heads, cfg.model.decoder.gqa_head_dim
    shard_shape = f"f32[{L},{N2},{T},{kvh // 4},{hd}]"
    full_shape = f"f32[{L},{N2},{T},{kvh},{hd}]"
    assert shard_shape in hlo, f"per-shard cache {shard_shape} not in HLO"
    assert full_shape not in hlo, "full-size (replicated) lane cache in HLO"
    assert hlo.count("all-reduce") > 0, "TP psum all-reduces missing"
    for op in ("all-gather", "all-reduce", "collective-permute"):
        for line in hlo.splitlines():
            if f" {op}(" in line or line.lstrip().startswith(op):
                assert full_shape not in line, f"{op} moves the full cache"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_tensor_parallel_quant_kv_lanes_match_single_device(monkeypatch):
    """The TPU serving default stack end-to-end sharded: packed-int8 weights
    + int8 KV caches + continuous batching on a (2,4) mesh, token-exact vs
    the unsharded quant batcher."""
    from dia_tts_prune_tpu.config import (
        DataConfig, DecoderConfig, DiaConfig, EncoderConfig, ModelConfig,
    )
    from dia_tts_prune_tpu.models.dia import init_params as _init
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed
    from dia_tts_prune_tpu.parallel.sharding import make_mesh, shard_params

    monkeypatch.setenv("DIA_KV_INT8", "1")
    cfg = DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=2, n_embd=64, n_hidden=256,
                                  n_head=8, head_dim=16),
            decoder=DecoderConfig(
                n_layer=2, n_embd=64, n_hidden=256, gqa_query_heads=8,
                kv_heads=4, gqa_head_dim=16, cross_query_heads=8,
                cross_head_dim=16,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
        ),
        data=DataConfig(text_length=128, audio_length=128),
    )
    params = _init(cfg, jax.random.PRNGKey(1))

    class _Dia:
        pass

    def run(p, mesh=None):
        dia = _Dia()
        dia.config = cfg
        dia.params = p
        dia.compute_dtype = "float32"
        cb = ContinuousBatcher(dia, n_slots=2, segment_steps=8,
                               max_tokens=MT, text_window=128, mesh=mesh)
        try:
            assert cb._quant
            f0 = cb.submit("[S1] tp quant zero", temperature=0.0, seed=21)
            f1 = cb.submit("[S1] tp quant one", temperature=1.2, seed=22)
            return f0.result(600), f1.result(600)
        finally:
            cb.shutdown()

    ref = run(quantize_params_int8_packed(params, fused=False))
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    with mesh:  # quantize sharded arrays → sharded packed kernels
        sp_packed = quantize_params_int8_packed(sp, fused=False)
    out = run(sp_packed, mesh=mesh)
    np.testing.assert_array_equal(out[0], ref[0])
    np.testing.assert_array_equal(out[1], ref[1])


def test_worker_failure_fails_futures_instead_of_hanging(tiny, monkeypatch):
    """If the device backend dies mid-serving (segment dispatch raises), all
    pending futures resolve with the failure and the batcher stops accepting
    — no client blocks forever on a dead worker."""
    import dia_tts_prune_tpu.cbatch as cbatch_mod

    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=8, max_tokens=MT,
                           text_window=128)

    def boom(*a, **k):
        raise RuntimeError("backend went away")

    monkeypatch.setattr(cbatch_mod, "cb_segment", boom)
    f1 = cb.submit("[S1] doomed", temperature=0.0, seed=1)
    it = cb.submit_stream("[S1] doomed stream", temperature=0.0, seed=2)
    with pytest.raises(RuntimeError, match="backend went away"):
        f1.result(120)
    with pytest.raises(RuntimeError, match="backend went away"):
        list(it)
    with pytest.raises(RuntimeError):  # shut down: no new work accepted
        cb.submit("[S1] after death")


def test_shutdown_drains_queue(tiny):
    """shutdown(wait=True) finishes queued work before returning."""
    cb = ContinuousBatcher(tiny, n_slots=2, segment_steps=16, max_tokens=MT,
                           text_window=128)
    futs = [cb.submit(f"[S1] drain {i}", temperature=0.0, seed=i)
            for i in range(3)]
    cb.shutdown(wait=True)
    for f in futs:
        assert f.result(timeout=1).shape[1] == 9
