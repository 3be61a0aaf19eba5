"""Dynamic batching serving layer: coalescing, correctness, error delivery."""

import threading

import jax
import numpy as np
import pytest

from dia_tts_prune_tpu import Dia, tiny_test_config
from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params
from dia_tts_prune_tpu.serving import DynamicBatcher


@pytest.fixture(scope="module")
def tiny_dia():
    dia = Dia.random_init(tiny_test_config(), seed=0)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32,
                               decoder_rates=(4, 2), n_codebooks=9,
                               codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    return dia


def test_concurrent_requests_are_coalesced_and_correct(tiny_dia):
    batcher = DynamicBatcher(tiny_dia, max_batch=8, max_wait_ms=2000.0)
    try:
        texts = [f"[S1] Request number {i} here." for i in range(4)]
        results: dict[int, np.ndarray] = {}
        errors: list[BaseException] = []
        barrier = threading.Barrier(4)

        def client(i):
            try:
                barrier.wait()
                results[i] = batcher.generate(texts[i], max_tokens=48,
                                              temperature=0.0, seed=0)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors
        assert len(results) == 4
        # the four simultaneous compatible requests shared decode loops
        assert batcher.stats["requests"] == 4
        assert batcher.stats["max_group"] >= 2
        assert batcher.stats["batches"] < 4

        # batched greedy output == the single-stream run (token parity of the
        # batched loop is verified elsewhere; this checks it end-to-end
        # through the batcher + codec)
        solo = tiny_dia.generate(texts[0], max_tokens=48, temperature=0.0, seed=0)
        np.testing.assert_array_equal(np.asarray(results[0]), np.asarray(solo))
    finally:
        batcher.shutdown()


def test_seeded_sampling_reproducible_through_batcher(tiny_dia):
    """Seeded temperature>0 requests keep single-stream reproducibility even
    when coalesced: seeds no longer split groups (they ride per-stream key
    chains inside the batched loop), and each batched result equals the same
    request's solo run (VERDICT r2 weak #4)."""
    batcher = DynamicBatcher(tiny_dia, max_batch=8, max_wait_ms=2000.0)
    try:
        texts = [f"[S1] Seeded request {i}." for i in range(3)]
        seeds = [5, 9, 5]
        results: dict[int, np.ndarray] = {}
        barrier = threading.Barrier(3)

        def client(i):
            barrier.wait()
            results[i] = batcher.generate(texts[i], max_tokens=40,
                                          temperature=1.1, seed=seeds[i])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 3
        # different seeds coalesced into one batch (seed not in the compat key)
        assert batcher.stats["max_group"] >= 2
        for i in range(3):
            solo = tiny_dia.generate(texts[i], max_tokens=40, temperature=1.1,
                                     seed=seeds[i])
            np.testing.assert_array_equal(
                np.asarray(results[i]), np.asarray(solo), err_msg=f"request {i}")
    finally:
        batcher.shutdown()


def test_incompatible_keys_run_in_separate_groups(tiny_dia):
    batcher = DynamicBatcher(tiny_dia, max_batch=8, max_wait_ms=200.0)
    try:
        out: dict[float, np.ndarray] = {}

        def client(temp):
            out[temp] = batcher.generate("[S1] Hello.", max_tokens=40,
                                         temperature=temp, seed=3)

        threads = [threading.Thread(target=client, args=(t,)) for t in (0.0, 1.3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(out) == {0.0, 1.3}
        assert all(v is not None for v in out.values())
    finally:
        batcher.shutdown()


def test_errors_are_delivered_to_the_caller(tiny_dia):
    batcher = DynamicBatcher(tiny_dia, max_batch=2, max_wait_ms=10.0)
    try:
        with pytest.raises(ValueError):
            # audio prompt without its transcript is rejected (reference rule)
            batcher.generate("[S1] Hi.", max_tokens=32, temperature=0.0,
                             audio_prompt=np.zeros((8, 9), np.int32))
    finally:
        batcher.shutdown()


def test_http_server_with_dynamic_batching(tiny_dia):
    """Two concurrent POSTs through the real HTTP server share one batch."""
    import http.client
    import json
    import threading as th

    from dia_tts_prune_tpu.app import make_server

    batcher = DynamicBatcher(tiny_dia, max_batch=4, max_wait_ms=1500.0)
    server = make_server(tiny_dia, host="127.0.0.1", port=0, batcher=batcher)
    port = server.server_address[1]
    t = th.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        bodies: dict[int, bytes] = {}
        barrier = th.Barrier(2)

        def post(i):
            barrier.wait()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            payload = json.dumps({"text": f"[S1] Stream {i}.", "max_new_tokens": 40,
                                  "temperature": 0.0, "seed": 0}).encode()
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
        assert stats["requests"] >= 2
        assert stats["max_group"] >= 2  # the two concurrent posts coalesced
    finally:
        server.shutdown()
        batcher.shutdown()


def test_serve_http_sigterm_drains_and_exits(tmp_path):
    """SIGTERM to the serving process stops accepting, drains the batcher,
    and exits 0 (container-friendly) — serve_http's signal path."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    script = tmp_path / "srv.py"
    script.write_text(
        "import jax\n"
        "from dia_tts_prune_tpu import Dia, tiny_test_config\n"
        "from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params\n"
        "from dia_tts_prune_tpu.cbatch import ContinuousBatcher\n"
        "from dia_tts_prune_tpu.app import serve_http\n"
        "dia = Dia.random_init(tiny_test_config(), seed=0)\n"
        "dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2,4),\n"
        "    decoder_dim=32, decoder_rates=(4,2), n_codebooks=9,\n"
        "    codebook_size=1024, codebook_dim=4)\n"
        "dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))\n"
        "b = ContinuousBatcher(dia, n_slots=2, segment_steps=16, max_tokens=48,\n"
        "    text_window=128)\n"
        "serve_http(dia, host='127.0.0.1', port=0, batcher=b)\n"
    )
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen([sys.executable, str(script)], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    try:
        deadline = _time.time() + 300
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(f"server died early:\n{proc.stdout.read()[-2000:]}")
            _time.sleep(1.0)
            # wait until the banner prints (server is up)
            os.set_blocking(proc.stdout.fileno(), False)
            line = proc.stdout.readline()
            os.set_blocking(proc.stdout.fileno(), True)
            if line and "Serving Dia TTS API" in line:
                break
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        assert proc.returncode == 0, out[-2000:]
        assert "drained and stopped" in out
    finally:
        if proc.poll() is None:
            proc.kill()
