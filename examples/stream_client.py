"""Streaming HTTP client: consume POST /stream as the audio is generated.

Run the server first:

    python -m dia_tts_prune_tpu.app --continuous-batch --quantize-int8

Then:

    python examples/stream_client.py "[S1] The first words play before the last words exist."

The response is a live WAV (unknown-length header, read-until-close): bytes
arrive chunk-by-chunk as lanes produce them, so a player fed from this
socket starts within ~half a second while the rest is still decoding.
"""

import http.client
import json
import sys
import time


def main() -> None:
    text = sys.argv[1] if len(sys.argv) > 1 else "[S1] Hello from the stream."
    host, port = "localhost", 7860
    conn = http.client.HTTPConnection(host, port, timeout=600)
    conn.request(
        "POST", "/stream",
        body=json.dumps({"text": text, "temperature": 1.3, "seed": 42}).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    if resp.status != 200:
        raise SystemExit(f"HTTP {resp.status}: {resp.read().decode()[:200]}")

    t0 = time.perf_counter()
    total = 0
    with open("streamed.wav", "wb") as f:
        while chunk := resp.read(8192):  # or hand to an audio sink
            if total == 0:
                print(f"first audio bytes after {time.perf_counter() - t0:.2f}s")
            total += len(chunk)
            f.write(chunk)
    print(f"{total} bytes over {time.perf_counter() - t0:.2f}s → streamed.wav")


if __name__ == "__main__":
    main()
