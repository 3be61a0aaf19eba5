"""TPU serving example: the default high-throughput configuration.

Beyond the reference's single-request script (example/simple.py), the TPU
rebuild serves batches and streams:

* ``dia.quantize_int8()`` packs the decoder weight-only int8 (the measured
  TPU default, +71% tokens/s; docs/PERF.md).  The int8 KV cache rides along
  automatically on TPU backends.
* ``generate_batch`` decodes N independent requests in one compiled loop —
  each stream's tokens are identical to its single-stream run (per-stream
  PRNG chains), aggregate throughput ~4x single-stream at batch 8.
* ``generate_stream`` yields audio chunks while decoding continues (first
  chunk in under half a second on a v5e chip).

For a full HTTP server, run ``python -m dia_tts_prune_tpu.app
--continuous-batch`` (cbatch.py): requests join a running batched decode at
segment boundaries, every lane can stream (``POST /stream`` returns a live
WAV), and seeded outputs are reproducible under any traffic.  Use
``--dynamic-batch`` (serving.py) when traffic arrives in homogeneous bursts.
"""

from dia_tts_prune_tpu import Dia

dia = Dia.from_pretrained(
    "nari-labs/Dia-1.6B",
    compute_dtype="bfloat16",
    dac_checkpoint="weights_44khz_8kbps_0.0.1.pth",
)
dia.quantize_int8()  # default TPU serving config

# batched: four scripts, one compiled loop
texts = [
    "[S1] Batched request one. [S2] Served together.",
    "[S1] Request two, a little longer than the first one. (laughs)",
    "[S1] Request three.",
    "[S2] And request four, with a different speaker tag.",
]
for i, audio in enumerate(dia.generate_batch(texts, seed=42)):
    dia.save_audio(f"batch_{i}.wav", audio)

# streaming: play audio while the rest is still decoding
chunks = []
for chunk in dia.generate_stream("[S1] Streaming means the first words play "
                                 "before the last words exist. [S2] Neat."):
    chunks.append(chunk)  # hand to an audio sink in a real app
print(f"streamed {len(chunks)} chunks")
