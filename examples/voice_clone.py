"""Voice cloning example (reference analogue: example/voice_clone.py — note
the bundled reference example passes no ``audio_prompt_text`` and is rejected
by its own API, quirk Q6; this one is runnable).

Provide a 5-10s WAV of the target voice and its exact transcript; the
transcript is prepended to the generation text automatically.
"""

from dia_tts_prune_tpu import Dia

dia = Dia.from_pretrained(
    "nari-labs/Dia-1.6B",
    compute_dtype="bfloat16",
    dac_checkpoint="weights_44khz_8kbps_0.0.1.pth",
)

clone_from_audio = "example_prompt.wav"
clone_from_text = "[S1] I will use this voice for everything that follows."

text_to_generate = "[S1] Hello, this continues in the cloned voice. [S2] And a second speaker answers."

audio = dia.generate(
    text_to_generate,
    audio_prompt=clone_from_audio,
    audio_prompt_text=clone_from_text,
    seed=42,
    verbose=True,
)
dia.save_audio("voice_clone.wav", audio)
