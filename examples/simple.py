"""Minimal generation example (reference analogue: example/simple.py).

Loads the published checkpoint (local dir or HF Hub), generates a dialogue,
saves a WAV.  The whole decode loop is compiled — no torch.compile flag
needed, it is always on.
"""

from dia_tts_prune_tpu import Dia

dia = Dia.from_pretrained(
    "nari-labs/Dia-1.6B",
    compute_dtype="bfloat16",
    dac_checkpoint="weights_44khz_8kbps_0.0.1.pth",  # torch DAC checkpoint
)

text = "[S1] Dia is an open weights text to dialogue model. [S2] You get full control over scripts and voices. [S1] Wow. Amazing. (laughs)"

audio = dia.generate(text, seed=42, verbose=True)
dia.save_audio("simple.wav", audio)
