"""dia_tts_prune_tpu — TPU-native Dia dialogue-TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
babybirdprd/dia-tts-prune (1.6B text→dialogue-speech with pruning, LoRA
fine-tuning, voice cloning, and serving), designed TPU-first: device-resident
autoregressive decoding, scan-over-layers transformer stacks, mesh-sharded
multi-chip execution, and Pallas kernels on the hot paths.
"""

from .config import DataConfig, DecoderConfig, DiaConfig, EncoderConfig, ModelConfig, dia_1_6b_config, tiny_test_config

__version__ = "0.1.0"

__all__ = [
    "DiaConfig",
    "DataConfig",
    "ModelConfig",
    "EncoderConfig",
    "DecoderConfig",
    "dia_1_6b_config",
    "tiny_test_config",
    "Dia",
]


def __getattr__(name):
    # Lazy import: keep `import dia_tts_prune_tpu` light (no jax at import time
    # for config-only consumers).
    if name == "Dia":
        from .api import Dia

        return Dia
    raise AttributeError(name)
