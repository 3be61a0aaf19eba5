"""Load the torch reference modules for parity testing.

The reference package's __init__ imports `dac` (not installed), so we load
dia/config.py, dia/state.py, dia/layers.py and dia/audio.py directly.  The
reference's RotaryEmbedding.forward crashes on 4-D inputs as written (missing
head-axis broadcast — quirk Q11, /root/reference/dia/layers.py:135-173); we
patch in the minimal fix (sin/cos get a head axis) so the *intended* reference
semantics can execute.  Parity is asserted against this patched reference.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return (REFERENCE / "dia" / "layers.py").exists()


_cache = {}


def load_reference():
    """Returns (config_mod, state_mod, layers_mod, audio_mod) with Q11 patched."""
    if _cache:
        return _cache["mods"]
    import torch

    pkg = type(sys)("dia_ref")
    pkg.__path__ = [str(REFERENCE / "dia")]
    sys.modules.setdefault("dia", pkg)

    def load(name, fname):
        spec = importlib.util.spec_from_file_location(name, REFERENCE / "dia" / fname)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    cfg = load("dia.config", "config.py")
    st = load("dia.state", "state.py")
    ly = load("dia.layers", "layers.py")
    au = load("dia.audio", "audio.py")

    # --- Q11 patch: broadcast sin/cos over the head axis ------------------
    def rope_forward(self, inputs, position):
        # inputs [B, T, N, H]; position [B, T]
        pos = position.unsqueeze(-1).unsqueeze(-1).to(torch.float32)  # [B,T,1,1]
        freqs = pos * self.inv_freq.to(torch.float32)  # [B,T,1,H/2]
        sin, cos = torch.sin(freqs), torch.cos(freqs)
        x1, x2 = torch.chunk(inputs.to(torch.float32), 2, dim=-1)
        out = torch.cat((x1 * cos - x2 * sin, x1 * sin + x2 * cos), dim=-1)
        return out.to(self.compute_dtype)

    ly.RotaryEmbedding.forward = rope_forward

    # --- Q12 patch: KVCache.prefill returns None but Attention.forward
    # unpacks it (dia/state.py:105-109 vs dia/layers.py:297) — the reference
    # decoder prefill/training path crashes as written.  Return the written
    # prefix, mirroring KVCache.update's contract.
    def kv_prefill(self, k, v):
        prefill_len = k.shape[2]
        self.k[:, :, :prefill_len, :] = k
        self.v[:, :, :prefill_len, :] = v
        self.current_idx = prefill_len - 1
        return self.k[:, :, :prefill_len, :], self.v[:, :, :prefill_len, :]

    st.KVCache.prefill = kv_prefill

    # --- Q13 patch: the generation loop crashes at its first step —
    # dia/model.py:759 does get_tokens_at(t-1) [1, C] → unsqueeze ×2 →
    # [1,1,1,C] → expand(2, 1, -1), a rank mismatch.  Make the single-step
    # read return [C] so the loop's expand produces the intended [2, 1, C]
    # (the two-arg prefill read keeps its [T, C] shape).
    _orig_get = st.DecoderOutput.get_tokens_at

    def get_tokens_at(self, step_from, step_to=None):
        if step_to is None:
            return self.generated_tokens[step_from, :]
        return _orig_get(self, step_from, step_to)

    st.DecoderOutput.get_tokens_at = get_tokens_at

    _cache["mods"] = (cfg, st, ly, au)
    return _cache["mods"]


def tiny_ref_config(cfg_mod, channels=9, delay=(0, 1, 2, 3, 4, 5, 6, 7, 8)):
    return cfg_mod.DiaConfig(
        model=cfg_mod.ModelConfig(
            encoder=cfg_mod.EncoderConfig(n_layer=2, n_embd=64, n_hidden=128, n_head=4, head_dim=16),
            decoder=cfg_mod.DecoderConfig(
                n_layer=2, n_embd=64, n_hidden=128, gqa_query_heads=4, kv_heads=2,
                gqa_head_dim=16, cross_query_heads=4, cross_head_dim=16,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
        ),
        data=cfg_mod.DataConfig(
            text_length=128, audio_length=128, channels=channels, delay_pattern=list(delay)
        ),
    )
