"""End-to-end generation-loop parity vs the torch reference.

Runs the reference's *actual* ``Dia.generate`` loop (dia/model.py:631-846) on
a tiny random-weight model — with the external ``dac`` dependency stubbed and
``_generate_output`` patched to return the raw generated codes — and compares
token-for-token against our device-resident ``lax.while_loop`` under greedy
decoding.  This validates the whole per-step semantics stack: position/KV-slot
indexing, CFG combination, constraint masks, the BOS-window masked write, the
EOS delay-countdown state machine, and the near-max trigger.

(The reference loop requires Q11/Q12 patches to execute at all — see
ref_loader; and ``seed`` must be None to dodge its Q1 ``random`` NameError.)
"""

import sys
import types

import numpy as np
import pytest

from .ref_loader import REFERENCE, load_reference, reference_available, tiny_ref_config

pytestmark = pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")


def _load_reference_model_module():
    """Import dia/model.py with dac/torchaudio/soundfile stubbed."""
    import importlib.util

    load_reference()  # installs patched dia.config/state/layers/audio
    added = []
    for name in ("dac", "torchaudio", "soundfile"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            added.append(name)
    spec = importlib.util.spec_from_file_location("dia.model", REFERENCE / "dia" / "model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dia.model"] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        # drop the spec-less stubs: dia.model keeps its own references, but a
        # lingering sys.modules entry with __spec__=None breaks any later
        # importlib.util.find_spec("soundfile") (peft/transformers probe it)
        for name in added:
            del sys.modules[name]
    return mod


@pytest.fixture(scope="module")
def parity_setup():
    import torch

    cfg_mod, st, ly, au = load_reference()
    model_mod = _load_reference_model_module()

    torch.manual_seed(0)
    ref_cfg = tiny_ref_config(cfg_mod)
    dia_ref = model_mod.Dia(ref_cfg, compute_dtype="float32", device=torch.device("cpu"))
    with torch.no_grad():
        for p in dia_ref.model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    dia_ref.model.eval()
    # bypass the DAC decode: return the raw delayed codes the loop produced
    dia_ref._generate_output = lambda codes: codes.cpu().numpy()

    from dia_tts_prune_tpu.checkpoint import convert_torch_state_dict
    from dia_tts_prune_tpu.config import DiaConfig
    from dia_tts_prune_tpu.generate import DiaGenerator

    jcfg = DiaConfig.model_validate(ref_cfg.model_dump())
    params = convert_torch_state_dict(dia_ref.model.state_dict(), jcfg)
    gen = DiaGenerator(params, jcfg)
    return dia_ref, gen, jcfg


@pytest.mark.parametrize("max_tokens", [48, 96])
def test_full_loop_token_parity_greedy(parity_setup, max_tokens):
    dia_ref, gen, jcfg = parity_setup
    text = "[S1] Parity of the full generation loop. [S2] Token for token."

    ref_codes = dia_ref.generate(
        text, max_tokens=max_tokens, temperature=0.0, cfg_scale=3.0,
        cfg_filter_top_k=35, verbose=False,
    )  # delayed codes [T, C] (raw, pre-revert)
    assert ref_codes is not None and ref_codes.shape[0] > 0

    # ours, pre-revert: replicate the final slice (dia/model.py:831) on the
    # raw token buffer by asking generate_tokens for the reverted output and
    # comparing the delayed stream instead via the internal path
    from dia_tts_prune_tpu.ops.delay import revert_audio_delay_np

    ours_reverted = gen.generate_tokens(text, max_tokens=max_tokens, temperature=0.0)
    ref_reverted = revert_audio_delay_np(
        np.asarray(ref_codes)[None], jcfg.data.audio_pad_value,
        tuple(jcfg.data.delay_pattern), ref_codes.shape[0],
    )[0][: max(0, ref_codes.shape[0] - jcfg.data.max_delay)]
    ref_reverted = np.where((ref_reverted < 0) | (ref_reverted > 1023), 0, ref_reverted)

    assert ours_reverted.shape == ref_reverted.shape, (
        f"length mismatch: ours {ours_reverted.shape} vs ref {ref_reverted.shape}"
    )
    # with HIGHEST-precision fp32 contractions the whole loop is token-exact
    np.testing.assert_array_equal(ours_reverted, ref_reverted)


def test_loop_parity_first_steps_exact(parity_setup):
    """The first decode steps must match exactly (no divergence cascade yet):
    validates position/slot indexing and the BOS-window template writes."""
    dia_ref, gen, jcfg = parity_setup
    text = "[S1] Short."
    ref_codes = dia_ref.generate(text, max_tokens=24, temperature=0.0, cfg_scale=3.0,
                                 cfg_filter_top_k=35)
    from dia_tts_prune_tpu.ops.delay import revert_audio_delay_np

    ours = gen.generate_tokens(text, max_tokens=24, temperature=0.0)
    ref_rev = revert_audio_delay_np(
        np.asarray(ref_codes)[None], jcfg.data.audio_pad_value,
        tuple(jcfg.data.delay_pattern), ref_codes.shape[0],
    )[0][: max(0, ref_codes.shape[0] - jcfg.data.max_delay)]
    ref_rev = np.where((ref_rev < 0) | (ref_rev > 1023), 0, ref_rev)
    n = min(4, ours.shape[0], ref_rev.shape[0])
    np.testing.assert_array_equal(ours[:n], ref_rev[:n])
