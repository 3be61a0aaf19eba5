"""DAC JAX port tests: conv math parity vs torch ground truth, shape
contracts of the decode/encode paths, and weight-norm folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.models.dac import (
    DACConfig,
    conv1d,
    conv_transpose1d,
    decode_codes,
    encode_audio,
    init_dac_params,
    pad_audio,
    snake,
    tiny_dac_config,
)

try:
    import torch
    import torch.nn.functional as F

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False

needs_torch = pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")


@needs_torch
@pytest.mark.parametrize("stride,padding,dilation", [(1, 3, 1), (2, 1, 1), (1, 9, 3), (8, 4, 1)])
def test_conv1d_matches_torch(stride, padding, dilation):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 64)).astype(np.float32)
    w = rng.normal(size=(10, 6, 7)).astype(np.float32)
    b = rng.normal(size=(10,)).astype(np.float32)
    ref = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=padding, dilation=dilation,
    ).numpy()
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=stride, padding=padding, dilation=dilation))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@needs_torch
@pytest.mark.parametrize("stride,padding", [(2, 1), (4, 2), (8, 4)])
def test_conv_transpose1d_matches_torch(stride, padding):
    rng = np.random.default_rng(1)
    K = 2 * stride
    x = rng.normal(size=(2, 6, 32)).astype(np.float32)
    w = rng.normal(size=(6, 4, K)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=padding,
    ).numpy()
    ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                       stride=stride, padding=padding))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@needs_torch
def test_snake_matches_dac_formula():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 16)).astype(np.float32)
    alpha = rng.uniform(0.5, 2.0, size=(1, 4, 1)).astype(np.float32)
    xt = torch.from_numpy(x)
    at = torch.from_numpy(alpha)
    ref = (xt + (at + 1e-9).reciprocal() * torch.sin(at * xt).pow(2)).numpy()
    ours = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@needs_torch
def test_weight_norm_fold():
    from dia_tts_prune_tpu.models.dac import _fold_weight_norm

    torch.manual_seed(0)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(6, 10, 7))
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = _fold_weight_norm(sd, "c")
    with torch.no_grad():
        ref_w = conv.weight_g * conv.weight_v / conv.weight_v.norm(dim=(1, 2), keepdim=True)
    np.testing.assert_allclose(folded, ref_w.numpy(), rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_dac():
    cfg = tiny_dac_config()
    params = init_dac_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_decode_shape_and_range(tiny_dac):
    cfg, params = tiny_dac
    rng = np.random.default_rng(0)
    T = 12
    codes = rng.integers(0, cfg.codebook_size, (1, T, cfg.n_codebooks)).astype(np.int32)
    wav = np.asarray(decode_codes(params, cfg, jnp.asarray(codes)))
    assert wav.shape == (1, T * cfg.hop_length)
    assert np.abs(wav).max() <= 1.0  # tanh output


def test_encode_shape(tiny_dac):
    cfg, params = tiny_dac
    rng = np.random.default_rng(1)
    T = 5 * cfg.hop_length
    audio = rng.normal(size=(1, T)).astype(np.float32) * 0.1
    codes = np.asarray(encode_audio(params, cfg, jnp.asarray(audio)))
    assert codes.shape == (1, 5, cfg.n_codebooks)
    assert codes.min() >= 0 and codes.max() < cfg.codebook_size


def test_encode_decode_round_trip_runs(tiny_dac):
    cfg, params = tiny_dac
    rng = np.random.default_rng(2)
    audio = rng.normal(size=(1, 4 * cfg.hop_length)).astype(np.float32) * 0.1
    codes = encode_audio(params, cfg, jnp.asarray(audio))
    wav = np.asarray(decode_codes(params, cfg, codes))
    assert wav.shape == audio.shape
    assert np.isfinite(wav).all()


def test_pad_audio():
    x = np.zeros((1, 100), np.float32)
    out = pad_audio(x, 64)
    assert out.shape == (1, 128)
    assert pad_audio(out, 64).shape == (1, 128)


@needs_torch
def test_dac_torch_conversion_round_trip(tiny_dac):
    """Build a torch state dict in DAC naming from our params, convert back,
    verify decode outputs are identical (validates the key mapping)."""
    from dia_tts_prune_tpu.models.dac import convert_dac_torch_state_dict

    cfg, params = tiny_dac
    sd = {}

    def put_conv(prefix, p, transpose=False):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_res(prefix, p):
        sd[f"{prefix}.block.0.alpha"] = np.asarray(p["snake1"]["alpha"])
        put_conv(f"{prefix}.block.1", p["conv1"])
        sd[f"{prefix}.block.2.alpha"] = np.asarray(p["snake2"]["alpha"])
        put_conv(f"{prefix}.block.3", p["conv2"])

    enc = params["encoder"]
    put_conv("encoder.block.0", enc["stem"])
    for b, blk in enumerate(enc["blocks"]):
        p = f"encoder.block.{b + 1}"
        put_res(f"{p}.block.0", blk["res1"])
        put_res(f"{p}.block.1", blk["res2"])
        put_res(f"{p}.block.2", blk["res3"])
        sd[f"{p}.block.3.alpha"] = np.asarray(blk["snake"]["alpha"])
        put_conv(f"{p}.block.4", blk["conv"])
    n_enc = len(cfg.encoder_rates)
    sd[f"encoder.block.{n_enc + 1}.alpha"] = np.asarray(enc["snake"]["alpha"])
    put_conv(f"encoder.block.{n_enc + 2}", enc["head"])

    dec = params["decoder"]
    put_conv("decoder.model.0", dec["stem"])
    for b, blk in enumerate(dec["blocks"]):
        p = f"decoder.model.{b + 1}"
        sd[f"{p}.block.0.alpha"] = np.asarray(blk["snake"]["alpha"])
        put_conv(f"{p}.block.1", blk["conv_t"])
        put_res(f"{p}.block.2", blk["res1"])
        put_res(f"{p}.block.3", blk["res2"])
        put_res(f"{p}.block.4", blk["res3"])
    n_dec = len(cfg.decoder_rates)
    sd[f"decoder.model.{n_dec + 1}.alpha"] = np.asarray(dec["snake"]["alpha"])
    put_conv(f"decoder.model.{n_dec + 2}", dec["head"])

    for i, q in enumerate(params["quantizer"]["quantizers"]):
        p = f"quantizer.quantizers.{i}"
        put_conv(f"{p}.in_proj", q["in_proj"])
        put_conv(f"{p}.out_proj", q["out_proj"])
        sd[f"{p}.codebook.weight"] = np.asarray(q["codebook"]["embedding"])

    converted = convert_dac_torch_state_dict(sd, cfg)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, cfg.codebook_size, (1, 8, cfg.n_codebooks)).astype(np.int32)
    a = np.asarray(decode_codes(params, cfg, jnp.asarray(codes)))
    b = np.asarray(decode_codes(converted, cfg, jnp.asarray(codes)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
