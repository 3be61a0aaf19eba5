"""Descript Audio Codec (DAC) — JAX port of the 44.1 kHz model's inference
paths, so generated audio stays on-device until ``save_audio``.

The reference treats DAC as an external torch/CUDA dependency
(dia/model.py:238-252 load, :546-576 encode, dia/audio.py:166-185 decode;
package ``descript-audio-codec``).  This module reimplements, TPU-native:

* **RVQ ``from_codes``**: per-codebook embedding lookup + 1×1 out-projection,
  summed over the 9 codebooks → latent ``z_q``.
* **Decoder**: Conv1d stem → 4 upsampling blocks {Snake → ConvTranspose1d →
  3 dilated ResidualUnits} → Snake → Conv1d → tanh.  Upsample rates
  [8, 8, 4, 2] (512× hop → ≈86.13 frames/s at 44.1 kHz).
* **Encoder + RVQ encode** (for voice-cloning prompts): Conv1d stem → 4
  strided blocks {3 ResidualUnits → Snake → strided Conv1d} → Snake → Conv1d,
  then residual VQ with L2-normalized nearest-neighbor lookup.

Weight-normalized torch convs are folded to effective dense kernels at
conversion time (inference never needs the g/v factorization).  Internally
arrays are [B, C, T] to mirror torch conv semantics exactly; tests validate
conv/transposed-conv math against ``torch.nn.functional`` ground truth.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

DEFAULT_SAMPLE_RATE = 44100


@dataclass(frozen=True)
class DACConfig:
    """Architecture of the published 44.1 kHz DAC model."""

    encoder_dim: int = 64
    encoder_rates: tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sample_rate: int = DEFAULT_SAMPLE_RATE

    @property
    def latent_dim(self) -> int:
        return self.encoder_dim * (2 ** len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


def tiny_dac_config() -> DACConfig:
    """Small config for CPU tests."""
    return DACConfig(
        encoder_dim=8,
        encoder_rates=(2, 4),
        decoder_dim=32,
        decoder_rates=(4, 2),
        n_codebooks=3,
        codebook_size=32,
        codebook_dim=4,
        sample_rate=44100,
    )


# ---------------------------------------------------------------------------
# Conv primitives (torch-semantics, [B, C, T] layout)
# ---------------------------------------------------------------------------

_DN = ("NCH", "OIH", "NCH")


def _conv_prec(x: jax.Array):
    """fp32 convs run at HIGHEST precision (JAX's default is reduced-precision
    passes — observed ~1e-2 relative error vs torch); bf16 uses the default."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None, stride: int = 1,
           padding: int = 0, dilation: int = 1) -> jax.Array:
    """torch.nn.functional.conv1d equivalent. w: [O, I, K]."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((padding, padding),),
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        preferred_element_type=x.dtype, precision=_conv_prec(x),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array | None,
                     stride: int, padding: int, output_padding: int = 0) -> jax.Array:
    """torch.nn.functional.conv_transpose1d equivalent. w: [I, O, K].

    Implemented as an input-dilated convolution with the flipped kernel:
    out_len = (in-1)*stride - 2*padding + K + output_padding.
    """
    K = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [O, I, K]
    pad_lo = K - 1 - padding
    pad_hi = K - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1,), padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,), dimension_numbers=_DN,
        preferred_element_type=x.dtype, precision=_conv_prec(x),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation: x + sin²(αx)/α, α per-channel [1, C, 1] (DAC layers)."""
    a = alpha.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return (x32 + jnp.sin(a * x32) ** 2 / (a + 1e-9)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Parameter initialization (random — real use converts torch DAC weights)
# ---------------------------------------------------------------------------


def _conv_p(key, o, i, k):
    fan_in = i * k
    w = jax.random.normal(key, (o, i, k), jnp.float32) / math.sqrt(fan_in)
    return {"weight": w, "bias": jnp.zeros((o,), jnp.float32)}


def _convT_p(key, i, o, k):
    fan_in = i * k
    w = jax.random.normal(key, (i, o, k), jnp.float32) / math.sqrt(fan_in)
    return {"weight": w, "bias": jnp.zeros((o,), jnp.float32)}


def _res_unit_p(key, dim, k=7):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": {"alpha": jnp.ones((1, dim, 1), jnp.float32)},
        "conv1": _conv_p(k1, dim, dim, k),
        "snake2": {"alpha": jnp.ones((1, dim, 1), jnp.float32)},
        "conv2": _conv_p(k2, dim, dim, 1),
    }


def init_dac_params(config: DACConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 256))
    d = config.encoder_dim
    enc_blocks = []
    for stride in config.encoder_rates:
        d *= 2
        enc_blocks.append({
            "res1": _res_unit_p(next(keys), d // 2),
            "res2": _res_unit_p(next(keys), d // 2),
            "res3": _res_unit_p(next(keys), d // 2),
            "snake": {"alpha": jnp.ones((1, d // 2, 1), jnp.float32)},
            "conv": _conv_p(next(keys), d, d // 2, 2 * stride),
        })
    encoder = {
        "stem": _conv_p(next(keys), config.encoder_dim, 1, 7),
        "blocks": enc_blocks,
        "snake": {"alpha": jnp.ones((1, d, 1), jnp.float32)},
        "head": _conv_p(next(keys), config.latent_dim, d, 3),
    }

    dd = config.decoder_dim
    dec_blocks = []
    for i, stride in enumerate(config.decoder_rates):
        in_d, out_d = dd // (2**i), dd // (2 ** (i + 1))
        dec_blocks.append({
            "snake": {"alpha": jnp.ones((1, in_d, 1), jnp.float32)},
            "conv_t": _convT_p(next(keys), in_d, out_d, 2 * stride),
            "res1": _res_unit_p(next(keys), out_d),
            "res2": _res_unit_p(next(keys), out_d),
            "res3": _res_unit_p(next(keys), out_d),
        })
    final_d = dd // (2 ** len(config.decoder_rates))
    decoder = {
        "stem": _conv_p(next(keys), dd, config.latent_dim, 7),
        "blocks": dec_blocks,
        "snake": {"alpha": jnp.ones((1, final_d, 1), jnp.float32)},
        "head": _conv_p(next(keys), 1, final_d, 7),
    }

    quantizers = []
    for _ in range(config.n_codebooks):
        quantizers.append({
            "in_proj": _conv_p(next(keys), config.codebook_dim, config.latent_dim, 1),
            "out_proj": _conv_p(next(keys), config.latent_dim, config.codebook_dim, 1),
            "codebook": {
                "embedding": jax.random.normal(
                    next(keys), (config.codebook_size, config.codebook_dim), jnp.float32
                )
            },
        })
    return {"encoder": encoder, "decoder": decoder, "quantizer": {"quantizers": quantizers}}


# ---------------------------------------------------------------------------
# Forward paths
# ---------------------------------------------------------------------------


def _res_unit(p: Params, x: jax.Array, dilation: int) -> jax.Array:
    """DAC ResidualUnit: Snake → dilated k7 conv → Snake → 1×1 conv + skip."""
    pad = ((7 - 1) * dilation) // 2
    y = snake(x, p["snake1"]["alpha"])
    y = conv1d(y, p["conv1"]["weight"], p["conv1"]["bias"], padding=pad, dilation=dilation)
    y = snake(y, p["snake2"]["alpha"])
    y = conv1d(y, p["conv2"]["weight"], p["conv2"]["bias"])
    return x + y


def rvq_from_codes(params: Params, config: DACConfig, codes_BxNxT: jax.Array) -> jax.Array:
    """codes [B, N, T] → latent z_q [B, latent_dim, T] (RVQ decode path)."""
    qs = params["quantizer"]["quantizers"]

    def one(q, codes_BxT):
        z_p = q["codebook"]["embedding"][codes_BxT]  # [B, T, cb_dim]
        z_p = z_p.transpose(0, 2, 1)  # [B, cb_dim, T]
        return conv1d(z_p, q["out_proj"]["weight"], q["out_proj"]["bias"])

    z_q = None
    for i in range(config.n_codebooks):
        zi = one(qs[i], codes_BxNxT[:, i])
        z_q = zi if z_q is None else z_q + zi
    return z_q


def dac_decode_latent(params: Params, config: DACConfig, z: jax.Array) -> jax.Array:
    """Latent [B, latent_dim, T] → waveform [B, 1, T*hop]."""
    p = params["decoder"]
    x = conv1d(z, p["stem"]["weight"], p["stem"]["bias"], padding=3)
    for block, stride in zip(p["blocks"], config.decoder_rates):
        x = snake(x, block["snake"]["alpha"])
        x = conv_transpose1d(
            x, block["conv_t"]["weight"], block["conv_t"]["bias"],
            stride=stride, padding=math.ceil(stride / 2),
        )
        x = _res_unit(block["res1"], x, 1)
        x = _res_unit(block["res2"], x, 3)
        x = _res_unit(block["res3"], x, 9)
    x = snake(x, p["snake"]["alpha"])
    x = conv1d(x, p["head"]["weight"], p["head"]["bias"], padding=3)
    return jnp.tanh(x)


@partial(jax.jit, static_argnames=("config",))
def decode_codes(params: Params, config: DACConfig, codes_BxTxC: jax.Array) -> jax.Array:
    """Codec tokens [B, T, C] → waveform [B, T*hop] — the full decode path the
    reference runs through torch DAC (dia/audio.py:166-185)."""
    codes = jnp.transpose(codes_BxTxC, (0, 2, 1))  # [B, C(N), T]
    z = rvq_from_codes(params, config, codes)
    wav = dac_decode_latent(params, config, z)
    return wav[:, 0, :]


def dac_encode_latent(params: Params, config: DACConfig, audio: jax.Array) -> jax.Array:
    """Waveform [B, 1, T] → continuous latent [B, latent_dim, T/hop]."""
    p = params["encoder"]
    x = conv1d(audio, p["stem"]["weight"], p["stem"]["bias"], padding=3)
    d = config.encoder_dim
    for block, stride in zip(p["blocks"], config.encoder_rates):
        d *= 2
        x = _res_unit(block["res1"], x, 1)
        x = _res_unit(block["res2"], x, 3)
        x = _res_unit(block["res3"], x, 9)
        x = snake(x, block["snake"]["alpha"])
        x = conv1d(
            x, block["conv"]["weight"], block["conv"]["bias"],
            stride=stride, padding=math.ceil(stride / 2),
        )
    x = snake(x, p["snake"]["alpha"])
    return conv1d(x, p["head"]["weight"], p["head"]["bias"], padding=1)


def _nearest_code(codebook_VxD: jax.Array, z_e_BxDxT: jax.Array) -> jax.Array:
    """L2-normalized nearest-neighbor lookup (DAC decode_latents semantics)."""
    enc = z_e_BxDxT.transpose(0, 2, 1)  # [B, T, D]
    enc_n = enc / jnp.maximum(jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12)
    cb_n = codebook_VxD / jnp.maximum(
        jnp.linalg.norm(codebook_VxD, axis=-1, keepdims=True), 1e-12
    )
    # argmin ||e - c||² over normalized vectors == argmax cosine similarity
    sim = jnp.einsum("btd,vd->btv", enc_n, cb_n)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)  # [B, T]


@partial(jax.jit, static_argnames=("config",))
def encode_audio(params: Params, config: DACConfig, audio_BxT: jax.Array) -> jax.Array:
    """Waveform [B, T] → codec tokens [B, T/hop, C] (DAC encode + RVQ).

    Replaces the reference's ``dac.encode`` voice-cloning path
    (dia/model.py:546-576).  The caller is responsible for padding T to a
    multiple of ``config.hop_length`` (see ``pad_audio``).
    """
    z = dac_encode_latent(params, config, audio_BxT[:, None, :])
    qs = params["quantizer"]["quantizers"]
    residual = z
    codes = []
    for i in range(config.n_codebooks):
        q = qs[i]
        z_e = conv1d(residual, q["in_proj"]["weight"], q["in_proj"]["bias"])
        idx = _nearest_code(q["codebook"]["embedding"], z_e)  # [B, T]
        z_p = q["codebook"]["embedding"][idx].transpose(0, 2, 1)  # [B, D, T]
        z_q = conv1d(z_p, q["out_proj"]["weight"], q["out_proj"]["bias"])
        residual = residual - z_q
        codes.append(idx)
    return jnp.stack(codes, axis=-1)  # [B, T, C]


def pad_audio(audio: np.ndarray, hop_length: int) -> np.ndarray:
    """Right-pad to a hop multiple (DAC preprocess semantics)."""
    T = audio.shape[-1]
    target = -(-T // hop_length) * hop_length
    pad = target - T
    if pad == 0:
        return audio
    width = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
    return np.pad(audio, width)


# ---------------------------------------------------------------------------
# torch DAC checkpoint conversion
# ---------------------------------------------------------------------------


def _fold_weight_norm(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold torch weight_norm (weight_g, weight_v) into an effective kernel.

    torch computes W = g * v / ||v|| with the norm over all dims except 0.
    """
    g = np.asarray(sd[f"{prefix}.weight_g"])
    v = np.asarray(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def _conv_from_sd(sd, prefix):
    if f"{prefix}.weight_g" in sd:
        w = _fold_weight_norm(sd, prefix)
    else:
        w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    out = {"weight": jnp.asarray(w)}
    bias_key = f"{prefix}.bias"
    if bias_key not in sd:
        # every conv in the published DAC checkpoints carries a bias; the
        # output-channel axis differs between Conv1d and ConvTranspose1d so a
        # zero fallback cannot be shaped reliably from the kernel alone
        raise KeyError(f"Missing DAC checkpoint key: {bias_key}")
    out["bias"] = jnp.asarray(np.asarray(sd[bias_key], dtype=np.float32))
    return out


def _alpha_from_sd(sd, prefix):
    return {"alpha": jnp.asarray(np.asarray(sd[f"{prefix}.alpha"], dtype=np.float32))}


def _res_from_sd(sd, prefix):
    return {
        "snake1": _alpha_from_sd(sd, f"{prefix}.block.0"),
        "conv1": _conv_from_sd(sd, f"{prefix}.block.1"),
        "snake2": _alpha_from_sd(sd, f"{prefix}.block.2"),
        "conv2": _conv_from_sd(sd, f"{prefix}.block.3"),
    }


def to_dac_torch_state_dict(params: Params, config: DACConfig) -> dict[str, np.ndarray]:
    """Inverse of ``convert_dac_torch_state_dict``: export this module's params
    in the descript-audio-codec checkpoint naming (plain weights, no weight
    norm).  Used for interop tests and shipping converted codecs."""
    sd: dict[str, np.ndarray] = {}

    def put_conv(prefix, p):
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
        pre = f"encoder.block.{b + 1}"
        put_res(f"{pre}.block.0", blk["res1"])
        put_res(f"{pre}.block.1", blk["res2"])
        put_res(f"{pre}.block.2", blk["res3"])
        sd[f"{pre}.block.3.alpha"] = np.asarray(blk["snake"]["alpha"])
        put_conv(f"{pre}.block.4", blk["conv"])
    n_enc = len(config.encoder_rates)
    sd[f"encoder.block.{n_enc + 1}.alpha"] = np.asarray(enc["snake"]["alpha"])
    put_conv(f"encoder.block.{n_enc + 2}", enc["head"])

    dec = params["decoder"]
    put_conv("decoder.model.0", dec["stem"])
    for b, blk in enumerate(dec["blocks"]):
        pre = f"decoder.model.{b + 1}"
        sd[f"{pre}.block.0.alpha"] = np.asarray(blk["snake"]["alpha"])
        put_conv(f"{pre}.block.1", blk["conv_t"])
        put_res(f"{pre}.block.2", blk["res1"])
        put_res(f"{pre}.block.3", blk["res2"])
        put_res(f"{pre}.block.4", blk["res3"])
    n_dec = len(config.decoder_rates)
    sd[f"decoder.model.{n_dec + 1}.alpha"] = np.asarray(dec["snake"]["alpha"])
    put_conv(f"decoder.model.{n_dec + 2}", dec["head"])

    for i, q in enumerate(params["quantizer"]["quantizers"]):
        pre = f"quantizer.quantizers.{i}"
        put_conv(f"{pre}.in_proj", q["in_proj"])
        put_conv(f"{pre}.out_proj", q["out_proj"])
        sd[f"{pre}.codebook.weight"] = np.asarray(q["codebook"]["embedding"])
    return sd


def convert_dac_torch_state_dict(state_dict: Mapping[str, Any], config: DACConfig) -> Params:
    """Convert the published torch DAC checkpoint (descript-audio-codec weight
    naming: encoder.block.{i}, decoder.model.{i}, quantizer.quantizers.{i})
    into this module's param tree, folding weight norm."""
    sd = {}
    for k, v in state_dict.items():
        try:
            sd[k] = v.detach().cpu().numpy()
        except AttributeError:
            sd[k] = np.asarray(v)

    n_enc = len(config.encoder_rates)
    enc_blocks = []
    for b in range(n_enc):
        p = f"encoder.block.{b + 1}"
        enc_blocks.append({
            "res1": _res_from_sd(sd, f"{p}.block.0"),
            "res2": _res_from_sd(sd, f"{p}.block.1"),
            "res3": _res_from_sd(sd, f"{p}.block.2"),
            "snake": _alpha_from_sd(sd, f"{p}.block.3"),
            "conv": _conv_from_sd(sd, f"{p}.block.4"),
        })
    encoder = {
        "stem": _conv_from_sd(sd, "encoder.block.0"),
        "blocks": enc_blocks,
        "snake": _alpha_from_sd(sd, f"encoder.block.{n_enc + 1}"),
        "head": _conv_from_sd(sd, f"encoder.block.{n_enc + 2}"),
    }

    n_dec = len(config.decoder_rates)
    dec_blocks = []
    for b in range(n_dec):
        p = f"decoder.model.{b + 1}"
        dec_blocks.append({
            "snake": _alpha_from_sd(sd, f"{p}.block.0"),
            "conv_t": _conv_from_sd(sd, f"{p}.block.1"),
            "res1": _res_from_sd(sd, f"{p}.block.2"),
            "res2": _res_from_sd(sd, f"{p}.block.3"),
            "res3": _res_from_sd(sd, f"{p}.block.4"),
        })
    decoder = {
        "stem": _conv_from_sd(sd, "decoder.model.0"),
        "blocks": dec_blocks,
        "snake": _alpha_from_sd(sd, f"decoder.model.{n_dec + 1}"),
        "head": _conv_from_sd(sd, f"decoder.model.{n_dec + 2}"),
    }

    quantizers = []
    for i in range(config.n_codebooks):
        p = f"quantizer.quantizers.{i}"
        quantizers.append({
            "in_proj": _conv_from_sd(sd, f"{p}.in_proj"),
            "out_proj": _conv_from_sd(sd, f"{p}.out_proj"),
            "codebook": {
                "embedding": jnp.asarray(np.asarray(sd[f"{p}.codebook.weight"], np.float32))
            },
        })
    return {"encoder": encoder, "decoder": decoder, "quantizer": {"quantizers": quantizers}}
