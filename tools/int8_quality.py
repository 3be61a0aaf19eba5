"""int8 vs bf16 quality delta on the real generation path.

Measures what int8 weight quantization does to generated tokens at 1.6B
scale: greedy (temperature 0) decode from the same seed/text under bf16
and packed-int8 weights, reporting token agreement and first-divergence
step.  Autoregressive decode amplifies any logit perturbation — once one
token differs the sequences decouple — so we report BOTH the raw token
agreement and the first divergence step, plus a teacher-forced logit
comparison that isolates per-step numeric error from trajectory drift.

Run (TPU):  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/int8_quality.py
CPU smoke:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/int8_quality.py --tiny

Counterpart of the reference's (no-op) dynamic quantization switch
(/root/reference/app.py:51-63, quirk Q7) — here the quantization is real,
so the quality cost must be measured, not assumed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


DEFAULT_TEXT = (
    "[S1] Quality comparison of int8 and bfloat16 weights. [S2] Same seed, greedy decode."
)


def _quantize(params, mode: str):
    from dia_tts_prune_tpu.ops.quant import (
        quantize_params_int4_packed,
        quantize_params_int8_packed,
    )

    if mode == "int8":
        return quantize_params_int8_packed(params)
    if mode == "int4":
        return quantize_params_int4_packed(params, nibble=True)
    if mode == "hybrid":  # int4 MLP + int8 rest
        return quantize_params_int8_packed(
            quantize_params_int4_packed(params, mlp_only=True, nibble=True),
            fused=False)
    raise ValueError(f"unknown quant mode {mode}")


def compare_kv_int8(params, config, steps: int = 256, seed: int = 0,
                    text: str = DEFAULT_TEXT, weights_label: str = "random") -> dict:
    """int8 KV cache vs bf16 KV cache, SAME packed-int8 weights — isolates
    the QuantKVCache numerics (the serving-default decision is cache on/off
    given int8 weights).  Greedy trajectories under both cache formats."""
    import os

    import numpy as np

    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    params_q = quantize_params_int8_packed(params)
    steps = min(steps, config.data.audio_length - 32)
    max_tokens = steps + config.data.max_delay + 2
    gen = DiaGenerator(params_q, config, "bfloat16")

    outs = {}
    prior = os.environ.get("DIA_KV_INT8")  # restore the operator's setting
    for flag in ("0", "1"):
        os.environ["DIA_KV_INT8"] = flag
        try:
            outs[flag] = np.asarray(gen.generate_tokens(
                text, max_tokens=max_tokens, temperature=0.0, seed=seed,
                cache_len=max_tokens))
        finally:
            if prior is None:
                del os.environ["DIA_KV_INT8"]
            else:
                os.environ["DIA_KV_INT8"] = prior
    a, b = outs["0"], outs["1"]
    n = min(a.shape[0], b.shape[0])
    eq = a[:n] == b[:n]
    row_eq = eq.all(axis=1) if n else np.array([])

    # Teacher-forced replay: feed the bf16-cache trajectory's delayed inputs
    # step-by-step under BOTH cache formats and compare per-step argmax +
    # logit error.  Greedy trajectories decouple at the first near-tie flip,
    # so this is the number that actually characterizes the int8 cache.
    import jax
    import jax.numpy as jnp

    from dia_tts_prune_tpu.models.dia import (
        decode_step_scan,
        encoder_forward,
        new_self_cache,
        precompute_cross_cache,
    )
    from dia_tts_prune_tpu.state import cross_attention_mask, new_encoder_state
    from dia_tts_prune_tpu.tokenizer import encode_text
    from dia_tts_prune_tpu.train import build_train_batch

    tf_n = int(min(max(n, 16), 96))
    base_codes = a if n else np.zeros((16, config.data.channels), np.int32)
    batch = build_train_batch(config, encode_text(text, config.data.text_length)[None],
                              [base_codes[:tf_n]])
    dec_in = jnp.asarray(batch["decoder_input_ids"][:, :tf_n])
    enc = jnp.asarray(encode_text(text, config.data.text_length)[None])
    st = new_encoder_state(config, enc)
    eo = encoder_forward(params_q, config, enc, st.positions, st.attn_mask, jnp.bfloat16)
    cc = precompute_cross_cache(params_q, config, eo, st.positions)
    cmask = cross_attention_mask(st.padding_mask)

    @jax.jit
    def step(tgt, pos, slot, cache):
        return decode_step_scan(params_q, config, tgt, pos, slot, cache, cc,
                                cmask, jnp.bfloat16)

    per_mode = {}
    for qflag in (False, True):
        cache = (new_self_cache(config, 1, max_len=tf_n, quant=True) if qflag
                 else new_self_cache(config, 1, max_len=tf_n, dtype=jnp.bfloat16))
        arg, logs = [], []
        for t in range(tf_n):
            logits, cache = step(dec_in[:, t:t + 1],
                                 jnp.full((1, 1), t, jnp.int32),
                                 jnp.asarray(t, jnp.int32), cache)
            ch = np.asarray(logits[0, -1], np.float32)  # [C, V]
            arg.append(ch.argmax(-1))
            logs.append(ch)
        per_mode[qflag] = (np.stack(arg), np.stack(logs))
    tf_agree = float((per_mode[False][0] == per_mode[True][0]).mean())
    delta = np.abs(per_mode[True][1] - per_mode[False][1])
    scale = np.abs(per_mode[False][1]).mean() + 1e-9

    return {
        "metric": "kv_int8_quality_vs_bf16_cache",
        "greedy_token_agreement": round(float(eq.mean()), 4) if n else None,
        "first_divergence_step": (int(np.argmin(row_eq))
                                  if n and not row_eq.all() else None),
        "rows_compared": int(n),
        "teacher_forced_argmax_agreement": round(tf_agree, 4),
        "teacher_forced_mean_abs_logit_delta_rel": round(float(delta.mean() / scale), 5),
        "teacher_forced_steps": tf_n,
        "weights": weights_label,
    }


def compare(params, config, steps: int = 256, seed: int = 0,
            text: str = DEFAULT_TEXT, weights_label: str = "random",
            mode: str = "int8") -> dict:
    """Quantized-vs-bf16 quality delta for the GIVEN params (random or real).

    ``mode`` selects the quantized format (int8 / int4 grouped / int4-MLP+
    int8 hybrid).  Runs greedy decode under both weight formats plus a
    teacher-forced per-step logit comparison; returns the metrics dict.
    Called standalone on random weights (main below) and as a stage of
    tools/validate_real_checkpoint.py the moment real weights are reachable.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dia_tts_prune_tpu.generate import DiaGenerator

    params_q = _quantize(params, mode)
    steps = min(steps, config.data.audio_length - 32)
    max_tokens = steps + config.data.max_delay + 2

    gen_bf = DiaGenerator(params, config, "bfloat16")
    gen_q = DiaGenerator(params_q, config, "bfloat16")

    out_bf = np.asarray(gen_bf.generate_tokens(
        text, max_tokens=max_tokens, temperature=0.0, seed=seed,
        cache_len=max_tokens))
    out_q = np.asarray(gen_q.generate_tokens(
        text, max_tokens=max_tokens, temperature=0.0, seed=seed,
        cache_len=max_tokens))

    n = min(out_bf.shape[0], out_q.shape[0])
    eq = out_bf[:n] == out_q[:n]
    agree = float(eq.mean()) if n else float("nan")
    row_eq = eq.all(axis=1) if n else np.array([])
    div = int(np.argmin(row_eq)) if n and not row_eq.all() else None

    # Teacher-forced per-step check: run the full-sequence decoder on the SAME
    # token sequence under both weight formats and compare per-step argmax —
    # isolates per-step int8 logit error from autoregressive trajectory drift.
    from dia_tts_prune_tpu.models.dia import decoder_forward, encoder_forward
    from dia_tts_prune_tpu.ops.masks import create_attn_mask
    from dia_tts_prune_tpu.state import cross_attention_mask
    from dia_tts_prune_tpu.tokenizer import encode_text

    d = config.data
    tf_n = min(max(n, 16), 64)
    if n >= 16:
        # on-distribution: teacher-force the bf16 greedy trajectory (delayed,
        # exactly as the decoder saw it during generation)
        from dia_tts_prune_tpu.train import build_train_batch
        from dia_tts_prune_tpu.tokenizer import encode_text as _enc

        batch = build_train_batch(config, _enc(text, d.text_length)[None],
                                  [out_bf[:tf_n]])
        tgt = jnp.asarray(batch["decoder_input_ids"][:, :tf_n])
    else:
        rng = np.random.default_rng(seed)
        tgt = jnp.asarray(rng.integers(0, d.audio_eos_value, (1, tf_n, d.channels), dtype=np.int32))
    ids = jnp.asarray(encode_text(text, config.data.text_length)[None])
    enc_padding = ids != d.text_pad_value
    enc_mask = create_attn_mask(enc_padding, enc_padding, is_causal=False)
    pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None]
    dpos = jnp.arange(tf_n, dtype=jnp.int32)[None]

    def tf_logits(pp):
        enc_out = encoder_forward(pp, config, ids, pos, enc_mask, jnp.bfloat16)
        return decoder_forward(pp, config, tgt, enc_out, pos, dpos, None,
                               cross_attention_mask(enc_padding), jnp.bfloat16,
                               enc_padding_mask=enc_padding)

    logits_bf = np.asarray(tf_logits(params), np.float32)
    logits_q = np.asarray(tf_logits(params_q), np.float32)
    am_bf = np.argmax(logits_bf, axis=-1)
    am_q = np.argmax(logits_q, axis=-1)
    tf_agree = float((am_bf == am_q).mean())
    rel = np.abs(logits_q - logits_bf)
    scale = np.abs(logits_bf).mean() + 1e-9

    return {
        "metric": f"{mode}_quality_vs_bf16",
        "greedy_token_agreement": round(agree, 4),
        "first_divergence_step": div,
        "rows_compared": int(n),
        "teacher_forced_argmax_agreement": round(tf_agree, 4),
        "teacher_forced_mean_abs_logit_delta_rel": round(float(rel.mean() / scale), 5),
        "weights": weights_label,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model-dir", type=str, default=None,
                   help="Load TRAINED weights from a save_pretrained dir "
                        "(e.g. tests/fixtures/trained_small) instead of "
                        "random init — quality numbers on random weights are "
                        "a worst case, not an estimate.")
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--text", type=str, default=DEFAULT_TEXT)
    p.add_argument("--mode", type=str, default="int8",
                   choices=["int8", "int4", "hybrid", "kv"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    if args.model_dir:
        from dia_tts_prune_tpu.api import Dia

        dia = Dia.from_pretrained(args.model_dir, compute_dtype="bfloat16")
        config, params = dia.config, dia.params
        weights_label = f"trained:{Path(args.model_dir).name}"
    else:
        from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
        from dia_tts_prune_tpu.models.dia import init_params

        config = tiny_test_config() if args.tiny else dia_1_6b_config(weight_dtype="bfloat16")
        params = init_params(config, jax.random.PRNGKey(args.seed), jnp.bfloat16)
        weights_label = "random"
    if args.mode == "kv":
        print(json.dumps(compare_kv_int8(params, config, steps=args.steps,
                                         seed=args.seed, text=args.text,
                                         weights_label=weights_label)))
    else:
        print(json.dumps(compare(params, config, steps=args.steps, seed=args.seed,
                                 text=args.text, mode=args.mode,
                                 weights_label=weights_label)))


if __name__ == "__main__":
    main()
