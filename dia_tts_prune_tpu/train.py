"""Teacher-forced fine-tuning (full and LoRA) with optax.

TPU-native replacement for the reference training pipeline (finetune.py) —
whose forward pass cannot actually run as written (SURVEY.md Q3); this module
implements the *intended* semantics, corrected:

* decoder input  = delay(BOS + audio[:-1])  (finetune.py:190-204);
* loss target    = delay(audio) — next-token prediction of the **delayed**
  stream, consistent with how inference actually generates tokens.  The
  reference returns the *undelayed* audio as the target (finetune.py:208)
  while feeding delayed inputs — a cross-channel misalignment; pass
  ``loss_mode="reference"`` to replicate that behavior for comparisons.
* CE loss with pad-token masking (ignore_index = audio_pad_value,
  finetune.py:446-451, 520-526), NaN-loss skip (finetune.py:529-532);
* AdamW + global-norm clipping + {linear, cosine, step, constant} schedules
  with real warmup (the reference's warmup is a no-op placeholder,
  finetune.py:232-262) + gradient accumulation via ``optax.MultiSteps``;
* LoRA mode: base params frozen under ``stop_gradient``, adapter merged
  inside the loss so gradients flow only to A/B (lora.py);
* ``jax.checkpoint`` rematerialization on the layer scans (1.6B × 3072-step
  teacher forcing does not fit v5e HBM without it — SURVEY.md §7 hard part 6);
* mesh sharding: batch over the data axis, params TP over the model axis
  (parallel/sharding.py) — gradient reductions are XLA-emitted collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import DiaConfig
from .lora import LoraConfig, init_lora, merge_lora
from .models.dia import decoder_forward, encoder_forward
from .ops.delay import apply_audio_delay
from .ops.masks import create_attn_mask
from .state import cross_attention_mask

Params = dict[str, Any]


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference CLI surface (finetune.py:267-305)."""

    learning_rate: float = 1e-5
    epochs: int = 1
    batch_size: int = 2
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "cosine"  # linear | cosine | step | constant
    warmup_steps: int = 0
    weight_decay: float = 0.0
    adapter_mode: str = "none"  # none | lora
    lora: LoraConfig = LoraConfig()
    loss_mode: str = "delayed"  # delayed (inference-consistent) | reference
    qat_mode: str = "none"  # none | int8 | int4 | int4_hybrid (decoder-scope STE fake-quant)
    remat: bool = True
    compute_dtype: str = "float32"
    seed: int = 42
    logging_steps: int = 10
    save_steps: int = 200


# ---------------------------------------------------------------------------
# Batch construction (pure functions; reference: finetune.py:113-204)
# ---------------------------------------------------------------------------


def build_train_batch(
    config: DiaConfig,
    text_ids: np.ndarray,  # [B, T_text] int
    audio_codes_list: list[np.ndarray],  # B × [T_i, C] int
    loss_mode: str = "delayed",
) -> dict[str, np.ndarray]:
    """Pad/truncate audio, build delayed decoder inputs + targets + masks."""
    d = config.data
    B = text_ids.shape[0]
    T, C = d.audio_length, d.channels
    audio = np.full((B, T, C), d.audio_pad_value, dtype=np.int32)
    for i, codes in enumerate(audio_codes_list):
        n = min(codes.shape[0], T)
        audio[i, :n] = codes[:n]

    bos = np.full((B, 1, C), d.audio_bos_value, dtype=np.int32)
    pad_row = np.full((B, 1, C), d.audio_pad_value, dtype=np.int32)
    # decoder input: delay(BOS + audio[:-1]) (finetune.py:190-204)
    dec_in_raw = np.concatenate([bos, audio[:, :-1], pad_row], axis=1)  # [B, T+1, C]
    dec_in = np.asarray(
        apply_audio_delay(jnp.asarray(dec_in_raw), d.audio_pad_value, d.audio_bos_value,
                          tuple(d.delay_pattern))
    )[:, :T]

    if loss_mode == "reference":
        targets = audio  # undelayed (finetune.py:208 — reference as written)
    else:
        targets = np.asarray(
            apply_audio_delay(jnp.asarray(np.concatenate([audio, pad_row], axis=1)),
                              d.audio_pad_value, d.audio_bos_value, tuple(d.delay_pattern))
        )[:, :T]

    return {
        "text_ids": text_ids.astype(np.int32),
        "decoder_input_ids": dec_in.astype(np.int32),
        "target_ids": targets.astype(np.int32),
    }


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def compute_loss(
    params: Params,
    config: DiaConfig,
    batch: dict[str, jax.Array],
    compute_dtype=jnp.float32,
    remat: bool = False,
    qat_mode: str = "none",
) -> jax.Array:
    """Teacher-forced CE with pad masking (finetune.py:446-451, 517-526).

    ``qat_mode`` != "none" runs the forward through the serving quantizer's
    numerics (decoder-scope fake-quant, straight-through gradients — see
    ops/quant.py::fake_quant_params_ste), so the trained weights land on a
    loss surface where int8/int4 export is near-free."""
    if qat_mode != "none":
        from .ops.quant import fake_quant_params_ste

        params = fake_quant_params_ste(params, qat_mode)
    d = config.data
    text_ids = batch["text_ids"]
    B, T_text = text_ids.shape
    enc_padding = text_ids != d.text_pad_value
    enc_mask = create_attn_mask(enc_padding, enc_padding, is_causal=False)
    positions = jnp.broadcast_to(jnp.arange(T_text, dtype=jnp.int32)[None], (B, T_text))
    enc_out = encoder_forward(params, config, text_ids, positions, enc_mask, compute_dtype,
                              remat=remat)

    T = batch["decoder_input_ids"].shape[1]
    dec_positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits = decoder_forward(
        params, config, batch["decoder_input_ids"], enc_out, positions, dec_positions,
        None, cross_attention_mask(enc_padding), compute_dtype, remat=remat,
        enc_padding_mask=enc_padding,
    )  # [B, T, C, V] fp32

    targets = batch["target_ids"]
    mask = (targets != d.audio_pad_value).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# Optimizer / schedules
# ---------------------------------------------------------------------------


def make_schedule(tc: TrainConfig, num_training_steps: int) -> optax.Schedule:
    """LR schedules matching the reference set (finetune.py:232-262), with a
    real linear warmup prepended."""
    base = tc.learning_rate
    steps = max(1, num_training_steps)
    if tc.lr_scheduler_type == "linear":
        main = optax.linear_schedule(base, 0.0, steps)
    elif tc.lr_scheduler_type == "cosine":
        main = optax.cosine_decay_schedule(base, steps)
    elif tc.lr_scheduler_type == "step":
        b1 = max(1, steps // 3)
        b2 = max(b1 + 1, 2 * steps // 3)  # keep two distinct staged decays
        main = optax.piecewise_constant_schedule(base, {b1: 0.1, b2: 0.1})
    elif tc.lr_scheduler_type == "constant":
        main = optax.constant_schedule(base)
    else:
        raise ValueError(f"Unknown scheduler: {tc.lr_scheduler_type}")
    if tc.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base, tc.warmup_steps)
        return optax.join_schedules([warmup, main], [tc.warmup_steps])
    return main


def make_optimizer(tc: TrainConfig, num_training_steps: int) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm) if tc.max_grad_norm > 0 else optax.identity(),
        optax.adamw(make_schedule(tc, num_training_steps), weight_decay=tc.weight_decay),
    )
    if tc.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, tc.gradient_accumulation_steps)
    return opt


# ---------------------------------------------------------------------------
# Train steps (jitted; donate state for in-place updates)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("config", "optimizer", "compute_dtype_name", "remat", "qat_mode"),
    donate_argnames=("params", "opt_state"),
)
def train_step(
    params: Params,
    opt_state,
    batch,
    config: DiaConfig,
    optimizer: optax.GradientTransformation,
    compute_dtype_name: str = "float32",
    remat: bool = True,
    qat_mode: str = "none",
):
    """One full-fine-tune update. Returns (params, opt_state, loss, grad_norm)."""
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[compute_dtype_name]
    loss, grads = jax.value_and_grad(
        lambda p: compute_loss(p, config, batch, dtype, remat=remat, qat_mode=qat_mode)
    )(params)
    grad_norm = optax.global_norm(grads)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # NaN-loss skip (reference: finetune.py:529-532, which `continue`s without
    # stepping): keep params, optimizer moments AND schedule counters
    # untouched — selected in traced code so the step stays device-resident.
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    params = jax.tree.map(lambda new, old: jnp.where(ok, new, old), new_params, params)
    opt_state = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                             new_opt_state, opt_state)
    return params, opt_state, loss, grad_norm


@partial(
    jax.jit,
    static_argnames=("config", "optimizer", "compute_dtype_name", "remat"),
    donate_argnames=("adapter_weights", "opt_state"),
)
def lora_train_step(
    base_params: Params,
    adapter_weights: Params,
    adapter_static: tuple,  # (r, alpha) as traced scalars is fine; kept simple
    opt_state,
    batch,
    config: DiaConfig,
    optimizer: optax.GradientTransformation,
    compute_dtype_name: str = "float32",
    remat: bool = True,
):
    """One LoRA update: only A/B receive gradients (reference peft wrap:
    finetune.py:374-396); the merge happens inside the loss."""
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[compute_dtype_name]
    r, alpha = adapter_static

    def loss_of(aw):
        adapter = {"config": {"r": r, "alpha": alpha, "dropout": 0.0, "target_modules": []},
                   "weights": aw}
        merged = merge_lora(jax.lax.stop_gradient(base_params), adapter)
        return compute_loss(merged, config, batch, dtype, remat=remat)

    loss, grads = jax.value_and_grad(loss_of)(adapter_weights)
    grad_norm = optax.global_norm(grads)
    updates, new_opt_state = optimizer.update(grads, opt_state, adapter_weights)
    new_weights = optax.apply_updates(adapter_weights, updates)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    adapter_weights = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                                   new_weights, adapter_weights)
    opt_state = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                             new_opt_state, opt_state)
    return adapter_weights, opt_state, loss, grad_norm


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class Trainer:
    """Epoch loop with logging and checkpointing (reference: finetune.py:458-585),
    plus optimizer-state save/resume the reference lacks (SURVEY.md §5)."""

    def __init__(
        self,
        params: Params,
        config: DiaConfig,
        tc: TrainConfig,
        num_training_steps: int,
        mesh=None,
    ):
        self.config = config
        self.tc = tc
        self.mesh = mesh
        self.optimizer = make_optimizer(tc, num_training_steps)
        self.global_step = 0

        if tc.qat_mode != "none" and tc.adapter_mode == "lora":
            raise ValueError(
                "QAT composes with full fine-tuning only: at serving the "
                "adapter is merged THEN quantized, so fake-quanting a frozen "
                "base under fp LoRA deltas would train against different "
                "numerics than it serves. Merge first, then QAT-finetune.")
        if tc.adapter_mode == "lora":
            self.base_params = params
            adapter = init_lora(params, tc.lora, jax.random.PRNGKey(tc.seed))
            self.adapter_cfg = adapter["config"]
            self.adapter_weights = adapter["weights"]
            self.opt_state = self.optimizer.init(self.adapter_weights)
        else:
            # own a private copy: train_step donates its param buffers, and the
            # caller's arrays must stay alive (they may be shared with a
            # generator or other tests)
            self.params = jax.tree.map(jnp.array, params)
            self.opt_state = self.optimizer.init(self.params)

    def step(self, batch: dict[str, np.ndarray]) -> dict[str, float]:
        if self.mesh is not None:
            from .parallel.sharding import shard_batch

            batch = shard_batch({k: np.asarray(v) for k, v in batch.items()},
                                self.mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.tc.adapter_mode == "lora":
            self.adapter_weights, self.opt_state, loss, gnorm = lora_train_step(
                self.base_params, self.adapter_weights,
                (self.adapter_cfg["r"], self.adapter_cfg["alpha"]),
                self.opt_state, batch, self.config, self.optimizer,
                self.tc.compute_dtype, self.tc.remat,
            )
        else:
            self.params, self.opt_state, loss, gnorm = train_step(
                self.params, self.opt_state, batch, self.config, self.optimizer,
                self.tc.compute_dtype, self.tc.remat, self.tc.qat_mode,
            )
        self.global_step += 1
        return {"loss": float(loss), "grad_norm": float(gnorm), "step": self.global_step}

    # ---- persistence -------------------------------------------------

    def trained_params(self) -> Params:
        if self.tc.adapter_mode == "lora":
            return merge_lora(
                self.base_params,
                {"config": self.adapter_cfg, "weights": self.adapter_weights},
            )
        return self.params

    def adapter(self) -> Params | None:
        if self.tc.adapter_mode == "lora":
            return {"config": self.adapter_cfg, "weights": self.adapter_weights}
        return None

    def save(self, directory, step: int | None = None) -> None:
        from .checkpoint import save_checkpoint

        payload = {"step": self.global_step}
        if self.tc.adapter_mode == "lora":
            payload["adapter_weights"] = self.adapter_weights
        else:
            payload["params"] = self.params
        payload["opt_state"] = self.opt_state
        save_checkpoint(directory, payload, step=step)

    def restore(self, directory) -> int:
        """Resume params/adapter + optimizer state + step from a checkpoint
        directory written by ``save`` (the resume story the reference lacks —
        SURVEY.md §5: 'no optimizer-state saving and no resume-from-step').

        Returns the restored global step."""
        from .checkpoint import latest_step_dir, restore_checkpoint

        directory = latest_step_dir(directory) or directory
        template = {"step": self.global_step, "opt_state": self.opt_state}
        if self.tc.adapter_mode == "lora":
            template["adapter_weights"] = self.adapter_weights
        else:
            template["params"] = self.params
        restored = restore_checkpoint(directory, template)
        self.opt_state = restored["opt_state"]
        self.global_step = int(restored["step"])
        if self.tc.adapter_mode == "lora":
            self.adapter_weights = restored["adapter_weights"]
        else:
            self.params = restored["params"]
        return self.global_step
