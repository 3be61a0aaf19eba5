"""Top-level user API — the TPU-native equivalent of class ``Dia``
(reference: dia/model.py:101-846).

Provides the same surface a reference user expects:
``Dia.from_local(config, checkpoint)``, ``Dia.from_pretrained(path_or_repo)``,
``generate(text, …) -> np.ndarray waveform``, ``load_audio`` (DAC-encode a
voice-cloning prompt), ``save_audio``, and ``load_adapter_weights`` (LoRA).

Differences by design:
* device/dtype policy is JAX-native: params live on the default device(s) in
  ``compute_dtype``; multi-chip execution is configured via
  ``parallel.sharding`` instead of a single ``device`` handle;
* DAC runs in-process as a JAX model (models/dac.py), so codes→waveform never
  leaves the accelerator until ``save_audio``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import (
    load_safetensors_checkpoint,
    load_torch_checkpoint,
    restore_checkpoint,
)
from .config import DiaConfig, dia_1_6b_config
from .generate import DiaGenerator
from .models.dac import (
    DACConfig,
    convert_dac_torch_state_dict,
    decode_codes,
    encode_audio,
    init_dac_params,
    pad_audio,
)
from .utils.audio_io import DEFAULT_SAMPLE_RATE, load_audio_mono, write_wav


def load_dac_config(spec) -> "DACConfig | None":
    """Accept a DACConfig, a JSON path describing one, or None."""
    if spec is None or isinstance(spec, DACConfig):
        return spec
    import json

    data = json.loads(Path(spec).read_text())
    for k in ("encoder_rates", "decoder_rates"):
        if k in data:
            data[k] = tuple(data[k])
    return DACConfig(**data)


def stream_decode_wav(
    dac_params,
    dac_config,
    code_chunks,
    overlap_frames: int = 32,
    lookahead_frames: int = 32,
):
    """Incrementally decode an iterator of undelayed code chunks to audio.

    Each emitted span is decoded with ``overlap_frames`` of left context
    (conv warm-up, trimmed) and holds back ``lookahead_frames`` of right
    context, so every sample has the DAC decoder's full receptive field on
    both sides (≈20 frames for the 44.1 kHz architecture) — the concatenated
    stream is sample-exact against the offline decode.  Shared by
    ``Dia.generate_stream`` (single stream) and
    ``ContinuousBatcher.generate_stream`` (a lane of the resident batch).
    """
    hop = dac_config.hop_length
    codes_all = np.zeros((0, dac_config.n_codebooks), np.int32)
    emitted_f = 0  # frames already emitted as audio

    def decode_span(start: int, end: int) -> np.ndarray:
        ctx_start = max(0, start - overlap_frames)
        ctx_end = min(codes_all.shape[0], end + lookahead_frames)
        ctx = codes_all[ctx_start:ctx_end]
        wav = np.asarray(
            decode_codes(dac_params, dac_config, jnp.asarray(ctx)[None])[0]
        )
        return wav[(start - ctx_start) * hop : (end - ctx_start) * hop]

    for new_codes in code_chunks:
        codes_all = np.concatenate([codes_all, new_codes], axis=0)
        emit_until = codes_all.shape[0] - lookahead_frames
        if emit_until > emitted_f:
            yield decode_span(emitted_f, emit_until).astype(np.float32)
            emitted_f = emit_until
    if codes_all.shape[0] > emitted_f:
        yield decode_span(emitted_f, codes_all.shape[0]).astype(np.float32)


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def _flatten_tree(tree, prefix: str = "") -> dict:
    """Pytree (nested dicts/lists of arrays) → flat dotted-key dict.
    List indices become numeric key segments (inverse: _unflatten_tree)."""
    flat = {}
    items = enumerate(tree) if isinstance(tree, (list, tuple)) else tree.items()
    for k, v in items:
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            flat.update(_flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten_tree(flat: dict):
    """Inverse of _flatten_tree: numeric key segments rebuild lists."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [fix(node[str(i)]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


class Dia:
    """Orchestrator: model params + generator + codec (reference: dia/model.py:101)."""

    def __init__(
        self,
        config: DiaConfig,
        params,
        compute_dtype: str = "float32",
        dac_params=None,
        dac_config: DACConfig | None = None,
    ):
        self.config = config
        self.params = params
        self.compute_dtype = compute_dtype
        self.dac_config = dac_config or DACConfig()
        self.dac_params = dac_params
        self._audio_cache: dict = {}  # (path, mtime, size) → DAC codes LRU
        self.generator = DiaGenerator(params, config, compute_dtype)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_local(
        cls,
        config_path: str | Path,
        checkpoint_path: str | Path,
        compute_dtype: str = "float32",
        dac_checkpoint: str | Path | None = None,
        dac_config: "DACConfig | str | Path | None" = None,
    ) -> "Dia":
        """Load from a reference-format config.json + checkpoint
        (reference: dia/model.py:139-187).  Accepts torch .bin/.pth,
        .safetensors, or an orbax directory."""
        config = DiaConfig.load(config_path)
        if config is None:
            raise FileNotFoundError(f"Config file not found at {config_path}")
        params = cls._load_params(checkpoint_path, config, compute_dtype)
        dia = cls(config, params, compute_dtype, dac_config=load_dac_config(dac_config))
        if dac_checkpoint is not None:
            dia.load_dac(dac_checkpoint)
        return dia

    @classmethod
    def from_pretrained(
        cls,
        model_name: str = "nari-labs/Dia-1.6B",
        compute_dtype: str = "float32",
        dac_checkpoint: str | Path | None = None,
        dac_config: "DACConfig | str | Path | None" = None,
    ) -> "Dia":
        """Load from a local directory containing config.json + weights, or a
        HF Hub repo id when huggingface_hub is importable and online
        (reference: dia/model.py:189-236)."""
        path = Path(model_name)
        if not path.exists():
            try:
                from huggingface_hub import snapshot_download

                path = Path(snapshot_download(model_name))
            except Exception as e:  # offline / hub unavailable
                raise FileNotFoundError(
                    f"'{model_name}' is not a local directory and HF Hub download failed: {e}"
                ) from e
        config = DiaConfig.load(path / "config.json")
        if config is None:
            raise FileNotFoundError(f"config.json not found under {path}")
        ckpt = None
        for cand in ("model.safetensors", "pytorch_model.bin", "params"):
            if (path / cand).exists():
                ckpt = path / cand
                break
        if ckpt is None:
            raise FileNotFoundError(f"No checkpoint found under {path}")
        params = cls._load_params(ckpt, config, compute_dtype)
        if dac_config is None and (path / "dac_config.json").exists():
            dac_config = path / "dac_config.json"
        dia = cls(config, params, compute_dtype, dac_config=load_dac_config(dac_config))
        if dac_checkpoint is not None:
            dia.load_dac(dac_checkpoint)
        elif (path / "dac.safetensors").exists():
            # self-contained model dir (written by save_pretrained): codec
            # weights ride along, so generate()/load_audio() work immediately
            from safetensors.numpy import load_file

            dia.dac_params = _unflatten_tree(load_file(str(path / "dac.safetensors")))
        return dia

    @classmethod
    def random_init(
        cls, config: DiaConfig | None = None, seed: int = 0, compute_dtype: str = "float32",
        with_dac: bool = False,
    ) -> "Dia":
        """Random-weight instance (benchmarks / tests / training-from-scratch)."""
        from .models.dia import init_params

        config = config or dia_1_6b_config()
        params = init_params(config, jax.random.PRNGKey(seed), _dtype_of(compute_dtype))
        dia = cls(config, params, compute_dtype)
        if with_dac:
            dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(seed + 1))
        return dia

    @staticmethod
    def _load_params(checkpoint_path: str | Path, config: DiaConfig, compute_dtype: str):
        p = Path(checkpoint_path)
        dtype = _dtype_of(compute_dtype)
        if p.is_dir():
            from .models.dia import init_params

            template = jax.eval_shape(
                lambda: init_params(config, jax.random.PRNGKey(0), dtype)
            )
            return restore_checkpoint(p, template)
        if p.suffix == ".safetensors":
            return load_safetensors_checkpoint(p, config, dtype=dtype)
        return load_torch_checkpoint(p, config, dtype=dtype)

    # ------------------------------------------------------------------
    # Codec
    # ------------------------------------------------------------------

    def load_dac(self, checkpoint: str | Path) -> None:
        """Load DAC weights from a torch DAC checkpoint (.pth dict with
        'state_dict' or flat) — reference: dia/model.py:238-252."""
        import torch

        obj = torch.load(str(checkpoint), map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        self.dac_params = convert_dac_torch_state_dict(sd, self.dac_config)

    def _require_dac(self):
        if self.dac_params is None:
            raise RuntimeError(
                "DAC weights not loaded. Call load_dac(path) or construct with dac_params."
            )

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    # codec-decode chunking: emitted samples keep the decoder's receptive
    # field on both sides, so the result is identical to a whole-array decode
    # while only 3 fixed shapes ever compile (varied generation lengths would
    # otherwise each trigger a fresh XLA compile of the full DAC decoder)
    _DEC_BODY = 256
    _DEC_OV = 32
    _DEC_LA = 32

    def _decode_waveform(self, codes_TxC: np.ndarray) -> np.ndarray:
        hop = self.dac_config.hop_length
        T = codes_TxC.shape[0]
        W = self._DEC_OV + self._DEC_BODY + self._DEC_LA

        def dec(span):
            return np.asarray(
                decode_codes(self.dac_params, self.dac_config, jnp.asarray(span)[None])[0]
            )

        if T <= W:  # short outputs: exact single decode (shape varies; rare)
            return dec(codes_TxC).astype(np.float32)

        out = np.empty(T * hop, np.float32)
        body, ov, la = self._DEC_BODY, self._DEC_OV, self._DEC_LA
        # first chunk: emit [0, body) with right lookahead only
        out[: body * hop] = dec(codes_TxC[: body + la])[: body * hop]
        s = body
        while s + body + la <= T:
            w = dec(codes_TxC[s - ov : s + body + la])
            out[s * hop : (s + body) * hop] = w[ov * hop : (ov + body) * hop]
            s += body
        # tail: end-aligned fixed window (exact right boundary)
        w = dec(codes_TxC[T - W : T])
        off = s - (T - W)
        out[s * hop :] = w[off * hop :]
        return out

    def speculative_generator(self, window: int = 8,
                              n_draft_layers: int | None = None):
        """The speculative-decoding driver over the CURRENT params (layer-skip
        self-draft + batched-window verify; speculative.py).  Cached until the
        params object is swapped (quantize/adapter/prune recreate it)."""
        from .speculative import SpeculativeGenerator

        key = (int(window), n_draft_layers, id(self.params))
        if getattr(self, "_spec_key", None) != key:
            self._spec_gen = SpeculativeGenerator(
                self.params, self.config, self.compute_dtype,
                n_draft_layers=n_draft_layers, window=int(window))
            self._spec_key = key
        return self._spec_gen

    def generate_codes(self, text: str, speculative: "bool | int" = False,
                       spec_draft_layers: int | None = None, **kwargs) -> np.ndarray:
        """Text → undelayed codec tokens [T, C] (no codec decode).

        ``speculative`` switches to the speculative decoder: ``True`` (window
        8) or an int window size.  Output-distribution-preserving — greedy is
        token-exact vs the normal loop, sampled draws are exact samples from
        the same filtered distribution (speculative.py docstring)."""
        if speculative:
            window = 8 if speculative is True else int(speculative)
            gen = self.speculative_generator(window, spec_draft_layers)
            kwargs.pop("verbose", None)
            kwargs.pop("cache_len", None)
            return gen.generate_tokens(text, **kwargs)
        return self.generator.generate_tokens(text, **kwargs)

    def generate(
        self,
        text: str,
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompt: str | np.ndarray | None = None,
        audio_prompt_text: str | None = None,
        seed: int | None = None,
        verbose: bool = False,
        use_torch_compile: bool = False,  # accepted for reference-API compat;
        # the whole pipeline is always jit-compiled here (dia/model.py:658)
        speculative: "bool | int" = False,
        spec_draft_layers: int | None = None,
    ) -> np.ndarray | None:
        """Text → waveform (float32 [T_audio]) — reference: dia/model.py:631-846.

        ``audio_prompt`` may be a WAV/FLAC path (encoded through the JAX DAC)
        or a pre-encoded [T, C] code array.  ``speculative`` enables the
        layer-skip speculative decoder (True = window 8, or an int window) —
        same output distribution, fewer full-model steps.
        """
        prompt_codes = None
        if isinstance(audio_prompt, (str, Path)):
            prompt_codes = self.load_audio(audio_prompt)
        elif audio_prompt is not None:
            prompt_codes = np.asarray(audio_prompt)

        codes = self.generate_codes(
            text,
            max_tokens=max_tokens,
            cfg_scale=cfg_scale,
            temperature=temperature,
            top_p=top_p,
            cfg_filter_top_k=cfg_filter_top_k,
            audio_prompt_codes=prompt_codes,
            audio_prompt_text=audio_prompt_text,
            seed=seed,
            verbose=verbose,
            speculative=speculative,
            spec_draft_layers=spec_draft_layers,
        )
        if codes.shape[0] == 0:
            return None
        self._require_dac()
        return self._decode_waveform(codes)

    def generate_stream(
        self,
        text: str,
        segment_steps: int = 128,
        overlap_frames: int = 32,
        lookahead_frames: int = 32,
        audio_prompt: "str | np.ndarray | None" = None,
        **kwargs,
    ):
        """Stream audio chunks while generation continues.

        Codec decoding runs incrementally with ``overlap_frames`` of left
        context (conv warm-up, trimmed from the output) and holds back
        ``lookahead_frames`` of right context, so every emitted sample has the
        decoder's full receptive field on both sides (≈20 frames for the
        44.1 kHz architecture) — the concatenated stream is sample-exact
        against the offline decode.  A serving capability the reference lacks
        (its generate is monolithic).
        """
        self._require_dac()
        if isinstance(audio_prompt, (str, Path)):
            kwargs["audio_prompt_codes"] = self.load_audio(audio_prompt)
        elif audio_prompt is not None:
            kwargs["audio_prompt_codes"] = np.asarray(audio_prompt)
        yield from stream_decode_wav(
            self.dac_params, self.dac_config,
            self.generator.generate_tokens_stream(
                text, segment_steps=segment_steps, **kwargs),
            overlap_frames=overlap_frames, lookahead_frames=lookahead_frames)

    def generate_batch(
        self,
        texts: list[str],
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompts: "list[str | np.ndarray | None] | None" = None,
        audio_prompt_texts: "list[str | None] | None" = None,
        seed: int | None = None,
        seeds: "list[int | None] | None" = None,
    ) -> list[np.ndarray | None]:
        """Batched serving: N prompts decoded in one device-resident loop,
        then one batched codec decode.  Beyond the reference, which is
        single-stream only (SURVEY.md Q4).  ``audio_prompts`` (per-stream WAV
        paths or [T, C] code arrays) enables batched voice cloning — the
        reference app's rolling-prompt long-form pipeline at batch speed.
        ``seeds`` carries per-stream PRNG seeds (each stream samples from its
        own key chain, reproducing its single-stream run exactly)."""
        prompt_codes = None
        if audio_prompts is not None:
            prompt_codes = [
                self.load_audio(p) if isinstance(p, (str, Path))
                else (np.asarray(p) if p is not None else None)
                for p in audio_prompts
            ]
        codes_list = self.generator.generate_tokens_batch(
            texts, max_tokens=max_tokens, cfg_scale=cfg_scale, temperature=temperature,
            top_p=top_p, cfg_filter_top_k=cfg_filter_top_k,
            audio_prompt_codes=prompt_codes, audio_prompt_texts=audio_prompt_texts,
            seed=seed, seeds=seeds,
        )
        self._require_dac()
        outs: list[np.ndarray | None] = []
        for codes in codes_list:
            outs.append(self._decode_waveform(codes) if codes.shape[0] else None)
        return outs

    # ------------------------------------------------------------------
    # Audio I/O
    # ------------------------------------------------------------------

    def load_audio(self, audio_path: str | Path) -> np.ndarray:
        """WAV file → DAC codes [T_codes, C] (reference: dia/model.py:546-576).

        Encodings are LRU-cached by (path, mtime, size): a server handling
        repeated voice-clone requests with the same prompt file skips the
        full DAC encoder pass after the first one; an edited file (new
        mtime/size) re-encodes."""
        self._require_dac()
        p = Path(audio_path).resolve()
        st = p.stat()
        key = (str(p), st.st_mtime_ns, st.st_size)
        hit = self._audio_cache.get(key)
        if hit is not None:
            self._audio_cache.pop(key)
            self._audio_cache[key] = hit  # refresh LRU order
            return hit.copy()
        mono = load_audio_mono(p, self.dac_config.sample_rate)
        mono = pad_audio(mono[None, :], self.dac_config.hop_length)
        codes = np.asarray(
            encode_audio(self.dac_params, self.dac_config, jnp.asarray(mono))[0])
        self._audio_cache[key] = codes
        while len(self._audio_cache) > 16:
            self._audio_cache.pop(next(iter(self._audio_cache)))
        return codes.copy()

    def save_audio(self, path: str | Path, audio: np.ndarray,
                   sample_rate: int = DEFAULT_SAMPLE_RATE) -> None:
        """Waveform → disk, by extension: .wav, .flac, or .mp3
        (reference: dia/model.py:578-595 writes via soundfile)."""
        if audio is None:
            return
        from .utils.audio_io import write_audio

        write_audio(path, audio, sample_rate)

    # ------------------------------------------------------------------
    # Adapters
    # ------------------------------------------------------------------

    def quantize_int8(self) -> None:
        """Swap dense kernels to packed int8 (values + per-channel scales).

        The decode path then streams int8 weight bytes (convert fused into
        the dot's operand load; scan-over-layers step auto-selected) —
        roughly halving per-token HBM traffic, measured +32% tokens/s
        (docs/PERF.md).  Real quantization, unlike the reference's no-op
        dynamic quant (app.py:51-63, quirk Q7)."""
        from .ops.quant import quantize_params_int8_packed

        self.params = quantize_params_int8_packed(self.params)
        self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)

    def quantize_int4(self, group: int | None = 128, mlp_only: bool = False,
                      nibble: bool = True, halfsplit: bool = True) -> None:
        """Swap decoder dense kernels to packed int4 (grouped scales).

        Quarter-byte weight streaming on the bandwidth-bound decode loop —
        half the int8 path's HBM bytes again.  ``group`` rows of each
        contraction share one scale per output column (128 keeps the 4-bit
        error local; ``None`` = per-column, int8-granularity).  ``mlp_only``
        packs just the MLP kernels at int4 and the remaining decoder kernels
        at int8 — the hybrid config: MLP weights are ~57% of per-layer bytes
        and the least quantization-sensitive population.  Quality/perf
        numbers: docs/PERF.md; quality proxy tool: tools/int8_quality.py
        ``--mode int4|hybrid``.  ``nibble`` (default) stores two int4 rows
        per int8 byte — identical numerics, no ``S4``-dtype array crosses a
        device/jit boundary (required on remote-attached TPUs whose int4
        transfer is broken).  Inside every fused generate program the
        nibble bytes are unpacked ONCE to XLA-native S4 before the decode
        loop (generate._maybe_unpack_s4, ``DIA_INT4_S4=0`` opts out), so
        the loop streams weights at true 4-bit density with the upcast
        fused into each dot's operand read — measured 1.6–1.9× the int8
        path's MLP-chain throughput (docs/PERF.md round 4).  ``halfsplit``
        (default) pairs contraction halves per byte; same quantization
        grid, keeps the Pallas GEMV fallback layout-compatible, falls back
        per-kernel when shapes misalign."""
        from .ops.quant import quantize_params_int4_packed, quantize_params_int8_packed

        self.params = quantize_params_int4_packed(
            self.params, group=group, mlp_only=mlp_only, nibble=nibble,
            halfsplit=halfsplit)
        if mlp_only:
            self.params = quantize_params_int8_packed(self.params, fused=False)
        self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)

    def prune_block_sparse(self, amount: float, block: tuple[int, int] = (256, 256)) -> dict:
        """Block-granular magnitude pruning wired into inference.

        Ranks (block_k, block_n) weight blocks by L1 norm across all dense
        kernels, zeroes the ``amount`` smallest (reference pruning semantics
        at block granularity: dia/pruning_utils.py:42-62; README.md:366
        recommends 50-70% sparsity), then swaps decoder kernels for
        ``BlockSparseKernel``s so the decode loop's matmuls DMA-skip the
        pruned blocks — weight HBM bytes scale with density, unlike the
        reference's zero-multiplying masked inference.  Returns the
        per-module block-density summary."""
        from .ops.sparse import sparsify_params_block, sparsity_summary
        from .prune import apply_masks, block_masks

        masks = block_masks(self.params, amount, block=block)
        pruned = apply_masks(self.params, masks)
        self.params = sparsify_params_block(pruned, block_k=block[0], block_n=block[1])
        self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)
        return sparsity_summary(self.params)

    def sparsify_block(self, block: tuple[int, int] = (256, 256)) -> dict:
        """Pack the EXISTING zero blocks of already-pruned weights (e.g. a
        checkpoint written by ``offline_prune --prune-mode block``) into
        BlockSparseKernels — no additional pruning.  Returns the per-module
        block-density summary."""
        from .ops.sparse import sparsify_params_block, sparsity_summary

        self.params = sparsify_params_block(self.params, block_k=block[0], block_n=block[1])
        self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)
        return sparsity_summary(self.params)

    def load_adapter_weights(self, adapter_path: str | Path, fuse: bool = True) -> None:
        """Load a LoRA adapter and fuse it into the base weights (reference
        intent: dia/model.py:598-628; our adapters are native — see lora.py).

        The fused delta is tracked so ``unload_adapter`` / ``set_adapter`` can
        switch adapters exactly (fp32 merge is invertible)."""
        from .lora import load_adapter, merge_lora

        adapter = load_adapter(adapter_path)
        if not fuse:
            raise NotImplementedError(
                "Unfused adapters are not supported: fusion is free at "
                "inference (W + (alpha/r)·A@B folds into the kernels) and "
                "unload_adapter() exactly reverses it. Use fuse=True."
            )
        self.unload_adapter()
        self.params = merge_lora(self.params, adapter)
        self._active_adapter = adapter
        self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)

    def unload_adapter(self) -> None:
        """Un-merge the active adapter (exact inverse of the fuse)."""
        from .lora import merge_lora

        active = getattr(self, "_active_adapter", None)
        if active is not None:
            self.params = merge_lora(self.params, active, sign=-1.0)
            self._active_adapter = None
            self.generator = DiaGenerator(self.params, self.config, self.compute_dtype)

    def set_adapter(self, adapter_path: str | Path) -> None:
        """Swap the active adapter (unload current, fuse new) — the
        reference's PEFT set_adapter analogue (dia/model.py:621-625)."""
        self.load_adapter_weights(adapter_path, fuse=True)

    def save_pretrained(self, directory: str | Path, include_dac: bool = True) -> None:
        """Write a reference-compatible model dir: config.json +
        model.safetensors, plus — when codec weights are loaded and
        ``include_dac`` — dac.safetensors + dac_config.json, making the dir
        fully self-contained (``from_pretrained(dir)`` can generate audio
        with no external DAC checkpoint).  model.safetensors is loadable by
        both ``from_pretrained`` here and (after renaming to
        pytorch_model.bin via torch) the torch reference."""
        import json

        from safetensors.numpy import save_file

        from .checkpoint import to_torch_state_dict

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        self.config.save(directory / "config.json")
        sd = {k: np.ascontiguousarray(v) for k, v in
              to_torch_state_dict(self.params, self.config).items()}
        save_file(sd, str(directory / "model.safetensors"))
        bundle_dac = include_dac and self.dac_params is not None
        if bundle_dac:
            save_file(
                {k: np.ascontiguousarray(v)
                 for k, v in _flatten_tree(self.dac_params).items()},
                str(directory / "dac.safetensors"),
            )
        if bundle_dac or self.dac_config != DACConfig():
            from dataclasses import asdict

            (directory / "dac_config.json").write_text(
                json.dumps(asdict(self.dac_config), indent=2)
            )
