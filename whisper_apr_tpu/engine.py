"""The WhisperApr engine: load, transcribe, detect language.

The orchestration layer (reference: src/lib.rs:270 ``WhisperApr`` —
``transcribe`` :364, ``detect_language`` :495, ``load_from_apr`` :673,
``transcribe_batch`` :1033) re-built around jitted on-device pipelines:

    audio (host)  -> log-mel (XLA, one fused program)
                  -> encoder (XLA)
                  -> greedy decode (ONE lax.while_loop on device)
                  -> BPE decode (host)

Every stage is batched; ``transcribe_batch`` runs the whole batch through a
single compiled program instead of the reference's sequential per-item loop
(reference: src/lib.rs:1033).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import MelFilterbank, parse_wav
from .audio.resample import SincResampler
from .config import ComputeConfig, ModelConfig, N_FRAMES, SAMPLE_RATE
from .detection import LanguageDetector, LanguageProbs
from .errors import InferenceError, ModelError
from .format import AprReader
from .inference.processors import WhisperTokenSuppressor
from .model.decoder import greedy_generate, prefill, init_cache
from .model.encoder import encode_jit
from .model.params import (
    Params,
    load_params_from_apr,
    params_from_hf_model,
)
from .timestamps import Segment, extract_segments, has_timestamps
from .tokenizer import BpeTokenizer, SpecialTokens, Vocabulary
from .tokenizer import special_tokens as st


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


@dataclasses.dataclass
class TranscribeOptions:
    """(reference: src/lib.rs:170 TranscribeOptions)"""

    language: Optional[str] = None  # None/"auto" -> detect
    task: str = "transcribe"  # or "translate"
    strategy: str = "greedy"  # or "beam"
    beam_size: int = 5
    best_of: int = 1  # N sampled candidates at temperature>0 (whisper.cpp)
    patience: float = 1.0
    temperature: float = 0.0
    max_tokens: Optional[int] = None
    word_timestamps: bool = False
    # word alignment method: "dtw" (globally optimal monotonic DTW over
    # cross-attention — native C++ DP, beats per-token peaks on noisy
    # rows) or "peak" (the reference's argmax, alignment.rs:223)
    word_alignment: str = "dtw"
    timestamps: bool = False  # emit timestamp tokens (segment-level)
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    seed: int = 0
    # temperature-fallback quality gates (whisper.cpp parity:
    # --logprob-thold / --entropy-thold / --no-speech-thold,
    # reference: src/cli/args.rs:160-410)
    logprob_thold: float = -1.0
    compression_ratio_thold: float = 2.4
    entropy_thold: float = 2.4
    no_speech_thold: float = 0.6
    # hotword boosting (reference: src/vocabulary/mod.rs:86): phrases with
    # optional per-phrase boost; drives the host-stepped boosted decode
    hotwords: Optional[List] = None  # [(phrase, boost)] or ["phrase:boost"]
    # speculative self-draft decode (single-stream greedy only): the first
    # draft_layers decoder layers draft draft_tokens tokens per verify pass;
    # output stays token-exact vs plain greedy. draft_layers=0 -> L//4.
    speculative: bool = False
    draft_tokens: int = 4
    draft_layers: int = 0


@dataclasses.dataclass
class TranscriptionResult:
    """(reference: src/lib.rs:200 TranscriptionResult)"""

    text: str
    language: str
    segments: List[Segment]
    tokens: List[int] = dataclasses.field(default_factory=list)
    words: List = dataclasses.field(default_factory=list)  # WordTimestamp
    # whisper.cpp quality-gate signals
    avg_logprob: float = 0.0
    no_speech_prob: float = 0.0
    compression_ratio: float = 0.0
    temperature: float = 0.0


@dataclasses.dataclass
class BatchTranscriptionResult:
    """(reference: src/lib.rs:211 BatchTranscriptionResult)"""

    results: List[TranscriptionResult]
    total_duration_secs: float

    def __len__(self) -> int:
        return len(self.results)


class WhisperApr:
    """The transcription engine (reference: src/lib.rs:270)."""

    def __init__(self, config: ModelConfig, params: Params,
                 tokenizer: Optional[BpeTokenizer] = None,
                 mel_filters: Optional[MelFilterbank] = None,
                 compute: Optional[ComputeConfig] = None,
                 specials: Optional[SpecialTokens] = None) -> None:
        self.config = config
        self.params = params
        if tokenizer is None:
            # fallback vocabulary covering every model id (placeholder names
            # beyond the 256 byte tokens) so decode never fails
            v = Vocabulary.with_base_tokens()
            while len(v) < config.n_vocab:
                v.add_token(b"<|tok%d|>" % len(v))
            tokenizer = BpeTokenizer(v)
        self.tokenizer = tokenizer
        self.mel_filters = mel_filters or MelFilterbank.create(config.n_mels)
        self.compute = compute or ComputeConfig()
        self.specials = specials or SpecialTokens.for_vocab_size(config.n_vocab)
        # a token id >= n_vocab would be silently CLAMPED by the XLA gather
        # in the embedding lookup (unlike torch, which raises) — reject early
        if self.specials.sot >= config.n_vocab or self.specials.eot >= config.n_vocab:
            raise ModelError(
                f"special tokens (sot={self.specials.sot}, eot={self.specials.eot}) "
                f"out of range for n_vocab={config.n_vocab}; pass explicit "
                f"`specials` fitted to this vocabulary")

    # -- constructors --------------------------------------------------------
    @staticmethod
    def load_from_apr(path_or_bytes: Union[str, bytes],
                      compute: Optional[ComputeConfig] = None,
                      verify_crc: bool = True,
                      specials: Optional[SpecialTokens] = None,
                      progress: Optional[Callable] = None) -> "WhisperApr":
        """Load a model from an .apr container (reference: src/lib.rs:673).

        ``progress`` receives :class:`~..utils.progress.Progress` updates
        through the weighted read/parse/encoder/decoder/finalize phases
        (reference: src/lib.rs:700 load_from_apr_with_progress +
        src/progress.rs ProgressTracker::model_loading).
        """
        from .format.v2 import AprReaderV2, is_v2
        from .utils.progress import ProgressTracker
        tracker = ProgressTracker.model_loading() if progress else None

        def _emit(msg: str = "") -> None:
            if tracker is not None:
                progress(tracker.to_progress(msg))

        if tracker is not None:
            tracker.start_phase("read")
            _emit("opening container")
        raw = (open(path_or_bytes, "rb").read(4)
               if isinstance(path_or_bytes, str) else path_or_bytes[:4])
        if is_v2(raw):
            reader = (AprReaderV2.from_file(path_or_bytes)
                      if isinstance(path_or_bytes, str)
                      else AprReaderV2(path_or_bytes))
        else:
            reader = (AprReader.from_file(path_or_bytes)
                      if isinstance(path_or_bytes, str)
                      else AprReader(path_or_bytes))
        if tracker is not None:
            tracker.advance()  # -> parse
            _emit("header + checksum")
        if verify_crc and not reader.verify_crc():
            raise ModelError("corrupt .apr file: CRC32 mismatch")
        config = reader.header.to_model_config()
        compute = compute or ComputeConfig()
        dtype = jnp.dtype(compute.param_dtype)
        # quantized files stay quantized on device (file scales, no
        # dequant round trip): int8 with the per-tensor scale table, q4k
        # bit-exact from the super-blocks (ops/q4k.planar_from_raw)
        file_int8 = reader.header.quantization == 2
        file_q4k = reader.header.quantization == 4
        file_q5k = reader.header.quantization == 5
        file_q6k = reader.header.quantization == 6
        keep = (file_int8 and compute.quantization in ("none", "int8")) or \
               (file_q4k and compute.quantization in ("none", "q4k")) or \
               (file_q5k and compute.quantization in ("none", "q5k")) or \
               (file_q6k and compute.quantization in ("none", "q6k"))
        on_tensor = None
        if tracker is not None:
            # expected tensor loads per section (attn=8, ln=2, fc=2 each)
            totals = {"encoder": 7 + 16 * config.n_audio_layer,
                      "decoder": 4 + 26 * config.n_text_layer}
            counts = {"encoder": 0, "decoder": 0}

            def on_tensor(name: str, _i: int) -> None:
                ph = "encoder" if name.startswith("encoder.") else "decoder"
                counts[ph] += 1
                tracker.start_phase(ph)
                tracker.update_phase_progress(
                    min(counts[ph] / totals[ph], 1.0))
                _emit(name)

        params = load_params_from_apr(reader, dtype=dtype, keep_quantized=keep,
                                      on_tensor=on_tensor)
        if compute.quantization != "none" and not keep:
            from .model.params import quantize_params
            params = quantize_params(params, compute.quantization)

        if tracker is not None:
            tracker.start_phase("finalize")
            _emit("vocabulary + filterbank")
        tokenizer = None
        vb = reader.read_vocabulary_bytes()
        if vb is not None:
            tokenizer = BpeTokenizer(Vocabulary.from_bytes(vb))

        mel_filters = None
        fb = reader.read_mel_filterbank()
        if fb is not None:
            mel_filters = MelFilterbank.from_apr_data(fb)

        eng = WhisperApr(config, params, tokenizer, mel_filters, compute,
                         specials)
        if tracker is not None:
            tracker.update_phase_progress(1.0)
            _emit("done")
        return eng

    @staticmethod
    def from_hf_model(hf_model, config: ModelConfig,
                      tokenizer: Optional[BpeTokenizer] = None,
                      compute: Optional[ComputeConfig] = None,
                      specials: Optional[SpecialTokens] = None) -> "WhisperApr":
        """Build directly from a transformers Whisper model (test oracle)."""
        compute = compute or ComputeConfig()
        params = params_from_hf_model(hf_model, config,
                                      dtype=jnp.dtype(compute.param_dtype))
        if compute.quantization != "none":
            from .model.params import quantize_params
            params = quantize_params(params, compute.quantization)
        return WhisperApr(config, params, tokenizer, None, compute, specials)

    # -- pipeline stages ------------------------------------------------------
    @property
    def _compute_dtype(self):
        return jnp.dtype(self.compute.compute_dtype)

    @property
    def _use_flash(self) -> bool:
        """Resolved flash-attention choice: explicit option wins; otherwise
        the KernelSelector decides from encoder shape and platform
        (reference analog: BackendSelector::select, selector.rs:198)."""
        if not hasattr(self, "_use_flash_cache"):
            opt = self.compute.use_flash_attention
            if opt is None:
                from .ops.dispatch import KernelBackend, KernelSelector
                choice = KernelSelector().attention(
                    q_len=self.config.n_audio_ctx,
                    k_len=self.config.n_audio_ctx)
                opt = choice == KernelBackend.PALLAS
            self._use_flash_cache = bool(opt)
        return self._use_flash_cache

    @property
    def _qdecode(self):
        """Pallas quantized-matvec decode fast path (lazy, TPU-only).

        Prepared once per engine; aliases the int8 param buffers plus one
        transposed vocab projection. None when the params are not int8 or
        the backend is CPU (tests exercise the kernel in interpret mode).
        """
        if not hasattr(self, "_qdecode_cache"):
            qd = None
            if jax.default_backend() not in ("cpu",):
                from .model.qdecode import (prepare_kq_decode,
                                            prepare_q4k_decode,
                                            prepare_qdecode)
                qd = prepare_qdecode(self.params, self.config)
                if qd is None:
                    qd = prepare_q4k_decode(self.params, self.config)
                if qd is None:
                    qd = prepare_kq_decode(self.params, self.config)
            self._qdecode_cache = qd
        return self._qdecode_cache

    @property
    def _qdecode_batched(self):
        """qd for BATCHED (B>1) fused decode. int8 params: same as
        ``_qdecode``. k-quant params: a per-channel int8 TRANSCODE of the
        decoder block linears built once at first use
        (qdecode.transcode_kq_to_int8) — B>1 then rides the batched int8
        megakernels at the int8 model's per-stream cost instead of the
        scan-step fallback (measured 1.5-2.7x slower, BENCH_NOTES round 4).
        Storage and the B=1 path stay exact k-quant."""
        if not hasattr(self, "_qdecode_batched_cache"):
            from .model.qdecode import KQ_MODES, transcode_kq_to_int8
            qd = self._qdecode
            if qd is not None and str(qd.get("mode", "int8")) in KQ_MODES:
                qd = transcode_kq_to_int8(self.params, self.config) or qd
            self._qdecode_batched_cache = qd
        return self._qdecode_batched_cache

    def _qd_for(self, batch: int):
        """The qd serving a decode at this batch size (see
        ``_qdecode_batched``)."""
        from .model.qdecode import qf_supported
        qd = self._qdecode
        if qd is not None and not qf_supported(qd, batch):
            return self._qdecode_batched
        return qd

    @property
    def _qf_mode(self):
        """Fused-attention decode mode for the greedy hot path (see
        ComputeConfig.kv_mode): None when no qdecode, else
        "bf16"/"int8"/"fp8"."""
        if self._qdecode is None:
            return None
        # k-quant modes ride the fused blocks too since round 4 (B=1 via
        # ops/decode_blocks_kq; the jitted decode bodies fall back to the
        # scan step at B>1 through qdecode.qf_supported)
        mode = self.compute.kv_mode
        if mode == "auto":
            # session-7 production-shaped A/B: int8 CROSS cache only is
            # the fastest single-stream step — 1.715 vs bf16's 1.788
            # ms/step on large-v3 int8 B=1 (the cross K/V are the
            # per-utterance-static bulk of step traffic). Self rows stay
            # bf16 (full-int8 measured SLOWER at B=1, BENCH_NOTES r3).
            # Serving slots (B>1) remap to FULL int8 KV — the measured
            # batch winner (parallel/serving.py).
            return "cross8"
        return None if mode == "scan" else mode

    @property
    def _fidelity(self) -> bool:
        return self.compute.compute_dtype == "float32"

    def compute_mel(self, audio: np.ndarray) -> np.ndarray:
        """30 s-padded log-mel [2*n_audio_ctx, n_mels] — 3000 frames for the
        standard 1500-position models (reference: src/lib.rs:407)."""
        return self.mel_filters.compute_30s(
            np.asarray(audio, dtype=np.float32),
            n_frames=2 * self.config.n_audio_ctx)

    def encode(self, mel: np.ndarray) -> jnp.ndarray:
        """Encoder features; accepts [T, M] or [B, T, M] (reference: lib.rs:446)."""
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        return encode_jit(self.params, mel, self.config,
                          compute_dtype=self._compute_dtype,
                          fidelity=self._fidelity,
                          use_flash=self._use_flash)

    def get_initial_tokens(self, language: str, task: str = "transcribe",
                           timestamps: bool = False) -> List[int]:
        """[SOT, lang?, task, NO_TIMESTAMPS?] (reference: src/lib.rs:455)."""
        sp = self.specials
        tokens = [sp.sot]
        if sp.is_multilingual:
            off = st.language_offset(language)
            tokens.append(sp.lang_base + (off if off is not None else 0))
        if task == "translate":
            tokens.append(sp.translate)
        else:
            tokens.append(sp.transcribe)
        if not timestamps:
            tokens.append(sp.no_timestamps)
        bad = [t for t in tokens if t >= self.config.n_vocab]
        if bad:
            raise ModelError(
                f"prompt tokens {bad} out of range for n_vocab="
                f"{self.config.n_vocab}")
        return tokens

    # -- language detection ----------------------------------------------------
    def detect_language(self, audio: np.ndarray) -> LanguageProbs:
        """(reference: src/lib.rs:495 detect_language)"""
        mel = self.compute_mel(audio)
        enc = self.encode(mel)
        return self.detect_language_from_features(enc)

    def detect_language_from_features(self, enc_out: jnp.ndarray) -> LanguageProbs:
        cache = init_cache(self.params, enc_out, self.config, max_len=8,
                           compute_dtype=self._compute_dtype)
        sot = jnp.full((enc_out.shape[0], 1), self.specials.sot, dtype=jnp.int32)
        logits, _ = prefill(self.params, sot, enc_out, cache, self.config,
                            compute_dtype=self._compute_dtype)
        return LanguageProbs.from_logits(np.asarray(logits[0]),
                                         lang_base=self.specials.lang_base)

    # -- transcription -----------------------------------------------------------
    def transcribe(self, audio: np.ndarray,
                   options: Optional[TranscribeOptions] = None
                   ) -> TranscriptionResult:
        """Transcribe one clip (reference: src/lib.rs:364)."""
        return self.transcribe_batch([audio], options).results[0]

    def _needs_retry(self, result: TranscriptionResult,
                     options: TranscribeOptions) -> bool:
        from .inference.sampling import needs_fallback
        prompt_n = len(self.get_initial_tokens(
            result.language or "en", options.task, options.timestamps))
        gen = max(len(result.tokens) - prompt_n, 1)  # generated incl. EOT
        return needs_fallback(
            result.text, result.avg_logprob, gen,
            logprob_thold=options.logprob_thold,
            compression_thold=options.compression_ratio_thold,
            entropy_thold=options.entropy_thold,
            tokens=result.tokens,
            no_speech_prob=result.no_speech_prob,
            no_speech_thold=options.no_speech_thold)

    def _skip_if_silence(self, result: TranscriptionResult,
                         options: TranscribeOptions) -> TranscriptionResult:
        from .inference.sampling import is_silence
        if is_silence(result.no_speech_prob, result.avg_logprob,
                      no_speech_thold=options.no_speech_thold,
                      logprob_thold=options.logprob_thold):
            # segment skipped as silence (OpenAI should_skip rule)
            return dataclasses.replace(
                result, text="", segments=[], tokens=[], words=[])
        return result

    def transcribe_with_fallback(self, audio: np.ndarray,
                                 options: Optional[TranscribeOptions] = None,
                                 temperatures: Sequence[float] = (
                                     0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
                                 ) -> TranscriptionResult:
        """whisper.cpp-style temperature fallback: retry at increasing
        temperature until the quality gates pass (avg logprob, compression
        ratio, token entropy; reference flags at src/cli/args.rs
        --logprob-thold/--entropy-thold/--no-speech-thold).

        Silence handling (OpenAI decode_with_fallback + transcribe loop):
        high no-speech probability never retries, and if additionally the
        average logprob is below the threshold the segment is skipped —
        the result comes back with empty text.
        """
        options = options or TranscribeOptions()
        result = None
        for t in temperatures:
            opts = dataclasses.replace(
                options, temperature=t,
                strategy="greedy" if t == 0.0 else "sampling")
            result = self.transcribe(audio, opts)
            if not self._needs_retry(result, options):
                break
        return self._skip_if_silence(result, options) if result else result

    def transcribe_batch_with_fallback(
            self, audios: Sequence[np.ndarray],
            options: Optional[TranscribeOptions] = None,
            temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
            ) -> BatchTranscriptionResult:
        """Batched temperature fallback: the whole batch decodes at t=0 in
        one pipeline call; only gate-failing items re-decode at each higher
        temperature (whisper.cpp's per-segment fallback, batched)."""
        t0 = time.time()
        options = options or TranscribeOptions()
        first = dataclasses.replace(
            options, temperature=temperatures[0],
            strategy="greedy" if temperatures[0] == 0.0 else "sampling")
        results = list(self.transcribe_batch(audios, first).results)
        pending = [i for i, r in enumerate(results)
                   if self._needs_retry(r, options)]
        for t in temperatures[1:]:
            if not pending:
                break
            opts = dataclasses.replace(options, temperature=t,
                                       strategy="sampling")
            retry = self.transcribe_batch([audios[i] for i in pending], opts)
            still = []
            for i, r in zip(pending, retry.results):
                results[i] = r
                if self._needs_retry(r, options):
                    still.append(i)
            pending = still
        results = [self._skip_if_silence(r, options) for r in results]
        return BatchTranscriptionResult(results, time.time() - t0)

    def transcribe_batch(self, audios: Sequence[np.ndarray],
                         options: Optional[TranscribeOptions] = None
                         ) -> BatchTranscriptionResult:
        """Batched transcription through ONE compiled pipeline
        (vs the reference's sequential loop, src/lib.rs:1033)."""
        t0 = time.time()
        options = options or TranscribeOptions()

        # language: fixed, or detected from the first item
        lang = options.language
        enc = None
        if lang in (None, "auto"):
            if self.specials.is_multilingual:
                mel0 = self.mel_filters.compute_30s_device(
                    audios[0], n_frames=2 * self.config.n_audio_ctx)
                probs = self.detect_language_from_features(self.encode(mel0))
                lang = probs.best[0]
            else:
                lang = "en"

        prompt_list = self.get_initial_tokens(lang, options.task,
                                              options.timestamps)
        prompt = jnp.asarray(np.tile(np.asarray(prompt_list, np.int32),
                                     (len(audios), 1)))

        suppressor = WhisperTokenSuppressor(
            suppress_timestamps=not (options.timestamps or options.word_timestamps),
            n_vocab=self.config.n_vocab, tokens=self.specials)
        bias = jnp.asarray(suppressor.bias())
        ns_id = (self.specials.no_speech
                 if self.specials.no_speech < self.config.n_vocab else -1)

        max_tokens = options.max_tokens or self.config.n_text_ctx
        max_tokens = min(max_tokens, self.config.n_text_ctx)

        if options.hotwords:
            return self._transcribe_hotwords(
                audios, options, lang, prompt_list, bias, max_tokens, t0)

        if (options.speculative and len(audios) == 1
                and options.strategy == "greedy"
                and options.temperature == 0.0 and not options.timestamps):
            from .inference.speculative import speculative_greedy_generate
            mel = self.mel_filters.compute_30s_device(
                audios[0], n_frames=2 * self.config.n_audio_ctx)
            enc = self.encode(mel)
            ld = options.draft_layers or max(1, self.config.n_text_layer // 4)
            ns_id_s = (self.specials.no_speech
                       if self.specials.no_speech < self.config.n_vocab
                       else -1)
            spec = speculative_greedy_generate(
                self.params, enc, prompt, bias, self.specials.eot,
                self.config, max_len=max_tokens,
                prompt_len=len(prompt_list),
                draft_tokens=options.draft_tokens, draft_layers=ld,
                compute_dtype=self._compute_dtype, fidelity=self._fidelity,
                no_speech=ns_id_s)
            # token-exact greedy output WITH the quality-gate signals the
            # plain path accumulates (sum logprob over emitted tokens,
            # no-speech prob at SOT)
            tokens_np = np.asarray(spec.tokens)
            lengths_np = np.asarray(spec.lengths)
            toks = tokens_np[0, : lengths_np[0]].tolist()
            gen = toks[len(prompt_list):]
            text = self.tokenizer.decode_with_options(gen, skip_special=True)
            segments = ([Segment(0.0, len(audios[0]) / SAMPLE_RATE,
                                 text, gen)] if text.strip() else [])
            gen_n = max(len(gen), 1)
            return BatchTranscriptionResult([TranscriptionResult(
                text=text.strip(), language=lang, segments=segments,
                tokens=toks,
                avg_logprob=float(np.asarray(spec.sum_logprob)[0]) / gen_n,
                no_speech_prob=float(np.asarray(spec.no_speech_prob)[0]),
            )], time.time() - t0)

        if options.strategy == "sampling" or (
                options.strategy == "greedy" and options.temperature > 0):
            from .inference.sampling import sample_generate
            mels = jnp.stack([
                self.mel_filters.compute_30s_device(
                    a, n_frames=2 * self.config.n_audio_ctx)
                for a in audios])
            enc = self.encode(mels)
            key = jax.random.PRNGKey(options.seed)
            n_best = max(1, options.best_of)
            if n_best > 1:
                # whisper.cpp best_of: N independent samples per item as a
                # flattened batch, winner by length-normalized logprob
                B = enc.shape[0]
                enc_rep = jnp.repeat(enc, n_best, axis=0)
                prompt_rep = jnp.repeat(prompt, n_best, axis=0)
                res = sample_generate(
                    self.params, enc_rep, prompt_rep, bias,
                    self.specials.eot, key, self.config,
                    max_len=max_tokens, prompt_len=len(prompt_list),
                    temperature=options.temperature,
                    top_k=options.top_k, top_p=options.top_p,
                    compute_dtype=self._compute_dtype,
                    fidelity=self._fidelity, no_speech=ns_id,
                    qd=self._qd_for(enc_rep.shape[0]),
                    qf_mode=self._qf_mode)
                toks = res.tokens.reshape(B, n_best, -1)
                lens = res.lengths.reshape(B, n_best)
                gen_len = jnp.maximum(
                    lens - len(prompt_list), 1).astype(jnp.float32)
                avg_lp = res.sum_logprob.reshape(B, n_best) / gen_len
                best = jnp.argmax(avg_lp, axis=1)
                tokens = jnp.take_along_axis(
                    toks, best[:, None, None], axis=1)[:, 0]
                lengths = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
                sum_lp = jnp.take_along_axis(
                    res.sum_logprob.reshape(B, n_best), best[:, None],
                    axis=1)[:, 0]
                ns_prob = res.no_speech_prob.reshape(B, n_best)[:, 0]
            else:
                res = sample_generate(
                    self.params, enc, prompt, bias, self.specials.eot, key,
                    self.config, max_len=max_tokens,
                    prompt_len=len(prompt_list),
                    temperature=options.temperature,
                    top_k=options.top_k, top_p=options.top_p,
                    compute_dtype=self._compute_dtype,
                    fidelity=self._fidelity, no_speech=ns_id,
                    qd=self._qd_for(enc.shape[0]),
                    qf_mode=self._qf_mode)
                tokens, lengths = res.tokens, res.lengths
                sum_lp, ns_prob = res.sum_logprob, res.no_speech_prob
        elif options.strategy == "beam":
            from .inference.beam import beam_generate
            mels = jnp.stack([
                self.mel_filters.compute_30s_device(
                    a, n_frames=2 * self.config.n_audio_ctx)
                for a in audios])
            enc = self.encode(mels)
            res = beam_generate(
                self.params, enc, prompt, bias, self.specials.eot, self.config,
                beam_size=options.beam_size, patience=options.patience,
                max_len=max_tokens, prompt_len=len(prompt_list),
                compute_dtype=self._compute_dtype, fidelity=self._fidelity,
                no_speech=ns_id,
                qd=self._qd_for(enc.shape[0] * options.beam_size),
                qf_mode=self._qf_mode)
            tokens, lengths = res.tokens, res.lengths
            sum_lp, ns_prob = res.sum_logprob, res.no_speech_prob
        else:
            # hot path: mel+encode+greedy fused into ONE executable
            from .pipeline import fused_transcribe_step, pad_audio_batch
            fb = self.mel_filters
            n_samples = 2 * self.config.n_audio_ctx * 160
            batch = jnp.asarray(pad_audio_batch(audios, n_samples))
            ts_base = (self.specials.timestamp_base
                       if options.timestamps
                       and self.specials.timestamp_base < self.config.n_vocab
                       else -1)
            res = fused_transcribe_step(
                self.params, batch, fb._window, fb._basis, fb._filters_t,
                prompt, bias, self.specials.eot, self.config,
                max_len=max_tokens, prompt_len=len(prompt_list),
                compute_dtype=self._compute_dtype, fidelity=self._fidelity,
                timestamp_base=ts_base, no_speech=ns_id,
                qd=self._qd_for(batch.shape[0]),
                use_flash=self._use_flash, qf_mode=self._qf_mode)
            tokens, lengths = res.tokens, res.lengths
            sum_lp, ns_prob = res.sum_logprob, res.no_speech_prob

        tokens_np = np.asarray(tokens)
        lengths_np = np.asarray(lengths)
        sum_lp_np = np.asarray(sum_lp, dtype=np.float64)
        ns_prob_np = np.asarray(ns_prob, dtype=np.float64)

        from .inference.sampling import compression_ratio
        results = []
        for i in range(len(audios)):
            toks = tokens_np[i, : lengths_np[i]].tolist()
            gen = toks[len(prompt_list):]
            text = self.tokenizer.decode_with_options(gen, skip_special=True)
            if has_timestamps(gen, self.specials.timestamp_base):
                segments = extract_segments(
                    gen, self.tokenizer,
                    timestamp_base=self.specials.timestamp_base,
                    eot=self.specials.eot,
                    default_end=len(audios[i]) / SAMPLE_RATE)
            else:
                segments = [Segment(0.0, len(audios[i]) / SAMPLE_RATE,
                                    text, gen)] if text.strip() else []
            results.append(TranscriptionResult(
                text=text.strip(), language=lang, segments=segments, tokens=toks,
                avg_logprob=float(sum_lp_np[i] / max(len(gen), 1)),
                no_speech_prob=float(ns_prob_np[i]),
                compression_ratio=compression_ratio(text.strip()),
                temperature=options.temperature))

        if options.word_timestamps:
            self._attach_word_timestamps(results, audios,
                                         method=options.word_alignment)

        return BatchTranscriptionResult(results, time.time() - t0)

    def transcribe_nbest(self, audio: np.ndarray,
                         options: Optional[TranscribeOptions] = None,
                         n: Optional[int] = None) -> List[TranscriptionResult]:
        """N-best hypotheses from beam search, best first (reference:
        src/inference/beam.rs:300 decode_nbest). ``n`` defaults to the
        beam size; results carry the normalized-score ordering."""
        from .inference.beam import beam_generate
        options = options or TranscribeOptions(strategy="beam")
        n = min(n or options.beam_size, options.beam_size)

        lang = options.language
        if lang in (None, "auto"):
            lang = (self.detect_language(np.asarray(audio, np.float32)).best[0]
                    if self.specials.is_multilingual else "en")
        prompt_list = self.get_initial_tokens(lang, options.task,
                                              options.timestamps)
        prompt = jnp.asarray(np.asarray(prompt_list, np.int32)[None])
        suppressor = WhisperTokenSuppressor(
            suppress_timestamps=not options.timestamps,
            n_vocab=self.config.n_vocab, tokens=self.specials)
        bias = jnp.asarray(suppressor.bias())
        max_tokens = min(options.max_tokens or self.config.n_text_ctx,
                         self.config.n_text_ctx)
        mel = self.mel_filters.compute_30s_device(
            np.asarray(audio, np.float32),
            n_frames=2 * self.config.n_audio_ctx)
        enc = self.encode(mel)
        ns_id = (self.specials.no_speech
                 if self.specials.no_speech < self.config.n_vocab else -1)
        res = beam_generate(
            self.params, enc, prompt, bias, self.specials.eot, self.config,
            beam_size=options.beam_size, patience=options.patience,
            max_len=max_tokens, prompt_len=len(prompt_list),
            compute_dtype=self._compute_dtype, fidelity=self._fidelity,
            return_nbest=True, no_speech=ns_id,
            qd=self._qd_for(options.beam_size), qf_mode=self._qf_mode)
        toks = np.asarray(res.tokens)[0]       # [K, max_len]
        lens = np.asarray(res.lengths)[0]      # [K]
        scores = np.asarray(res.sum_logprob)[0]
        ns = float(np.asarray(res.no_speech_prob)[0])
        out = []
        for k in range(min(n, toks.shape[0])):
            seq = toks[k, : lens[k]].tolist()
            gen = seq[len(prompt_list):]
            text = self.tokenizer.decode_with_options(gen, skip_special=True)
            out.append(TranscriptionResult(
                text=text.strip(), language=lang, segments=[], tokens=seq,
                avg_logprob=float(scores[k]) / max(len(gen), 1),
                no_speech_prob=ns))
        return out

    @staticmethod
    def parse_hotwords(items) -> List:
        """["phrase", "phrase:3.5", ("phrase", 4.0)] -> [(phrase, boost)]."""
        out = []
        for it in items or ():
            if isinstance(it, (tuple, list)):
                out.append((str(it[0]), float(it[1])))
            else:
                text, sep, boost = str(it).rpartition(":")
                if sep and _is_float(boost):
                    out.append((text, float(boost)))
                else:
                    out.append((str(it), 5.0))
        return out

    def _transcribe_hotwords(self, audios, options, lang, prompt_list,
                             bias, max_tokens, t0) -> BatchTranscriptionResult:
        """Host-stepped greedy decode with trie prefix boosts
        (reference: src/vocabulary/mod.rs:86 VocabularyCustomizer::apply,
        trie.rs:324 apply_prefix_boost).

        Context-dependent boosts need the generated prefix each step, so
        this path steps the decoder one token at a time with the logits
        fetched to host — correct everywhere, fastest on directly-attached
        TPUs (the fused on-device loop cannot see the trie).
        """
        from .model.decoder import decode_step, init_cache, prefill
        from .vocabulary import HotwordBooster

        booster = HotwordBooster(self.tokenizer)
        for phrase, boost in self.parse_hotwords(options.hotwords):
            booster.add_hotword(phrase, boost)

        mels = jnp.stack([
            self.mel_filters.compute_30s_device(
                a, n_frames=2 * self.config.n_audio_ctx) for a in audios])
        enc = self.encode(mels)
        B = enc.shape[0]
        cache = init_cache(self.params, enc, self.config, max_tokens,
                           compute_dtype=self._compute_dtype)
        prompt = jnp.asarray(np.tile(np.asarray(prompt_list, np.int32),
                                     (B, 1)))
        logits, cache = prefill(self.params, prompt, enc, cache, self.config,
                                compute_dtype=self._compute_dtype)
        bias_np = np.asarray(bias)
        eot = self.specials.eot
        seqs = [list(prompt_list) for _ in range(B)]
        done = [False] * B
        pos = len(prompt_list)
        logits_np = np.asarray(logits, dtype=np.float32)
        while pos < max_tokens and not all(done):
            nxt = []
            for i in range(B):
                row = logits_np[i] + bias_np
                ctx = seqs[i][len(prompt_list):]
                row = booster.apply(row, ctx)
                tok = int(np.argmax(row)) if not done[i] else eot
                nxt.append(tok)
                if not done[i]:
                    seqs[i].append(tok)
                    if tok == eot:
                        done[i] = True
            if all(done) or pos + 1 >= max_tokens:
                break
            logits, cache = decode_step(
                self.params, jnp.asarray(np.asarray(nxt, np.int32)),
                jnp.int32(pos), cache, self.config,
                compute_dtype=self._compute_dtype)
            logits_np = np.asarray(logits, dtype=np.float32)
            pos += 1

        results = []
        for i in range(B):
            toks = seqs[i]
            gen = toks[len(prompt_list):]
            text = self.tokenizer.decode_with_options(gen, skip_special=True)
            segments = ([Segment(0.0, len(audios[i]) / SAMPLE_RATE, text, gen)]
                        if text.strip() else [])
            results.append(TranscriptionResult(
                text=text.strip(), language=lang, segments=segments,
                tokens=toks, temperature=options.temperature))
        return BatchTranscriptionResult(results, time.time() - t0)

    def _attach_word_timestamps(self, results, audios,
                                method: str = "dtw") -> None:
        """Word-level timestamps via cross-attention alignment
        (reference: src/timestamps/alignment.rs; needs the attention-weight
        decoder mode, a debug-path teacher-forced replay). ``method``
        "dtw" (default) runs the native-DP monotonic DTW pass; "peak" is
        the reference's per-token argmax."""
        from .alignment import (AlignmentConfig, WordTimestampExtractor,
                                refine_boundaries_by_silence)
        from .model.traced import decoder_forward_traced
        extractor = WordTimestampExtractor(
            self.tokenizer, AlignmentConfig(method=method))
        for result, audio in zip(results, audios):
            if not result.tokens:
                continue
            mel = self.compute_mel(audio)
            enc = self.encode(mel)
            toks = jnp.asarray(np.asarray(result.tokens, np.int32)[None])
            _, _, weights = decoder_forward_traced(
                self.params, toks, enc, self.config)
            n_frames = min(
                int(np.ceil(len(audio) / SAMPLE_RATE / 0.02)),
                enc.shape[1])
            words = extractor.extract(np.asarray(weights), result.tokens,
                                      n_frames)
            result.words = refine_boundaries_by_silence(
                words, np.asarray(audio, np.float32))

    # -- streaming / VAD --------------------------------------------------------
    def create_streaming_session(self, options: Optional[TranscribeOptions] = None,
                                 input_sample_rate: int = 44_100,
                                 config=None):
        """Real-time session (reference: src/lib.rs:1555)."""
        from .inference.streaming import StreamingSession
        return StreamingSession(self, options, input_sample_rate, config)

    def transcribe_partial(self, audio: np.ndarray, is_final: bool = False,
                           options: Optional[TranscribeOptions] = None
                           ) -> TranscriptionResult:
        """Transcribe a growing prefix (reference: src/lib.rs:1482)."""
        return self.transcribe(audio, options)

    PREFIX_BUCKET = 8  # prefix lengths round DOWN to this (compile reuse)

    def transcribe_prefixed(self, audio: np.ndarray,
                            prefix_tokens: Sequence[int],
                            options: Optional[TranscribeOptions] = None
                            ) -> TranscriptionResult:
        """Greedy transcription continuing a forced text prefix.

        The token-level streaming-reuse path (reference machinery:
        StreamingKVCache::warm_up, src/model/decoder.rs:739). The
        reference copies PREVIOUS-chunk decoder K/V into the new chunk's
        cache; on this engine that would be unsound for partials — new
        audio changes every encoder position, hence every cross-attention
        read. The sound equivalent: force the previous partial's tokens as
        a decode PREFIX. Their self-attention K/V rebuild against the new
        encoder output in ONE prefill GEMM pass, so only the new suffix
        decodes sequentially — partial latency stops growing linearly
        with transcript length. Greedy continuation of a prefix the full
        decode would itself produce is exactly the full decode's output.

        The prefix is truncated DOWN to a PREFIX_BUCKET multiple so
        repeated partials reuse a handful of compiled shapes.
        """
        options = options or TranscribeOptions()
        lang = options.language or "en"
        initial = self.get_initial_tokens(lang, options.task,
                                          options.timestamps)
        prefix = [int(t) for t in prefix_tokens]
        keep = (len(prefix) // self.PREFIX_BUCKET) * self.PREFIX_BUCKET
        prefix = prefix[:keep]
        prompt_list = initial + prefix
        max_tokens = min(options.max_tokens or self.config.n_text_ctx,
                         self.config.n_text_ctx)
        if len(prompt_list) + 1 >= max_tokens:
            # no decode room left at this budget: fall back to a full pass
            return self.transcribe(audio, options)

        from .inference.processors import WhisperTokenSuppressor
        from .pipeline import fused_transcribe_step, pad_audio_batch
        suppressor = WhisperTokenSuppressor(
            suppress_timestamps=not options.timestamps,
            n_vocab=self.config.n_vocab, tokens=self.specials)
        bias = jnp.asarray(suppressor.bias())
        fb = self.mel_filters
        n_samples = 2 * self.config.n_audio_ctx * 160
        batch = jnp.asarray(pad_audio_batch([audio], n_samples))
        prompt = jnp.asarray(np.asarray(prompt_list, np.int32)[None])
        res = fused_transcribe_step(
            self.params, batch, fb._window, fb._basis, fb._filters_t,
            prompt, bias, self.specials.eot, self.config,
            max_len=max_tokens, prompt_len=len(prompt_list),
            compute_dtype=self._compute_dtype, fidelity=self._fidelity,
            no_speech=(self.specials.no_speech
                       if self.specials.no_speech < self.config.n_vocab
                       else -1),
            qd=self._qdecode, use_flash=self._use_flash,
            qf_mode=self._qf_mode)
        toks = np.asarray(res.tokens)[0, : int(np.asarray(res.lengths)[0])]
        toks = toks.tolist()
        gen = toks[len(initial):]            # prefix + new suffix
        text = self.tokenizer.decode_with_options(gen, skip_special=True) \
            if self.tokenizer else ""
        segments = ([Segment(0.0, len(audio) / SAMPLE_RATE, text.strip(),
                             gen)] if text.strip() else [])
        return TranscriptionResult(text=text.strip(), language=lang,
                                   segments=segments, tokens=toks)

    def transcribe_with_vad(self, audio: np.ndarray,
                            options: Optional[TranscribeOptions] = None
                            ) -> TranscriptionResult:
        """VAD-segmented transcription: only speech spans hit the model
        (reference: src/lib.rs:1237 transcribe_with_vad)."""
        from .vad import VoiceActivityDetector
        options = options or TranscribeOptions()
        audio = np.asarray(audio, dtype=np.float32)
        segments = VoiceActivityDetector().detect(audio)
        if not segments:
            return TranscriptionResult("", options.language or "en", [], [])
        clips = [audio[s:e] for s, e in segments if e - s >= 400]
        if not clips:
            return TranscriptionResult("", options.language or "en", [], [])
        batch = self.transcribe_batch(clips, options)
        texts, segs, toks = [], [], []
        for (s, e), r in zip(segments, batch.results):
            if r.text:
                texts.append(r.text)
                segs.append(Segment(s / SAMPLE_RATE, e / SAMPLE_RATE,
                                    r.text, r.tokens))
                toks.extend(r.tokens)
        return TranscriptionResult(" ".join(texts),
                                   batch.results[0].language if batch.results else "en",
                                   segs, toks)

    def transcribe_long(self, audio: np.ndarray,
                        options: Optional[TranscribeOptions] = None,
                        overlap_seconds: float = 1.0,
                        fallback: bool = False) -> TranscriptionResult:
        """Transcribe audio of ANY length by 30 s chunking with overlap.

        The reference caps transcribe at one 30 s window (src/lib.rs:407
        truncates) and handles long audio via streaming/VAD; this runs the
        fixed windows as ONE batched pipeline call and stitches segments
        with window-offset timestamps (whisper.cpp-style long-file behavior).
        """
        from .audio.batch import split_into_chunks
        options = options or TranscribeOptions()
        audio = np.asarray(audio, dtype=np.float32)
        window = 2 * self.config.n_audio_ctx * 160
        if len(audio) <= window:
            return (self.transcribe_with_fallback(audio, options) if fallback
                    else self.transcribe(audio, options))
        # overlap must stay well under the window or chunking degenerates
        overlap = min(int(overlap_seconds * SAMPLE_RATE), window // 4)
        chunks = split_into_chunks(audio, chunk_samples=window,
                                   overlap_samples=overlap)
        batch = (self.transcribe_batch_with_fallback(chunks, options)
                 if fallback else self.transcribe_batch(chunks, options))
        step = (window - overlap) / SAMPLE_RATE
        from .inference.streaming import dedup_overlap_words
        texts, segs, toks = [], [], []
        for i, r in enumerate(batch.results):
            if not r.text:
                continue
            # chunk-boundary dedup: the audio overlap re-decodes boundary
            # words (reference overlap_tokens continuity, streaming.rs:63)
            text = (dedup_overlap_words(texts[-1], r.text) if texts
                    else r.text)
            if not text:
                continue
            texts.append(text)
            toks.extend(r.tokens)
            offset = i * step
            for s in r.segments:
                segs.append(Segment(s.start + offset, s.end + offset,
                                    s.text, s.tokens))
        lang = batch.results[0].language if batch.results else "en"
        return TranscriptionResult(" ".join(texts), lang, segs, toks)

    # -- file helpers ----------------------------------------------------------
    def transcribe_file(self, path: str,
                        options: Optional[TranscribeOptions] = None
                        ) -> TranscriptionResult:
        samples, sr = parse_wav(open(path, "rb").read())
        if sr != SAMPLE_RATE:
            samples = SincResampler(sr, SAMPLE_RATE).resample(samples)
        return self.transcribe_long(samples, options)
