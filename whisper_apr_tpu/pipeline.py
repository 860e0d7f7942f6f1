"""Fused transcription pipeline: mel -> encoder -> greedy decode in ONE jit.

No reference counterpart as a concept — the reference pays function-call
boundaries freely (scalar CPU); on a remotely-attached TPU every dispatched
executable costs a host<->device round-trip (~25 ms measured on the axon
tunnel), so the whole greedy path compiles into a single XLA program.
Measured on whisper-tiny / 30 s / 224 forced decode steps: 160 ms as three
executables -> 89 ms fused.

Beam search and language detection keep the staged path (they interleave
host logic); greedy transcription — the hot path — goes through here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .audio.mel import log_mel_body
from .config import HOP_LENGTH, N_FFT, ModelConfig
from .model.decoder import greedy_generate_body
from .model.encoder import encode

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_len", "prompt_len", "compute_dtype",
                     "fidelity", "timestamp_base", "no_speech", "use_flash",
                     "qf_mode"))
def fused_transcribe_step(params: dict, audio: jnp.ndarray,
                          window: jnp.ndarray, basis: jnp.ndarray,
                          filters_t: jnp.ndarray, prompt: jnp.ndarray,
                          suppress_bias: jnp.ndarray, eot: int,
                          config: ModelConfig, max_len: int,
                          prompt_len: int,
                          compute_dtype: jnp.dtype = jnp.float32,
                          fidelity: bool = False,
                          timestamp_base: int = -1,
                          no_speech: int = -1,
                          qd=None,
                          use_flash: bool = False,
                          qf_mode=None):
    """audio [B, n_samples] (pre-padded to a full window) -> DecodeResult.

    One XLA program: batched log-mel (vmapped, per-item normalization as in
    the reference), frame padding to 2*n_audio_ctx with -1.0, encoder, and
    the on-device greedy while_loop.
    """
    precision = _HIGHEST if fidelity else None
    n_frames_target = 2 * config.n_audio_ctx

    def one_mel(a):
        return log_mel_body(a, window, basis, filters_t, N_FFT, HOP_LENGTH)

    mel = jax.vmap(one_mel)(audio)  # [B, n_frames, n_mels]
    pad = n_frames_target - mel.shape[1]
    if pad > 0:
        mel = jnp.concatenate(
            [mel, jnp.full((mel.shape[0], pad, mel.shape[2]), -1.0,
                           mel.dtype)], axis=1)
    mel = mel[:, :n_frames_target]

    enc = encode(params, mel, config, compute_dtype, precision,
                 use_flash=use_flash)
    return greedy_generate_body(
        params, enc, prompt, suppress_bias, eot, config,
        max_len=max_len, prompt_len=prompt_len,
        compute_dtype=compute_dtype, fidelity=fidelity,
        timestamp_base=timestamp_base, no_speech=no_speech, qd=qd,
        qf_mode=qf_mode)


def pad_audio_batch(audios, n_samples: int) -> np.ndarray:
    """Host-side: pad/truncate each clip to ``n_samples`` and stack [B, N]."""
    out = np.zeros((len(audios), n_samples), dtype=np.float32)
    for i, a in enumerate(audios):
        a = np.asarray(a, dtype=np.float32)
        n = min(len(a), n_samples)
        out[i, :n] = a[:n]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("config", "compute_dtype", "fidelity", "use_flash"))
def fused_admit_step(params: dict, audio: jnp.ndarray, window: jnp.ndarray,
                     basis: jnp.ndarray, filters_t: jnp.ndarray,
                     prompt: jnp.ndarray, suppress_bias: jnp.ndarray,
                     config: ModelConfig,
                     compute_dtype: jnp.dtype = jnp.float32,
                     fidelity: bool = False,
                     use_flash: bool = False):
    """Batched serving ADMISSION in one XLA program: log-mel (vmapped) ->
    encoder -> cross-K/V precompute -> prompt prefill -> suppressed
    first-token argmax.

    The reference admits browser sessions one postMessage at a time
    (src/wasm/worker.rs:38); on a remotely-attached TPU each staged
    admission costs ~3 dispatched executables per request, so a burst of
    N requests pays ~3N round-trips. This fuses the whole admission of a
    request batch into ONE dispatch.

    audio: [n, n_samples] pre-padded; prompt: [n, P] (equal lengths).
    Returns (first_token [n] int32, KVCache with self K/V [L, n, P, D]
    holding exactly the prompt rows and cross K/V [L, n, S, D]).
    """
    from .model.decoder import init_cache, prefill

    precision = _HIGHEST if fidelity else None
    n_frames_target = 2 * config.n_audio_ctx

    def one_mel(a):
        return log_mel_body(a, window, basis, filters_t, N_FFT, HOP_LENGTH)

    mel = jax.vmap(one_mel)(audio)  # [n, n_frames, n_mels]
    pad = n_frames_target - mel.shape[1]
    if pad > 0:
        mel = jnp.concatenate(
            [mel, jnp.full((mel.shape[0], pad, mel.shape[2]), -1.0,
                           mel.dtype)], axis=1)
    mel = mel[:, :n_frames_target]

    enc = encode(params, mel, config, compute_dtype, precision,
                 use_flash=use_flash)
    cache = init_cache(params, enc, config, max_len=prompt.shape[1],
                       precision=precision, compute_dtype=compute_dtype)
    logits, cache = prefill(params, prompt, enc, cache, config,
                            compute_dtype=compute_dtype, precision=precision)
    first = jnp.argmax(logits + suppress_bias[None, :], axis=-1)
    return first.astype(jnp.int32), cache
