"""Temperature sampling + quality-gated temperature fallback.

(reference: DecodingStrategy::Sampling {temperature, top_k, top_p} at
src/lib.rs:150-158; the whisper.cpp-parity fallback thresholds the CLI
exposes at src/cli/args.rs: --temperature-fallback / --entropy-thold /
--logprob-thold; hallucination detection patterns in
tests/ground_truth_tests.rs:39.)

``sample_generate`` runs fully on device (jax.random.categorical inside the
while_loop) and also accumulates the chosen-token log-probs so the fallback
driver can gate on average log-probability without a second pass.
"""

from __future__ import annotations

import functools
import zlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..model.decoder import (DecodeResult, KVCache, _no_speech_prob,
                             decode_step, init_cache, prefill)

_HIGHEST = jax.lax.Precision.HIGHEST


def _pick(logits: jnp.ndarray, key, temperature: float,
          top_k: Optional[int], top_p: Optional[float]
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select next token per row; returns (token [B], logprob [B])."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if temperature <= 0.0:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

    scaled = logits / temperature
    if top_k is not None and top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    if top_p is not None and 0.0 < top_p < 1.0:
        sorted_ = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.argmax(cum >= top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_, cutoff_idx[:, None], axis=1)
        scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    tok = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return tok, jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_len", "prompt_len", "temperature",
                     "top_k", "top_p", "compute_dtype", "fidelity",
                     "no_speech", "qf_mode"))
def sample_generate(params: dict, enc_out: jnp.ndarray, prompt: jnp.ndarray,
                    suppress_bias: jnp.ndarray, eot: int, key,
                    config: ModelConfig, max_len: int = 448,
                    prompt_len: int = 4, temperature: float = 1.0,
                    top_k: Optional[int] = None, top_p: Optional[float] = None,
                    compute_dtype: jnp.dtype = jnp.float32,
                    fidelity: bool = False,
                    no_speech: int = -1,
                    qd: Optional[dict] = None,
                    qf_mode: Optional[str] = None) -> DecodeResult:
    """Sampled decode, fully on device.

    Returns a DecodeResult; sum_logprob covers generated tokens (incl. EOT)
    and no_speech_prob is read at the SOT position for the silence gate.
    ``qd`` switches per-token steps to the Pallas quantized-matvec path;
    ``qf_mode`` ("bf16"/"int8", with qd) selects the per-block megakernel
    step (see model/qdecode.decode_step_qf).
    """
    precision = _HIGHEST if fidelity else None
    B = enc_out.shape[0]
    from ..model.qdecode import qf_supported
    use_qf = bool(qf_mode) and qf_supported(qd, B)
    if qd is None:
        step = functools.partial(decode_step, params, config=config,
                                 compute_dtype=compute_dtype,
                                 precision=precision)
    elif use_qf:
        from ..model.qdecode import decode_step_qf
        step = functools.partial(decode_step_qf, params, qd, config=config,
                                 compute_dtype=compute_dtype,
                                 enc_len=enc_out.shape[1])
    else:
        from ..model.qdecode import decode_step_q
        step = functools.partial(decode_step_q, params, qd, config=config,
                                 compute_dtype=compute_dtype)
    cache = init_cache(params, enc_out, config, max_len, precision,
                       compute_dtype)
    logits_all, cache = prefill(params, prompt, enc_out, cache, config,
                                compute_dtype, precision, all_logits=True)
    if use_qf:
        from ..model.qdecode import quantize_cache
        cache = quantize_cache(cache, mode=qf_mode)
    ns_prob = _no_speech_prob(logits_all, no_speech)
    logits = logits_all[:, -1, :]

    tokens = jnp.full((B, max_len), eot, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32),
                                          (0, 0))
    key, sub = jax.random.split(key)
    first, lp = _pick(logits + suppress_bias[None, :], sub, temperature,
                      top_k, top_p)
    tokens = tokens.at[:, prompt_len].set(first)
    done0 = first == eot
    sum_lp0 = lp

    def cond(state):
        pos, _, done, _, _, _ = state
        return jnp.logical_and(pos + 1 < max_len, ~jnp.all(done))

    def body(state):
        pos, tokens, done, cache, key, sum_lp = state
        tok = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)[:, 0]
        logits, cache = step(token=tok, pos=pos, cache=cache)
        key, sub = jax.random.split(key)
        nxt, lp = _pick(logits + suppress_bias[None, :], sub, temperature,
                        top_k, top_p)
        nxt = jnp.where(done, jnp.int32(eot), nxt)
        sum_lp = sum_lp + jnp.where(done, 0.0, lp)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, pos + 1))
        done = jnp.logical_or(done, nxt == eot)
        return pos + 1, tokens, done, cache, key, sum_lp

    pos0 = jnp.int32(prompt_len)
    _, tokens, _, _, _, sum_lp = jax.lax.while_loop(
        cond, body, (pos0, tokens, done0, cache, key, sum_lp0))

    idx = jnp.arange(max_len)[None, :]
    is_eot = jnp.logical_and(tokens == eot, idx >= prompt_len)
    has_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(has_eot, first_eot + 1, max_len)
    return DecodeResult(tokens, lengths, sum_lp, ns_prob)


# ---------------------------------------------------------------------------
# Quality gates (whisper.cpp-parity fallback heuristics)
# ---------------------------------------------------------------------------

def compression_ratio(text: str) -> float:
    """zlib compression ratio; repetitive hallucinations compress extremely
    well (the reference's hallucination-pattern detector analog,
    ground_truth_tests.rs:39)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / max(len(zlib.compress(data)), 1)


def avg_logprob(sum_logprob: float, n_tokens: int) -> float:
    return sum_logprob / max(n_tokens, 1)


def token_entropy(tokens, window: int = 32) -> float:
    """Shannon entropy of the token histogram over the last ``window``
    generated tokens (whisper.cpp's --entropy-thold signal: repetition
    loops collapse the distribution, driving entropy toward 0)."""
    tokens = list(tokens)[-window:]
    if not tokens:
        return 0.0
    counts = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    n = len(tokens)
    return -sum((c / n) * np.log(c / n) for c in counts.values())


def needs_fallback(text: str, avg_lp: float, n_tokens: int,
                   logprob_thold: float = -1.0,
                   compression_thold: float = 2.4,
                   entropy_thold: Optional[float] = None,
                   tokens=None,
                   no_speech_prob: float = 0.0,
                   no_speech_thold: Optional[float] = None) -> bool:
    """Retry at higher temperature? (whisper.cpp decision rule).

    Fails on: compression_ratio > threshold (repetitive text),
    avg_logprob < threshold (low confidence), or token entropy below the
    entropy threshold (repetition loop, whisper.cpp --entropy-thold).
    SILENCE never retries: if no_speech_prob exceeds its threshold the
    low-logprob result is accepted as-is (OpenAI decode_with_fallback).
    """
    if no_speech_thold is not None and no_speech_prob > no_speech_thold:
        return False
    if n_tokens == 0:
        return True
    if compression_ratio(text) > compression_thold:
        return True
    if avg_lp < logprob_thold:
        return True
    if (entropy_thold is not None and tokens is not None
            and len(tokens) >= 32
            and token_entropy(tokens) < entropy_thold):
        return True
    return False


def is_silence(no_speech_prob: float, avg_lp: float,
               no_speech_thold: float = 0.6,
               logprob_thold: float = -1.0) -> bool:
    """OpenAI's segment-skip rule: no-speech mass high AND confidence low."""
    return no_speech_prob > no_speech_thold and avg_lp < logprob_thold


DEFAULT_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
