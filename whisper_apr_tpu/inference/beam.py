"""Beam search, fully on device.

Re-designs the reference beam search (reference: src/inference/beam.rs:56
BeamSearchDecoder — hypothesis expansion :137-216, length-normalized scoring
``score / len^length_penalty`` :45, patience early-stop :278) as a batched
fixed-shape XLA program:

- beams are a flattened batch dimension ``B*K`` sharing one KV cache; beam
  reordering is a gather over the beam axis (the TPU answer to the
  reference's per-hypothesis Vec cloning)
- finished beams continue in place, forced to extend with EOT at zero log
  prob (equivalent to the reference's completed pool: their cumulative score
  freezes)
- each step takes top-K over the ``K*V`` joint candidate scores via
  ``lax.top_k`` — no host round-trips
- final selection maximizes the reference's normalized score over beams

No in-step length normalization is needed: every active candidate at a step
has identical length, so ranking by raw cumulative score inside the loop is
order-equivalent to the reference's per-step normalized sort.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..model.decoder import (DecodeResult, KVCache, _no_speech_prob,
                             decode_step, init_cache, prefill)

_HIGHEST = jax.lax.Precision.HIGHEST
NEG = jnp.float32(-1e30)


def _flatten_beams(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=("config", "beam_size", "max_len", "prompt_len",
                     "compute_dtype", "fidelity", "length_penalty",
                     "return_nbest", "no_speech", "qf_mode"))
def beam_generate(params: dict, enc_out: jnp.ndarray, prompt: jnp.ndarray,
                  suppress_bias: jnp.ndarray, eot: int, config: ModelConfig,
                  beam_size: int = 5, patience: float = 1.0,
                  max_len: int = 448, prompt_len: int = 4,
                  length_penalty: float = 1.0,
                  compute_dtype: jnp.dtype = jnp.float32,
                  fidelity: bool = False,
                  return_nbest: bool = False,
                  no_speech: int = -1,
                  qd: Optional[dict] = None,
                  qf_mode: Optional[str] = None) -> DecodeResult:
    """Batched beam search. Returns a DecodeResult for the best hypothesis
    per batch item (sum_logprob = the winning beam's raw cumulative score),
    or per-beam [B, K, ...] arrays sorted by normalized score with
    return_nbest (the on-device analog of decode_nbest, beam.rs:300).

    Patience early-stop (beam.rs:278 should_stop_early): a batch item stops
    when its best COMPLETED normalized score exceeds its worst ACTIVE
    candidate's normalized score times ``patience``.
    """
    precision = _HIGHEST if fidelity else None
    B = enc_out.shape[0]
    K = beam_size
    V = config.n_vocab

    # replicate encoder output per beam: [B*K, S, D]
    enc_rep = _flatten_beams(
        jnp.broadcast_to(enc_out[:, None], (B, K) + enc_out.shape[1:]))
    cache = init_cache(params, enc_rep, config, max_len, precision,
                       compute_dtype)

    prompt_rep = _flatten_beams(
        jnp.broadcast_to(prompt[:, None], (B, K, prompt_len))).astype(jnp.int32)
    logits_all, cache = prefill(params, prompt_rep, enc_rep, cache, config,
                                compute_dtype, precision, all_logits=True)
    # no-speech prob from beam 0 of each item (all beams identical here)
    ns_prob = _no_speech_prob(
        logits_all.reshape(B, K, prompt_len, V)[:, 0], no_speech)
    logits = logits_all[:, -1, :]
    from ..model.qdecode import qf_supported
    use_qf = bool(qf_mode) and qf_supported(qd, B * K)   # beams decode B*K
    if use_qf:
        from ..model.qdecode import quantize_cache
        cache = quantize_cache(cache, mode=qf_mode)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32) + suppress_bias[None, :])
    logp = logp.reshape(B, K, V)
    # all beams are identical after prefill: keep beam 0, kill the rest so the
    # first top-k picks K DISTINCT tokens
    beam_mask = jnp.where(jnp.arange(K) == 0, 0.0, NEG)[None, :, None]
    first_scores = logp + beam_mask  # [B, K, V]

    top_scores, top_idx = jax.lax.top_k(first_scores.reshape(B, K * V), K)
    first_tokens = (top_idx % V).astype(jnp.int32)  # [B, K]

    tokens = jnp.full((B, K, max_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :, :prompt_len].set(prompt_rep.reshape(B, K, prompt_len))
    tokens = tokens.at[:, :, prompt_len].set(first_tokens)
    scores = top_scores  # [B, K]
    done = first_tokens == eot
    # total hypothesis length (prompt + generated incl. EOT) at finish time;
    # 0 = still active (resolved to the loop-exit length afterwards)
    fin_len = jnp.where(done, jnp.int32(prompt_len + 1), 0)

    def cond(state):
        pos, _, done, _, _, _ = state
        return jnp.logical_and(pos + 1 < max_len, ~jnp.all(done))

    def body(state):
        pos, tokens, done, scores, fin_len, cache = state
        tok = jax.lax.dynamic_slice(
            tokens, (0, 0, pos), (B, K, 1))[:, :, 0]  # [B, K]
        if qd is None:
            logits, cache = decode_step(
                params, _flatten_beams(tok), pos, cache, config,
                compute_dtype, precision)
        elif use_qf:
            from ..model.qdecode import decode_step_qf
            logits, cache = decode_step_qf(
                params, qd, _flatten_beams(tok), pos, cache, config,
                compute_dtype, enc_len=enc_out.shape[1])
        else:
            from ..model.qdecode import decode_step_q
            logits, cache = decode_step_q(
                params, qd, _flatten_beams(tok), pos, cache, config,
                compute_dtype)
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32) + suppress_bias[None, :]).reshape(B, K, V)

        # finished beams may only emit EOT, at zero cost (score frozen)
        eot_onehot = jnp.where(jnp.arange(V)[None, None, :] == eot, 0.0, NEG)
        logp = jnp.where(done[:, :, None], eot_onehot, logp)

        cand = scores[:, :, None] + logp  # [B, K, V]
        new_scores, top_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        src_beam = (top_idx // V).astype(jnp.int32)  # [B, K]
        new_tok = (top_idx % V).astype(jnp.int32)    # [B, K]

        # reorder beam-major state by src_beam
        tokens = jnp.take_along_axis(tokens, src_beam[:, :, None], axis=1)
        was_done = jnp.take_along_axis(done, src_beam, axis=1)
        fin_len = jnp.take_along_axis(fin_len, src_beam, axis=1)

        # reorder SELF KV caches: [L, B*K, T, .] -> [L, B, K, T, .] gather.
        # Cross caches are NOT reordered: beams of one item share identical
        # cross K/V (prefilled from the repeated encoder output), so the
        # within-item gather would be an expensive identity (245 MB/step
        # on large-v3).
        def reorder(c):
            if c is None:
                return None
            L = c.shape[0]
            cb = c.reshape(L, B, K, *c.shape[2:])
            return jnp.take_along_axis(
                cb, src_beam[None, :, :, None, None], axis=2
            ).reshape(c.shape)

        cache = cache._replace(
            **{f: reorder(getattr(cache, f))
               for f in ("self_k", "self_v") if hasattr(cache, f)},
            **{f: reorder(getattr(cache, f))
               for f in ("self_kq", "self_ks", "self_vq", "self_vs")
               if hasattr(cache, f)})

        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, :, None], (0, 0, pos + 1))
        done = jnp.logical_or(was_done, new_tok == eot)
        fin_len = jnp.where((~was_done) & done, pos + 2, fin_len)

        # patience early-stop (beam.rs:278): per item, stop when the best
        # COMPLETED normalized score beats the worst ACTIVE candidate's
        # normalized score * patience. Forced-stopped actives keep their
        # current length, like the reference folding incomplete hypotheses
        # into the completed pool.
        lens_f = jnp.where(done, fin_len,
                           pos + 2).astype(jnp.float32)
        norm = new_scores / jnp.power(lens_f, length_penalty)
        best_completed = jnp.max(jnp.where(done, norm, NEG), axis=1)
        worst_active = jnp.min(jnp.where(done, -NEG, norm), axis=1)
        stop = (jnp.any(done, axis=1) & jnp.any(~done, axis=1)
                & (best_completed > worst_active * patience))
        newly_stopped = stop[:, None] & ~done
        fin_len = jnp.where(newly_stopped, pos + 2, fin_len)
        done = done | stop[:, None]
        return pos + 1, tokens, done, new_scores, fin_len, cache

    pos0 = jnp.int32(prompt_len)
    pos, tokens, done, scores, fin_len, _ = jax.lax.while_loop(
        cond, body, (pos0, tokens, done, scores, fin_len, cache))

    # active beams at loop exit: current total length (no EOT emitted)
    lengths = jnp.where(fin_len > 0, fin_len, pos + 1)  # [B, K]

    # reference normalized score: score / len^length_penalty (beam.rs:45)
    norm = scores / jnp.power(lengths.astype(jnp.float32), length_penalty)
    if return_nbest:
        order = jnp.argsort(-norm, axis=1)
        tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
        lengths = jnp.take_along_axis(lengths, order, axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        return DecodeResult(tokens, lengths, scores, ns_prob)
    best = jnp.argmax(norm, axis=1)  # [B]
    tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return DecodeResult(tokens, lengths, scores, ns_prob)
