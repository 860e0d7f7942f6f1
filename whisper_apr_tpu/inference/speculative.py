"""Speculative (self-drafting) greedy decode — multi-token single-stream.

Sequential decode reads every decoder weight once PER TOKEN; that weight
traffic, not compute, bounds single-stream latency. Speculation amortizes
it: a cheap DRAFT proposes k tokens, then ONE full forward over the k+1
positions verifies them (the verify pass reads the weights once for all
k+1 positions). Greedy acceptance keeps the output TOKEN-EXACT: a draft
token is accepted only while it equals the full model's argmax, and the
first mismatch is replaced by the full model's own choice, so every emitted
token is exactly what plain greedy would have produced.

The draft here is the model's own first ``draft_layers`` decoder layers
(early exit through the final LayerNorm + vocab head) — no second model,
and the draft's K/V writes at those layers are IDENTICAL to the full
model's (same weights, same inputs), so they share the one KV cache; the
verify pass overwrites all layers at the drafted positions anyway.

(Builder roadmap item; no reference counterpart — the reference decodes
strictly one token per step, greedy.rs:119.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..model.decoder import (KVCache, _attn_proj, _block_step, embed,
                             init_cache, prefill, project_to_vocab)
from ..ops.basic import gelu, layer_norm, linear, mha

_HIGHEST = jax.lax.Precision.HIGHEST


def _head_blocks(params: dict, n_layers: int) -> dict:
    """First ``n_layers`` of the stacked decoder blocks."""
    return jax.tree_util.tree_map(
        lambda x: x[:n_layers], params["decoder"]["blocks"])


def draft_step(params: dict, token: jnp.ndarray, pos, cache: KVCache,
               config: ModelConfig, draft_layers: int,
               compute_dtype=jnp.float32, precision=None
               ) -> Tuple[jnp.ndarray, KVCache]:
    """Shallow decode step: first ``draft_layers`` layers + early-exit head.

    Writes K/V only for those layers (valid for the full model too — same
    weights and inputs). token [B] at ``pos`` -> (draft logits [B, V], cache).
    """
    Ld = draft_layers
    x = embed(params, token[:, None], pos, compute_dtype)
    n_heads = config.n_text_head
    blocks = _head_blocks(params, Ld)

    def body(x, layer):
        blk, k_c, v_c, c_k, c_v = layer
        x, new_k, new_v = _block_step(
            x, blk, k_c, v_c, c_k, c_v, pos, n_heads, precision)
        return x, (new_k, new_v)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, cache.self_k[:Ld], cache.self_v[:Ld],
                  cache.cross_k[:Ld], cache.cross_v[:Ld]))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x[:, 0, :], precision)
    cache = KVCache(
        jax.lax.dynamic_update_slice(cache.self_k, new_k, (0, 0, 0, 0)),
        jax.lax.dynamic_update_slice(cache.self_v, new_v, (0, 0, 0, 0)),
        cache.cross_k, cache.cross_v)
    return logits, cache


def decode_chunk(params: dict, tokens: jnp.ndarray, pos_start,
                 cache: KVCache, config: ModelConfig,
                 compute_dtype=jnp.float32, precision=None
                 ) -> Tuple[jnp.ndarray, KVCache]:
    """Full forward over T tokens at positions [pos_start, pos_start+T)
    against the KV cache (chunked prefill / the verify pass).

    tokens [B, T] -> logits [B, T, V]; writes K/V for all T positions at
    every layer.
    """
    B, T = tokens.shape
    x = embed(params, tokens, pos_start, compute_dtype)
    n_heads = config.n_text_head
    T_max = cache.self_k.shape[2]
    # position pos_start+i attends cache positions <= pos_start+i
    key_pos = jnp.arange(T_max)[None, :]                    # [1, T_max]
    qry_pos = pos_start + jnp.arange(T)[:, None]            # [T, 1]
    mask = (key_pos <= qry_pos)[None, None, :, :]           # [1,1,T,T_max]

    def body(x, layer):
        blk, k_c, v_c, c_k, c_v = layer
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q", precision)
        k_new = _attn_proj(h, sa, "k", precision)
        v_new = _attn_proj(h, sa, "v", precision)
        k_c = jax.lax.dynamic_update_slice(k_c, k_new, (0, pos_start, 0))
        v_c = jax.lax.dynamic_update_slice(v_c, v_new, (0, pos_start, 0))
        attn = mha(q, k_c, v_c, n_heads, mask=mask, precision=precision)
        x = x + linear(attn, sa["o_w"], sa["o_b"], precision)

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q", precision)
        x = x + linear(mha(q, c_k, c_v, n_heads, precision=precision),
                       ca["o_w"], ca["o_b"], precision)

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"],
                               precision)),
                   blk["fc2"]["w"], blk["fc2"]["b"], precision)
        return x + h, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (params["decoder"]["blocks"], cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x, precision)
    return logits, KVCache(new_k, new_v, cache.cross_k, cache.cross_v)


class SpecResult(NamedTuple):
    tokens: jnp.ndarray      # [1, max_len] EOT-padded
    lengths: jnp.ndarray     # [1]
    n_verify_passes: jnp.ndarray  # [] int32 — full-model forwards used
    n_accepted: jnp.ndarray  # [] int32 — draft tokens accepted
    sum_logprob: jnp.ndarray      # [1] — emitted tokens incl. EOT
    no_speech_prob: jnp.ndarray   # [1] — at the SOT position


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_len", "prompt_len", "draft_tokens",
                     "draft_layers", "compute_dtype", "fidelity",
                     "no_speech"))
def speculative_greedy_generate(params: dict, enc_out: jnp.ndarray,
                                prompt: jnp.ndarray,
                                suppress_bias: jnp.ndarray, eot: int,
                                config: ModelConfig, max_len: int = 448,
                                prompt_len: int = 4, draft_tokens: int = 4,
                                draft_layers: int = 1,
                                compute_dtype=jnp.float32,
                                fidelity: bool = False,
                                no_speech: int = -1) -> SpecResult:
    """Single-stream (B=1) speculative greedy decode, fully on device.

    Token-exact vs ``greedy_generate``: every emitted token is the full
    model's argmax given its prefix. draft_tokens=k drafts per round;
    the verify pass emits between 1 and k+1 tokens.
    """
    precision = _HIGHEST if fidelity else None
    B = enc_out.shape[0]
    assert B == 1, "speculative decode is the single-stream fast path"
    k = draft_tokens
    cache = init_cache(params, enc_out, config, max_len, precision,
                       compute_dtype)
    logits_all, cache = prefill(params, prompt, enc_out, cache, config,
                                compute_dtype, precision, all_logits=True)
    from ..model.decoder import _no_speech_prob
    ns_prob = _no_speech_prob(logits_all, no_speech)
    logits = logits_all[:, -1, :]
    tokens = jnp.full((B, max_len), eot, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32),
                                          (0, 0))
    biased0 = logits + suppress_bias[None, :]
    first = jnp.argmax(biased0, axis=-1).astype(jnp.int32)
    lp0 = jax.nn.log_softmax(biased0.astype(jnp.float32))[0, first[0]]
    tokens = tokens.at[:, prompt_len].set(first)
    done0 = (first == eot)[0]

    def cond(state):
        pos, _, done, _, _, _, _ = state
        return jnp.logical_and(pos + 1 < max_len - (k + 1), ~done)

    def body(state):
        pos, tokens, done, cache, n_ver, n_acc, sum_lp = state
        # ---- draft k tokens with the shallow head --------------------------
        def draft_body(i, dstate):
            dtoks, dcache = dstate
            tok = jax.lax.dynamic_slice(dtoks, (0, i), (1, 1))[:, 0]
            dlogits, dcache = draft_step(
                params, tok, pos + i, dcache, config, draft_layers,
                compute_dtype, precision)
            nxt = jnp.argmax(dlogits + suppress_bias[None, :], axis=-1
                             ).astype(jnp.int32)
            dtoks = jax.lax.dynamic_update_slice(dtoks, nxt[:, None],
                                                 (0, i + 1))
            return dtoks, dcache

        cur = jax.lax.dynamic_slice(tokens, (0, pos), (1, 1))
        dtoks0 = jnp.concatenate(
            [cur, jnp.zeros((1, k), jnp.int32)], axis=1)  # [1, k+1]
        dtoks, cache = jax.lax.fori_loop(0, k, draft_body, (dtoks0, cache))

        # ---- verify all k+1 positions in ONE full forward -------------------
        v_logits, cache = decode_chunk(params, dtoks, pos, cache, config,
                                       compute_dtype, precision)
        v_logits = v_logits + suppress_bias[None, None, :]
        argmax = jnp.argmax(v_logits, axis=-1).astype(jnp.int32)[0]  # [k+1]

        # accept drafts while they match the full model's argmax
        drafts = dtoks[0, 1:]                       # [k]
        match = drafts == argmax[:k]
        m = jnp.argmin(jnp.concatenate(
            [match, jnp.zeros(1, bool)]).astype(jnp.int32))  # first mismatch
        # emitted tokens: argmax[0..m] — accepted drafts ARE argmax values,
        # plus the correction (or bonus) at index m — total m+1 tokens
        idx = jnp.arange(k + 1)
        emit = jnp.where(idx <= m, argmax, eot)     # EOT-pad beyond
        tokens = jax.lax.dynamic_update_slice(tokens, emit[None, :],
                                              (0, pos + 1))
        hit_eot = jnp.any(jnp.where(idx <= m, emit == eot, False))
        # quality-gate accumulation (matches the plain greedy path):
        # log-probs of emitted tokens up to and INCLUDING the first EOT
        lp = jax.nn.log_softmax(v_logits.astype(jnp.float32), axis=-1)[0]
        chosen = jnp.take_along_axis(lp, argmax[:, None], axis=1)[:, 0]
        prev_eot = jnp.cumsum(
            jnp.concatenate([jnp.zeros(1, jnp.int32),
                             (emit == eot).astype(jnp.int32)[:-1]])) == 0
        valid = (idx <= m) & prev_eot
        sum_lp = sum_lp + jnp.sum(jnp.where(valid, chosen, 0.0))
        new_pos = pos + 1 + m
        return (new_pos, tokens, done | hit_eot, cache,
                n_ver + 1, n_acc + m, sum_lp)

    pos0 = jnp.int32(prompt_len)
    pos, tokens, done, cache, n_ver, n_acc, sum_lp = jax.lax.while_loop(
        cond, body,
        (pos0, tokens, done0, cache, jnp.int32(0), jnp.int32(0), lp0))

    # tail: finish sequentially if the window ended near max_len
    def tail_cond(state):
        pos, _, done, _, _ = state
        return jnp.logical_and(pos + 1 < max_len, ~done)

    def tail_body(state):
        pos, tokens, done, cache, sum_lp = state
        from ..model.decoder import decode_step
        tok = jax.lax.dynamic_slice(tokens, (0, pos), (1, 1))[:, 0]
        logits, cache = decode_step(params, tok, pos, cache, config,
                                    compute_dtype, precision)
        biased = logits + suppress_bias[None, :]
        nxt = jnp.argmax(biased, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, jnp.int32(eot), nxt)
        lp = jax.nn.log_softmax(biased.astype(jnp.float32))[0, nxt[0]]
        sum_lp = sum_lp + jnp.where(done, 0.0, lp)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, pos + 1))
        return pos + 1, tokens, done | (nxt[0] == eot), cache, sum_lp

    _, tokens, _, _, sum_lp = jax.lax.while_loop(
        tail_cond, tail_body, (pos, tokens, done, cache, sum_lp))

    idx = jnp.arange(max_len)[None, :]
    is_eot = jnp.logical_and(tokens == eot, idx >= prompt_len)
    has_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(has_eot, first_eot + 1, max_len)
    return SpecResult(tokens, lengths, n_ver, n_acc,
                      sum_lp[None], ns_prob)
