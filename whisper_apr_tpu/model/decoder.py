"""Whisper text decoder: KV-cached autoregressive transformer, TPU-native.

Re-designs the reference decoder (reference: src/model/decoder.rs:1478
Decoder, :433 DecoderKVCache, :2125 forward_one, :2471 generate) around XLA's
static-shape compilation model:

- KV caches are PRE-ALLOCATED fixed arrays ``[L, B, T_max, D]`` updated with
  ``dynamic_update_slice`` (vs the reference's growing Vec appends,
  decoder.rs:123) — zero reallocation by construction.
- Cross-attention K/V are computed once from encoder output before decoding
  (the reference computes-and-caches on first token, decoder.rs:2276-2308).
- The greedy decode loop runs ENTIRELY on device under ``lax.while_loop``
  with a per-sequence done-mask (the batched analog of generate_batch's
  ``finished`` flags, decoder.rs:2629-2680) — no host round-trip per token.
- Transformer blocks run under ``lax.scan`` over stacked layer params.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, linear, mha, softmax

_HIGHEST = jax.lax.Precision.HIGHEST

# Greedy while_loop tail: with the fused-attention step (qf_mode) and no
# timestamp rules, replace the XLA vocab tail (logits round-trip + bias +
# argmax + full log_softmax over ~52k) with the in-kernel greedy head
# (ops/qmatvec.qmatvec_greedy_head). Token-exact vs the logits path
# (pinned in tests/test_qdecode.py). Default ON since the session-7
# production-shaped A/B: with the cross8 B=1 cache the head kernel wins
# (qf_prodhead_cross8 1.702 vs qf_prod_cross8 1.715 ms/step, large-v3
# int8 B=1 — the in-kernel logsumexp replaces the loop's full [1, 52k]
# log_softmax), and it is neutral at B=8 slots (0.910 vs 0.908
# ms/slot-token). The plain probe bodies (qf_fusedhead ~ qf_defer,
# session 6) showed neutral only because they omit that log_softmax.
FUSED_GREEDY_HEAD = True


class KVCache(NamedTuple):
    """Decode-time state (reference analog: DecoderKVCache, decoder.rs:433).

    self_k/self_v: [L, B, T_max, D]   — causal self-attention cache
    cross_k/cross_v: [L, B, S, D]     — encoder K/V, computed once
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray


def _attn_proj(h: jnp.ndarray, a: dict, what: str, precision=None) -> jnp.ndarray:
    return linear(h, a[f"{what}_w"], a[f"{what}_b"], precision)


def precompute_cross_kv(params: dict, enc_out: jnp.ndarray,
                        precision=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder K/V projections for every decoder layer, computed once
    (reference: decoder.rs:2276-2296 cross_attn_cached).

    enc_out: [B, S, D] -> (cross_k, cross_v): [L, B, S, D]
    """
    blocks = params["decoder"]["blocks"]

    def per_layer(ca_k_w, ca_k_b, ca_v_w, ca_v_b):
        k = linear(enc_out, ca_k_w, ca_k_b, precision)
        v = linear(enc_out, ca_v_w, ca_v_b, precision)
        return k, v

    ca = blocks["cross_attn"]
    return jax.vmap(per_layer)(ca["k_w"], ca["k_b"], ca["v_w"], ca["v_b"])


def init_cache(params: dict, enc_out: jnp.ndarray, config: ModelConfig,
               max_len: Optional[int] = None, precision=None,
               compute_dtype: jnp.dtype = jnp.float32) -> KVCache:
    """Allocate the fixed-shape decode cache and fill cross K/V."""
    max_len = max_len or config.n_text_ctx
    L, B = config.n_text_layer, enc_out.shape[0]
    D = config.n_text_state
    ck, cv = precompute_cross_kv(params, enc_out.astype(compute_dtype), precision)
    return KVCache(
        self_k=jnp.zeros((L, B, max_len, D), dtype=compute_dtype),
        self_v=jnp.zeros((L, B, max_len, D), dtype=compute_dtype),
        cross_k=ck, cross_v=cv)


def _block_step(x: jnp.ndarray, blk: dict, k_cache: jnp.ndarray,
                v_cache: jnp.ndarray, cross_k: jnp.ndarray,
                cross_v: jnp.ndarray, pos: jnp.ndarray, n_heads: int,
                precision=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder block for ONE new token (reference: decoder.rs:2241
    forward_block_cached). x: [B, 1, D]; caches: [B, T_max, D] / [B, S, D].
    Returns (x, new_k_cache, new_v_cache).
    """
    B, _, D = x.shape
    T_max = k_cache.shape[1]

    # self-attention over the cache (reference: decoder.rs:2414
    # compute_attention_cached)
    h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
    sa = blk["self_attn"]
    q = _attn_proj(h, sa, "q", precision)
    k_new = _attn_proj(h, sa, "k", precision)
    v_new = _attn_proj(h, sa, "v", precision)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, pos, 0))
    # mask future (unwritten) cache slots
    valid = (jnp.arange(T_max) <= pos)[None, None, None, :]  # [1,1,1,T_max]
    attn = mha(q, k_cache, v_cache, n_heads, mask=valid, precision=precision)
    x = x + linear(attn, sa["o_w"], sa["o_b"], precision)

    # cross-attention over precomputed encoder K/V
    h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
    ca = blk["cross_attn"]
    q = _attn_proj(h, ca, "q", precision)
    attn = mha(q, cross_k, cross_v, n_heads, precision=precision)
    x = x + linear(attn, ca["o_w"], ca["o_b"], precision)

    # FFN
    h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
    h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"], precision)),
               blk["fc2"]["w"], blk["fc2"]["b"], precision)
    return x + h, k_cache, v_cache


def embed(params: dict, tokens: jnp.ndarray, pos_start,
          compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Token + learned positional embedding (reference: decoder.rs:1606)."""
    from ..ops.quant import dequant, is_quantized
    dec = params["decoder"]
    T = tokens.shape[-1]
    emb = dec["token_emb"]
    if is_quantized(emb):
        # gather int8 rows, then dequant only the gathered slice
        rows = emb.q[tokens]
        scale = emb.scale.astype(compute_dtype)
        while scale.ndim > 1:  # per-channel keepdims [1, d] -> [d]
            scale = scale[0]
        tok = rows.astype(compute_dtype) * scale
    else:
        tok = emb[tokens]
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos_start, T, axis=0)
    return (tok.astype(compute_dtype) + pos[None, :, :].astype(compute_dtype))


def project_to_vocab(params: dict, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Weight-tied vocab projection (reference: decoder.rs:1794
    project_to_vocab, cached transposed embedding at :1493). Logits in f32.
    """
    from ..ops.quant import dequant
    emb = dequant(params["decoder"]["token_emb"], x.dtype)
    return jnp.dot(x, emb.T, precision=precision).astype(jnp.float32)


def decode_step(params: dict, token: jnp.ndarray, pos: jnp.ndarray,
                cache: KVCache, config: ModelConfig,
                compute_dtype: jnp.dtype = jnp.float32,
                precision=None) -> Tuple[jnp.ndarray, KVCache]:
    """Incremental single-token forward (reference: decoder.rs:2125
    forward_one). token: [B] int32 at position ``pos``; returns
    (logits [B, V] f32, updated cache).
    """
    x = embed(params, token[:, None], pos, compute_dtype)  # [B,1,D]
    blocks = params["decoder"]["blocks"]
    n_heads = config.n_text_head

    def body(x, layer):
        blk, k_c, v_c, c_k, c_v = layer
        x, new_k, new_v = _block_step(
            x, blk, k_c, v_c, c_k, c_v, pos, n_heads, precision)
        return x, (new_k, new_v)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x[:, 0, :], precision)
    return logits, KVCache(new_k, new_v, cache.cross_k, cache.cross_v)


def decoder_forward(params: dict, tokens: jnp.ndarray, enc_out: jnp.ndarray,
                    config: ModelConfig,
                    compute_dtype: jnp.dtype = jnp.float32,
                    precision=None) -> jnp.ndarray:
    """Full teacher-forced forward over all positions (reference:
    decoder.rs:1606 forward). tokens: [B, T] -> logits [B, T, V].

    The oracle for KV-cache correctness: batch-vs-incremental equivalence
    (reference: tests/integration_transcribe.rs:305).
    """
    B, T = tokens.shape
    x = embed(params, tokens, 0, compute_dtype)
    enc_out = enc_out.astype(compute_dtype)
    n_heads = config.n_text_head
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None, :, :]
    blocks = params["decoder"]["blocks"]

    def body(x, blk):
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q", precision)
        k = _attn_proj(h, sa, "k", precision)
        v = _attn_proj(h, sa, "v", precision)
        x = x + linear(mha(q, k, v, n_heads, mask=causal, precision=precision),
                       sa["o_w"], sa["o_b"], precision)

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q", precision)
        k = _attn_proj(enc_out, ca, "k", precision)
        v = _attn_proj(enc_out, ca, "v", precision)
        x = x + linear(mha(q, k, v, n_heads, precision=precision),
                       ca["o_w"], ca["o_b"], precision)

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"], precision)),
                   blk["fc2"]["w"], blk["fc2"]["b"], precision)
        return x + h, None

    x, _ = jax.lax.scan(body, x, blocks)
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    return project_to_vocab(params, x, precision)


def prefill(params: dict, tokens: jnp.ndarray, enc_out: jnp.ndarray,
            cache: KVCache, config: ModelConfig,
            compute_dtype: jnp.dtype = jnp.float32,
            precision=None, all_logits: bool = False
            ) -> Tuple[jnp.ndarray, KVCache]:
    """Process the whole prompt in one forward, filling the self-KV cache
    for positions ``[0, T)``. Returns (last-position logits [B, V], cache);
    with ``all_logits`` the logits cover every prompt position [B, T, V]
    (needed for the no-speech probability, read at the SOT position).
    """
    B, T = tokens.shape
    x = embed(params, tokens, 0, compute_dtype)
    n_heads = config.n_text_head
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None, :, :]
    blocks = params["decoder"]["blocks"]

    def body(x, layer):
        blk, k_cache, v_cache, c_k, c_v = layer
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q", precision)
        k = _attn_proj(h, sa, "k", precision)
        v = _attn_proj(h, sa, "v", precision)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, 0))
        x = x + linear(mha(q, k, v, n_heads, mask=causal, precision=precision),
                       sa["o_w"], sa["o_b"], precision)

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q", precision)
        x = x + linear(mha(q, c_k, c_v, n_heads, precision=precision),
                       ca["o_w"], ca["o_b"], precision)

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"], precision)),
                   blk["fc2"]["w"], blk["fc2"]["b"], precision)
        return x + h, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x if all_logits else x[:, -1, :],
                              precision)
    return logits, KVCache(new_k, new_v, cache.cross_k, cache.cross_v)


# ---------------------------------------------------------------------------
# On-device greedy generation
# ---------------------------------------------------------------------------

class DecodeResult(NamedTuple):
    """Decode output + the whisper.cpp quality-gate signals.

    sum_logprob covers generated tokens (EOT included, prompt excluded) so
    ``avg_logprob = sum_logprob / (lengths - prompt_len)`` matches OpenAI's
    ``sum_logprobs / (len(tokens) + 1)``. no_speech_prob is the softmax mass
    on the NO_SPEECH token at the SOT position (OpenAI ``probs_at_sot``);
    zeros when no ``no_speech`` id was supplied.
    """

    tokens: jnp.ndarray        # [B, max_len] int32, EOT padded
    lengths: jnp.ndarray       # [B] int32, prompt + generated incl. EOT
    sum_logprob: jnp.ndarray   # [B] f32
    no_speech_prob: jnp.ndarray  # [B] f32


def _no_speech_prob(logits_all: jnp.ndarray, no_speech: int) -> jnp.ndarray:
    """P(NO_SPEECH) at the SOT position from raw (unsuppressed) prompt
    logits [B, T, V]; the suppressor would have -inf'd the token."""
    if no_speech < 0:
        return jnp.zeros(logits_all.shape[0], jnp.float32)
    probs = jax.nn.softmax(logits_all[:, 0, :].astype(jnp.float32), axis=-1)
    return probs[:, no_speech]


def _chosen_logprob(biased_logits: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
    """Log-prob of the chosen token under the distribution decoded from."""
    logp = jax.nn.log_softmax(biased_logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token[:, None].astype(jnp.int32),
                               axis=1)[:, 0]

def greedy_generate_body(params: dict, enc_out: jnp.ndarray, prompt: jnp.ndarray,
                         suppress_bias: jnp.ndarray, eot: int,
                         config: ModelConfig, max_len: int = 448,
                         prompt_len: int = 4,
                         compute_dtype: jnp.dtype = jnp.float32,
                         fidelity: bool = False,
                         timestamp_base: int = -1,
                         no_speech: int = -1,
                         qd: Optional[dict] = None,
                         qf_mode: Optional[str] = None,
                         fused_head: Optional[bool] = None) -> DecodeResult:
    """Greedy decode, fully on device (reference semantics:
    src/inference/greedy.rs:119-143 — argmax until EOT, EOT appended, total
    length capped at ``max_len`` including the prompt; suppression applied
    to every step's logits, processors.rs:129).

    prompt: [B, prompt_len] int32; suppress_bias: [V] f32 (0 or -inf added
    to logits). ``no_speech`` (the NO_SPEECH token id, or -1 to skip) turns
    on the no-speech probability read at the SOT position. ``qd`` (from
    ``qdecode.prepare_qdecode``) switches the per-token step to the Pallas
    quantized-matvec fast path; prefill stays on XLA (GEMM-shaped).
    ``qf_mode`` (with qd) selects the fused-attention step: "bf16" fuses
    attention+o-proj into one Pallas call per block (token-exact vs the
    scan path, logits within ~1e-5 — the kernels reorder dots via the
    head-expansion matmul and use the A&S erf approximation);
    "int8" additionally keeps the KV caches int8 with per-row scales
    (~half the KV bandwidth, ~1e-3-relative logit error).
    """
    precision = _HIGHEST if fidelity else None
    B = enc_out.shape[0]
    cache = init_cache(params, enc_out, config, max_len,
                       precision, compute_dtype)

    from .qdecode import qf_supported
    use_qf = bool(qf_mode) and qf_supported(qd, B)
    use_ts = timestamp_base >= 0
    # Fused greedy head (ops/qmatvec.qmatvec_greedy_head): the while_loop
    # body gets (token, max_logit, logsumexp) straight from the vocab
    # kernel — no [B, 52k] logits round-trip, no XLA bias/argmax and no
    # full log_softmax per step (the chosen token IS the argmax, so its
    # logprob is max_logit - logsumexp). Timestamp rules need the full
    # logits row, so that path keeps the logits tail. ``fused_head`` is a
    # STATIC argument (not the module flag read at trace time) so flipping
    # it retraces instead of hitting a stale jit cache entry.
    if fused_head is None:
        fused_head = FUSED_GREEDY_HEAD
    fused_head = use_qf and not use_ts and fused_head
    if qd is None:
        step_fn = functools.partial(decode_step, params,
                                    config=config,
                                    compute_dtype=compute_dtype,
                                    precision=precision)
    elif use_qf:
        from .qdecode import decode_step_qf
        step_fn = functools.partial(decode_step_qf, params, qd,
                                    config=config,
                                    compute_dtype=compute_dtype,
                                    enc_len=enc_out.shape[1])
        if fused_head:
            v_pad = qd["vocab_qT"].shape[2]
            gb = jnp.zeros((1, v_pad), jnp.float32)
            gb = gb.at[0, : suppress_bias.shape[0]].set(
                suppress_bias.astype(jnp.float32))
            step_fn = functools.partial(step_fn, greedy_bias=gb)
    else:
        from .qdecode import decode_step_q
        step_fn = functools.partial(decode_step_q, params, qd,
                                    config=config,
                                    compute_dtype=compute_dtype)

    logits_all, cache = prefill(params, prompt, enc_out, cache, config,
                                compute_dtype, precision, all_logits=True)
    if use_qf:
        from .qdecode import quantize_cache
        cache = quantize_cache(cache, mode=qf_mode)
    ns_prob = _no_speech_prob(logits_all, no_speech)
    logits = logits_all[:, -1, :]

    tokens = jnp.full((B, max_len), eot, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))

    if use_ts:
        from ..inference import timestamp_rules as tsr
        ts_state = tsr.init_state(B)
        first_logits = tsr.apply_rules(
            logits + suppress_bias[None, :], ts_state, timestamp_base, eot,
            is_first=jnp.ones(B, bool))
    else:
        ts_state = None
        first_logits = logits + suppress_bias[None, :]

    first = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    tokens = tokens.at[:, prompt_len].set(first)
    done0 = first == eot
    sum_lp0 = _chosen_logprob(first_logits, first)
    if use_ts:
        ts_state = tsr.update_state(ts_state, first, timestamp_base)

    def cond(state):
        pos = state[0]
        done = state[2]
        return jnp.logical_and(pos + 1 < max_len, ~jnp.all(done))

    def body(state):
        if use_ts:
            pos, tokens, done, sum_lp, cache, ts = state
        else:
            pos, tokens, done, sum_lp, cache = state
        tok = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)[:, 0]
        if fused_head:
            (nxt, mx, lz), cache = step_fn(token=tok, pos=pos, cache=cache)
            nxt = jnp.where(done, jnp.int32(eot), nxt)
            sum_lp = sum_lp + jnp.where(done, 0.0, mx - lz)
        else:
            logits, cache = step_fn(token=tok, pos=pos, cache=cache)
            biased = logits + suppress_bias[None, :]
            if use_ts:
                biased = tsr.apply_rules(biased, ts, timestamp_base, eot,
                                         is_first=jnp.zeros(B, bool))
            nxt = jnp.argmax(biased, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, jnp.int32(eot), nxt)
            sum_lp = sum_lp + jnp.where(done, 0.0,
                                        _chosen_logprob(biased, nxt))
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, pos + 1))
        done = jnp.logical_or(done, nxt == eot)
        if use_ts:
            return pos + 1, tokens, done, sum_lp, cache, tsr.update_state(
                ts, nxt, timestamp_base)
        return pos + 1, tokens, done, sum_lp, cache

    pos0 = jnp.int32(prompt_len)
    init = ((pos0, tokens, done0, sum_lp0, cache, ts_state) if use_ts
            else (pos0, tokens, done0, sum_lp0, cache))
    out_state = jax.lax.while_loop(cond, body, init)
    tokens, sum_lp = out_state[1], out_state[3]

    # length = index of first EOT after the prompt, + 1 (EOT included,
    # reference: greedy.rs:133-137), or max_len if none was produced
    is_eot = tokens[:, :] == eot
    # ignore EOT-valued tokens inside the prompt
    idx = jnp.arange(max_len)[None, :]
    is_eot = jnp.logical_and(is_eot, idx >= prompt_len)
    has_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(has_eot, first_eot + 1, max_len)
    return DecodeResult(tokens, lengths, sum_lp, ns_prob)


greedy_generate = functools.partial(
    jax.jit,
    static_argnames=("config", "max_len", "prompt_len", "compute_dtype",
                     "fidelity", "timestamp_base", "no_speech",
                     "qf_mode", "fused_head"))(greedy_generate_body)
