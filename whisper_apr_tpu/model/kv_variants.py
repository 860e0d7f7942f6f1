"""KV-cache variants: per-slot positions, sliding window, paged.

(reference: src/model/decoder.rs — StreamingKVCache sliding window with
context overlap :541 (presets low_latency 64/16, ultra 32/8, standard 448/64
at :584-606, slide_window :692, warm_up :739, stats :767), CircularKVBuffer
:278, PagedDecoderKVCache over realizar PagedKvCache :835 with 16-token
pages.)

TPU formulation: every variant keeps FIXED-shape arrays; "sliding" and
"paging" are index arithmetic, not reallocation.

- ``decode_step_multi``: like decoder.decode_step but with a PER-SEQUENCE
  position vector — the primitive continuous batching needs (each serving
  slot is at a different decode depth).
- ``SlidingKVCache``: ring-buffer positions ``pos % window`` with attention
  masked to the last ``window`` tokens.
- ``PagedKVCache``: host-side page allocator + device page pool; pages are
  gathered per step (the vLLM-style layout; a Pallas paged-attention kernel
  can later consume the same tables).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..errors import InferenceError
from ..ops.basic import gelu, layer_norm, linear, mha
from .decoder import KVCache, _attn_proj, embed, project_to_vocab


def _scatter_rows(cache: jnp.ndarray, new: jnp.ndarray,
                  pos: jnp.ndarray) -> jnp.ndarray:
    """cache [B, T, D] <- new [B, 1, D] at per-batch row ``pos`` [B]."""
    B = cache.shape[0]
    return cache.at[jnp.arange(B), pos].set(new[:, 0])


def decode_step_multi(params: dict, token: jnp.ndarray, pos: jnp.ndarray,
                      cache: KVCache, config: ModelConfig,
                      compute_dtype: jnp.dtype = jnp.float32,
                      precision=None) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step with PER-SEQUENCE positions.

    token: [B] int32, pos: [B] int32 (each sequence's current index).
    The continuous-batching primitive: slots at different depths advance in
    one fused step (no reference counterpart — the reference decodes
    sequences independently, decoder.rs:2517 BatchDecoderCache).
    """
    B = token.shape[0]
    # per-sequence positional embedding
    dec = params["decoder"]
    from ..ops.quant import is_quantized
    emb = dec["token_emb"]
    if is_quantized(emb):
        scale = emb.scale.astype(compute_dtype)
        while scale.ndim > 1:
            scale = scale[0]
        tok = emb.q[token].astype(compute_dtype) * scale
    else:
        tok = emb[token].astype(compute_dtype)
    pos_emb = dec["pos_emb"][pos].astype(compute_dtype)  # [B, D]
    x = (tok + pos_emb)[:, None, :]  # [B, 1, D]

    n_heads = config.n_text_head
    T_max = cache.self_k.shape[2]
    valid = (jnp.arange(T_max)[None, :] <= pos[:, None])[:, None, None, :]

    def body(x, layer):
        blk, k_c, v_c, c_k, c_v = layer
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q", precision)
        k_new = _attn_proj(h, sa, "k", precision)
        v_new = _attn_proj(h, sa, "v", precision)
        k_c = _scatter_rows(k_c, k_new, pos)
        v_c = _scatter_rows(v_c, v_new, pos)
        # valid is [B,1,1,T]; broadcast over heads/queries
        attn = mha(q, k_c, v_c, n_heads, mask=valid, precision=precision)
        x = x + linear(attn, sa["o_w"], sa["o_b"], precision)

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q", precision)
        attn = mha(q, c_k, c_v, n_heads, precision=precision)
        x = x + linear(attn, ca["o_w"], ca["o_b"], precision)

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"], precision)),
                   blk["fc2"]["w"], blk["fc2"]["b"], precision)
        return x + h, (k_c, v_c)

    blocks = params["decoder"]["blocks"]
    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x[:, 0, :], precision)
    return logits, KVCache(new_k, new_v, cache.cross_k, cache.cross_v)


def decode_steps_multi(params: dict, token: jnp.ndarray, pos: jnp.ndarray,
                       suppress_bias: jnp.ndarray, cache: KVCache,
                       config: ModelConfig, n_steps: int,
                       compute_dtype: jnp.dtype = jnp.float32,
                       qd: Optional[dict] = None
                       ) -> Tuple[jnp.ndarray, KVCache]:
    """Advance every slot by ``n_steps`` greedy tokens in ONE dispatch.

    Returns (tokens [B, n_steps], cache). Slots that hit EOT mid-tick keep
    stepping (their post-EOT cache writes land at positions the attention
    mask never reaches once the host trims pos back to the EOT index), so
    the host can cut each slot's stream at its own EOT. Amortizes per-
    dispatch overhead on remotely-tunneled devices (~25 ms/executable).
    ``qd`` switches per-token steps to the Pallas quantized-matvec path;
    passing a ``qdecode.QKVCache`` (with qd) selects the per-block
    megakernel step (decode_step_qf) — the cache type IS the switch.
    """
    qf = not hasattr(cache, "self_k")  # QKVCache (fused megakernel path)
    T_max = cache.self_kq.shape[2] if qf else cache.self_k.shape[2]
    if qd is None:
        step = functools.partial(decode_step_multi, params, config=config,
                                 compute_dtype=compute_dtype)
    elif qf:
        from .qdecode import decode_step_qf
        step = functools.partial(decode_step_qf, params, qd, config=config,
                                 compute_dtype=compute_dtype)
    else:
        from .qdecode import decode_step_q
        step = functools.partial(decode_step_q, params, qd, config=config,
                                 compute_dtype=compute_dtype)

    def body(carry, _):
        tok, p, c = carry
        logits, c = step(token=tok, pos=jnp.minimum(p, T_max - 1), cache=c)
        nxt = jnp.argmax(logits + suppress_bias[None, :], axis=-1
                         ).astype(jnp.int32)
        return (nxt, p + 1, c), nxt

    (_, _, cache), toks = jax.lax.scan(
        body, (token, pos, cache), None, length=n_steps)
    return jnp.transpose(toks, (1, 0)), cache


_decode_steps_multi_jit = None


def decode_steps_multi_jit(params, token, pos, suppress_bias, cache, config,
                           n_steps, compute_dtype=jnp.float32, qd=None):
    global _decode_steps_multi_jit
    if _decode_steps_multi_jit is None:
        # donate the cache: XLA reuses its HBM for the updated cache instead
        # of copying [L, B, T_max, D] every tick (the buffer-pool reuse the
        # reference gets from its warmup allocator, pool.rs)
        _decode_steps_multi_jit = jax.jit(
            decode_steps_multi,
            static_argnames=("config", "n_steps", "compute_dtype"),
            donate_argnums=(4,))
    return _decode_steps_multi_jit(params, token, pos, suppress_bias, cache,
                                   config, n_steps, compute_dtype, qd=qd)


# ---------------------------------------------------------------------------
# Sliding-window KV (reference: StreamingKVCache, decoder.rs:541)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SlidingConfig:
    """(reference: decoder.rs:584-606 presets)"""

    window_size: int = 448
    context_overlap: int = 64

    @staticmethod
    def standard() -> "SlidingConfig":
        return SlidingConfig(448, 64)

    @staticmethod
    def low_latency() -> "SlidingConfig":
        return SlidingConfig(64, 16)

    @staticmethod
    def ultra_low_latency() -> "SlidingConfig":
        return SlidingConfig(32, 8)


@dataclasses.dataclass
class SlidingCacheStats:
    """(reference: decoder.rs:767 stats / :796 utilization)"""

    window_size: int
    tokens_seen: int
    slides: int

    @property
    def utilization(self) -> float:
        return min(self.tokens_seen, self.window_size) / self.window_size


class SlidingKVCache:
    """Ring-buffer self-attention cache: position ``t`` lives in slot
    ``t % window``; attention is masked to the most recent ``window`` tokens.

    Unlike the reference's copy-based slide_window (decoder.rs:692), the TPU
    version never copies — sliding is modular indexing, and the mask keeps
    exactly the last ``window`` positions visible.
    """

    def __init__(self, params: dict, enc_out: jnp.ndarray, config: ModelConfig,
                 sliding: Optional[SlidingConfig] = None,
                 compute_dtype: jnp.dtype = jnp.float32) -> None:
        from .decoder import init_cache
        self.sliding = sliding or SlidingConfig.standard()
        self.config = config
        self.compute_dtype = compute_dtype
        self.cache = init_cache(params, enc_out, config,
                                max_len=self.sliding.window_size,
                                compute_dtype=compute_dtype)
        self.tokens_seen = 0

    def step(self, params: dict, token: jnp.ndarray
             ) -> jnp.ndarray:
        """Advance one token for every sequence; returns logits [B, V]."""
        W = self.sliding.window_size
        t = self.tokens_seen
        slot = jnp.full((token.shape[0],), t % W, dtype=jnp.int32)
        logits, cache = _sliding_step(
            params, token, slot, jnp.int32(t), self.cache, self.config, W,
            self.compute_dtype)
        self.cache = cache
        self.tokens_seen += 1
        return logits

    def warm_up(self, other: "SlidingKVCache") -> None:
        """Seed this cache with the last ``context_overlap`` tokens of a
        previous chunk's cache (reference: decoder.rs:739 warm_up — carries
        K/V context across streaming chunks)."""
        W = self.sliding.window_size
        ov = min(self.sliding.context_overlap, other.tokens_seen, W)
        if ov <= 0:
            return
        # copy the ring slots holding the donor's most recent `ov` tokens
        # into our slots [0, ov)
        src_positions = [(other.tokens_seen - ov + i) % W for i in range(ov)]
        idx = jnp.asarray(np.asarray(src_positions, np.int32))
        self.cache = KVCache(
            self.cache.self_k.at[:, :, :ov].set(
                other.cache.self_k[:, :, idx]),
            self.cache.self_v.at[:, :, :ov].set(
                other.cache.self_v[:, :, idx]),
            self.cache.cross_k, self.cache.cross_v)
        self.tokens_seen = ov

    def stats(self) -> SlidingCacheStats:
        return SlidingCacheStats(
            self.sliding.window_size, self.tokens_seen,
            max(0, self.tokens_seen - self.sliding.window_size))


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _sliding_step(params, token, slot, t, cache, config, window,
                  compute_dtype):
    """One jitted ring-buffer decode step (config/window/dtype static)."""
    dec = params["decoder"]
    from ..ops.quant import is_quantized
    emb = dec["token_emb"]
    if is_quantized(emb):
        scale = emb.scale.astype(compute_dtype)
        while scale.ndim > 1:
            scale = scale[0]
        tok = emb.q[token].astype(compute_dtype) * scale
    else:
        tok = emb[token].astype(compute_dtype)
    # positional embedding saturates at the context edge for long streams
    pos_idx = jnp.minimum(t, config.n_text_ctx - 1)
    x = (tok + dec["pos_emb"][pos_idx].astype(compute_dtype)[None, :])[:, None, :]

    n_heads = config.n_text_head
    valid = _window_mask(window, slot, t)[:, None, None, :]

    def body(x, layer):
        blk, k_c, v_c, c_k, c_v = layer
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q")
        k_new = _attn_proj(h, sa, "k")
        v_new = _attn_proj(h, sa, "v")
        k_c = _scatter_rows(k_c, k_new, slot)
        v_c = _scatter_rows(v_c, v_new, slot)
        attn = mha(q, k_c, v_c, n_heads, mask=valid)
        x = x + linear(attn, sa["o_w"], sa["o_b"])

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q")
        attn = mha(q, c_k, c_v, n_heads)
        x = x + linear(attn, ca["o_w"], ca["o_b"])

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"])),
                   blk["fc2"]["w"], blk["fc2"]["b"])
        return x + h, (k_c, v_c)

    blocks = params["decoder"]["blocks"]
    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x[:, 0, :])
    return logits, KVCache(new_k, new_v, cache.cross_k, cache.cross_v)


def _window_mask(window: int, slot: jnp.ndarray, t) -> jnp.ndarray:
    """Which ring slots hold one of the last ``window`` tokens at time t."""
    idx = jnp.arange(window)[None, :]
    written = idx <= jnp.minimum(t, window - 1)
    return jnp.broadcast_to(written, (slot.shape[0], window))


# ---------------------------------------------------------------------------
# Paged KV (reference: PagedDecoderKVCache, decoder.rs:835)
# ---------------------------------------------------------------------------

PAGE_SIZE = 16  # tokens per page (reference: decoder.rs paged cache)

# serving-tick step choice: when True (set after TPU validation) the


class PagedKVCache:
    """vLLM-style paged cache: a fixed device page pool + host page tables.

    Pages are [n_pages, PAGE_SIZE, D] per layer (stacked [L, ...]); each
    sequence owns an ordered page list. alloc/extend/free mirror the
    reference API (decoder.rs:880-961, incl. clean rollback on exhaustion).
    """

    def __init__(self, config: ModelConfig, n_pages: int,
                 compute_dtype: jnp.dtype = jnp.float32) -> None:
        L, D = config.n_text_layer, config.n_text_state
        self.config = config
        self.n_pages = n_pages
        self.k_pool = jnp.zeros((L, n_pages, PAGE_SIZE, D), dtype=compute_dtype)
        self.v_pool = jnp.zeros((L, n_pages, PAGE_SIZE, D), dtype=compute_dtype)
        self._free: List[int] = list(range(n_pages))
        self._tables: Dict[int, List[int]] = {}
        self._lengths: Dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, seq_id: int, n_tokens: int = 0) -> None:
        if seq_id in self._tables:
            raise InferenceError(f"sequence {seq_id} already allocated")
        need = max(1, -(-n_tokens // PAGE_SIZE))
        if need > len(self._free):
            raise InferenceError("out of KV pages")
        self._tables[seq_id] = [self._free.pop() for _ in range(need)]
        self._lengths[seq_id] = n_tokens

    def extend(self, seq_id: int, n_tokens: int = 1) -> None:
        """Grow a sequence; allocates pages on demand with rollback
        (reference: decoder.rs:954-961)."""
        if seq_id not in self._tables:
            raise InferenceError(f"unknown sequence {seq_id}")
        new_len = self._lengths[seq_id] + n_tokens
        need = -(-new_len // PAGE_SIZE) - len(self._tables[seq_id])
        if need > len(self._free):
            raise InferenceError("out of KV pages")  # nothing mutated: rollback-safe
        for _ in range(need):
            self._tables[seq_id].append(self._free.pop())
        self._lengths[seq_id] = new_len

    def free(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, [])
        self._free.extend(pages)
        self._lengths.pop(seq_id, None)

    def seq_len(self, seq_id: int) -> int:
        return self._lengths.get(seq_id, 0)

    def page_table(self, seq_id: int, max_pages: int) -> np.ndarray:
        """Padded page table for the device step."""
        pages = self._tables.get(seq_id, [])
        out = np.zeros(max_pages, dtype=np.int32)
        out[: len(pages)] = pages[:max_pages]
        return out

    def write_token(self, seq_id: int, layer_k: jnp.ndarray,
                    layer_v: jnp.ndarray, pos: int) -> None:
        """Write K/V [L, D] for one token at ``pos`` into the pool."""
        page = self._tables[seq_id][pos // PAGE_SIZE]
        off = pos % PAGE_SIZE
        self.k_pool = self.k_pool.at[:, page, off].set(layer_k)
        self.v_pool = self.v_pool.at[:, page, off].set(layer_v)

    def gather_layer(self, seq_id: int, layer: int,
                     upto: Optional[int] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One layer's K/V [n, D] for a sequence (first ``upto`` tokens)."""
        pages = self._tables.get(seq_id)
        if pages is None:
            raise InferenceError(f"unknown sequence {seq_id}")
        n = self._lengths[seq_id] if upto is None else min(
            upto, self._lengths[seq_id])
        if n == 0:
            D = self.k_pool.shape[-1]
            z = jnp.zeros((0, D), self.k_pool.dtype)
            return z, z
        idx = jnp.asarray(pages, dtype=jnp.int32)
        k = self.k_pool[layer, idx].reshape(-1, self.k_pool.shape[-1])[:n]
        v = self.v_pool[layer, idx].reshape(-1, self.v_pool.shape[-1])[:n]
        return k, v

    def gather(self, seq_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Materialize a sequence's K/V [L, len, D] from its pages."""
        pages = self._tables.get(seq_id)
        if not pages:
            raise InferenceError(f"unknown sequence {seq_id}")
        n = self._lengths[seq_id]
        idx = jnp.asarray(pages, dtype=jnp.int32)
        k = self.k_pool[:, idx].reshape(self.k_pool.shape[0], -1,
                                        self.k_pool.shape[-1])[:, :n]
        v = self.v_pool[:, idx].reshape(self.v_pool.shape[0], -1,
                                        self.v_pool.shape[-1])[:, :n]
        return k, v


# ---------------------------------------------------------------------------
# Paged decoding (reference: decoder.rs:1930 forward_one_paged /
# :2068 generate_paged)
# ---------------------------------------------------------------------------

def paged_decode_step(params: dict, token: int, pos: int,
                      paged: "PagedKVCache", seq_id: int,
                      cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                      config: ModelConfig,
                      compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """One decode step over the PAGED pool for a single sequence.

    Per layer: project K/V for the new token, write them into the sequence's
    pages, and attend over the gathered page contents. Python layer loop
    (like the reference's per-layer forward_one_paged) — the correctness
    companion to the dense fused path, sharing the page-table layout a
    future Pallas paged-attention kernel will consume.
    """
    from .traced import _layer_slice
    from .decoder import project_to_vocab

    dec = params["decoder"]
    from ..ops.quant import is_quantized
    emb = dec["token_emb"]
    if is_quantized(emb):
        scale = emb.scale.astype(compute_dtype)
        while scale.ndim > 1:
            scale = scale[0]
        tok = emb.q[token].astype(compute_dtype) * scale
    else:
        tok = emb[token].astype(compute_dtype)
    x = (tok + dec["pos_emb"][pos].astype(compute_dtype))[None, None, :]

    paged.extend(seq_id, 1)
    n_heads = config.n_text_head
    k_all, v_all = [], []

    blocks = dec["blocks"]
    for li in range(config.n_text_layer):
        blk = _layer_slice(blocks, li)
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q")
        k_new = _attn_proj(h, sa, "k")[0, 0]
        v_new = _attn_proj(h, sa, "v")[0, 0]
        k_all.append(k_new)
        v_all.append(v_new)
        # write this layer lazily after the loop (one pool update)
        # attention needs K/V up to and including this token:
        k_hist, v_hist = paged.gather_layer(seq_id, li, upto=pos)
        k_seq = jnp.concatenate([k_hist, k_new[None]], axis=0)[None]
        v_seq = jnp.concatenate([v_hist, v_new[None]], axis=0)[None]
        attn = mha(q, k_seq.astype(compute_dtype),
                   v_seq.astype(compute_dtype), n_heads)
        x = x + linear(attn, sa["o_w"], sa["o_b"])

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q")
        attn = mha(q, cross_k[li][None], cross_v[li][None], n_heads)
        x = x + linear(attn, ca["o_w"], ca["o_b"])

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"])),
                   blk["fc2"]["w"], blk["fc2"]["b"])
        x = x + h

    paged.write_token(seq_id, jnp.stack(k_all), jnp.stack(v_all), pos)
    x = layer_norm(x, dec["ln_post"]["w"], dec["ln_post"]["b"])
    return project_to_vocab(params, x[:, 0, :])


def generate_paged(params: dict, enc_out: jnp.ndarray, prompt,
                   paged: "PagedKVCache", seq_id: int, eot: int,
                   config: ModelConfig, max_tokens: int = 448,
                   suppress_bias=None,
                   compute_dtype: jnp.dtype = jnp.float32):
    """Greedy decode for one sequence over the paged pool
    (reference: decoder.rs:2068 generate_paged)."""
    from .decoder import precompute_cross_kv
    cross_k, cross_v = precompute_cross_kv(
        params, enc_out.astype(compute_dtype))
    cross_k, cross_v = cross_k[:, 0], cross_v[:, 0]

    paged.alloc(seq_id, n_tokens=0)
    tokens = [int(t) for t in prompt]
    try:
        for pos, t in enumerate(tokens):
            logits = paged_decode_step(params, t, pos, paged, seq_id,
                                       cross_k, cross_v, config,
                                       compute_dtype)
        while len(tokens) < max_tokens:
            biased = logits[0]
            if suppress_bias is not None:
                biased = biased + suppress_bias
            nxt = int(jnp.argmax(biased))
            tokens.append(nxt)
            if nxt == eot:
                break
            logits = paged_decode_step(params, nxt, len(tokens) - 1, paged,
                                       seq_id, cross_k, cross_v, config,
                                       compute_dtype)
    finally:
        paged.free(seq_id)
    return tokens
