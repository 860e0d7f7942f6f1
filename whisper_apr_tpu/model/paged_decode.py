"""Device-side paged decoding: batched decode steps over the page pool.

The serving-path companion to ``PagedKVCache`` (reference:
src/model/decoder.rs:1930 forward_one_paged / :2068 generate_paged): each
slot's K/V history lives in 16-token pages of a shared fixed pool; the host
allocator hands out pages, the device step scatters the new token's K/V
into its page and attends THROUGH the page table with the Pallas
paged-attention kernel — no per-sequence cache materialization, no dense
[n_slots, max_len] reservation.

Why this beats the dense slot cache at scale: dense serving reserves
``n_slots * max_len`` positions regardless of actual lengths; the pool is
sized to the REAL token count (plus page slack), so the same HBM serves
many more concurrent streams.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, linear, mha
from ..ops.paged_attention import paged_attention_stacked
from .decoder import _attn_proj, project_to_vocab
from .kv_variants import PAGE_SIZE

# test hook: interpret mode for CPU backends
INTERPRET = False


def _embed_multi(params: dict, token: jnp.ndarray, pos: jnp.ndarray,
                 compute_dtype) -> jnp.ndarray:
    """Token + positional embedding with PER-SEQUENCE positions [B]."""
    from ..ops.quant import is_quantized
    dec = params["decoder"]
    emb = dec["token_emb"]
    if is_quantized(emb):
        scale = emb.scale.astype(compute_dtype)
        while scale.ndim > 1:
            scale = scale[0]
        tok = emb.q[token].astype(compute_dtype) * scale
    else:
        tok = emb[token].astype(compute_dtype)
    pos_emb = dec["pos_emb"][pos].astype(compute_dtype)  # [B, D]
    return (tok + pos_emb)[:, None, :]                   # [B, 1, D]


def paged_decode_step(params: dict, token: jnp.ndarray, pos: jnp.ndarray,
                      tables: jnp.ndarray, k_pool: jnp.ndarray,
                      v_pool: jnp.ndarray, cross_k: jnp.ndarray,
                      cross_v: jnp.ndarray, config: ModelConfig,
                      compute_dtype: jnp.dtype = jnp.float32,
                      interpret: Optional[bool] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batched decode step over the paged pool.

    token/pos: [B] int32 (pos = index of ``token`` in its sequence);
    tables: [B, P_max] page ids; pools: [L, n_pages, PAGE, D];
    cross_k/v: [L, B, S, D]. Returns (logits [B, V] f32, k_pool, v_pool).
    The new token's K/V are scattered into each slot's current page before
    the paged-attention kernel reads the pool.
    """
    if interpret is None:
        interpret = INTERPRET
    B = token.shape[0]
    L = config.n_text_layer
    n_heads = config.n_text_head
    x = _embed_multi(params, token, pos, compute_dtype)

    pages = tables[jnp.arange(B), pos // PAGE_SIZE]  # [B] page ids
    offs = pos % PAGE_SIZE                           # [B]
    lengths = pos + 1                                # incl. current token

    blocks = params["decoder"]["blocks"]

    def body(carry, layer):
        x, k_pool, v_pool = carry
        l, blk, c_k, c_v = layer
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        q = _attn_proj(h, sa, "q")
        k_new = _attn_proj(h, sa, "k")[:, 0, :]  # [B, D]
        v_new = _attn_proj(h, sa, "v")[:, 0, :]
        k_pool = k_pool.at[l, pages, offs].set(k_new.astype(k_pool.dtype))
        v_pool = v_pool.at[l, pages, offs].set(v_new.astype(v_pool.dtype))
        attn = paged_attention_stacked(
            q[:, 0, :], k_pool, v_pool, tables, lengths, l, n_heads,
            interpret=interpret)[:, None, :]
        x = x + linear(attn.astype(x.dtype), sa["o_w"], sa["o_b"])

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        q = _attn_proj(h, ca, "q")
        attn = mha(q, c_k, c_v, n_heads)
        x = x + linear(attn, ca["o_w"], ca["o_b"])

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"])),
                   blk["fc2"]["w"], blk["fc2"]["b"])
        return (x + h, k_pool, v_pool), None

    (x, k_pool, v_pool), _ = jax.lax.scan(
        body, (x, k_pool, v_pool),
        (jnp.arange(L), blocks, cross_k, cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x[:, 0, :])
    return logits, k_pool, v_pool


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_steps", "compute_dtype", "interpret"),
    donate_argnames=("k_pool", "v_pool"))
def paged_decode_steps_jit(params: dict, token: jnp.ndarray,
                           pos: jnp.ndarray, suppress_bias: jnp.ndarray,
                           tables: jnp.ndarray, k_pool: jnp.ndarray,
                           v_pool: jnp.ndarray, cross_k: jnp.ndarray,
                           cross_v: jnp.ndarray, config: ModelConfig,
                           n_steps: int = 1,
                           compute_dtype: jnp.dtype = jnp.float32,
                           interpret: Optional[bool] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance every slot ``n_steps`` greedy tokens over the paged pool in
    ONE dispatch (the paged twin of decode_steps_multi_jit). The host must
    have pre-extended each slot's page table to cover ``pos + n_steps``
    tokens. Returns (tokens [B, n_steps], k_pool, v_pool)."""

    def step(carry, _):
        token, pos, k_pool, v_pool = carry
        logits, k_pool, v_pool = paged_decode_step(
            params, token, pos, tables, k_pool, v_pool, cross_k, cross_v,
            config, compute_dtype, interpret)
        nxt = jnp.argmax(logits + suppress_bias[None, :], axis=-1
                         ).astype(jnp.int32)
        return (nxt, pos + 1, k_pool, v_pool), nxt

    (_, _, k_pool, v_pool), toks = jax.lax.scan(
        step, (token, pos, k_pool, v_pool), None, length=n_steps)
    return jnp.transpose(toks, (1, 0)), k_pool, v_pool


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_prefills_to_pool(k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                           self_k: jnp.ndarray, self_v: jnp.ndarray,
                           pages: jnp.ndarray, offs: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter a BATCH of prefilled K/V into their pages in one donated
    program (batched serving admission). self_k/v: [L, n, P, D];
    pages/offs: [n, P] int32 (page id and in-page offset per position).
    Duplicate (page, off) targets across rows must carry identical values
    (the admission pad convention)."""
    k_pool = k_pool.at[:, pages, offs].set(self_k.astype(k_pool.dtype))
    v_pool = v_pool.at[:, pages, offs].set(self_v.astype(v_pool.dtype))
    return k_pool, v_pool


def write_prefill_to_pool(k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                          self_k: jnp.ndarray, self_v: jnp.ndarray,
                          table: np.ndarray, n_tokens: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter one sequence's prefilled K/V (dense [L, 1, T, D]) into its
    pages. table: this sequence's page ids (host array)."""
    positions = np.arange(n_tokens)
    pages = jnp.asarray(table[positions // PAGE_SIZE], jnp.int32)
    offs = jnp.asarray(positions % PAGE_SIZE, jnp.int32)
    k = self_k[:, 0, :n_tokens].astype(k_pool.dtype)  # [L, T, D]
    v = self_v[:, 0, :n_tokens].astype(v_pool.dtype)
    k_pool = k_pool.at[:, pages, offs].set(k)
    v_pool = v_pool.at[:, pages, offs].set(v)
    return k_pool, v_pool
