"""Pallas paged-attention decode kernel.

Attends one query token per sequence over that sequence's PAGED KV history
— the device half of ``PagedKVCache`` (reference: src/model/decoder.rs:835
PagedDecoderKVCache over realizar's PagedKvCache; :1930 forward_one_paged).

The TPU-native trick: the page table rides in as a SCALAR-PREFETCH operand,
so the BlockSpec index_map dereferences ``table[b, p]`` and the pipeline
DMAs each page straight from the pooled HBM arrays — no gather, no
materialized per-sequence K/V. Softmax is computed online (flash-style
running max/sum) across the page grid.

Heads are VECTORIZED via the block-diagonal head-expansion matrix E [D, H]
(see ops/decode_attention.py — a per-head in-kernel loop emits hundreds of
tiny VPU/MXU ops per page and measurably dominates the kernel):

    S[t, h]   = ((K ∘ q) @ E)[t, h]
    P_D[t, d] = (P @ E^T)[t, d]
    O[1, d]   = ones[1, T] @ (P_D ∘ V)[t, d]

Layout: pools are [n_pages, PAGE, D] (written by an XLA scatter in the
decode step); queries [B, D]; tables [B, P_max] int32 (0-padded); lengths
[B] int32 counting valid tokens INCLUDING the current one.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import head_expand_matrix

_LANES = 128
_NEG = float(-0.7 * np.finfo(np.float32).max)


def _paged_attn_kernel(tables_ref, lengths_ref, layer_ref, q_ref, k_ref,
                       v_ref, e_ref, et_ref, o_ref,
                       m_ref, l_ref, acc_ref, *, page: int, scale: float):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    e = e_ref[...]                                     # [D, H]
    et = et_ref[...]                                   # [H, D]
    k = k_ref[0, 0].astype(jnp.float32)                # [PAGE, D]
    v = v_ref[0, 0].astype(jnp.float32)                # [PAGE, D]
    q32 = q_ref[0].astype(jnp.float32) * scale         # [1, D]

    s = jax.lax.dot(k * q32, e, preferred_element_type=jnp.float32)

    base = p * page
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (page, 1), 0)
    valid = pos < lengths_ref[b]                       # [PAGE, 1]
    s = jnp.where(valid, s, _NEG)

    m_prev = m_ref[...]                                # [1, H]
    m_cur = jnp.max(s, axis=0, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    pij = jnp.exp(s - m_next)                          # [PAGE, H]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pij, axis=0, keepdims=True)
    m_ref[...] = m_next

    p_d = jax.lax.dot(pij, et, preferred_element_type=jnp.float32)
    ones = jnp.ones((1, page), jnp.float32)
    contrib = jax.lax.dot(ones, p_d * v,
                          preferred_element_type=jnp.float32)  # [1, D]
    alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha_d + contrib

    @pl.when(p == pl.num_programs(1) - 1)
    def _finalize():
        l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), et,
                          preferred_element_type=jnp.float32)
        o_ref[0] = (acc_ref[...] / l_d).astype(o_ref.dtype)


def paged_attention_stacked(q: jnp.ndarray, k_pool: jnp.ndarray,
                            v_pool: jnp.ndarray, tables: jnp.ndarray,
                            lengths: jnp.ndarray, layer, n_heads: int,
                            interpret: bool = False) -> jnp.ndarray:
    """q [B, D] one token per sequence; pools [L, n_pages, PAGE, D] stacked
    per layer (the layer index is a scalar-prefetch operand, so calling
    this inside ``lax.scan`` over layers never slices the pool — the same
    zero-copy trick as qmatvec_stacked); tables [B, P_max] int32 page ids;
    lengths [B] valid tokens (incl. the current token, already scattered
    into the pool). Returns [B, D]."""
    B, D = q.shape
    L, n_pages, page, D2 = k_pool.shape
    assert D == D2
    P_max = tables.shape[1]
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)

    kernel = functools.partial(_paged_attn_kernel, page=page, scale=scale)
    grid = (B, P_max)
    # q/out as [B, 1, D]: leading block dims of 1 keep the last-two-dims
    # tiling rule satisfied for any B
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # tables, lengths, layer
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D),
                             lambda b, p, tbl, lens, lyr: (b, 0, 0)),
                pl.BlockSpec((1, 1, page, D),
                             lambda b, p, tbl, lens, lyr:
                             (lyr[0], tbl[b, p], 0, 0)),
                pl.BlockSpec((1, 1, page, D),
                             lambda b, p, tbl, lens, lyr:
                             (lyr[0], tbl[b, p], 0, 0)),
                pl.BlockSpec((D, n_heads),
                             lambda b, p, tbl, lens, lyr: (0, 0)),
                pl.BlockSpec((n_heads, D),
                             lambda b, p, tbl, lens, lyr: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, p, tbl, lens, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, n_heads), jnp.float32),   # m
                pltpu.VMEM((1, n_heads), jnp.float32),   # l
                pltpu.VMEM((1, D), jnp.float32),         # acc (head-major)
            ],
        ),
        interpret=interpret,
    )(jnp.asarray(tables, jnp.int32), jnp.asarray(lengths, jnp.int32),
      layer, q[:, None, :], k_pool, v_pool, e_mat, et_mat)
    return out[:, 0, :]


def paged_attention(q: jnp.ndarray, k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                    tables: jnp.ndarray, lengths: jnp.ndarray,
                    n_heads: int, interpret: bool = False) -> jnp.ndarray:
    """Single-layer convenience wrapper: pools [n_pages, PAGE, D]."""
    return paged_attention_stacked(q, k_pool[None], v_pool[None], tables,
                                   lengths, 0, n_heads, interpret=interpret)
