"""Pallas paged-attention decode kernel.

Attends one query token per sequence over that sequence's PAGED KV history
— the device half of ``PagedKVCache`` (reference: src/model/decoder.rs:835
PagedDecoderKVCache over realizar's PagedKvCache; :1930 forward_one_paged).

The TPU-native trick: the page table rides in as a SCALAR-PREFETCH operand,
so the BlockSpec index_map dereferences ``table[b, p]`` and the pipeline
DMAs each page straight from the pooled HBM arrays — no gather, no
materialized per-sequence K/V. Softmax is computed online (flash-style
running max/sum) across the page grid.

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

_LANES = 128
_NEG = float(-0.7 * np.finfo(np.float32).max)


def _paged_attn_kernel(tables_ref, lengths_ref, layer_ref, q_ref, k_ref,
                       v_ref, o_ref,
                       m_ref, l_ref, acc_ref, *, n_heads: int, page: int,
                       scale: float, hd: int):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    k = k_ref[0, 0].astype(jnp.float32)           # [PAGE, D]
    v = v_ref[0, 0].astype(jnp.float32)           # [PAGE, D]

    # positions covered by this page vs the sequence length
    base = p * page
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
    valid = pos < lengths_ref[b]                  # [1, PAGE]

    # per-head online softmax (static head loop; tiny MXU ops — the kernel
    # is HBM-bandwidth-bound on the page reads). m/l live as (1, LANES)
    # broadcast rows; only column 0 is meaningful.
    q32 = q_ref[0].astype(jnp.float32) * scale    # [1, D]
    for h in range(n_heads):
        lo = h * hd
        q_h = q32[:, lo: lo + hd]                 # [1, hd]
        k_h = k[:, lo: lo + hd]                   # [PAGE, hd]
        v_h = v[:, lo: lo + hd]
        s = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(valid, s, _NEG)             # [1, PAGE]

        m_prev = m_ref[h: h + 1, :1]              # [1, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)          # [1, 1]
        p_ij = jnp.exp(s - m_next)                # [1, PAGE]
        l_new = l_ref[h: h + 1, :1] * alpha + jnp.sum(s * 0 + p_ij,
                                                      axis=1, keepdims=True)
        m_ref[h: h + 1, :] = jnp.broadcast_to(m_next, (1, m_ref.shape[1]))
        l_ref[h: h + 1, :] = jnp.broadcast_to(l_new, (1, l_ref.shape[1]))
        pv = jax.lax.dot_general(p_ij, v_h, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[h: h + 1, :] = acc_ref[h: h + 1, :] * alpha + pv

    @pl.when(p == pl.num_programs(1) - 1)
    def _finalize():
        for h in range(n_heads):
            lo = h * hd
            l_h = jnp.maximum(l_ref[h: h + 1, :1], 1e-30)
            o_ref[0, :, lo: lo + hd] = (acc_ref[h: h + 1, :] / l_h
                                        ).astype(o_ref.dtype)


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

    kernel = functools.partial(_paged_attn_kernel, n_heads=n_heads,
                               page=page, scale=scale, hd=hd)
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
            ],
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, p, tbl, lens, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_heads, _LANES), jnp.float32),  # m (col 0)
                pltpu.VMEM((n_heads, _LANES), jnp.float32),  # l (col 0)
                pltpu.VMEM((n_heads, hd), jnp.float32),      # acc
            ],
        ),
        interpret=interpret,
    )(jnp.asarray(tables, jnp.int32), jnp.asarray(lengths, jnp.int32),
      layer, q[:, None, :], k_pool, v_pool)
    return out[:, 0, :]


def paged_attention(q: jnp.ndarray, k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                    tables: jnp.ndarray, lengths: jnp.ndarray,
                    n_heads: int, interpret: bool = False) -> jnp.ndarray:
    """Single-layer convenience wrapper: pools [n_pages, PAGE, D]."""
    return paged_attention_stacked(q, k_pool[None], v_pool[None], tables,
                                   lengths, 0, n_heads, interpret=interpret)
