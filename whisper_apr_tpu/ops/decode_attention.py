"""Shared decode-attention building blocks for the megakernels.

The per-block decode kernels (ops/decode_blocks.py) vectorize attention
heads with a block-diagonal HEAD-EXPANSION MATRIX instead of an in-kernel
per-head loop (which, at M=1 decode shapes, emits hundreds of tiny VPU/MXU
ops per tile and erases the fusion win — measured on large-v3:
2.38 ms/step looped vs 2.04 vectorized, BENCH_NOTES.md round-2c):

    E [D, H], E[d, h] = 1 iff d // hd == h
    S[t, h]   = ((K ∘ q) @ E)[t, h]          == q_h . k_h[t]
    P_D[t, d] = (P @ E^T)[t, d]              == P[t, head(d)]
    O[1, d]   = ones[1, T] @ (P_D ∘ V)[t, d] == sum_t P[t,h(d)] V[t,d]

This module also owns the per-row int8 KV-cache quantization helpers:
row scales commute through the attention dots exactly
(scores[t] = (q . k_q[t]) * k_s[t]; out = sum_t p[t] * v_s[t] * v_q[t]),
so int8 caches halve KV bandwidth/memory at int8 rounding error only
(~0.3% relative). Scales are stored [..., T, 1] — a column, broadcasting
over lanes inside the kernels with no transpose.

Reference semantics anchor: the per-head attention loop at
src/model/attention.rs:587-620.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def head_expand_matrix(n_heads: int, hd: int) -> np.ndarray:
    """E [D, H] f32 with E[d, h] = 1 iff d // hd == h (block-diagonal)."""
    d = n_heads * hd
    e = np.zeros((d, n_heads), np.float32)
    for h in range(n_heads):
        e[h * hd: (h + 1) * hd, h] = 1.0
    return e


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8: x [..., T, D] -> (q int8 [..., T, D],
    scales f32 [..., T, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)   # [..., T]
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(x.astype(jnp.float32) / s[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, s[..., None]


def quantize_row(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One row [B, D] -> (int8 [B, D], scale f32 [B])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s
