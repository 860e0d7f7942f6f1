"""Fused decode attention + output projection Pallas kernel.

One pallas call replaces, per decoder layer, the XLA attention over the KV
cache AND the out-projection matvec (reference semantics: the per-head
attention loop at src/model/attention.rs:587-620 followed by the o_proj
linear). Wins over the split form:

  1. the attention probabilities and per-head outputs never round-trip
     through HBM — only the [B, D] projected output leaves the kernel;
  2. the KV cache tiles stream through VMEM flash-style (online softmax
     across the T grid), double-buffered against the MXU work;
  3. heads are VECTORIZED, not looped: a per-head loop at M=1 emits
     hundreds of tiny VPU ops per tile (measured: it erased the entire
     bandwidth win on large-v3). Instead scores for all heads come from
     one dot with a block-diagonal head-expansion matrix E [D, H]
     (E[d, h] = 1 iff d // hd == h):

         S[t, h]   = ((K ∘ q) @ E)[t, h]          == q_h . k_h[t]
         P_D[t, d] = (P @ E^T)[t, d]              == P[t, head(d)]
         O[1, d]   = ones[1, T] @ (P_D ∘ V)[t, d] == sum_t P[t,h(d)] V[t,d]

     so the whole tile is ~10 medium MXU/VPU ops, none per-head.

Layout mirrors the rest of the quantized decode path: caches and weights
are STACKED on a leading layer axis and addressed by a scalar-prefetch
layer index, so ``lax.scan``/``lax.while_loop`` over layers never slices
a layer copy out of HBM.

Optionally the K/V cache may be int8 with per-row (per-position) scales
(k_dequant[t, :] = k_q[t, :] * k_s[t]). Row scales commute through the
dots exactly, so int8 caches halve the decode's KV bandwidth at per-row
int8 rounding error only (~0.3% relative). Scales are stored [L, B, T, 1]
— a column, so they broadcast over lanes inside the kernel with no
transpose.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = float(-0.7 * np.finfo(np.float32).max)


def head_expand_matrix(n_heads: int, hd: int) -> np.ndarray:
    """E [D, H] f32 with E[d, h] = 1 iff d // hd == h (block-diagonal)."""
    d = n_heads * hd
    e = np.zeros((d, n_heads), np.float32)
    for h in range(n_heads):
        e[h * hd: (h + 1) * hd, h] = 1.0
    return e


def _kernel(lengths_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            wo_ref, wos_ref, e_ref, et_ref, o_ref,
            m_ref, l_ref, acc_ref,
            *, bt: int, scale: float, quantized: bool):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    e = e_ref[...]                                     # [D, H] f32
    et = et_ref[...]                                   # [H, D] f32
    k = k_ref[0, 0].astype(jnp.float32)                # [bt, D]
    v = v_ref[0, 0].astype(jnp.float32)                # [bt, D]
    q32 = q_ref[0].astype(jnp.float32) * scale         # [1, D]

    qk = k * q32                                       # [bt, D] (row bcast)
    if quantized:
        qk = qk * ks_ref[0, 0].astype(jnp.float32)     # [bt, 1] lane bcast
    s = jax.lax.dot(qk, e, preferred_element_type=jnp.float32)  # [bt, H]

    pos = t * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
    valid = pos < lengths_ref[b]                       # [bt, 1]
    s = jnp.where(valid, s, _NEG)

    m_prev = m_ref[...]                                # [1, H]
    m_cur = jnp.max(s, axis=0, keepdims=True)          # [1, H]
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)                   # [1, H]
    p = jnp.exp(s - m_next)                            # [bt, H]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[...] = m_next

    p_d = jax.lax.dot(p, et, preferred_element_type=jnp.float32)  # [bt, D]
    pv = p_d * v                                       # [bt, D]
    if quantized:
        pv = pv * vs_ref[0, 0].astype(jnp.float32)     # [bt, 1] lane bcast
    ones = jnp.ones((1, bt), jnp.float32)
    contrib = jax.lax.dot(ones, pv,
                          preferred_element_type=jnp.float32)     # [1, D]
    alpha_d = jax.lax.dot(alpha, et,
                          preferred_element_type=jnp.float32)     # [1, D]
    acc_ref[...] = acc_ref[...] * alpha_d + contrib

    @pl.when(t == pl.num_programs(1) - 1)
    def _project():
        l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), et,
                          preferred_element_type=jnp.float32)     # [1, D]
        out = (acc_ref[...] / l_d).astype(q_ref.dtype)            # [1, D]
        wo = wo_ref[0].astype(q_ref.dtype)                        # [D, D]
        y = jax.lax.dot(out, wo, preferred_element_type=jnp.float32)
        o_ref[...] = (y * wos_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)[None]


def decode_attention_oproj(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           wo_q: jnp.ndarray, wo_s: jnp.ndarray,
                           lengths: jnp.ndarray, layer, n_heads: int,
                           k_s: Optional[jnp.ndarray] = None,
                           v_s: Optional[jnp.ndarray] = None,
                           block_t: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """One decode token per sequence: softmax(q K^T / sqrt(hd)) V @ Wo.

    q: [B, D] (already q-projected, bias included);
    k/v: [L, B, T, D] stacked caches — bf16, or int8 with per-row scales
         ``k_s``/``v_s`` [L, B, T, 1] f32;
    wo_q: [L, D, D] int8 out-projection, wo_s [L, 1, D] f32 scales
          (bias added by the caller);
    lengths: [B] int32 — valid cache rows per sequence (incl. current);
    layer: traced int32 — which stacked layer to read (scalar prefetch).

    T must be a multiple of ``block_t`` (pad the cache; padding is masked
    via ``lengths``). Returns [B, D] in q.dtype.
    """
    B, D = q.shape
    L, B2, T, D2 = k.shape
    assert (B, D) == (B2, D2), (q.shape, k.shape)
    assert T % block_t == 0, (T, block_t)
    quantized = k_s is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    grid = (B, T // block_t)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)

    kernel = functools.partial(_kernel, bt=block_t, scale=scale,
                               quantized=quantized)

    cache_spec = pl.BlockSpec((1, 1, block_t, D),
                              lambda b, t, lens, lyr: (lyr[0], b, t, 0))
    if quantized:
        ks_in, vs_in = k_s, v_s
        sspec = pl.BlockSpec((1, 1, block_t, 1),
                             lambda b, t, lens, lyr: (lyr[0], b, t, 0))
        ks_spec = vs_spec = sspec
    else:
        ks_in = jnp.zeros((L, B, block_t, 1), jnp.float32)
        vs_in = ks_in
        ks_spec = vs_spec = pl.BlockSpec(
            (1, 1, block_t, 1), lambda b, t, lens, lyr: (lyr[0], b, 0, 0))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lengths, layer
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D), lambda b, t, lens, lyr: (b, 0, 0)),
                cache_spec,
                cache_spec,
                ks_spec,
                vs_spec,
                pl.BlockSpec((1, D, D), lambda b, t, lens, lyr:
                             (lyr[0], 0, 0)),
                pl.BlockSpec((1, 1, D), lambda b, t, lens, lyr:
                             (lyr[0], 0, 0)),
                pl.BlockSpec((D, n_heads), lambda b, t, lens, lyr: (0, 0)),
                pl.BlockSpec((n_heads, D), lambda b, t, lens, lyr: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, t, lens, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, n_heads), jnp.float32),   # m
                pltpu.VMEM((1, n_heads), jnp.float32),   # l
                pltpu.VMEM((1, D), jnp.float32),         # acc (head-major)
            ],
        ),
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), layer, q[:, None, :],
      k, v, ks_in, vs_in, wo_q, wo_s, e_mat, et_mat)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Per-row int8 quantization helpers for KV cache rows
# ---------------------------------------------------------------------------

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
