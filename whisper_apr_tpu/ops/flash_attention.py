"""Pallas flash attention for TPU: online-softmax tiled attention.

The TPU-native re-design of the reference's blockwise flash attention
(reference: src/model/attention.rs:360 flash_attention / :472
flash_attention_simd — online softmax with running max/sum rescaling,
``update_output_with_block`` at :295, block size 32). Here the blocks are
MXU-shaped (128x128), the scores tile lives only in VMEM, and softmax
statistics (m, l) and the output accumulator persist in f32 VMEM scratch
across KV tiles — the [T, T] score matrix is never materialized in HBM
(for Whisper's 1500-frame encoder that is 6..20 heads x 9 MB per item
saved per layer).

Supports non-causal (encoder) and causal (decoder prefill) masking plus a
valid-length mask so callers can pad 1500 -> 1536 without polluting the
softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
# -0.7 * float32 max instead of -inf: exp(-inf - (-inf)) would yield NaN
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, sm_scale: float, causal: bool, kv_valid: int,
                  block_q: int, block_k: int, kv_seq_len: int):
    """One (batch, head, q_tile, kv_tile) grid cell."""
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # causal: skip KV tiles entirely above the diagonal
    if causal:
        should_run = ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [block_q, block_k]
        if sm_scale != 1.0:
            s = s * sm_scale

        # masking: valid length (padding) and causal
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
        mask = col_ids < kv_valid
        if causal:
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0) + q_idx * block_q
            mask = jnp.logical_and(mask, col_ids <= row_ids)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scratch[...]            # [block_q, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]               # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)               # [block_q, LANES]
        alpha = jnp.exp(m_prev - m_next)                   # correction
        p = jnp.exp(s - m_next[:, :1])                     # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1)[:, None]

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # [block_k, d]
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha[:, : acc_scratch.shape[-1]] \
            + o_curr

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scratch[...][:, : acc_scratch.shape[-1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    sm_scale: Optional[float] = None, causal: bool = False,
                    kv_valid: Optional[int] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> jnp.ndarray:
    """Tiled flash attention. q/k/v: [B, H, T, d] -> [B, H, Tq, d].

    Sequences are padded to the block size internally; ``kv_valid`` (default
    = the unpadded KV length) keeps padded keys out of the softmax. Padded
    query rows produce garbage that is sliced off before returning.
    """
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    kv_valid = Tk if kv_valid is None else kv_valid

    q_pad = (-Tq) % block_q
    k_pad = (-Tk) % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
    Tq_p, Tk_p = Tq + q_pad, Tk + k_pad

    grid = (B, H, Tq_p // block_q, Tk_p // block_k)

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal,
        kv_valid=kv_valid, block_q=block_q, block_k=block_k,
        kv_seq_len=Tk_p)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, qi, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, qi, ki: (b, h, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b, h, qi, ki: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),       # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v)

    return out[:, :, :Tq, :]


def mha_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_heads: int,
              causal: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.basic.mha with combined-head [B, T, D] layout."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // n_heads
    qh = q.reshape(B, Tq, n_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, n_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, n_heads, hd).transpose(0, 2, 1, 3)
    out = flash_attention(qh, kh, vh, causal=causal, interpret=interpret)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
