"""Exact Q4_K super-block quantization (the k-quant format).

The reference ships realizar's K-quantization for its headline "Q4K 86%
reduction / 0.47 RTF" numbers (reference: src/model/quantized.rs:88-380
``QuantizedTensorQ4K``/``QuantizedLinearQ4K::forward_fused`` :355; int4
pair-packing spec :1911-1960). This module implements the format itself —
the GGML ``block_q4_K`` super-block, byte-compatible — plus a TPU-native
planar unpacking:

Super-block (256 values, 144 bytes = 4.5 bits/weight):

    [0:2]    d     f16  — scale-of-scales
    [2:4]    dmin  f16  — scale-of-mins
    [4:16]   scales[12] — eight 6-bit sub-scales + eight 6-bit sub-mins
    [16:144] qs[128]    — 4-bit quants, chunked 64 at a time
                          (low nibbles = values c*64..c*64+31,
                           high nibbles = values c*64+32..c*64+63)

Dequantization rule per 32-value sub-block j:  x = d*ls[j]*q - dmin*lm[j]
with q in [0, 15] — asymmetric, so outlier-free blocks use all 16 levels.

The quantizer here targets the DECODE-TIME effective scales (f16-rounded
d/dmin times the 6-bit integers), so a raw-bytes round trip reproduces the
device values bit-exactly.

TPU planar form (for XLA dequant-fused matmuls and the decode kernel):
input-major ``[K, N]`` weights become

    q     int8 [K/2, N]   — even K rows in low nibbles, odd in high
                            (planar pairs along K: the kernel splits
                            even/odd instead of lane-interleaving, per
                            the Mosaic sub-32-bit rules)
    scale f32  [K/32, N]  — effective d*ls per (K-group, output)
    zero  f32  [K/32, N]  — effective dmin*lm

carried on a QTensor with a ``zero`` child (ops/quant.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .quant import QTensor

QK_K = 256
BLOCK_BYTES = 144
SUB = 32                     # values per sub-block
NSUB = QK_K // SUB           # 8 sub-blocks per super-block


# ---------------------------------------------------------------------------
# byte-exact codec (numpy, host side)
# ---------------------------------------------------------------------------

def quantize_q4k_raw(x: np.ndarray) -> np.ndarray:
    """[..., K] f32 (K % 256 == 0) -> raw super-blocks [..., K/256, 144]."""
    x = np.asarray(x, np.float32)
    K = x.shape[-1]
    if K % QK_K:
        raise ValueError(f"last dim {K} not a multiple of {QK_K}")
    lead = x.shape[:-1]
    S = K // QK_K
    xb = np.ascontiguousarray(x).reshape(-1, S, NSUB, SUB)
    R = xb.shape[0]

    xmin = np.minimum(xb.min(-1), 0.0)           # [R, S, 8]
    xmax = np.maximum(xb.max(-1), 0.0)
    scale = (xmax - xmin) / 15.0
    mins = -xmin

    d16 = (scale.max(-1) / 63.0).astype(np.float16)     # [R, S]
    dm16 = (mins.max(-1) / 63.0).astype(np.float16)
    df = d16.astype(np.float32)[..., None]
    dmf = dm16.astype(np.float32)[..., None]

    ls = np.where(df > 0, np.round(scale / np.where(df > 0, df, 1.0)), 0.0)
    ls = np.clip(ls, 0, 63).astype(np.uint8)             # [R, S, 8]
    lm = np.where(dmf > 0, np.round(mins / np.where(dmf > 0, dmf, 1.0)), 0.0)
    lm = np.clip(lm, 0, 63).astype(np.uint8)

    sc_eff = df * ls                                     # decode-time scales
    m_eff = dmf * lm
    denom = np.where(sc_eff > 0, sc_eff, 1.0)[..., None]
    q = np.round((xb + m_eff[..., None]) / denom)
    q = np.where(sc_eff[..., None] > 0, q, 0.0)
    q = np.clip(q, 0, 15).astype(np.uint8)               # [R, S, 8, 32]

    scales = np.zeros((R, S, 12), np.uint8)
    scales[..., 0:4] = ls[..., 0:4] | ((ls[..., 4:8] >> 4) << 6)
    scales[..., 4:8] = lm[..., 0:4] | ((lm[..., 4:8] >> 4) << 6)
    scales[..., 8:12] = (ls[..., 4:8] & 0xF) | ((lm[..., 4:8] & 0xF) << 4)

    qc = q.reshape(R, S, 4, 2, SUB)                      # chunks of 64
    qs = (qc[..., 0, :] | (qc[..., 1, :] << 4)).reshape(R, S, 128)

    raw = np.empty((R, S, BLOCK_BYTES), np.uint8)
    raw[..., 0:2] = np.ascontiguousarray(d16[..., None]).view(np.uint8)
    raw[..., 2:4] = np.ascontiguousarray(dm16[..., None]).view(np.uint8)
    raw[..., 4:16] = scales
    raw[..., 16:144] = qs.astype(np.uint8)
    return raw.reshape(lead + (S, BLOCK_BYTES))


def _decode_parts(raw: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """raw [..., S, 144] -> (q [..., S*256] uint8, sc_eff [..., S*8] f32,
    m_eff [..., S*8] f32)."""
    raw = np.asarray(raw, np.uint8)
    lead, S = raw.shape[:-2], raw.shape[-2]
    r = np.ascontiguousarray(raw).reshape(-1, S, BLOCK_BYTES)
    d = r[..., 0:2].copy().view("<f2")[..., 0].astype(np.float32)   # [R, S]
    dmin = r[..., 2:4].copy().view("<f2")[..., 0].astype(np.float32)
    sc = r[..., 4:16]
    ls = np.empty(r.shape[:2] + (NSUB,), np.uint8)
    lm = np.empty_like(ls)
    ls[..., 0:4] = sc[..., 0:4] & 63
    lm[..., 0:4] = sc[..., 4:8] & 63
    ls[..., 4:8] = (sc[..., 8:12] & 0xF) | ((sc[..., 0:4] >> 6) << 4)
    lm[..., 4:8] = (sc[..., 8:12] >> 4) | ((sc[..., 4:8] >> 6) << 4)
    qs = r[..., 16:144].reshape(-1, S, 4, SUB)
    lo = qs & 0xF
    hi = qs >> 4
    q = np.stack([lo, hi], axis=-2).reshape(-1, S, QK_K)
    sc_eff = (d[..., None] * ls).astype(np.float32)
    m_eff = (dmin[..., None] * lm).astype(np.float32)
    return (q.reshape(lead + (S * QK_K,)),
            sc_eff.reshape(lead + (S * NSUB,)),
            m_eff.reshape(lead + (S * NSUB,)))


def dequantize_q4k_raw(raw: np.ndarray) -> np.ndarray:
    """raw super-blocks [..., S, 144] -> f32 values [..., S*256]."""
    q, sc, m = _decode_parts(raw)
    lead = q.shape[:-1]
    K = q.shape[-1]
    qb = q.reshape(lead + (K // SUB, SUB)).astype(np.float32)
    out = qb * sc[..., None] - m[..., None]
    return out.reshape(lead + (K,)).astype(np.float32)


# ---------------------------------------------------------------------------
# TPU planar form
# ---------------------------------------------------------------------------

def _planar_from_parts(q: np.ndarray, sc: np.ndarray,
                       m: np.ndarray) -> QTensor:
    """(q [..., N, K] 0..15, sc/m [..., N, K/32]) -> planar QTensor."""
    qk = np.swapaxes(q, -1, -2)                  # [..., K, N] values 0..15
    scale = np.ascontiguousarray(np.swapaxes(sc, -1, -2))  # [..., K/32, N]
    zero = np.ascontiguousarray(np.swapaxes(m, -1, -2))
    lo = qk[..., 0::2, :]
    hi = qk[..., 1::2, :]
    packed = (lo | (hi << 4)).astype(np.uint8).view(np.int8)  # [..., K/2, N]
    return QTensor(jnp.asarray(packed), jnp.asarray(scale),
                   zero=jnp.asarray(zero), int4=True, group=SUB, kpack=True)


def quantize_q4k(w: np.ndarray, stacked: bool = False) -> QTensor:
    """Input-major weight [..., K, N] -> planar Q4_K QTensor.

    Quantization runs along K per output column — the same rows the raw
    format quantizes — so values match a raw-bytes round trip bit-exactly.
    ``stacked`` is accepted for signature parity (the layout already keeps
    the leading layer axis).
    """
    w = np.asarray(w, np.float32)
    if w.ndim < 2 or w.shape[-2] % QK_K:
        raise ValueError(f"need [..., K, N] with K % {QK_K} == 0, "
                         f"got {w.shape}")
    wt = np.swapaxes(w, -1, -2)                  # [..., N, K]
    raw = quantize_q4k_raw(wt)
    return _planar_from_parts(*_decode_parts(raw))


def planar_from_raw(raw: np.ndarray, d_out: int, d_in: int) -> QTensor:
    """File super-blocks for a [d_out, d_in] weight -> planar QTensor.

    ``raw`` is the .apr tensor payload [(d_out*d_in)/256, 144]; output-row
    n owns the d_in/256 consecutive super-blocks starting at n*d_in/256
    (GGML row-major convention). Bit-exact: no dequantize->requantize.
    """
    raw = np.asarray(raw, np.uint8).reshape(d_out, d_in // QK_K, BLOCK_BYTES)
    q, sc, m = _decode_parts(raw)                # [d_out, d_in], [d_out, g]
    return _planar_from_parts(q, sc, m)


def dequant_q4k(w: QTensor, dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Planar QTensor -> dense [..., K, N] (XLA fuses into the consumer)."""
    u = w.q.astype(jnp.uint8)
    lo = (u & 0x0F).astype(dtype)
    hi = ((u >> 4) & 0x0F).astype(dtype)
    # even/odd K rows interleave on the second-to-last axis
    full = jnp.stack([lo, hi], axis=-2)
    Kh, N = u.shape[-2], u.shape[-1]
    full = full.reshape(u.shape[:-2] + (2 * Kh, N))
    g = SUB
    K = 2 * Kh
    scale = w.scale.astype(dtype)
    zero = w.zero.astype(dtype)
    while scale.ndim > full.ndim:
        scale = scale[0]
        zero = zero[0]
    fg = full.reshape(full.shape[:-2] + (K // g, g, N))
    out = fg * scale[..., :, None, :] - zero[..., :, None, :]
    return out.reshape(full.shape[:-2] + (K, N))


def q4k_bytes(n_elements: int) -> int:
    """Stored bytes for a tensor of ``n_elements`` values."""
    if n_elements % QK_K:
        raise ValueError("not a Q4_K-aligned element count")
    return n_elements // QK_K * BLOCK_BYTES


# ---------------------------------------------------------------------------
# Decode-specialized fused dequant matvec (the k-quant answer to
# ops/qmatvec.py). Reference semantics: QuantizedLinearQ4K::forward_fused,
# src/model/quantized.rs:355.
# ---------------------------------------------------------------------------
#
# The group structure (a scale AND zero per 32 K-values per output) breaks
# the "fold scales after the dot" trick: S depends on both the K-group and
# the output column. Per-group loops are Mosaic poison (40 skinny matmuls
# per tile). Instead the kernel uses a BLOCK-DIAGONAL GROUP-EXPANSION of
# the activation — the same move the decode megakernels use for heads:
#
#     Xg [M*G, K/2],  Xg[m*G+g, r] = x[m, r-th even/odd k]  iff r//16 == g
#
# so the per-group partial dots become ONE MXU matmul per nibble plane:
#
#     P = Xg_even @ W_lo + Xg_odd @ W_hi          [M*G, bn]
#     y = SelT @ (S_exp * P) - xsum @ Z           [M, bn]
#
# with S_exp the group scales row-expanded by a second tiny matmul and
# xsum[m, g] the per-group activation sums (the zero-point term — exact:
# sum_k x_k * (S*q - Z) = S * sum(x q) - Z * sum(x)). The extra FLOPs are
# G x the matvec's — noise for the MXU — while HBM traffic halves vs int8.
# The planar even/odd split avoids sub-32-bit lane interleaves entirely
# (round-1 Mosaic rule) and the unpack is 4 int32 VPU ops per byte.

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TILE_BYTES = 2 * 1024 * 1024


def _pick_block_n(k_half: int, n: int) -> int:
    best = _LANE
    for cand in range(_LANE, n + 1, _LANE):
        if n % cand:
            continue
        if k_half * cand > _TILE_BYTES:
            break
        best = cand
    if best == n and n // 2 % _LANE == 0:
        best = n // 2
    return best


def _q4k_kernel(layer_ref, xe_ref, xo_ref, xsum_ref, wq_ref, s_ref, z_ref,
                o_ref, *, m: int, g: int):
    cdt = xe_ref.dtype
    rows = m * g
    kh = xe_ref.shape[1]
    # row i of the expansion serves (sequence i//g, group i%g)
    gi = jax.lax.broadcasted_iota(jnp.int32, (rows, kh), 0) % g
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, kh), 1)
    mask = (col // (SUB // 2) == gi).astype(cdt)
    sel_rows = (jax.lax.broadcasted_iota(jnp.int32, (rows, m), 0) // g
                == jax.lax.broadcasted_iota(jnp.int32, (rows, m), 1)
                ).astype(cdt)                                # [M*G, M]
    xe = jax.lax.dot(sel_rows, xe_ref[...],
                     preferred_element_type=jnp.float32).astype(cdt) * mask
    xo = jax.lax.dot(sel_rows, xo_ref[...],
                     preferred_element_type=jnp.float32).astype(cdt) * mask

    wi = wq_ref[0].astype(jnp.int32)                         # [K/2, bn]
    lo = (wi & 0xF).astype(cdt)
    hi = ((wi >> 4) & 0xF).astype(cdt)
    p = jax.lax.dot(xe, lo, preferred_element_type=jnp.float32) \
        + jax.lax.dot(xo, hi, preferred_element_type=jnp.float32)

    # expand group scales over the M copies: [M*G, G] 0/1 selector
    gsel = (jax.lax.broadcasted_iota(jnp.int32, (rows, g), 0) % g
            == jax.lax.broadcasted_iota(jnp.int32, (rows, g), 1)
            ).astype(jnp.float32)
    s_t = jax.lax.dot(gsel, s_ref[0].astype(jnp.float32),
                      preferred_element_type=jnp.float32)    # [M*G, bn]
    weighted = s_t * p
    sel_t = jnp.transpose(sel_rows).astype(jnp.float32)      # [M, M*G]
    pos_term = jax.lax.dot(sel_t, weighted,
                           preferred_element_type=jnp.float32)
    neg_term = jax.lax.dot(xsum_ref[...].astype(jnp.float32),
                           z_ref[0].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    o_ref[...] = (pos_term - neg_term).astype(o_ref.dtype)


def q4k_matvec_stacked(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                       zero: jnp.ndarray, layer,
                       block_n=None, interpret: bool = False,
                       out_dtype=None) -> jnp.ndarray:
    """x [M, K] @ planar-Q4_K weight stack, layer picked on device.

    wq: [L, K/2, N] packed nibbles (even K rows low); scale/zero:
    [L, K/32, N] f32 effective per-group values. Returns [M, N].
    """
    M, K = x.shape
    L, KH, N = wq.shape
    assert K == 2 * KH and K % SUB == 0, (x.shape, wq.shape)
    assert N % _LANE == 0
    G = K // SUB
    bn = block_n or _pick_block_n(KH, N)
    grid = (N // bn,)
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))

    xe = x[:, 0::2]
    xo = x[:, 1::2]
    xsum = jnp.sum(x.reshape(M, G, SUB).astype(jnp.float32), axis=-1)

    kernel = functools.partial(_q4k_kernel, m=M, g=G)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype or x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, KH), lambda j, l: (0, 0)),
                pl.BlockSpec((M, KH), lambda j, l: (0, 0)),
                pl.BlockSpec((M, G), lambda j, l: (0, 0)),
                pl.BlockSpec((1, KH, bn), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, G, bn), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, G, bn), lambda j, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, l: (0, j)),
        ),
        interpret=interpret,
    )(layer, xe.astype(x.dtype), xo.astype(x.dtype), xsum, wq, scale, zero)
