"""Pallas fused int4 dequant-matmul.

The XLA path for packed-int4 weights materializes the unpacked bf16 weight
buffer in HBM before the dot (measured: int4 75 ms vs int8 51 ms per tiny
clip — the unpack erases the bandwidth win). This kernel unpacks nibbles in
VMEM inside the matmul tile loop, so HBM traffic is the PACKED bytes:
half of int8, a quarter of bf16.

Mirrors the semantics of the reference's fused quantized kernels
(reference: src/model/quantized.rs QuantizedLinearQ4K::forward_fused :355 —
dequantize-inside-the-dot via realizar), with our pair packing
(quantized.rs:1911: low nibble = even column, high nibble = odd column).

y[M, N] = x[M, K] @ unpack(wq[K, N/2]) * scale[N]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Opt-in switch for routing int4 QTensor linears through this kernel.
# Measured on v5e (224-token decode, 30 s clip): tiny 102.7 ms / large-v3
# 2557 ms vs int8's 51.8 / 667.6 ms — single-stream decode re-unpacks the
# whole weight matrix per token, turning an HBM-bandwidth problem into a
# larger VPU-compute one. Use int4 when HBM CAPACITY is the constraint
# (0.84 GB vs 1.57 GB for large-v3), not decode latency.
USE_PALLAS_INT4 = False


def _unpack_nibbles(packed: jnp.ndarray):
    """[k, n/2] int8 bytes -> (lo, hi) f32 [k, n/2] each.

    Sign extension via the branch-free identity ``((v & 15) ^ 8) - 8``
    in int32 (Mosaic has no uint8->f32 cast and no int8 lane interleave, so
    the even/odd column streams stay SEPARATE inside the kernel; the caller
    interleaves the two OUTPUT halves outside, where XLA handles it).
    """
    u = packed.astype(jnp.int32) & 0xFF
    lo = (((u & 0x0F) ^ 0x08) - 8).astype(jnp.float32)
    hi = ((((u >> 4) & 0x0F) ^ 0x08) - 8).astype(jnp.float32)
    return lo, hi


def _int4_matmul_kernel(x_ref, wq_ref, s_lo_ref, s_hi_ref,
                        o_lo_ref, o_hi_ref, acc_lo, acc_hi,
                        *, n_k_tiles: int):
    """Grid (M/bm, Nh/bnh, K/bk); wq tile [bk, bnh] packed; outputs are the
    EVEN-column and ODD-column halves [bm, bnh] each."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    lo, hi = _unpack_nibbles(wq_ref[...])
    x = x_ref[...]
    acc_lo[...] += jax.lax.dot(x, lo.astype(x.dtype),
                               preferred_element_type=jnp.float32)
    acc_hi[...] += jax.lax.dot(x, hi.astype(x.dtype),
                               preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k_tiles - 1)
    def _store():
        # per-output-channel scale folds in once at the end:
        # x @ (q * s) == (x @ q) * s for column-wise s
        o_lo_ref[...] = (acc_lo[...] * s_lo_ref[...].astype(jnp.float32)
                         ).astype(o_lo_ref.dtype)
        o_hi_ref[...] = (acc_hi[...] * s_hi_ref[...].astype(jnp.float32)
                         ).astype(o_hi_ref.dtype)


def int4_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 128, block_n: int = 256, block_k: int = 128,
                interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ packed-int4 wq [K, N/2] with per-channel scale [..., N].

    The kernel computes the even-column (low nibble) and odd-column (high
    nibble) output halves separately — Mosaic cannot interleave lanes of
    sub-32-bit vectors — and XLA interleaves them afterwards. ``block_n``
    counts OUTPUT columns; the packed tile uses block_n/2 = 128 lanes.
    """
    M, K = x.shape
    half = wq.shape[1]
    N = half * 2
    scale = scale.reshape(1, -1)[:, :N]
    s_lo = scale[:, 0::2]  # even output columns (low nibbles)
    s_hi = scale[:, 1::2]  # odd output columns (high nibbles)
    block_nh = block_n // 2  # per-half lane block (128)

    def _pad2(a, r0, r1):
        # lax.pad, not jnp.pad: avoids a nested closed_call inside scan
        return jax.lax.pad(a, jnp.zeros((), a.dtype),
                           ((0, r0, 0), (0, r1, 0)))

    m_pad = (-M) % block_m
    k_pad = (-K) % block_k
    h_pad = (-half) % block_nh
    if m_pad or k_pad:
        x = _pad2(x, m_pad, k_pad)
    if k_pad or h_pad:
        wq = _pad2(wq, k_pad, h_pad)
    if h_pad:
        s_lo = _pad2(s_lo, 0, h_pad)
        s_hi = _pad2(s_hi, 0, h_pad)
    Mp, Kp, Hp = M + m_pad, K + k_pad, half + h_pad

    grid = (Mp // block_m, Hp // block_nh, Kp // block_k)
    kernel = functools.partial(_int4_matmul_kernel, n_k_tiles=grid[2])

    out_lo, out_hi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Mp, Hp), x.dtype),
                   jax.ShapeDtypeStruct((Mp, Hp), x.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_nh), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, block_nh), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, block_nh), lambda i, j, k: (0, j)),
            ],
            out_specs=(pl.BlockSpec((block_m, block_nh),
                                    lambda i, j, k: (i, j)),
                       pl.BlockSpec((block_m, block_nh),
                                    lambda i, j, k: (i, j))),
            scratch_shapes=[
                pltpu.VMEM((block_m, block_nh), jnp.float32),
                pltpu.VMEM((block_m, block_nh), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, wq, s_lo, s_hi)
    # interleave the even/odd halves OUTSIDE the kernel (XLA territory)
    out = jnp.stack([out_lo[:M, :half], out_hi[:M, :half]],
                    axis=-1).reshape(M, N)
    return out


def linear_int4(x: jnp.ndarray, qt, b: Optional[jnp.ndarray] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Linear layer over a packed-int4 QTensor (2-D only; callers slice the
    layer axis before this). x: [..., K] -> [..., N]."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    scale = qt.scale
    while scale.ndim > 2:
        scale = scale[0]
    y = int4_matmul(x2, qt.q, scale, interpret=interpret)
    y = y[..., : qt.orig_last]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(lead + (y.shape[-1],))
