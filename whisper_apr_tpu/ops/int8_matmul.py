"""Pallas fused int8 dequant-matmul.

XLA's int8 path materializes the converted bf16/f32 weight buffer in HBM
before the dot (measured on large-v3 decode: ~3.0 ms/step vs the ~1.6 ms
bandwidth optimum for int8 reads). This kernel converts int8 -> compute
dtype inside the VMEM tile loop, so HBM sees only the int8 bytes.

Unlike the int4 kernel, the int8 convert is a single cheap cast (no nibble
unpack, no lane interleave), so it stays bandwidth-bound.

y[M, N] = (x[M, K] @ w_q[K, N]) * scale[N]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# opt-in switch (see ops/basic.linear); benchmarked per model size
USE_PALLAS_INT8 = False


def _int8_matmul_kernel(x_ref, wq_ref, scale_ref, o_ref, acc_ref,
                        *, n_k_tiles: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = wq_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc_ref[...] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k_tiles - 1)
    def _store():
        # column-wise scale folds in once: x @ (q*s) == (x @ q) * s
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 128, block_n: int = 128, block_k: int = 128,
                interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ int8 wq [K, N] with per-channel (or scalar) scale."""
    M, K = x.shape
    N = wq.shape[1]
    scale = jnp.broadcast_to(scale.reshape(1, -1), (1, N)) \
        if scale.size > 1 else jnp.broadcast_to(scale.reshape(1, 1), (1, N))

    def _pad2(a, r0, r1):
        return jax.lax.pad(a, jnp.zeros((), a.dtype),
                           ((0, r0, 0), (0, r1, 0)))

    m_pad = (-M) % block_m
    k_pad = (-K) % block_k
    n_pad = (-N) % block_n
    if m_pad or k_pad:
        x = _pad2(x, m_pad, k_pad)
    if k_pad or n_pad:
        wq = _pad2(wq, k_pad, n_pad)
    if n_pad:
        scale = _pad2(scale, 0, n_pad)
    Mp, Kp, Np = M + m_pad, K + k_pad, N + n_pad

    grid = (Mp // block_m, Np // block_n, Kp // block_k)
    kernel = functools.partial(_int8_matmul_kernel, n_k_tiles=grid[2])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, wq, scale)
    return out[:M, :N]


def linear_int8(x: jnp.ndarray, qt, b: Optional[jnp.ndarray] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Linear layer over an int8 QTensor. x: [..., K] -> [..., N]."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    scale = qt.scale
    while scale.ndim > 2:
        scale = scale[0]
    y = int8_matmul(x2, qt.q, scale, interpret=interpret)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(lead + (y.shape[-1],))
