"""Decode-specialized quantized matvec Pallas kernel.

The single-stream decode problem (reference semantics: quantized.rs:2501
``forward_quantized``): every decode step re-reads every decoder weight, so
the step time is bounded by HBM bandwidth over the quantized bytes. XLA's
int8 path materializes a converted bf16 weight buffer before the dot, which
costs extra HBM round trips (measured ~1.9x off the int8 bandwidth optimum
on large-v3, BENCH_NOTES.md). This kernel converts int8 -> bf16 inside the
VMEM tile so HBM sees only the int8 bytes — once.

Two design points that differ from a generic GEMM kernel:

1. **M stays tiny (1-8) and is never padded to an MXU tile.** The grid is
   over N only; K stays resident per tile. A [M, K] activation block is
   re-used across the whole N loop (constant index_map -> one DMA).

2. **Stacked-layer weights are addressed by a scalar-prefetch layer index.**
   Decoder params live as ``[L, K, N]`` stacks (scanned layers). Slicing a
   layer OUT of the stack to feed a kernel would materialize an HBM copy
   per step; instead the whole stack is passed and the BlockSpec index_map
   reads ``(layer, 0, j)`` directly — zero-copy per-layer addressing from
   inside ``lax.scan``/``lax.while_loop``.

y[M, N] = (x[M, K] @ wq[layer, K, N]) * scale[layer, N]
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# production switch for the quantized decode fast path (engine sets this
# per-call; default on for TPU backends, tests exercise interpret mode)
USE_QMATVEC = True

_LANE = 128
# per-buffer VMEM budget for the weight tile (double-buffered by pallas)
_TILE_BYTES = 2 * 1024 * 1024


def _pick_block_n(k: int, n: int) -> int:
    """Largest multiple-of-128 divisor of n with k*block_n under budget,
    preferring >= 2 grid steps so DMA overlaps compute."""
    best = _LANE
    for cand in range(_LANE, n + 1, _LANE):
        if n % cand:
            continue
        if k * cand > _TILE_BYTES:
            break
        best = cand
    if best == n and n // 2 % _LANE == 0:
        best = n // 2  # force >= 2 grid steps for pipelining
    return best


def _qmatvec_kernel(layer_ref, x_ref, wq_ref, scale_ref, o_ref):
    x = x_ref[...]
    w = wq_ref[0].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * scale_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def qmatvec_stacked(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                    layer, block_n: Optional[int] = None,
                    interpret: bool = False,
                    out_dtype=None) -> jnp.ndarray:
    """x [M, K] @ wq[layer] with per-channel scale; layer picked on device.

    wq: [L, K, N] int8 (N multiple of 128); scale: [L, 1, N] f32.
    Returns [M, N] in x.dtype (or ``out_dtype``, e.g. f32 logits). M is
    expected small (decode shapes); for prefill/encoder GEMMs use XLA.
    """
    M, K = x.shape
    L, K2, N = wq.shape
    assert K == K2, (x.shape, wq.shape)
    assert N % _LANE == 0, f"N={N} must be padded to a multiple of {_LANE}"
    bn = block_n or _pick_block_n(K, N)
    grid = (N // bn,)
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))

    return pl.pallas_call(
        _qmatvec_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype or x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, K), lambda j, l: (0, 0)),
                pl.BlockSpec((1, K, bn), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, l: (0, j)),
        ),
        interpret=interpret,
    )(layer, x, wq, scale)


def qmatvec(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
            block_n: Optional[int] = None,
            interpret: bool = False) -> jnp.ndarray:
    """Unstacked convenience wrapper: wq [K, N], scale [N] or scalar."""
    K, N = wq.shape
    scale = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(1, -1), (1, N))
    return qmatvec_stacked(x, wq[None], scale[None], 0,
                           block_n=block_n, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused greedy head: vocab matvec + bias + running argmax + online
# logsumexp in ONE kernel — no [M, 52k] logits materialization, no XLA
# bias/argmax fusions in the greedy loop (round-4 session-5 anatomy: the
# whole B=1 gap is the step's FIXED part; the vocab tail + greedy glue
# are its biggest accounted slice)
# ---------------------------------------------------------------------------

_NEG_INF = float("-inf")


def _greedy_head_kernel(x_ref, wq_ref, bias_ref, tok_ref, max_ref, lz_ref,
                        m_s, z_s, i_s, *, bn: int, n_vocab: int):
    j = pl.program_id(0)
    m = x_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, _NEG_INF, jnp.float32)
        z_s[...] = jnp.zeros(z_s.shape, jnp.float32)
        i_s[...] = jnp.zeros(i_s.shape, jnp.int32)

    x = x_ref[...]                                       # [M, K]
    w = wq_ref[0].astype(x.dtype)                        # [K, bn]
    logit = jax.lax.dot(x, w, preferred_element_type=jnp.float32) \
        + bias_ref[...].astype(jnp.float32)              # [M, bn]
    col = j * bn + jax.lax.broadcasted_iota(jnp.int32, (m, bn), 1)
    logit = jnp.where(col < n_vocab, logit, _NEG_INF)

    m_t = jnp.max(logit, axis=1, keepdims=True)          # [M, 1]
    # first-max index within the tile (jnp.argmax tie semantics)
    big = jnp.int32(2 ** 30)
    i_t = jnp.min(jnp.where(logit == m_t, col, big), axis=1,
                  keepdims=True)                         # [M, 1]

    m_prev = m_s[:, 0:1]
    m_new = jnp.maximum(m_prev, m_t)
    # masked tiles (m_t == -inf) contribute exp(-inf - finite) = 0
    z_new = z_s[:, 0:1] * jnp.exp(m_prev - m_new) \
        + jnp.sum(jnp.exp(logit - m_new), axis=1, keepdims=True)
    better = m_t > m_prev                                # strict: keep the
    i_new = jnp.where(better, i_t, i_s[:, 0:1])          # FIRST global max
    m_s[...] = jnp.broadcast_to(m_new, m_s.shape)
    z_s[...] = jnp.broadcast_to(z_new, z_s.shape)
    i_s[...] = jnp.broadcast_to(i_new, i_s.shape)

    @pl.when(j == pl.num_programs(0) - 1)
    def _tail():
        tok_ref[...] = i_s[...]
        max_ref[...] = m_s[...]
        lz_ref[...] = m_s[...] + jnp.log(jnp.maximum(z_s[...], 1e-30))


def qmatvec_greedy_head(x: jnp.ndarray, wq: jnp.ndarray, bias: jnp.ndarray,
                        n_vocab: int, block_n: Optional[int] = None,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy vocab head: argmax_v (x @ wq + bias) without logits.

    x [M, K] (K-side scale pre-folded, as for the plain vocab matvec);
    wq [1, K, N] int8 (N lane-padded >= n_vocab); bias [1, N] f32 (real
    suppressions; padded tail ignored via the in-kernel n_vocab mask).

    Returns (token [M] int32, max_logit [M] f32, logsumexp [M] f32) —
    max_logit - logsumexp is the chosen token's logprob, so the greedy
    quality gates keep working without a [M, 52k] round-trip.
    """
    M, K = x.shape
    _, K2, N = wq.shape
    assert K == K2 and N % _LANE == 0 and n_vocab <= N
    bn = block_n or _pick_block_n(K, N)
    grid = (N // bn,)
    kernel = functools.partial(_greedy_head_kernel, bn=bn, n_vocab=n_vocab)
    out_shapes = (
        jax.ShapeDtypeStruct((M, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((M, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((M, _LANE), jnp.float32),
    )
    ospec = pl.BlockSpec((M, _LANE), lambda j: (0, 0))
    tok, mx, lz = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, K), lambda j: (0, 0)),
                pl.BlockSpec((1, K, bn), lambda j: (0, 0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=(ospec, ospec, ospec),
            scratch_shapes=[
                pltpu.VMEM((M, _LANE), jnp.float32),
                pltpu.VMEM((M, _LANE), jnp.float32),
                pltpu.VMEM((M, _LANE), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(x, wq, bias)
    return tok[:, 0], mx[:, 0], lz[:, 0]


# ---------------------------------------------------------------------------
# Fused FFN kernel: fc2(gelu(fc1(x))) in one pallas call
# ---------------------------------------------------------------------------

def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7, f32).

    Mosaic has no erf/erfc lowering; this keeps the exact-GELU semantics
    well below bf16 rounding error inside the kernel.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * x * (1 + erf(x / sqrt(2))) — HF Whisper's exact GELU."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


def _ffn_kernel(layer_ref, x_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                o_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w1 = w1_ref[0].astype(x.dtype)
    h = jax.lax.dot(x, w1, preferred_element_type=jnp.float32)
    h = h * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h).astype(x.dtype)
    w2 = w2_ref[0].astype(x.dtype)
    acc_ref[...] += jax.lax.dot(h, w2, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def ffn_fused(x: jnp.ndarray, w1: jnp.ndarray, s1: jnp.ndarray,
              b1: jnp.ndarray, w2: jnp.ndarray, layer,
              block_h: int = 512, interpret: bool = False) -> jnp.ndarray:
    """y = gelu(x @ w1[l] * s1[l] + b1[l]) @ w2[l]  (fc2 scale applied by
    the caller — it is per-output-channel, so it commutes out).

    x [M, D]; w1 [L, D, H] int8; s1 [L, 1, H]; b1 [L, 1, H]; w2 [L, H, D] int8.
    One kernel: the [M, H] intermediate lives only in VMEM, and the fc2
    K-reduction accumulates in scratch across the H-tile grid.
    """
    M, D = x.shape
    L, D2, H = w1.shape
    assert D == D2 and w2.shape == (L, H, D)
    assert b1.shape == (L, 1, H), b1.shape
    assert H % block_h == 0 and D % _LANE == 0
    grid = (H // block_h,)
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))

    return pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, D), lambda j, l: (0, 0)),
                pl.BlockSpec((1, D, block_h), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda j, l: (l[0], 0, j)),
                pl.BlockSpec((1, block_h, D), lambda j, l: (l[0], j, 0)),
            ],
            out_specs=pl.BlockSpec((M, D), lambda j, l: (0, 0)),
            scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
        ),
        interpret=interpret,
    )(layer, x, w1, s1, b1, w2)
