"""Per-block decode megakernels: one Pallas call per decoder sub-block.

The decode-step anatomy (BENCH_NOTES.md round-2b) showed ~0.4 ms/step of
XLA glue on large-v3 — per-layer LayerNorm/bias slicing, residual adds,
and the seams between five kernels per layer. These three kernels absorb
ALL of it; the XLA step body shrinks to four KV-row writes per layer:

  self_block : x -> LN1 -> qkv matvec -> (quantize k,v rows OUT) ->
               masked flash attention over the self cache (+ the current
               token's k/v in VMEM) -> o-proj -> +bias -> +residual
  cross_block: x -> LN2 -> q matvec -> flash attention over the cross
               cache -> o-proj -> +bias -> +residual
  ffn_block  : x -> LN3 -> fc1 -> exact GELU -> fc2 -> *scale +bias
               -> +residual

All weight/cache operands are STACKED on a leading layer axis and indexed
by a scalar-prefetch layer id, so ``lax.fori_loop`` over layers never
materializes per-layer slices (the qmatvec trick, ops/qmatvec.py).

Heads are vectorized via the block-diagonal head-expansion matrix E
(see ops/decode_attention.py — a per-head loop measurably erases the
fusion win). KV caches may be int8 with per-row scales [L, B, T, 1]
(row scales commute through the attention dots exactly) or
float8_e4m3fn with no scales (handled by the bf16 branch — tiles cast
at read, a cheap native VPU convert; see qdecode.quantize_cache).

Reference semantics: decoder block at src/model/decoder.rs:1478 (forward_one
incremental path at :2125); attention per-head loop at
src/model/attention.rs:587-620; quantized linear at
src/model/quantized.rs:2501.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import head_expand_matrix

_LANES = 128
_NEG = float(-0.7 * np.finfo(np.float32).max)
_LN_EPS = 1e-5

# Transposed-score softmax (B=1 kernels): scores leave the MXU as [bt, H]
# (H = n_heads, e.g. 20, padded to 128 lanes), so every VPU op on them —
# mask, max, exp, sum, row scales — burns 128/H more vector registers
# than the live data needs.  With TRANSPOSED on, one small XLU transpose
# per tile flips scores to [H, bt] (full lanes), the online-softmax state
# becomes [H, 1], and the value contraction becomes a native [H, bt] @
# [bt, D] matmul (no implicit lhs transpose).  Opt-in until slope-timed
# on hardware (round-4 VERDICT #3: attention-tile VPU work).
TRANSPOSED = False


def _ln(x32: jnp.ndarray, w_ref, b_ref) -> jnp.ndarray:
    """f32 LayerNorm over lanes of [1, D] (reference: encoder.rs:219)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return normed * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)


# A&S rational erf / exact GELU shared with the FFN matvec kernels
from .qmatvec import _gelu_exact  # noqa: E402


def _attn_tile(s, valid, e_t, v, vs, m_ref, l_ref, acc_ref, quantized):
    """One online-softmax accumulation step.

    s: [bt, H] raw scores (f32, K-row scales already folded in by the
    caller — they ride the small [bt, H] matrix, never the [bt, D] tile);
    valid: [bt, 1] bool; v: [bt, D] — RAW int8 in quantized mode (the
    value contraction runs as an f32 x int8 MXU dot, which Mosaic lowers
    exactly; the int8 rows are never cast on the VPU), bf16 otherwise;
    vs: [bt, 1] f32 row scales or None (folded into the [bt, H]
    probabilities, which is exact: each row t of P scales v[t, :]
    uniformly)."""
    s = jnp.where(valid, s, _NEG)
    m_prev = m_ref[...]
    m_cur = jnp.max(s, axis=0, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)                            # [bt, H] f32
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[...] = m_next
    if quantized:
        # int8 MXU value path: contract the tile's rows directly against
        # the raw int8 values — O[h, d] = sum_t p[t, h] * v8[t, d] — then
        # select each lane's own head via the 0/1 mask e_t ([H, D]):
        # contrib[d] = sum_h O[h, d] * e_t[h, d] = O[head(d), d].
        # f32 x int8 -> f32 is exact on the MXU (probed); no VPU casts.
        p = p * vs                                     # [bt, 1] row scales
        o = jax.lax.dot_general(
            p, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [H, D] f32
        ones_h = jnp.ones((1, o.shape[0]), jnp.float32)
        contrib = jax.lax.dot(ones_h, o * e_t,
                              preferred_element_type=jnp.float32)  # [1, D]
    else:
        # MXU accumulators must be f32; inputs stay bf16, result -> bf16
        p_d = jax.lax.dot(p.astype(v.dtype), e_t.astype(v.dtype),
                          preferred_element_type=jnp.float32).astype(v.dtype)
        ones = jnp.ones((1, p.shape[0]), v.dtype)
        contrib = jax.lax.dot(ones, p_d * v,
                              preferred_element_type=jnp.float32)  # [1, D]
    alpha_d = jax.lax.dot(alpha, e_t, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha_d + contrib


def _finish_attention(e_t, m_ref, l_ref, acc_ref):
    l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), e_t,
                      preferred_element_type=jnp.float32)
    return acc_ref[...] / l_d                          # [1, D] f32


def _attn_tile_t(sT, validT, e_t, v, vsT, m_ref, l_ref, acc_ref, quantized):
    """Transposed-layout online-softmax step (see TRANSPOSED).

    sT: [H, bt] f32 scores with K-row scales folded; validT: [1, bt] bool;
    v: [bt, D] (raw int8 in quantized mode, compute dtype otherwise);
    vsT: [1, bt] f32 V-row scales or None; m/l scratch: [H, 1]."""
    sT = jnp.where(validT, sT, _NEG)
    m_prev = m_ref[...]                                # [H, 1]
    m_next = jnp.maximum(m_prev, jnp.max(sT, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)                   # [H, 1]
    pT = jnp.exp(sT - m_next)                          # [H, bt] full lanes
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pT, axis=1, keepdims=True)
    m_ref[...] = m_next
    if quantized:
        # fold V-row scales on lanes, then contract rows on the MXU:
        # f32 x int8 -> f32 is exact (probed, STATUS round 3)
        o = jax.lax.dot(pT * vsT, v,
                        preferred_element_type=jnp.float32)  # [H, D]
    else:
        o = jax.lax.dot(pT.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [H, D]
    ones_h = jnp.ones((1, o.shape[0]), jnp.float32)
    contrib = jax.lax.dot(ones_h, o * e_t,
                          preferred_element_type=jnp.float32)  # [1, D]
    alpha_d = jax.lax.dot(jnp.transpose(alpha), e_t,
                          preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha_d + contrib


def _finish_attention_t(e_t, m_ref, l_ref, acc_ref):
    l_row = jnp.transpose(jnp.maximum(l_ref[...], 1e-30))  # [1, H]
    l_d = jax.lax.dot(l_row, e_t, preferred_element_type=jnp.float32)
    return acc_ref[...] / l_d                          # [1, D] f32


def _quantize_row(r32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[1, D] f32 -> (int8 [1, D], scale [1, 1] f32)."""
    amax = jnp.max(jnp.abs(r32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(r32 / s), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# self_block
# ---------------------------------------------------------------------------

def _self_kernel(lengths_ref, layer_ref, nt_ref, x_ref, lnw_ref, lnb_ref,
                 wqkv_ref, sqkv_ref, bqkv_ref, kq_ref, ks_ref, vq_ref,
                 vs_ref, wo_ref, wos_ref, wob_ref, e_ref, et_ref,
                 xo_ref, k8_ref, ksc_ref, v8_ref, vsc_ref,
                 x32_s, q_s, kc_s, vc_s, m_ref, l_ref, acc_ref, qe_s,
                 *, d: int, bt: int, scale: float, quantized: bool,
                 transposed: bool = False):
    b = pl.program_id(0)
    t = pl.program_id(1)
    e = e_ref[...]
    et = et_ref[...]

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)             # [1, D]
        x32_s[...] = x32
        h = _ln(x32, lnw_ref, lnb_ref).astype(x_ref.dtype)
        w = wqkv_ref[0].astype(x_ref.dtype)
        qkv = jax.lax.dot(h, w, preferred_element_type=jnp.float32)
        qkv = qkv * sqkv_ref[0].astype(jnp.float32) \
            + bqkv_ref[0].astype(jnp.float32)          # [1, 3D] f32
        q = qkv[:, :d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]
        q_s[...] = q * scale
        if quantized or transposed:
            # qe[d, h] = q[d] * scale * e[d, h]: the score dot against the
            # RAW int8 K tile becomes s = dot(k8, qe) * ks — the per-tile
            # [bt, D] cast + multiply moves onto the MXU. [1, D] -> [D, 1]
            # via a sublane broadcast + probed [8, D] transpose.
            # (transposed bf16 mode uses qe the same way: the k * q
            # elementwise over [bt, D] moves into the score matmul.)
            q8 = jnp.broadcast_to(q * scale, (8, d))
            qe_s[...] = jnp.transpose(q8)[:, 0:1] * e
        if quantized:
            k8, ks = _quantize_row(k)
            v8, vs = _quantize_row(v)
            k8_ref[...] = k8[None]
            v8_ref[...] = v8[None]
            ksc_ref[...] = jnp.broadcast_to(ks, ksc_ref.shape[1:])[None]
            vsc_ref[...] = jnp.broadcast_to(vs, vsc_ref.shape[1:])[None]
            # attend to what later steps will read (the quantized row)
            kc_s[...] = k8.astype(jnp.float32) * ks
            vc_s[...] = v8.astype(jnp.float32) * vs
        else:
            kb = k.astype(k8_ref.dtype)
            vb = v.astype(v8_ref.dtype)
            k8_ref[...] = kb[None]
            v8_ref[...] = vb[None]
            ksc_ref[...] = jnp.ones(ksc_ref.shape[1:], jnp.float32)[None]
            vsc_ref[...] = jnp.ones(vsc_ref.shape[1:], jnp.float32)[None]
            kc_s[...] = kb.astype(jnp.float32)
            vc_s[...] = vb.astype(jnp.float32)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    # int8 mode: both tile contractions run RAW int8 against f32 on the
    # MXU (exact, probed) — no [bt, D] VPU casts or multiplies touch the
    # KV tiles; the row scales ride the small [bt, H] matrices.
    # bf16 mode: bf16 elementwise + bf16 MXU dots with f32 accumulation.
    # Tiles past ceil(pos/bt) hold no live rows: their index maps repeat
    # the last live block (no DMA) and the compute is skipped.
    cdt = x_ref.dtype

    @pl.when(t < nt_ref[0])
    def _tile():
        if transposed:
            if quantized:
                s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                                preferred_element_type=jnp.float32)
                sT = jnp.transpose(s) \
                    * jnp.transpose(ks_ref[0, 0].astype(jnp.float32))
                vsT = jnp.transpose(vs_ref[0, 0].astype(jnp.float32))
                v = vq_ref[0, 0]                       # raw int8 [bt, D]
            else:
                k = kq_ref[0, 0].astype(cdt)
                v = vq_ref[0, 0].astype(cdt)
                sT = jnp.transpose(jax.lax.dot(
                    k, qe_s[...].astype(cdt),
                    preferred_element_type=jnp.float32))  # [H, bt]
                vsT = None
            posT = t * bt + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
            validT = posT < lengths_ref[b]             # excludes current
            _attn_tile_t(sT, validT, et, v, vsT, m_ref, l_ref, acc_ref,
                         quantized)
            return
        vs = None
        if quantized:
            s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                            preferred_element_type=jnp.float32)  # [bt, H]
            s = s * ks_ref[0, 0].astype(jnp.float32)   # [bt, 1] K scales
            vs = vs_ref[0, 0].astype(jnp.float32)
            v = vq_ref[0, 0]                           # raw int8 [bt, D]
        else:
            k = kq_ref[0, 0].astype(cdt)               # [bt, D]
            v = vq_ref[0, 0].astype(cdt)
            qk = k * q_s[...].astype(cdt)
            s = jax.lax.dot(qk, e.astype(cdt),
                            preferred_element_type=jnp.float32)  # [bt, H]
        pos = t * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        valid = pos < lengths_ref[b]                   # excludes current
        _attn_tile(s, valid, et, v, vs, m_ref, l_ref, acc_ref, quantized)

    @pl.when(t == pl.num_programs(1) - 1)
    def _tail():
        # current token's k/v (in VMEM, exactly what was written out)
        s_c = jax.lax.dot(kc_s[...] * q_s[...], e,
                          preferred_element_type=jnp.float32)  # [1, H]
        if transposed:                                 # [H, 1] -> [1, H]
            m_prev = jnp.transpose(m_ref[...])
            l_prev = jnp.transpose(l_ref[...])
        else:
            m_prev, l_prev = m_ref[...], l_ref[...]
        m_next = jnp.maximum(m_prev, s_c)
        alpha = jnp.exp(m_prev - m_next)
        p_c = jnp.exp(s_c - m_next)                    # [1, H]
        l_f = l_prev * alpha + p_c
        alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
        p_d = jax.lax.dot(p_c, et, preferred_element_type=jnp.float32)
        acc = acc_ref[...] * alpha_d + p_d * vc_s[...]
        l_d = jax.lax.dot(jnp.maximum(l_f, 1e-30), et,
                          preferred_element_type=jnp.float32)
        out = (acc / l_d).astype(x_ref.dtype)          # [1, D]
        wo = wo_ref[0].astype(x_ref.dtype)
        y = jax.lax.dot(out, wo, preferred_element_type=jnp.float32)
        y = y * wos_ref[0].astype(jnp.float32) + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)[None]


def self_block(x: jnp.ndarray, blk: dict, kq: jnp.ndarray,
               ks: Optional[jnp.ndarray], vq: jnp.ndarray,
               vs: Optional[jnp.ndarray], pos: jnp.ndarray, layer,
               n_heads: int, block_t: int = 256,
               interpret: bool = False,
               transposed: Optional[bool] = None):
    """Whole self-attention sub-block for one decode token per sequence.

    x [B, D]; blk: stacked operands from qdecode.prepare_qdecode()["blk"]
    (ln1_w/ln1_b [L,1,D], wqkv [L,D,3D] int8, sqkv/bqkv [L,1,3D],
    wo [L,D,D] int8, wos/wob [L,1,D]); kq/vq [L,B,T,D] cache stacks with
    optional per-row scales ks/vs [L,B,T,1] (int8 mode);
    pos [B] int32 — rows < pos are valid history (current token's k/v are
    computed in-kernel and NOT yet in the cache).

    Returns (x_out [B, D], k_row, k_scale [B], v_row, v_scale [B]) — the
    caller scatters the rows into the cache at ``pos``.
    """
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2)
    assert T % block_t == 0
    quantized = ks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    grid = (B, T // block_t)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    # int8 -> int8 rows; fp8 caches -> f8 rows; bf16 -> compute dtype
    row_dtype = kq.dtype

    if transposed is None:
        transposed = TRANSPOSED
    kernel = functools.partial(_self_kernel, d=D, bt=block_t, scale=scale,
                               quantized=quantized, transposed=transposed)
    ml_shape = (n_heads, 1) if transposed else (1, n_heads)
    # dynamic tile bound (see self_block_batched)
    n_tiles = T // block_t
    nt = jnp.clip((jnp.max(lengths) + block_t - 1) // block_t,
                  1, n_tiles).reshape((1,)).astype(jnp.int32)

    def const(i, j=None):
        if j is None:
            return lambda b, t, lens, lyr, ntr: (lyr[0], 0)
        return lambda b, t, lens, lyr, ntr: (lyr[0], 0, 0)

    clamp = lambda t, ntr: jnp.minimum(t, ntr[0] - 1)
    cache_spec = pl.BlockSpec(
        (1, 1, block_t, D),
        lambda b, t, lens, lyr, ntr: (lyr[0], b, clamp(t, ntr), 0))
    if quantized:
        ks_in, vs_in = ks, vs
        sspec = pl.BlockSpec(
            (1, 1, block_t, 1),
            lambda b, t, lens, lyr, ntr: (lyr[0], b, clamp(t, ntr), 0))
    else:
        ks_in = jnp.zeros((L, B, block_t, 1), jnp.float32)
        vs_in = ks_in
        sspec = pl.BlockSpec((1, 1, block_t, 1),
                             lambda b, t, lens, lyr, ntr: (lyr[0], b, 0, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((B, 1, D), x.dtype),        # x_out
        jax.ShapeDtypeStruct((B, 1, D), row_dtype),      # k row
        jax.ShapeDtypeStruct((B, 1, _LANES), jnp.float32),  # k scale
        jax.ShapeDtypeStruct((B, 1, D), row_dtype),      # v row
        jax.ShapeDtypeStruct((B, 1, _LANES), jnp.float32),  # v scale
    )
    bspec = lambda shp: pl.BlockSpec(
        shp, lambda b, t, lens, lyr, ntr: (b, 0, 0))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D),
                             lambda b, t, lens, lyr, ntr: (b, 0, 0)),
                pl.BlockSpec((1, 1, D), const(0, 0)),     # ln_w
                pl.BlockSpec((1, 1, D), const(0, 0)),     # ln_b
                pl.BlockSpec((1, D, 3 * D), const(0, 0)),  # wqkv
                pl.BlockSpec((1, 1, 3 * D), const(0, 0)),  # sqkv
                pl.BlockSpec((1, 1, 3 * D), const(0, 0)),  # bqkv
                cache_spec,                               # kq
                sspec,                                    # ks
                cache_spec,                               # vq
                sspec,                                    # vs
                pl.BlockSpec((1, D, D), const(0, 0)),     # wo
                pl.BlockSpec((1, 1, D), const(0, 0)),     # wos
                pl.BlockSpec((1, 1, D), const(0, 0)),     # wob
                pl.BlockSpec((D, n_heads),
                             lambda b, t, lens, lyr, ntr: (0, 0)),
                pl.BlockSpec((n_heads, D),
                             lambda b, t, lens, lyr, ntr: (0, 0)),
            ],
            out_specs=(
                bspec((1, 1, D)),
                bspec((1, 1, D)),
                bspec((1, 1, _LANES)),
                bspec((1, 1, D)),
                bspec((1, 1, _LANES)),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),      # x32 (residual)
                pltpu.VMEM((1, D), jnp.float32),      # q (pre-scaled)
                pltpu.VMEM((1, D), jnp.float32),      # k current
                pltpu.VMEM((1, D), jnp.float32),      # v current
                pltpu.VMEM(ml_shape, jnp.float32),    # m (online max)
                pltpu.VMEM(ml_shape, jnp.float32),    # l (online sum)
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((D, n_heads), jnp.float32),  # qe (int8 scores)
            ],
        ),
        interpret=interpret,
    )(lengths, layer, nt, x[:, None, :], blk["ln1_w"], blk["ln1_b"],
      blk["wqkv"], blk["sqkv"], blk["bqkv"], kq, ks_in, vq, vs_in,
      blk["self_wo"], blk["self_wos"], blk["self_wob"], e_mat, et_mat)
    x_out, k8, ksc, v8, vsc = outs
    return (x_out[:, 0, :], k8[:, 0, :], ksc[:, 0, 0], v8[:, 0, :],
            vsc[:, 0, 0])


# ---------------------------------------------------------------------------
# cross_block
# ---------------------------------------------------------------------------

def _cross_kernel(lengths_ref, layer_ref, x_ref, lnw_ref, lnb_ref,
                  wq_ref, sq_ref, bq_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                  wo_ref, wos_ref, wob_ref, e_ref, et_ref,
                  xo_ref, x32_s, q_s, m_ref, l_ref, acc_ref, qe_s,
                  *, bt: int, scale: float, quantized: bool,
                  transposed: bool = False):
    b = pl.program_id(0)
    t = pl.program_id(1)
    e = e_ref[...]
    et = et_ref[...]

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)
        x32_s[...] = x32
        h = _ln(x32, lnw_ref, lnb_ref).astype(x_ref.dtype)
        w = wq_ref[0].astype(x_ref.dtype)
        q = jax.lax.dot(h, w, preferred_element_type=jnp.float32)
        q = q * sq_ref[0].astype(jnp.float32) + bq_ref[0].astype(jnp.float32)
        q_s[...] = q * scale
        if quantized or transposed:
            # see _self_kernel: raw-int8 score dot needs qe = q_col * e
            q8 = jnp.broadcast_to(q * scale, (8, q.shape[-1]))
            qe_s[...] = jnp.transpose(q8)[:, 0:1] * e
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    cdt = x_ref.dtype
    if transposed:
        if quantized:
            s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                            preferred_element_type=jnp.float32)
            sT = jnp.transpose(s) \
                * jnp.transpose(ks_ref[0, 0].astype(jnp.float32))
            vsT = jnp.transpose(vs_ref[0, 0].astype(jnp.float32))
            v = vq_ref[0, 0]                           # raw int8 [bt, D]
        else:
            k = kq_ref[0, 0].astype(cdt)
            v = vq_ref[0, 0].astype(cdt)
            sT = jnp.transpose(jax.lax.dot(
                k, qe_s[...].astype(cdt),
                preferred_element_type=jnp.float32))   # [H, bt]
            vsT = None
        posT = t * bt + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        validT = posT < lengths_ref[b]
        _attn_tile_t(sT, validT, et, v, vsT, m_ref, l_ref, acc_ref,
                     quantized)
    else:
        vs = None
        if quantized:
            s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                            preferred_element_type=jnp.float32)
            s = s * ks_ref[0, 0].astype(jnp.float32)
            vs = vs_ref[0, 0].astype(jnp.float32)
            v = vq_ref[0, 0]                           # raw int8 [bt, D]
        else:
            k = kq_ref[0, 0].astype(cdt)
            v = vq_ref[0, 0].astype(cdt)
            qk = k * q_s[...].astype(cdt)
            s = jax.lax.dot(qk, e.astype(cdt),
                            preferred_element_type=jnp.float32)
        pos = t * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        valid = pos < lengths_ref[b]
        _attn_tile(s, valid, et, v, vs, m_ref, l_ref, acc_ref, quantized)

    @pl.when(t == pl.num_programs(1) - 1)
    def _tail():
        fin = _finish_attention_t if transposed else _finish_attention
        out = fin(et, m_ref, l_ref, acc_ref).astype(x_ref.dtype)
        wo = wo_ref[0].astype(x_ref.dtype)
        y = jax.lax.dot(out, wo, preferred_element_type=jnp.float32)
        y = y * wos_ref[0].astype(jnp.float32) + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)[None]


def cross_block(x: jnp.ndarray, blk: dict, kq: jnp.ndarray,
                ks: Optional[jnp.ndarray], vq: jnp.ndarray,
                vs: Optional[jnp.ndarray], enc_len: int, layer,
                n_heads: int, block_t: int = 512,
                interpret: bool = False) -> jnp.ndarray:
    """Whole cross-attention sub-block; cache is static per utterance.

    x [B, D]; kq/vq [L, B, Tc, D] (+ ks/vs row scales in int8 mode);
    enc_len — valid encoder positions (n_audio_ctx). Returns x_out [B, D].
    """
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2)
    assert T % block_t == 0
    quantized = ks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.full((B,), enc_len, jnp.int32)
    grid = (B, T // block_t)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    kernel = functools.partial(_cross_kernel, bt=block_t, scale=scale,
                               quantized=quantized)

    cache_spec = pl.BlockSpec((1, 1, block_t, D),
                              lambda b, t, lens, lyr: (lyr[0], b, t, 0))
    if quantized:
        ks_in, vs_in = ks, vs
        sspec = pl.BlockSpec((1, 1, block_t, 1),
                             lambda b, t, lens, lyr: (lyr[0], b, t, 0))
    else:
        ks_in = jnp.zeros((L, B, block_t, 1), jnp.float32)
        vs_in = ks_in
        sspec = pl.BlockSpec((1, 1, block_t, 1),
                             lambda b, t, lens, lyr: (lyr[0], b, 0, 0))

    const = lambda: (lambda b, t, lens, lyr: (lyr[0], 0, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D), lambda b, t, lens, lyr: (b, 0, 0)),
                pl.BlockSpec((1, 1, D), const()),         # ln_w
                pl.BlockSpec((1, 1, D), const()),         # ln_b
                pl.BlockSpec((1, D, D), const()),         # wq
                pl.BlockSpec((1, 1, D), const()),         # sq
                pl.BlockSpec((1, 1, D), const()),         # bq
                cache_spec, sspec, cache_spec, sspec,
                pl.BlockSpec((1, D, D), const()),         # wo
                pl.BlockSpec((1, 1, D), const()),         # wos
                pl.BlockSpec((1, 1, D), const()),         # wob
                pl.BlockSpec((D, n_heads), lambda b, t, lens, lyr: (0, 0)),
                pl.BlockSpec((n_heads, D), lambda b, t, lens, lyr: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, t, lens, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),      # x32
                pltpu.VMEM((1, D), jnp.float32),      # q
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((D, n_heads), jnp.float32),  # qe (int8 scores)
            ],
        ),
        interpret=interpret,
    )(lengths, layer, x[:, None, :], blk["ln2_w"], blk["ln2_b"],
      blk["wcq"], blk["scq"], blk["bcq"], kq, ks_in, vq, vs_in,
      blk["cross_wo"], blk["cross_wos"], blk["cross_wob"], e_mat, et_mat)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# ffn_block
# ---------------------------------------------------------------------------

def _ffn_kernel(layer_ref, x_ref, lnw_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                w2_ref, f2s_ref, f2b_ref, xo_ref, x32_s, h_s, acc_ref):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)
        x32_s[...] = x32
        h_s[...] = _ln(x32, lnw_ref, lnb_ref).astype(h_s.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = h_s[...].astype(x_ref.dtype)
    w1 = w1_ref[0].astype(x_ref.dtype)
    t1 = jax.lax.dot(h, w1, preferred_element_type=jnp.float32)
    t1 = t1 * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)
    g = _gelu_exact(t1).astype(x_ref.dtype)
    w2 = w2_ref[0].astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot(g, w2, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _tail():
        y = (acc_ref[...] * f2s_ref[0].astype(jnp.float32)
             + f2b_ref[0].astype(jnp.float32) + x32_s[...])
        xo_ref[...] = y.astype(xo_ref.dtype)[None]


def ffn_block(x: jnp.ndarray, blk: dict, layer, block_h: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """Whole FFN sub-block: x + fc2(gelu(fc1(LN3(x)))) with the fc2
    per-channel scale/bias epilogue in-kernel. x [B, D] -> [B, D]."""
    B, D = x.shape
    L, D2, H = blk["w1"].shape
    assert D == D2 and H % block_h == 0
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    grid = (B, H // block_h)

    const = lambda: (lambda b, j, lyr: (lyr[0], 0, 0))
    out = pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D), lambda b, j, lyr: (b, 0, 0)),
                pl.BlockSpec((1, 1, D), const()),
                pl.BlockSpec((1, 1, D), const()),
                pl.BlockSpec((1, D, block_h), lambda b, j, lyr:
                             (lyr[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda b, j, lyr:
                             (lyr[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda b, j, lyr:
                             (lyr[0], 0, j)),
                pl.BlockSpec((1, block_h, D), lambda b, j, lyr:
                             (lyr[0], j, 0)),
                pl.BlockSpec((1, 1, D), const()),
                pl.BlockSpec((1, 1, D), const()),
            ],
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, j, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),   # x32
                pltpu.VMEM((1, D), jnp.float32),   # h (post-LN)
                pltpu.VMEM((1, D), jnp.float32),   # acc
            ],
        ),
        interpret=interpret,
    )(layer, x[:, None, :], blk["ln3_w"], blk["ln3_b"], blk["w1"],
      blk["s1"], blk["b1"], blk["w2"], blk["fc2_s"], blk["fc2_b"])
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Batched (M > 1) block kernels — serving slots / batched greedy
# ---------------------------------------------------------------------------
#
# The single-stream kernels above put B on the GRID, serializing
# per-sequence work (B=8 large-v3 measured 1.28 ms/slot-token vs the
# batched XLA scan step's 0.94 — BENCH_NOTES round-2c). These variants
# keep the grid over T tiles ONLY and carry all B sequences through each
# tile: projections run as [B, D] @ [D, N] MXU dots, and the per-sequence
# attention bookkeeping stays 2-D via a block-diagonal SELECTOR matrix
#
#     P_sel [B*bt, B], P_sel[i, b] = 1  iff  i // bt == b
#
# which expands per-b rows ([B, X] -> [B*bt, X] via P_sel @ .) and sums
# tile rows per b ([B*bt, X] -> [B, X] via P_sel^T @ .) as single MXU
# dots. Only the running-max update needs a (short, static) loop over B.
# At B slots the KV tiles dominate HBM traffic, so int8 KV (half the
# bytes) actually pays here, unlike at B=1.

def _sel_matrix(n_rows: int, b: int, bt: int):
    """P_sel [B*bt, B] built from iotas in-kernel (no DMA)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, b), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_rows, b), 1)
    return (i // bt == j).astype(jnp.float32)


def _batched_attn_tile(s, valid, e_t, v_in, vs, m_ref, l_ref, acc_ref,
                       sel, selT, B, bt, quantized, cdt):
    """Online-softmax update for all B sequences in one tile.

    s [B*bt, H] raw scores (K scales folded); valid [B*bt, 1];
    v_in [B*bt, D] compute dtype (int8 rows pre-cast by the caller);
    vs [B*bt, 1] f32 or None; m/l [B, H] f32 scratch;
    acc [B, D] f32 scratch."""
    s = jnp.where(valid, s, _NEG)
    m_prev = m_ref[...]                                # [B, H]
    # segmented max over each b's bt rows: static B loop over 2-D slices,
    # stacked by concatenate (a functional .at[].set lowers to an
    # unsupported in-kernel scatter)
    m_cur = jnp.concatenate(
        [jnp.max(s[b * bt: (b + 1) * bt, :], axis=0, keepdims=True)
         for b in range(B)], axis=0)                   # [B, H]
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)                   # [B, H]
    m_exp = jax.lax.dot(sel, m_next,
                        preferred_element_type=jnp.float32)  # [B*bt, H]
    p = jnp.exp(s - m_exp)                             # [B*bt, H]
    l_ref[...] = l_ref[...] * alpha + jax.lax.dot(
        selT, p, preferred_element_type=jnp.float32)   # [B, H]
    m_ref[...] = m_next
    # int8 rows are cast to the compute dtype by the CALLER as one big
    # [B*bt, D] VPU op — measured FASTER at B>1 than every raw-int8 MXU
    # formulation tried (batched 3-D dot_generals: 0.886; per-sequence
    # plain 2-D dots: 0.982; this cast path: 0.847 ms/slot-token at B=8
    # large-v3 on v5e — the f32 x int8 MXU lowering is exact but slow)
    if quantized:
        p = p * vs
    p_d = jax.lax.dot(p.astype(cdt), e_t.astype(cdt),
                      preferred_element_type=jnp.float32).astype(cdt)
    pv = p_d * v_in                                    # [B*bt, D]
    contrib = jax.lax.dot(selT.astype(cdt), pv,
                          preferred_element_type=jnp.float32)  # [B, D]
    alpha_d = jax.lax.dot(alpha, e_t, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha_d + contrib


def _ln_rows(x32, w_ref, b_ref):
    """f32 LayerNorm over lanes, any number of rows [B, D]."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return normed * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)


def _self_kernel_b(lengths_ref, layer_ref, nt_ref, x_ref, lnw_ref, lnb_ref,
                   wqkv_ref, sqkv_ref, bqkv_ref, kq_ref, ks_ref, vq_ref,
                   vs_ref, wo_ref, wos_ref, wob_ref, e_ref, et_ref, len_ref,
                   xo_ref, k8_ref, ksc_ref, v8_ref, vsc_ref,
                   x32_s, q_s, kc_s, vc_s, m_ref, l_ref, acc_ref,
                   *, d: int, bt: int, B: int, scale: float,
                   quantized: bool):
    t = pl.program_id(0)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype
    n_rows = B * bt
    sel = _sel_matrix(n_rows, B, bt)
    selT = jnp.transpose(sel)

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[...].astype(jnp.float32)           # [B, D]
        x32_s[...] = x32
        h = _ln_rows(x32, lnw_ref, lnb_ref).astype(cdt)
        w = wqkv_ref[0].astype(cdt)
        qkv = jax.lax.dot(h, w, preferred_element_type=jnp.float32)
        qkv = qkv * sqkv_ref[0].astype(jnp.float32) \
            + bqkv_ref[0].astype(jnp.float32)          # [B, 3D] f32
        q = qkv[:, :d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]
        q_s[...] = q * scale
        if quantized:
            amax_k = jnp.max(jnp.abs(k), axis=-1, keepdims=True)
            ks = jnp.maximum(amax_k, 1e-12) / 127.0    # [B, 1]
            k8 = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)
            amax_v = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
            vsc = jnp.maximum(amax_v, 1e-12) / 127.0
            v8 = jnp.clip(jnp.round(v / vsc), -127, 127).astype(jnp.int8)
            k8_ref[...] = k8
            v8_ref[...] = v8
            ksc_ref[...] = jnp.broadcast_to(ks, ksc_ref.shape)
            vsc_ref[...] = jnp.broadcast_to(vsc, vsc_ref.shape)
            kc_s[...] = k8.astype(jnp.float32) * ks
            vc_s[...] = v8.astype(jnp.float32) * vsc
        else:
            k8_ref[...] = k.astype(k8_ref.dtype)
            v8_ref[...] = v.astype(v8_ref.dtype)
            ksc_ref[...] = jnp.ones(ksc_ref.shape, jnp.float32)
            vsc_ref[...] = jnp.ones(vsc_ref.shape, jnp.float32)
            kc_s[...] = k.astype(k8_ref.dtype).astype(jnp.float32)
            vc_s[...] = v.astype(v8_ref.dtype).astype(jnp.float32)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    # DYNAMIC TILE BOUNDING (the paged cache's bandwidth win, dense):
    # tiles past ceil(max(pos)/bt) hold no live rows — their index maps
    # repeat the last live block (no new DMA) and the compute is skipped.
    @pl.when(t < nt_ref[0])
    def _tile():
        k_flat = kq_ref[0].reshape(n_rows, d).astype(cdt)  # [B*bt, D]
        v_in = vq_ref[0].reshape(n_rows, d).astype(cdt)
        q_exp = jax.lax.dot(sel.astype(cdt), q_s[...].astype(cdt),
                            preferred_element_type=jnp.float32).astype(cdt)
        qk = k_flat * q_exp
        s = jax.lax.dot(qk, e.astype(cdt),
                        preferred_element_type=jnp.float32)
        vs = None
        if quantized:
            s = s * ks_ref[0].reshape(n_rows, 1).astype(jnp.float32)
            vs = vs_ref[0].reshape(n_rows, 1).astype(jnp.float32)
        # per-b validity: row i covers position t*bt + i % bt of seq i//bt
        pos_in = t * bt + \
            jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0) % bt
        len_exp = jax.lax.dot(sel, len_ref[...].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        valid = pos_in.astype(jnp.float32) < len_exp
        _batched_attn_tile(s, valid, et, v_in, vs, m_ref, l_ref, acc_ref,
                           sel, selT, B, bt, quantized, cdt)

    @pl.when(t == pl.num_programs(0) - 1)
    def _tail():
        # current token's k/v per sequence — all [B, *] 2-D ops
        s_c = jax.lax.dot((kc_s[...] * q_s[...]).astype(jnp.float32), e,
                          preferred_element_type=jnp.float32)  # [B, H]
        m_prev = m_ref[...]
        m_next = jnp.maximum(m_prev, s_c)
        alpha = jnp.exp(m_prev - m_next)
        p_c = jnp.exp(s_c - m_next)
        l_f = l_ref[...] * alpha + p_c
        alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
        p_d = jax.lax.dot(p_c, et, preferred_element_type=jnp.float32)
        acc = acc_ref[...] * alpha_d + p_d * vc_s[...]
        l_d = jax.lax.dot(jnp.maximum(l_f, 1e-30), et,
                          preferred_element_type=jnp.float32)
        out = (acc / l_d).astype(cdt)                  # [B, D]
        wo = wo_ref[0].astype(cdt)
        y = jax.lax.dot(out, wo, preferred_element_type=jnp.float32)
        y = y * wos_ref[0].astype(jnp.float32) + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)


def self_block_batched(x, blk, kq, ks, vq, vs, pos, layer, n_heads,
                       block_t: int = 128, interpret: bool = False):
    """Batched self-attention sub-block: all B sequences per grid tile.

    Same contract as ``self_block`` (x [B, D]; pos [B] per-sequence valid
    lengths EXCLUDING the current token; returns (x_out, k_row, k_scale,
    v_row, v_scale)) but the grid is (T // block_t,) — use for B > 1.
    """
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2)
    assert T % block_t == 0
    quantized = ks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    grid = (T // block_t,)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    row_dtype = kq.dtype  # int8 / f8 / compute dtype (see self_block)
    kernel = functools.partial(_self_kernel_b, d=D, bt=block_t, B=B,
                               scale=scale, quantized=quantized)
    # dynamic tile bound: live tiles = ceil(max(pos)/bt) (>=1 so the
    # t==0 init always runs); dead tiles repeat the last live block in
    # their index maps, so no DMA is issued for them
    n_tiles = T // block_t
    nt = jnp.clip((jnp.max(lengths) + block_t - 1) // block_t,
                  1, n_tiles).reshape((1,)).astype(jnp.int32)

    const3 = lambda: (lambda t, lens, lyr, ntr: (lyr[0], 0, 0))
    clamp = lambda t, ntr: jnp.minimum(t, ntr[0] - 1)
    cache_spec = pl.BlockSpec(
        (1, B, block_t, D),
        lambda t, lens, lyr, ntr: (lyr[0], 0, clamp(t, ntr), 0))
    if quantized:
        ks_in, vs_in = ks, vs
        sspec = pl.BlockSpec(
            (1, B, block_t, 1),
            lambda t, lens, lyr, ntr: (lyr[0], 0, clamp(t, ntr), 0))
    else:
        ks_in = jnp.zeros((L, B, block_t, 1), jnp.float32)
        vs_in = ks_in
        sspec = pl.BlockSpec((1, B, block_t, 1),
                             lambda t, lens, lyr, ntr: (lyr[0], 0, 0, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((B, D), x.dtype),
        jax.ShapeDtypeStruct((B, D), row_dtype),
        jax.ShapeDtypeStruct((B, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, D), row_dtype),
        jax.ShapeDtypeStruct((B, _LANES), jnp.float32),
    )
    full2 = lambda shp: pl.BlockSpec(shp,
                                     lambda t, lens, lyr, ntr: (0, 0))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                full2((B, D)),                           # x
                pl.BlockSpec((1, 1, D), const3()),       # ln_w
                pl.BlockSpec((1, 1, D), const3()),       # ln_b
                pl.BlockSpec((1, D, 3 * D), const3()),   # wqkv
                pl.BlockSpec((1, 1, 3 * D), const3()),   # sqkv
                pl.BlockSpec((1, 1, 3 * D), const3()),   # bqkv
                cache_spec, sspec, cache_spec, sspec,
                pl.BlockSpec((1, D, D), const3()),       # wo
                pl.BlockSpec((1, 1, D), const3()),       # wos
                pl.BlockSpec((1, 1, D), const3()),       # wob
                pl.BlockSpec((D, n_heads),
                             lambda t, lens, lyr, ntr: (0, 0)),
                pl.BlockSpec((n_heads, D),
                             lambda t, lens, lyr, ntr: (0, 0)),
                full2((B, 1)),                           # lengths (VMEM)
            ],
            out_specs=(
                full2((B, D)), full2((B, D)), full2((B, _LANES)),
                full2((B, D)), full2((B, _LANES)),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),     # x32
                pltpu.VMEM((B, D), jnp.float32),     # q
                pltpu.VMEM((B, D), jnp.float32),     # k current
                pltpu.VMEM((B, D), jnp.float32),     # v current
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths, layer, nt, x, blk["ln1_w"], blk["ln1_b"], blk["wqkv"],
      blk["sqkv"], blk["bqkv"], kq, ks_in, vq, vs_in, blk["self_wo"],
      blk["self_wos"], blk["self_wob"], e_mat, et_mat,
      lengths[:, None].astype(jnp.int32))
    x_out, k8, ksc, v8, vsc = outs
    return x_out, k8, ksc[:, 0], v8, vsc[:, 0]


def _cross_kernel_b(lengths_ref, layer_ref, x_ref, lnw_ref, lnb_ref,
                    wq_ref, sq_ref, bq_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                    wo_ref, wos_ref, wob_ref, e_ref, et_ref,
                    xo_ref, x32_s, q_s, m_ref, l_ref, acc_ref,
                    *, d: int, bt: int, B: int, enc_len: int, scale: float,
                    quantized: bool):
    t = pl.program_id(0)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype
    n_rows = B * bt
    sel = _sel_matrix(n_rows, B, bt)
    selT = jnp.transpose(sel)

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[...].astype(jnp.float32)
        x32_s[...] = x32
        h = _ln_rows(x32, lnw_ref, lnb_ref).astype(cdt)
        w = wq_ref[0].astype(cdt)
        q = jax.lax.dot(h, w, preferred_element_type=jnp.float32)
        q = q * sq_ref[0].astype(jnp.float32) + bq_ref[0].astype(jnp.float32)
        q_s[...] = q * scale
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    k_flat = kq_ref[0].reshape(n_rows, d).astype(cdt)
    v_in = vq_ref[0].reshape(n_rows, d).astype(cdt)
    q_exp = jax.lax.dot(sel.astype(cdt), q_s[...].astype(cdt),
                        preferred_element_type=jnp.float32).astype(cdt)
    qk = k_flat * q_exp
    s = jax.lax.dot(qk, e.astype(cdt),
                    preferred_element_type=jnp.float32)
    vs = None
    if quantized:
        s = s * ks_ref[0].reshape(n_rows, 1).astype(jnp.float32)
        vs = vs_ref[0].reshape(n_rows, 1).astype(jnp.float32)
    # every sequence shares the encoder length (same utter padding)
    pos_in = t * bt + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0) % bt
    valid = pos_in < enc_len
    _batched_attn_tile(s, valid, et, v_in, vs, m_ref, l_ref, acc_ref,
                       sel, selT, B, bt, quantized, cdt)

    @pl.when(t == pl.num_programs(0) - 1)
    def _tail():
        l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), et,
                          preferred_element_type=jnp.float32)
        out = (acc_ref[...] / l_d).astype(cdt)
        wo = wo_ref[0].astype(cdt)
        y = jax.lax.dot(out, wo, preferred_element_type=jnp.float32)
        y = y * wos_ref[0].astype(jnp.float32) + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)


def cross_block_batched(x, blk, kq, ks, vq, vs, enc_len, layer, n_heads,
                        block_t: int = 128, interpret: bool = False):
    """Batched cross-attention sub-block (grid over T tiles, B per tile)."""
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2)
    assert T % block_t == 0
    quantized = ks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.zeros((B,), jnp.int32)  # unused (enc_len is static)
    grid = (T // block_t,)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    kernel = functools.partial(_cross_kernel_b, d=D, bt=block_t, B=B,
                               enc_len=int(enc_len), scale=scale,
                               quantized=quantized)

    const3 = lambda: (lambda t, lens, lyr: (lyr[0], 0, 0))
    cache_spec = pl.BlockSpec((1, B, block_t, D),
                              lambda t, lens, lyr: (lyr[0], 0, t, 0))
    if quantized:
        ks_in, vs_in = ks, vs
        sspec = pl.BlockSpec((1, B, block_t, 1),
                             lambda t, lens, lyr: (lyr[0], 0, t, 0))
    else:
        ks_in = jnp.zeros((L, B, block_t, 1), jnp.float32)
        vs_in = ks_in
        sspec = pl.BlockSpec((1, B, block_t, 1),
                             lambda t, lens, lyr: (lyr[0], 0, 0, 0))
    full2 = lambda shp: pl.BlockSpec(shp, lambda t, lens, lyr: (0, 0))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                full2((B, D)),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, D, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                cache_spec, sspec, cache_spec, sspec,
                pl.BlockSpec((1, D, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((D, n_heads), lambda t, lens, lyr: (0, 0)),
                pl.BlockSpec((n_heads, D), lambda t, lens, lyr: (0, 0)),
            ],
            out_specs=full2((B, D)),
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths, layer, x, blk["ln2_w"], blk["ln2_b"], blk["wcq"],
      blk["scq"], blk["bcq"], kq, ks_in, vq, vs_in, blk["cross_wo"],
      blk["cross_wos"], blk["cross_wob"], e_mat, et_mat)
    return out


def _ffn_kernel_b(layer_ref, x_ref, lnw_ref, lnb_ref, w1_ref, s1_ref,
                  b1_ref, w2_ref, f2s_ref, f2b_ref, xo_ref,
                  x32_s, h_s, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _head():
        x32 = x_ref[...].astype(jnp.float32)
        x32_s[...] = x32
        h_s[...] = _ln_rows(x32, lnw_ref, lnb_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = h_s[...].astype(x_ref.dtype)
    w1 = w1_ref[0].astype(x_ref.dtype)
    t1 = jax.lax.dot(h, w1, preferred_element_type=jnp.float32)
    t1 = t1 * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)
    g = _gelu_exact(t1).astype(x_ref.dtype)
    w2 = w2_ref[0].astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot(g, w2, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _tail():
        y = (acc_ref[...] * f2s_ref[0].astype(jnp.float32)
             + f2b_ref[0].astype(jnp.float32) + x32_s[...])
        xo_ref[...] = y.astype(xo_ref.dtype)


def ffn_block_batched(x, blk, layer, block_h: int = 512,
                      interpret: bool = False):
    """Batched FFN sub-block: [B, D] rows through every H tile together."""
    B, D = x.shape
    L, D2, H = blk["w1"].shape
    assert D == D2 and H % block_h == 0
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    grid = (H // block_h,)

    const3 = lambda: (lambda j, lyr: (lyr[0], 0, 0))
    full2 = lambda shp: pl.BlockSpec(shp, lambda j, lyr: (0, 0))
    out = pl.pallas_call(
        _ffn_kernel_b,
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                full2((B, D)),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, D, block_h), lambda j, lyr: (lyr[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda j, lyr: (lyr[0], 0, j)),
                pl.BlockSpec((1, 1, block_h), lambda j, lyr: (lyr[0], 0, j)),
                pl.BlockSpec((1, block_h, D), lambda j, lyr: (lyr[0], j, 0)),
                pl.BlockSpec((1, 1, D), const3()),
                pl.BlockSpec((1, 1, D), const3()),
            ],
            out_specs=full2((B, D)),
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(layer, x, blk["ln3_w"], blk["ln3_b"], blk["w1"], blk["s1"],
      blk["b1"], blk["w2"], blk["fc2_s"], blk["fc2_b"])
    return out
