"""Per-block decode megakernels for k-quant weights (Q4_K / Q5_K / Q6_K).

Round-4 measurement (BENCH_NOTES "k-quant decode steps"): the k-quant
scan path (`qdecode.decode_step_q` — standalone dequant matvecs + XLA
attention over the FULL padded caches) costs 5.91 ms/step (q4k) and
3.35 ms/step (q5k) on large-v3 B=1, vs 1.80 ms for the int8 fused
per-block path. The matvecs themselves are microseconds — the gap is
the unfused attention. These kernels close it: the same three per-block
megakernels as ops/decode_blocks.py (self / cross / ffn — LayerNorms,
projections, tile-bounded online-softmax attention, epilogues and
residuals all in-kernel) with the weight matvecs replaced by in-kernel
fused k-quant dequant-matvecs.

Weight formats (one kernel family, ``wfmt`` static flag):

  "q4k":  packed nibbles [L, K/2, N] uint8 (even K rows in the low
          nibble, odd in the high — ops/q4k.py planar form) with f32
          per-group scale AND zero [L, K/32, N];
  "kq":   int8 value planes [L, K, N] (Q5_K values 0..31 / Q6_K
          -32..31 — ops/kquants.py planar form) with f32 per-group
          scales [L, K/sub, N] (sub=32 asym Q5_K with a zero plane,
          sub=16 sym Q6_K without).

The matvec math is the BLOCK-DIAGONAL GROUP-EXPANSION of the standalone
kernels (ops/q4k.py, ops/kquants.py), specialized to M=1 (B=1 decode —
each grid row is one sequence): the row-selector matmuls collapse, so

    Xg [G, K],  Xg[g, k] = h[k] iff k//sub == g        (iota mask)
    P  = Xg @ W                                        [G, N]
    y  = ones[1,G] @ (S * P)  (- xsum @ Z)             [1, N]

with the q4k variant running one P per nibble plane (the even/odd
activation split is two 0/1-selector matmuls — strided lane slicing
does not lower in Mosaic). Weight tiles are CHUNKED over N inside the
kernel (static python loop) so the int32 nibble unpack / bf16 value
cast never materializes more than ~2 MiB of VMEM at once.

Traffic: q4k reads ~6 bits/weight (nibbles + f32 group scale+zero) =
0.75x the int8 path's weight bytes, and B=1 decode is weight-bandwidth
bound — so this path is expected to BEAT the int8 step, not just match
it. Q5_K/Q6_K planar values are a full int8 lane, so those land near
the int8 step plus group-scale overhead.

Attention (online softmax, dynamic tile bounding, int8/fp8/bf16 KV
rows, current-token tail) is shared with ops/decode_blocks.py.

Reference semantics: decoder block at src/model/decoder.rs:1478
(forward_one at :2125); fused k-quant linear forward:
QuantizedLinearQ4K::forward_fused, src/model/quantized.rs:355.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import head_expand_matrix
from .decode_blocks import (_LANES, _attn_tile, _finish_attention, _ln,
                            _quantize_row)
from .qmatvec import _gelu_exact

_CHUNK_BYTES = 2 * 1024 * 1024


def _pick_chunk(rows: int, n: int, elem_bytes: int) -> int:
    """Largest multiple-of-128 divisor of ``n`` whose [rows, chunk]
    unpack intermediate stays under ~2 MiB."""
    cap = max(_LANES, _CHUNK_BYTES // (elem_bytes * rows))
    best = None
    for cand in range(_LANES, n + 1, _LANES):
        if n % cand == 0 and cand <= cap:
            best = cand
    return best or _LANES


# ---------------------------------------------------------------------------
# in-kernel fused dequant matvecs (M=1)
# ---------------------------------------------------------------------------

def _group_expand(h_cdt: jnp.ndarray, g: int, sub: int) -> jnp.ndarray:
    """[1, K] -> [G, K] block-diagonal expansion (row g keeps group g)."""
    k = h_cdt.shape[1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
    mask = (col // sub == gi).astype(h_cdt.dtype)
    return jnp.broadcast_to(h_cdt, (g, k)) * mask


def _group_sums(h32: jnp.ndarray, g: int, sub: int) -> jnp.ndarray:
    """[1, K] f32 -> [1, G] per-group sums (zero-point term), via a 0/1
    selector dot (lane->sublane reshapes do not lower in Mosaic)."""
    k = h32.shape[1]
    ki = jax.lax.broadcasted_iota(jnp.int32, (k, g), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (k, g), 1)
    sel = (ki // sub == gi).astype(jnp.float32)
    return jax.lax.dot(h32, sel, preferred_element_type=jnp.float32)


def _mv_kq(h32: jnp.ndarray, wq_ref, s_ref, z_ref, *, sub: int,
           cdt) -> jnp.ndarray:
    """h32 [1, K] f32 @ int8-plane k-quant weight (ops/kquants.py planar
    layout) -> [1, N] f32. Mirrors kquants._kq_expand at M=1."""
    k = wq_ref.shape[1]
    n = wq_ref.shape[2]
    g = k // sub
    hc = h32.astype(cdt)                                 # compute-dtype h,
    xg = _group_expand(hc, g, sub)                       # as the scan path
    ones = jnp.ones((1, g), jnp.float32)
    xsum = (None if z_ref is None
            else _group_sums(hc.astype(jnp.float32), g, sub))
    cn = _pick_chunk(k, n, 2)
    outs = []
    for c0 in range(0, n, cn):
        w = wq_ref[0, :, c0:c0 + cn].astype(cdt)         # [K, cn]
        p = jax.lax.dot(xg, w, preferred_element_type=jnp.float32)
        s = s_ref[0, :, c0:c0 + cn].astype(jnp.float32)
        y = jax.lax.dot(ones, s * p, preferred_element_type=jnp.float32)
        if z_ref is not None:
            z = z_ref[0, :, c0:c0 + cn].astype(jnp.float32)
            y = y - jax.lax.dot(xsum, z, preferred_element_type=jnp.float32)
        outs.append(y)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


# q4k in-kernel nibble-unpack strategy (module flag so the TPU probe can
# A/B without an API change):
#   "i32"     — unpack both nibbles via int32 ops (6 VPU ops/packed byte)
#   "algebra" — measured round-4: the i32 variant is VPU-BOUND (2.23
#               ms/step vs int8's 1.80 despite 0.75x the weight bytes —
#               ~2.3G unpack ops/step eat the bandwidth win). Since
#               w = lo + 16*hi exactly,
#                   xe@lo + xo@hi == (xe - xo/16)@lo + (xo/16)@w
#               so only the LOW nibble is ever extracted (3 ops/byte:
#               and + two casts); the high nibble rides the raw-byte dot.
Q4K_UNPACK = "algebra"


def _mv_q4k(h32: jnp.ndarray, wq_ref, s_ref, z_ref, *, cdt) -> jnp.ndarray:
    """h32 [1, K] f32 @ packed-nibble Q4_K weight (ops/q4k.py planar
    layout: [K/2, N] even-low/odd-high) -> [1, N] f32. Mirrors
    q4k._q4k_kernel at M=1; the even/odd activation split runs as two
    0/1-selector matmuls (strided lane slicing is Mosaic poison)."""
    kh = wq_ref.shape[1]
    n = wq_ref.shape[2]
    k = 2 * kh
    g = k // 32                                          # Q4_K group = 32
    h_c = h32.astype(cdt)
    ki = jax.lax.broadcasted_iota(jnp.int32, (k, kh), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, kh), 1)
    ee = (ki == 2 * ri).astype(cdt)
    eo = (ki == 2 * ri + 1).astype(cdt)
    xe = jax.lax.dot(h_c, ee, preferred_element_type=jnp.float32).astype(cdt)
    xo = jax.lax.dot(h_c, eo, preferred_element_type=jnp.float32).astype(cdt)
    # group expansion on the HALF axis (16 even/odd slots per group of 32)
    xeg = _group_expand(xe, g, 16)                       # [G, K/2]
    xog = _group_expand(xo, g, 16)
    xsum = _group_sums(h_c.astype(jnp.float32), g, 32)   # [1, G]
    ones = jnp.ones((1, g), jnp.float32)
    cn = _pick_chunk(kh, n, 4)                           # int32 unpack
    algebra = Q4K_UNPACK == "algebra"
    if algebra:
        xog16 = xog * jnp.asarray(1.0 / 16.0, cdt)
        xel = xeg - xog16
    outs = []
    for c0 in range(0, n, cn):
        # planar q is stored int8 (raw packed bytes viewed signed) — both
        # variants zero-extend before using the byte as an unsigned value
        if algebra:
            wu = wq_ref[0, :, c0:c0 + cn].astype(jnp.int32) & 0xFF
            wf = wu.astype(cdt)          # bf16 holds 0..255 exactly
            lo = (wu & 0xF).astype(cdt)
            p = jax.lax.dot(xel, lo, preferred_element_type=jnp.float32) \
                + jax.lax.dot(xog16, wf,
                              preferred_element_type=jnp.float32)
        else:
            wi = wq_ref[0, :, c0:c0 + cn].astype(jnp.int32)
            lo = (wi & 0xF).astype(cdt)
            hi = ((wi >> 4) & 0xF).astype(cdt)
            p = jax.lax.dot(xeg, lo, preferred_element_type=jnp.float32) \
                + jax.lax.dot(xog, hi, preferred_element_type=jnp.float32)
        s = s_ref[0, :, c0:c0 + cn].astype(jnp.float32)
        y = jax.lax.dot(ones, s * p, preferred_element_type=jnp.float32)
        z = z_ref[0, :, c0:c0 + cn].astype(jnp.float32)
        y = y - jax.lax.dot(xsum, z, preferred_element_type=jnp.float32)
        outs.append(y)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _mv(h32, wrefs, *, wfmt: str, sub: int, cdt) -> jnp.ndarray:
    if wfmt == "q4k":
        return _mv_q4k(h32, wrefs[0], wrefs[1], wrefs[2], cdt=cdt)
    z = wrefs[2] if len(wrefs) == 3 else None
    return _mv_kq(h32, wrefs[0], wrefs[1], z, sub=sub, cdt=cdt)


def _weight_fmt(tri) -> Tuple[str, int]:
    """(wfmt, sub) from a stacked weight triple's shapes — trace-safe
    (no static strings ride the jitted qd pytree).

    q4k packs two K-values per int8 row ([L, K/2, N] with [L, K/32, N]
    scales -> row ratio 16, zero present); the int8-plane forms keep one
    value per row (ratio = sub: 32 asym Q5_K / 16 sym Q6_K)."""
    wq, s, z = tri
    ratio = wq.shape[1] // s.shape[1]
    if z is not None and ratio == 16:
        return "q4k", 32
    return "kq", ratio


def _w_specs(tri, const3):
    """BlockSpecs + operands for one stacked weight triple."""
    wq, s, z = tri
    specs = [pl.BlockSpec((1,) + wq.shape[1:], const3),
             pl.BlockSpec((1,) + s.shape[1:], const3)]
    ops = [wq, s]
    if z is not None:
        specs.append(pl.BlockSpec((1,) + z.shape[1:], const3))
        ops.append(z)
    return specs, ops


# ---------------------------------------------------------------------------
# self_block_kq
# ---------------------------------------------------------------------------

def _self_kernel_kq(lengths_ref, layer_ref, nt_ref, *refs, d: int, bt: int,
                    scale: float, quantized: bool, wfmt: str, sub: int,
                    nw_qkv: int, nw_o: int):
    it = iter(refs)
    x_ref = next(it)
    lnw_ref, lnb_ref = next(it), next(it)
    qkv_refs = [next(it) for _ in range(nw_qkv)]
    bqkv_ref = next(it)
    kq_ref, ks_ref, vq_ref, vs_ref = (next(it), next(it), next(it),
                                      next(it))
    o_refs = [next(it) for _ in range(nw_o)]
    wob_ref = next(it)
    e_ref, et_ref = next(it), next(it)
    xo_ref, k8_ref, ksc_ref, v8_ref, vsc_ref = (next(it), next(it),
                                                next(it), next(it),
                                                next(it))
    x32_s, q_s, kc_s, vc_s, m_ref, l_ref, acc_ref, qe_s = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it))

    b = pl.program_id(0)
    t = pl.program_id(1)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)               # [1, D]
        x32_s[...] = x32
        h = _ln(x32, lnw_ref, lnb_ref)
        qkv = _mv(h, qkv_refs, wfmt=wfmt, sub=sub, cdt=cdt) \
            + bqkv_ref[0].astype(jnp.float32)            # [1, 3D] f32
        q = qkv[:, :d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]
        q_s[...] = q * scale
        if quantized:
            # see decode_blocks._self_kernel: raw-int8 score dot needs
            # qe[d, h] = q[d] * scale * e[d, h]
            q8 = jnp.broadcast_to(q * scale, (8, d))
            qe_s[...] = jnp.transpose(q8)[:, 0:1] * e
            k8, ks = _quantize_row(k)
            v8, vs = _quantize_row(v)
            k8_ref[...] = k8[None]
            v8_ref[...] = v8[None]
            ksc_ref[...] = jnp.broadcast_to(ks, ksc_ref.shape[1:])[None]
            vsc_ref[...] = jnp.broadcast_to(vs, vsc_ref.shape[1:])[None]
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

    @pl.when(t < nt_ref[0])
    def _tile():
        vs = None
        if quantized:
            s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                            preferred_element_type=jnp.float32)  # [bt, H]
            s = s * ks_ref[0, 0].astype(jnp.float32)
            vs = vs_ref[0, 0].astype(jnp.float32)
            v = vq_ref[0, 0]                             # raw int8 [bt, D]
        else:
            k = kq_ref[0, 0].astype(cdt)
            v = vq_ref[0, 0].astype(cdt)
            qk = k * q_s[...].astype(cdt)
            s = jax.lax.dot(qk, e.astype(cdt),
                            preferred_element_type=jnp.float32)
        pos = t * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        valid = pos < lengths_ref[b]                     # excludes current
        _attn_tile(s, valid, et, v, vs, m_ref, l_ref, acc_ref, quantized)

    @pl.when(t == pl.num_programs(1) - 1)
    def _tail():
        s_c = jax.lax.dot(kc_s[...] * q_s[...], e,
                          preferred_element_type=jnp.float32)  # [1, H]
        m_prev, l_prev = m_ref[...], l_ref[...]
        m_next = jnp.maximum(m_prev, s_c)
        alpha = jnp.exp(m_prev - m_next)
        p_c = jnp.exp(s_c - m_next)
        l_f = l_prev * alpha + p_c
        alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
        p_d = jax.lax.dot(p_c, et, preferred_element_type=jnp.float32)
        acc = acc_ref[...] * alpha_d + p_d * vc_s[...]
        l_d = jax.lax.dot(jnp.maximum(l_f, 1e-30), et,
                          preferred_element_type=jnp.float32)
        out32 = acc / l_d                                # [1, D] f32
        y = _mv(out32, o_refs, wfmt=wfmt, sub=sub, cdt=cdt) \
            + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)[None]


def self_block_kq(x: jnp.ndarray, blk: dict, kq: jnp.ndarray,
                  ks: Optional[jnp.ndarray], vq: jnp.ndarray,
                  vs: Optional[jnp.ndarray], pos: jnp.ndarray, layer,
                  n_heads: int, block_t: int = 128,
                  interpret: bool = False):
    """k-quant self-attention sub-block, B=1-per-grid-row decode.

    Same contract as decode_blocks.self_block, but ``blk`` carries
    stacked k-quant weight triples (``qkv``/``self_o``) plus biases
    (``bqkv``/``b_self_o`` [L, 1, N]) and ``wfmt``/``sub`` statics.
    """
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2) and T % block_t == 0
    quantized = ks is not None
    wfmt, sub = _weight_fmt(blk["qkv"])
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    grid = (B, T // block_t)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    row_dtype = kq.dtype

    n_tiles = T // block_t
    nt = jnp.clip((jnp.max(lengths) + block_t - 1) // block_t,
                  1, n_tiles).reshape((1,)).astype(jnp.int32)

    const3 = lambda b, t, lens, lyr, ntr: (lyr[0], 0, 0)
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

    qkv_specs, qkv_ops = _w_specs(blk["qkv"], const3)
    o_specs, o_ops = _w_specs(blk["self_o"], const3)
    kernel = functools.partial(
        _self_kernel_kq, d=D, bt=block_t, scale=scale, quantized=quantized,
        wfmt=wfmt, sub=sub, nw_qkv=len(qkv_ops), nw_o=len(o_ops))

    out_shapes = (
        jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        jax.ShapeDtypeStruct((B, 1, D), row_dtype),
        jax.ShapeDtypeStruct((B, 1, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, D), row_dtype),
        jax.ShapeDtypeStruct((B, 1, _LANES), jnp.float32),
    )
    bspec = lambda shp: pl.BlockSpec(
        shp, lambda b, t, lens, lyr, ntr: (b, 0, 0))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((1, 1, D),
                              lambda b, t, lens, lyr, ntr: (b, 0, 0)),
                 pl.BlockSpec((1, 1, D), const3),          # ln_w
                 pl.BlockSpec((1, 1, D), const3)]          # ln_b
                + qkv_specs
                + [pl.BlockSpec((1, 1, 3 * D), const3)]    # bqkv
                + [cache_spec, sspec, cache_spec, sspec]
                + o_specs
                + [pl.BlockSpec((1, 1, D), const3),        # wob
                   pl.BlockSpec((D, n_heads),
                                lambda b, t, lens, lyr, ntr: (0, 0)),
                   pl.BlockSpec((n_heads, D),
                                lambda b, t, lens, lyr, ntr: (0, 0))]),
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
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((D, n_heads), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths, layer, nt, x[:, None, :], blk["ln1_w"], blk["ln1_b"],
      *qkv_ops, blk["bqkv"], kq, ks_in, vq, vs_in, *o_ops,
      blk["b_self_o"], e_mat, et_mat)
    x_out, k8, ksc, v8, vsc = outs
    return (x_out[:, 0, :], k8[:, 0, :], ksc[:, 0, 0], v8[:, 0, :],
            vsc[:, 0, 0])


# ---------------------------------------------------------------------------
# cross_block_kq
# ---------------------------------------------------------------------------

def _cross_kernel_kq(lengths_ref, layer_ref, *refs, bt: int, scale: float,
                     quantized: bool, wfmt: str, sub: int, nw_q: int,
                     nw_o: int):
    it = iter(refs)
    x_ref = next(it)
    lnw_ref, lnb_ref = next(it), next(it)
    q_refs = [next(it) for _ in range(nw_q)]
    bq_ref = next(it)
    kq_ref, ks_ref, vq_ref, vs_ref = (next(it), next(it), next(it),
                                      next(it))
    o_refs = [next(it) for _ in range(nw_o)]
    wob_ref = next(it)
    e_ref, et_ref = next(it), next(it)
    xo_ref = next(it)
    x32_s, q_s, m_ref, l_ref, acc_ref, qe_s = (next(it), next(it),
                                               next(it), next(it),
                                               next(it), next(it))

    b = pl.program_id(0)
    t = pl.program_id(1)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype

    @pl.when(t == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)
        x32_s[...] = x32
        h = _ln(x32, lnw_ref, lnb_ref)
        q = _mv(h, q_refs, wfmt=wfmt, sub=sub, cdt=cdt) \
            + bq_ref[0].astype(jnp.float32)
        q_s[...] = q * scale
        if quantized:
            q8 = jnp.broadcast_to(q * scale, (8, q.shape[-1]))
            qe_s[...] = jnp.transpose(q8)[:, 0:1] * e
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    vs = None
    if quantized:
        s = jax.lax.dot(kq_ref[0, 0], qe_s[...],
                        preferred_element_type=jnp.float32)
        s = s * ks_ref[0, 0].astype(jnp.float32)
        vs = vs_ref[0, 0].astype(jnp.float32)
        v = vq_ref[0, 0]
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
        out32 = _finish_attention(et, m_ref, l_ref, acc_ref)  # [1, D] f32
        y = _mv(out32, o_refs, wfmt=wfmt, sub=sub, cdt=cdt) \
            + wob_ref[0].astype(jnp.float32)
        xo_ref[...] = (y + x32_s[...]).astype(xo_ref.dtype)[None]


def cross_block_kq(x: jnp.ndarray, blk: dict, kq: jnp.ndarray,
                   ks: Optional[jnp.ndarray], vq: jnp.ndarray,
                   vs: Optional[jnp.ndarray], enc_len: int, layer,
                   n_heads: int, block_t: int = 256,
                   interpret: bool = False) -> jnp.ndarray:
    """k-quant cross-attention sub-block (cache static per utterance)."""
    B, D = x.shape
    L, B2, T, D2 = kq.shape
    assert (B, D) == (B2, D2) and T % block_t == 0
    quantized = ks is not None
    wfmt, sub = _weight_fmt(blk["cross_q"])
    hd = D // n_heads
    scale = float(hd) ** -0.5
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.full((B,), enc_len, jnp.int32)
    grid = (B, T // block_t)

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)

    const3 = lambda b, t, lens, lyr: (lyr[0], 0, 0)
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

    q_specs, q_ops = _w_specs(blk["cross_q"], const3)
    o_specs, o_ops = _w_specs(blk["cross_o"], const3)
    kernel = functools.partial(
        _cross_kernel_kq, bt=block_t, scale=scale, quantized=quantized,
        wfmt=wfmt, sub=sub, nw_q=len(q_ops), nw_o=len(o_ops))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((1, 1, D), lambda b, t, lens, lyr: (b, 0, 0)),
                 pl.BlockSpec((1, 1, D), const3),
                 pl.BlockSpec((1, 1, D), const3)]
                + q_specs
                + [pl.BlockSpec((1, 1, D), const3)]        # bq
                + [cache_spec, sspec, cache_spec, sspec]
                + o_specs
                + [pl.BlockSpec((1, 1, D), const3),        # wob
                   pl.BlockSpec((D, n_heads),
                                lambda b, t, lens, lyr: (0, 0)),
                   pl.BlockSpec((n_heads, D),
                                lambda b, t, lens, lyr: (0, 0))]),
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, t, lens, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((D, n_heads), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths, layer, x[:, None, :], blk["ln2_w"], blk["ln2_b"],
      *q_ops, blk["b_cross_q"], kq, ks_in, vq, vs_in, *o_ops,
      blk["b_cross_o"], e_mat, et_mat)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# ffn_block_kq
# ---------------------------------------------------------------------------

def _ffn_kernel_kq(layer_ref, *refs, wfmt: str, sub: int, nw1: int,
                   nw2: int):
    it = iter(refs)
    x_ref = next(it)
    lnw_ref, lnb_ref = next(it), next(it)
    w1_refs = [next(it) for _ in range(nw1)]
    b1_ref = next(it)
    w2_refs = [next(it) for _ in range(nw2)]
    b2_ref = next(it)
    xo_ref = next(it)
    x32_s, h_s, acc_ref = next(it), next(it), next(it)

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _head():
        x32 = x_ref[0].astype(jnp.float32)
        x32_s[...] = x32
        h_s[...] = _ln(x32, lnw_ref, lnb_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    cdt = x_ref.dtype
    h = h_s[...]
    t1 = _mv(h, w1_refs, wfmt=wfmt, sub=sub, cdt=cdt) \
        + b1_ref[0].astype(jnp.float32)                  # [1, block_h]
    g = _gelu_exact(t1)                                  # f32
    acc_ref[...] += _mv(g, w2_refs, wfmt=wfmt, sub=sub, cdt=cdt)

    @pl.when(j == pl.num_programs(1) - 1)
    def _tail():
        y = acc_ref[...] + b2_ref[0].astype(jnp.float32) + x32_s[...]
        xo_ref[...] = y.astype(xo_ref.dtype)[None]


def ffn_block_kq(x: jnp.ndarray, blk: dict, layer, block_h: int = 512,
                 interpret: bool = False) -> jnp.ndarray:
    """k-quant FFN sub-block: x + fc2(gelu(fc1(LN3(x)))).

    fc1 is tiled over its OUTPUT axis and fc2 over its INPUT axis by the
    same ``block_h`` grid (the int8 ffn_block pattern); k-quant group
    boundaries align because block_h is a multiple of 32.
    """
    B, D = x.shape
    wfmt, sub = _weight_fmt(blk["fc1"])
    w1q = blk["fc1"][0]
    L = w1q.shape[0]
    H = w1q.shape[2]
    assert H % block_h == 0 and block_h % 32 == 0
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    grid = (B, H // block_h)

    const3 = lambda b, j, lyr: (lyr[0], 0, 0)
    col3 = lambda b, j, lyr: (lyr[0], 0, j)              # fc1: tile N
    row3 = lambda b, j, lyr: (lyr[0], j, 0)              # fc2: tile K

    def tiled_specs(tri, idx, axis):
        """Specs for one weight triple tiled by ``block_h`` along
        ``axis`` (0 = the K/input rows, 1 = the N/output columns).
        K-axis tiles shrink by the storage density: q4k packs two
        K-values per row, and group scales keep one row per ``sub``."""
        wq, s, z = tri
        wshp = list(wq.shape[1:])
        sshp = list(s.shape[1:])
        if axis == 0:
            wshp[0] = block_h // (2 if wfmt == "q4k" else 1)
            sshp[0] = block_h // sub
        else:
            wshp[1] = block_h
            sshp[1] = block_h
        specs = [pl.BlockSpec((1,) + tuple(wshp), idx),
                 pl.BlockSpec((1,) + tuple(sshp), idx)]
        ops = [wq, s]
        if z is not None:
            specs.append(pl.BlockSpec((1,) + tuple(sshp), idx))
            ops.append(z)
        return specs, ops

    w1_specs, w1_ops = tiled_specs(blk["fc1"], col3, 1)
    w2_specs, w2_ops = tiled_specs(blk["fc2"], row3, 0)
    kernel = functools.partial(_ffn_kernel_kq, wfmt=wfmt, sub=sub,
                               nw1=len(w1_ops), nw2=len(w2_ops))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((1, 1, D), lambda b, j, lyr: (b, 0, 0)),
                 pl.BlockSpec((1, 1, D), const3),
                 pl.BlockSpec((1, 1, D), const3)]
                + w1_specs
                + [pl.BlockSpec((1, 1, block_h), col3)]   # b1
                + w2_specs
                + [pl.BlockSpec((1, 1, D), const3)]),     # b2
            out_specs=pl.BlockSpec((1, 1, D),
                                   lambda b, j, lyr: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),   # x32
                pltpu.VMEM((1, D), jnp.float32),   # h (post-LN, f32)
                pltpu.VMEM((1, D), jnp.float32),   # acc
            ],
        ),
        interpret=interpret,
    )(layer, x[:, None, :], blk["ln3_w"], blk["ln3_b"], *w1_ops,
      blk["b_fc1"], *w2_ops, blk["b_fc2"])
    return out[:, 0, :]
