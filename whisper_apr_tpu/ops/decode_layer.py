"""Whole-layer decode megakernel: ONE Pallas call per decoder layer.

Round-2 left the single-stream decode at 1.849 ms/step on large-v3 vs a
1.322 ms HBM floor (BENCH_NOTES round-2c); the remaining gap is the
kernel-seam DMA non-overlap between the three per-block kernels
(ops/decode_blocks.py), the four XLA KV-row writes per layer, and
full-cache self-attention reads. This kernel absorbs the ENTIRE layer:

    LN1 -> qkv -> (k/v rows out) -> self attention -> o-proj -> residual
    LN2 -> q -> cross attention -> o-proj -> residual
    LN3 -> fc1 -> exact GELU -> fc2 -> epilogue -> residual

as ONE pallas_call over a phase-structured 1-D grid. Design points:

- **Phases on one grid**: the grid is the concatenation of per-phase tile
  loops (qkv K-tiles, self-cache T-tiles, o-proj K-tiles, cross-q K-tiles,
  cross-cache T-tiles, cross-o K-tiles, fc1 K-tiles, fc2 H-tiles). Each
  operand's index map advances only inside its own phase and repeats its
  last block index elsewhere, so it is DMA'd exactly once per layer and
  the pipeline overlaps one phase's tail DMA with the next phase's head.
- **K-axis streaming + accumulators**: every projection streams its
  weight over the CONTRACTION axis and accumulates into an f32 VMEM
  scratch. The activation slice for tile j is a 128-aligned
  ``jax.lax.dynamic_slice`` from scratch — no dynamic lane *stores*.
- **Dynamic tile bounding**: self-attention reads only the
  ``ceil(pos / bt)`` cache tiles that contain history (index map clamps
  via a prefetched scalar), so early decode steps skip most of the
  reserved [T_max] cache instead of reading masked zeros — the dense
  answer to the paged cache's bandwidth win (decoder.rs:835).
- **In-kernel KV-row writes** (optional): the k/v rows computed in the
  qkv phase are written straight into the cache stacks through
  ``input_output_aliases`` — the XLA step body loses its four per-layer
  ``dynamic_update_slice`` calls.
- Heads stay vectorized via the block-diagonal head-expansion matrix
  (ops/decode_attention.py); the online-softmax bookkeeping matches
  ops/decode_blocks.py exactly.

Reference semantics: one decoder layer of forward_block_cached
(src/model/decoder.rs:2241-2330) — LN/projections/attention/FFN per
token with cached K/V; quantized matvec semantics quantized.rs:2501.
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
from .qmatvec import _gelu_exact

_LANES = 128
_NEG = float(-0.7 * np.finfo(np.float32).max)
_LN_EPS = 1e-5


def _ln1(x32, w, b):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS) \
        * w.astype(jnp.float32) + b.astype(jnp.float32)


def _pick_tile(n: int, cap: int) -> int:
    """Largest multiple of 128 that divides n, capped at ``cap``."""
    best = _LANES
    for t in range(_LANES, min(n, cap) + 1, _LANES):
        if n % t == 0:
            best = t
    return best


class _Phases:
    """Static phase boundaries on the 1-D grid."""

    def __init__(self, d: int, h_ffn: int, t_self: int, t_cross: int,
                 bk: int, bh: int, bt_s: int, bt_c: int):
        self.bk, self.bh, self.bt_s, self.bt_c = bk, bh, bt_s, bt_c
        n_q = d // bk          # qkv projection K-tiles
        n_sa = t_self // bt_s  # self-attention cache tiles
        n_so = d // bk         # self o-proj K-tiles
        n_cq = d // bk         # cross q K-tiles
        n_ca = t_cross // bt_c
        n_co = d // bk
        n_f1 = d // bk         # fc1 K-tiles
        n_f2 = h_ffn // bh     # fc2 K-tiles (over H)
        self.p0 = 0
        self.p1 = self.p0 + n_q
        self.p2 = self.p1 + n_sa
        self.p3 = self.p2 + n_so
        self.p4 = self.p3 + n_cq
        self.p5 = self.p4 + n_ca
        self.p6 = self.p5 + n_co
        self.p7 = self.p6 + n_f1
        self.n = self.p7 + n_f2
        self.n_sa, self.n_ca = n_sa, n_ca


def _tile_rows(dst_ref, vec, width: int):
    """Mirror a [1, X] value into an [X/width, width] scratch with STATIC
    slices (one per tile, at a phase-head step).

    Mosaic cannot lower ``dynamic_slice`` on the LANE axis of a value, so
    per-tile activation reads go through this row-tiled mirror instead:
    writing uses static lane slices, and the per-step read is a dynamic
    SUBLANE index (``ref[pl.ds(j, 1)]``), which lowers fine.
    """
    n = vec.shape[1] // width
    for t in range(n):
        dst_ref[t: t + 1, :] = vec[:, t * width: (t + 1) * width]


def _row(tref, j):
    """[1, width] row j (traced) of a row-tiled scratch."""
    return tref[pl.ds(j, 1), :]


def _layer_kernel(lengths_ref, layer_ref, nt_ref, x_ref,
                  ln_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                  skq_ref, sks_ref, svq_ref, svs_ref,
                  ckq_ref, cks_ref, cvq_ref, cvs_ref,
                  wo3_ref, so3_ref, bo3_ref,
                  w1_ref, s1_ref, b1_ref, w2_ref, f2s_ref, f2b_ref,
                  e_ref, et_ref, kgrp_ref, vgrp_ref,
                  # outputs
                  xo_ref, k8_ref, ksc_ref, v8_ref, vsc_ref,
                  # scratch
                  x32_s, h_s, ht_s, gt_s, qkv_s, g_s, y_s, q_s, kc_s, vc_s,
                  m_ref, l_ref, acc_ref,
                  *, d: int, ph: _Phases, scale: float, quantized: bool,
                  alias_kv: bool):
    i = pl.program_id(0)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype
    bk, bh, bt_s, bt_c = ph.bk, ph.bh, ph.bt_s, ph.bt_c

    # ---- P0: LN1 + stream qkv over K-tiles -------------------------------
    @pl.when(i == ph.p0)
    def _p0_head():
        x32 = x_ref[0].astype(jnp.float32)
        x32_s[...] = x32
        h = _ln1(x32, ln_ref[0, 0:1, :], ln_ref[0, 1:2, :])
        h_s[...] = h
        _tile_rows(ht_s, h, bk)
        qkv_s[...] = jnp.zeros_like(qkv_s)

    @pl.when(i < ph.p1)
    def _p0_body():
        hk = _row(ht_s, i - ph.p0).astype(cdt)
        w = wqkv_ref[0].astype(cdt)                      # [bk, 3D]
        qkv_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P1: finalize qkv, emit k/v rows, self attention ----------------
    @pl.when(i == ph.p1)
    def _p1_head():
        qkv = qkv_s[...] * sqkv_ref[0].astype(jnp.float32) \
            + bqkv_ref[0].astype(jnp.float32)            # [1, 3D] f32
        q = qkv[:, :d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]
        q_s[...] = q * scale
        if quantized:
            amax_k = jnp.max(jnp.abs(k), axis=-1, keepdims=True)
            ks = jnp.maximum(amax_k, 1e-12) / 127.0
            k8 = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)
            amax_v = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
            vsc = jnp.maximum(amax_v, 1e-12) / 127.0
            v8 = jnp.clip(jnp.round(v / vsc), -127, 127).astype(jnp.int8)
            k_row, v_row = k8, v8
            ksc_ref[...] = jnp.broadcast_to(ks, ksc_ref.shape)
            vsc_ref[...] = jnp.broadcast_to(vsc, vsc_ref.shape)
            kc_s[...] = k8.astype(jnp.float32) * ks
            vc_s[...] = v8.astype(jnp.float32) * vsc
        else:
            k_row = k.astype(cdt)
            v_row = v.astype(cdt)
            ksc_ref[...] = jnp.ones(ksc_ref.shape, jnp.float32)
            vsc_ref[...] = jnp.ones(vsc_ref.shape, jnp.float32)
            kc_s[...] = k_row.astype(jnp.float32)
            vc_s[...] = v_row.astype(jnp.float32)
        if alias_kv:
            # Mosaic forbids single-row output blocks (sublane dim must be
            # a multiple of 8): the output is the 8-row GROUP holding
            # ``pos``. A dynamic-sublane store into the group fails to
            # lower at D=1280 ("index in dimension 2 is a multiple of 8"),
            # so build the whole group with an iota-mask select instead —
            # one static [1,1,8,D] store.
            sub = lengths_ref[0] % 8
            rowid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
            k8_ref[...] = jnp.where(rowid == sub,
                                    k_row[None, None].astype(k8_ref.dtype),
                                    kgrp_ref[...])
            v8_ref[...] = jnp.where(rowid == sub,
                                    v_row[None, None].astype(v8_ref.dtype),
                                    vgrp_ref[...])
        else:
            k8_ref[...] = k_row[None]
            v8_ref[...] = v_row[None]
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    def _attn_tile(k_t, ks_t, v_t, vs_t, t_idx, bt, len_bound):
        """One online-softmax tile (matches decode_blocks._attn_tile)."""
        k = k_t.astype(cdt)
        v = v_t.astype(cdt)
        qk = k * q_s[...].astype(cdt)
        s = jax.lax.dot(qk, e.astype(cdt),
                        preferred_element_type=jnp.float32)  # [bt, H]
        vs = None
        if quantized:
            s = s * ks_t.astype(jnp.float32)
            vs = vs_t.astype(jnp.float32)
        pos = t_idx * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        valid = pos < len_bound
        s = jnp.where(valid, s, _NEG)
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=0, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
        m_ref[...] = m_next
        if quantized:
            p = p * vs
        p_d = jax.lax.dot(p.astype(cdt), et.astype(cdt),
                          preferred_element_type=jnp.float32).astype(cdt)
        ones = jnp.ones((1, p.shape[0]), cdt)
        contrib = jax.lax.dot(ones, p_d * v,
                              preferred_element_type=jnp.float32)
        alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha_d + contrib

    # self-attention tiles, dynamically bounded to tiles holding history
    @pl.when((i >= ph.p1) & (i < ph.p2) & (i - ph.p1 < nt_ref[0]))
    def _p1_body():
        _attn_tile(skq_ref[0, 0], sks_ref[0, 0], svq_ref[0, 0],
                   svs_ref[0, 0], i - ph.p1, bt_s, lengths_ref[0])

    @pl.when(i == ph.p2 - 1)
    def _p1_tail():
        # current token's k/v (kept in VMEM — not read back from cache)
        s_c = jax.lax.dot(kc_s[...] * q_s[...], e,
                          preferred_element_type=jnp.float32)  # [1, H]
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
        attn = acc / l_d                                 # attn out -> h
        h_s[...] = attn
        _tile_rows(ht_s, attn, bk)
        y_s[...] = jnp.zeros_like(y_s)

    # ---- P2: self o-proj (stream over K) --------------------------------
    @pl.when((i >= ph.p2) & (i < ph.p3))
    def _p2_body():
        ak = _row(ht_s, i - ph.p2).astype(cdt)
        w = wo3_ref[0].astype(cdt)                       # [bk, D]
        y_s[...] += jax.lax.dot(ak, w, preferred_element_type=jnp.float32)

    # o-proj epilogue + residual + LN2 must run while the o3 operand still
    # holds the self_wo row (it advances to the cross_q row at i == p3)
    @pl.when(i == ph.p3 - 1)
    def _p2_tail():
        y = y_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        x32 = x32_s[...] + y
        x32_s[...] = x32
        h = _ln1(x32, ln_ref[0, 2:3, :], ln_ref[0, 3:4, :])
        h_s[...] = h
        _tile_rows(ht_s, h, bk)
        q_s[...] = jnp.zeros_like(q_s)

    # ---- P3: cross-q (stream over K) ------------------------------------
    @pl.when((i >= ph.p3) & (i < ph.p4))
    def _p3_body():
        hk = _row(ht_s, i - ph.p3).astype(cdt)
        w = wo3_ref[0].astype(cdt)                       # wcq tile [bk, D]
        q_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P4: cross attention --------------------------------------------
    @pl.when(i == ph.p4)
    def _p4_head():
        q = q_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        q_s[...] = q * scale
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when((i >= ph.p4) & (i < ph.p5))
    def _p4_body():
        _attn_tile(ckq_ref[0, 0], cks_ref[0, 0], cvq_ref[0, 0],
                   cvs_ref[0, 0], i - ph.p4, bt_c, lengths_ref[1])

    @pl.when(i == ph.p5 - 1)
    def _p4_tail():
        l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), et,
                          preferred_element_type=jnp.float32)
        attn = acc_ref[...] / l_d
        h_s[...] = attn
        _tile_rows(ht_s, attn, bk)
        y_s[...] = jnp.zeros_like(y_s)

    # ---- P5: cross o-proj ------------------------------------------------
    @pl.when((i >= ph.p5) & (i < ph.p6))
    def _p5_body():
        ak = _row(ht_s, i - ph.p5).astype(cdt)
        w = wo3_ref[0].astype(cdt)                       # cross_wo tile
        y_s[...] += jax.lax.dot(ak, w, preferred_element_type=jnp.float32)

    # ---- P6: residual + LN3 + fc1 (stream over K; full [1, H] out) ------
    @pl.when(i == ph.p6)
    def _p6_head():
        y = y_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        x32 = x32_s[...] + y
        x32_s[...] = x32
        h = _ln1(x32, ln_ref[0, 4:5, :], ln_ref[0, 5:6, :])
        h_s[...] = h
        _tile_rows(ht_s, h, bk)
        g_s[...] = jnp.zeros_like(g_s)

    @pl.when((i >= ph.p6) & (i < ph.p7))
    def _p6_body():
        hk = _row(ht_s, i - ph.p6).astype(cdt)
        w = w1_ref[0].astype(cdt)                        # [bk, H]
        g_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P7: GELU + fc2 (stream over H) ---------------------------------
    @pl.when(i == ph.p7)
    def _p7_head():
        t1 = g_s[...] * s1_ref[0].astype(jnp.float32) \
            + b1_ref[0].astype(jnp.float32)
        g = _gelu_exact(t1)
        g_s[...] = g
        _tile_rows(gt_s, g, bh)
        y_s[...] = jnp.zeros_like(y_s)

    @pl.when(i >= ph.p7)
    def _p7_body():
        gk = _row(gt_s, i - ph.p7).astype(cdt)
        w = w2_ref[0].astype(cdt)                        # [bh, D]
        y_s[...] += jax.lax.dot(gk, w, preferred_element_type=jnp.float32)

    @pl.when(i == ph.n - 1)
    def _final():
        y = y_s[...] * f2s_ref[0].astype(jnp.float32) \
            + f2b_ref[0].astype(jnp.float32)
        xo_ref[...] = (x32_s[...] + y).astype(xo_ref.dtype)[None]


def layer_block(x: jnp.ndarray, blk: dict,
                skq: jnp.ndarray, sks: Optional[jnp.ndarray],
                svq: jnp.ndarray, svs: Optional[jnp.ndarray],
                ckq: jnp.ndarray, cks: Optional[jnp.ndarray],
                cvq: jnp.ndarray, cvs: Optional[jnp.ndarray],
                pos: jnp.ndarray, enc_len: int, layer, n_heads: int,
                bk: Optional[int] = None, bh: Optional[int] = None,
                bt_s: int = 128, bt_c: int = 256,
                alias_kv: bool = False, interpret: bool = False):
    """One whole decoder layer for B=1 single-stream decode.

    x [1, D]; blk from qdecode.prepare_qdecode()["blk"] plus the
    layer-kernel extras (see qdecode._add_layer_kernel_operands):
    ln6 [L, 6, D] (ln1 w/b, ln2 w/b, ln3 w/b), wo3 [3L, D, D] int8 with
    so3/bo3 [3L, 1, D] (self_wo, cross_q, cross_wo per layer).

    Returns ``(x_out, k_row, k_scale, v_row, v_scale)`` when
    ``alias_kv=False`` (caller writes the rows, same contract as
    decode_blocks.self_block), else ``(x_out, skq2, svq2, k_scale,
    v_scale)`` where skq2/svq2 are the cache stacks with the current
    token's row written in-kernel through input_output_aliases (scale
    stacks still written by the caller in int8 mode).
    """
    B, D = x.shape
    assert B == 1, "layer_block is the single-stream kernel"
    L, _, T_s, _ = skq.shape
    T_c = ckq.shape[2]
    H_ffn = blk["w1"].shape[2]
    quantized = sks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    if bk is None:
        bk = _pick_tile(D, 384)
    if bh is None:
        bh = _pick_tile(H_ffn, 512)
    ph = _Phases(D, H_ffn, T_s, T_c, bk, bh, bt_s, bt_c)

    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    pos = jnp.asarray(pos, jnp.int32).reshape(())
    # lengths[0] = self history rows; lengths[1] = valid encoder rows
    lengths = jnp.stack([pos, jnp.int32(enc_len)])
    # dynamic bound: tiles holding history (>=1 so clamp indices stay sane)
    nt = jnp.maximum((pos + bt_s - 1) // bt_s, 0).reshape((1,))

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    row_dtype = jnp.int8 if quantized else x.dtype

    kernel = functools.partial(_layer_kernel, d=D, ph=ph, scale=scale,
                               quantized=quantized, alias_kv=alias_kv)

    p0, p1, p2, p3, p4, p5, p6, p7 = (ph.p0, ph.p1, ph.p2, ph.p3, ph.p4,
                                      ph.p5, ph.p6, ph.p7)
    n_q = p1 - p0
    n_sa = p2 - p1
    n_ca = p5 - p4

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    # per-phase tile index helpers (repeat last block outside the phase)
    def j_q(i):
        return clamp(i - p0, 0, n_q - 1)

    def j_sa(i, nt_r):
        return clamp(clamp(i - p1, 0, n_sa - 1), 0,
                     jnp.maximum(nt_r[0] - 1, 0))

    def j_ca(i):
        return clamp(i - p4, 0, n_ca - 1)

    def j_o3(i, lyr):
        """Row of the [3L, D, D] o-proj stack + its K tile.

        Rows: 3*l+0 self_wo (P2), 3*l+1 cross_q (P3), 3*l+2 cross_wo (P5).
        """
        row = 3 * lyr[0] + jnp.where(i < p3, 0, jnp.where(i < p5, 1, 2))
        tile = jnp.where(
            i < p3, clamp(i - p2, 0, D // bk - 1),
            jnp.where(i < p5, clamp(i - p3, 0, D // bk - 1),
                      clamp(i - p5, 0, D // bk - 1)))
        return row, tile

    def j_f1(i):
        return clamp(i - p6, 0, D // bk - 1)

    def j_f2(i):
        return clamp(i - p7, 0, H_ffn // bh - 1)

    def im(f):
        """index map over (i, lengths, layer, nt)."""
        return lambda i, lens, lyr, nt_r: f(i, lens, lyr, nt_r)

    const_l = im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0))
    cache_s = pl.BlockSpec(
        (1, 1, bt_s, D),
        im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_sa(i, nt_r), 0)))
    cache_c = pl.BlockSpec(
        (1, 1, bt_c, D),
        im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_ca(i), 0)))
    if quantized:
        sks_in, svs_in, cks_in, cvs_in = sks, svs, cks, cvs
        ss_s = pl.BlockSpec(
            (1, 1, bt_s, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_sa(i, nt_r), 0)))
        ss_c = pl.BlockSpec(
            (1, 1, bt_c, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_ca(i), 0)))
    else:
        sks_in = svs_in = jnp.zeros((L, 1, bt_s, 1), jnp.float32)
        cks_in = cvs_in = jnp.zeros((L, 1, bt_c, 1), jnp.float32)
        ss_s = pl.BlockSpec(
            (1, 1, bt_s, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0, 0)))
        ss_c = pl.BlockSpec(
            (1, 1, bt_c, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0, 0)))

    def o3_spec(shape_tail):
        def _map(i, lens, lyr, nt_r):
            row, tile = j_o3(i, lyr)
            if shape_tail[0] == bk:          # weight tile [bk, D]
                return (row, tile, 0)
            return (row, 0, 0)               # scale/bias row [1, D]
        return pl.BlockSpec((1,) + shape_tail, _map)

    in_specs = [
        pl.BlockSpec((1, 1, D),
                     im(lambda i, lens, lyr, nt_r: (0, 0, 0))),   # x
        pl.BlockSpec((1, 6, D), const_l),                          # ln6
        pl.BlockSpec((1, bk, 3 * D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], j_q(i), 0))),                     # wqkv
        pl.BlockSpec((1, 1, 3 * D), const_l),                      # sqkv
        pl.BlockSpec((1, 1, 3 * D), const_l),                      # bqkv
        cache_s, ss_s, cache_s, ss_s,                              # self kv
        cache_c, ss_c, cache_c, ss_c,                              # cross kv
        o3_spec((bk, D)),                                          # wo3
        o3_spec((1, D)),                                           # so3
        o3_spec((1, D)),                                           # bo3
        pl.BlockSpec((1, bk, H_ffn),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], j_f1(i), 0))),                    # w1
        pl.BlockSpec((1, 1, H_ffn), const_l),                      # s1
        pl.BlockSpec((1, 1, H_ffn), const_l),                      # b1
        pl.BlockSpec((1, bh, D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], j_f2(i), 0))),                    # w2
        pl.BlockSpec((1, 1, D), const_l),                          # fc2_s
        pl.BlockSpec((1, 1, D), const_l),                          # fc2_b
        pl.BlockSpec((D, n_heads),
                     im(lambda i, lens, lyr, nt_r: (0, 0))),       # e
        pl.BlockSpec((n_heads, D),
                     im(lambda i, lens, lyr, nt_r: (0, 0))),       # et
        # 8-row cache group holding `pos` (alias mode reads it to preserve
        # the 7 sibling rows when writing the whole output block)
        pl.BlockSpec((1, 1, 8, D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], 0, lens[0] // 8, 0))),            # kgrp
        pl.BlockSpec((1, 1, 8, D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], 0, lens[0] // 8, 0))),            # vgrp
    ]

    out_row = pl.BlockSpec((1, 1, D),
                           im(lambda i, lens, lyr, nt_r: (0, 0, 0)))
    if alias_kv:
        # k/v rows land in the cache stacks via the 8-row group block
        # (Mosaic requires sublane-dim blocks in multiples of 8)
        kv_out = pl.BlockSpec(
            (1, 1, 8, D),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, lens[0] // 8, 0)))
        out_shapes = (
            jax.ShapeDtypeStruct((1, 1, D), x.dtype),              # x_out
            jax.ShapeDtypeStruct(skq.shape, skq.dtype),            # skq'
            jax.ShapeDtypeStruct((1, 1, _LANES), jnp.float32),     # k scale
            jax.ShapeDtypeStruct(svq.shape, svq.dtype),            # svq'
            jax.ShapeDtypeStruct((1, 1, _LANES), jnp.float32),     # v scale
        )
        sc_out = pl.BlockSpec((1, 1, _LANES),
                              im(lambda i, lens, lyr, nt_r: (0, 0, 0)))
        out_specs = (out_row, kv_out, sc_out, kv_out, sc_out)
        # flat input numbering INCLUDES the 3 scalar-prefetch operands:
        # 0..2 scalars, 3 x, 4 ln6, 5 wqkv, 6 sqkv, 7 bqkv, 8 skq, 9 sks,
        # 10 svq, ... ; outputs: 0 x_out, 1 skq', 2 ksc, 3 svq', 4 vsc
        io_aliases = {8: 1, 10: 3}
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((1, 1, D), x.dtype),
            jax.ShapeDtypeStruct((1, 1, D), row_dtype),
            jax.ShapeDtypeStruct((1, 1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, D), row_dtype),
            jax.ShapeDtypeStruct((1, 1, _LANES), jnp.float32),
        )
        out_specs = (
            out_row,
            out_row,
            pl.BlockSpec((1, 1, _LANES),
                         im(lambda i, lens, lyr, nt_r: (0, 0, 0))),
            out_row,
            pl.BlockSpec((1, 1, _LANES),
                         im(lambda i, lens, lyr, nt_r: (0, 0, 0))),
        )
        io_aliases = {}

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ph.n,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),       # x32 residual
                pltpu.VMEM((1, D), jnp.float32),       # h (post-LN / attn)
                pltpu.VMEM((D // bk, bk), jnp.float32),      # h row-tiled
                pltpu.VMEM((H_ffn // bh, bh), jnp.float32),  # g row-tiled
                pltpu.VMEM((1, 3 * D), jnp.float32),   # qkv acc
                pltpu.VMEM((1, H_ffn), jnp.float32),   # g (fc1 out)
                pltpu.VMEM((1, D), jnp.float32),       # y acc
                pltpu.VMEM((1, D), jnp.float32),       # q (scaled)
                pltpu.VMEM((1, D), jnp.float32),       # k current
                pltpu.VMEM((1, D), jnp.float32),       # v current
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
            ],
        ),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(lengths, layer, nt, x[:, None, :], blk["ln6"],
      blk["wqkv"], blk["sqkv"], blk["bqkv"],
      skq, sks_in, svq, svs_in, ckq, cks_in, cvq, cvs_in,
      blk["wo3"], blk["so3"], blk["bo3"],
      blk["w1"], blk["s1"], blk["b1"], blk["w2"],
      blk["fc2_s"], blk["fc2_b"], e_mat, et_mat, skq, svq)

    if alias_kv:
        x_out, skq2, ksc, svq2, vsc = outs
        return x_out[:, 0, :], skq2, ksc[:, 0, 0], svq2, vsc[:, 0, 0]
    x_out, k8, ksc, v8, vsc = outs
    return (x_out[:, 0, :], k8[:, 0, :], ksc[:, 0, 0], v8[:, 0, :],
            vsc[:, 0, 0])


# ---------------------------------------------------------------------------
# Batched (B > 1) whole-layer kernel — serving slots
# ---------------------------------------------------------------------------
#
# Same phase grid as ``layer_block`` but every tile carries ALL B
# sequences: projections run as [B, D] @ tile MXU dots and the
# per-sequence online-softmax bookkeeping stays 2-D via the block-diagonal
# selector matrix of ops/decode_blocks.py (`_sel_matrix`). Self-attention
# reads are dynamically bounded by the LARGEST slot position in the batch
# (one prefetched scalar), so a freshly-admitted mix of short and long
# sequences only pays for the longest one — dense-layout paged bandwidth.
# KV rows come back as [B, D] outputs for the caller's per-slot scatter
# (continuous batching needs per-slot positions, which a single aliased
# block write cannot express).

def _ln_rows(x32, w, b):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS) \
        * w.astype(jnp.float32) + b.astype(jnp.float32)


def _sel_matrix(n_rows: int, b: int, bt: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, b), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_rows, b), 1)
    return (i // bt == j).astype(jnp.float32)


def _layer_kernel_b(lengths_ref, layer_ref, nt_ref, x_ref,
                    ln_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                    skq_ref, sks_ref, svq_ref, svs_ref,
                    ckq_ref, cks_ref, cvq_ref, cvs_ref,
                    wo3_ref, so3_ref, bo3_ref,
                    w1_ref, s1_ref, b1_ref, w2_ref, f2s_ref, f2b_ref,
                    e_ref, et_ref, len_ref,
                    xo_ref, k8_ref, ksc_ref, v8_ref, vsc_ref,
                    x32_s, h_s, ht_s, gt_s, qkv_s, g_s, y_s, q_s, kc_s,
                    vc_s, m_ref, l_ref, acc_ref,
                    *, d: int, b_sz: int, ph: _Phases, scale: float,
                    quantized: bool, enc_len: int):
    i = pl.program_id(0)
    e = e_ref[...]
    et = et_ref[...]
    cdt = x_ref.dtype
    B = b_sz
    bk, bh, bt_s, bt_c = ph.bk, ph.bh, ph.bt_s, ph.bt_c

    def tile3(dst_ref, mat, width):
        # [B, X] value -> [X/width, B, width] scratch via static slices
        for t in range(mat.shape[1] // width):
            dst_ref[t: t + 1] = mat[None, :, t * width: (t + 1) * width]

    def row3(tref, j):
        return tref[pl.ds(j, 1)][0]                    # [B, width]

    # ---- P0 ----
    @pl.when(i == ph.p0)
    def _p0_head():
        x32 = x_ref[...].astype(jnp.float32)             # [B, D]
        x32_s[...] = x32
        h = _ln_rows(x32, ln_ref[0, 0:1, :], ln_ref[0, 1:2, :])
        h_s[...] = h
        tile3(ht_s, h, bk)
        qkv_s[...] = jnp.zeros_like(qkv_s)

    @pl.when(i < ph.p1)
    def _p0_body():
        hk = row3(ht_s, i - ph.p0).astype(cdt)
        w = wqkv_ref[0].astype(cdt)
        qkv_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P1: qkv finalize + batched self attention ----
    @pl.when(i == ph.p1)
    def _p1_head():
        qkv = qkv_s[...] * sqkv_ref[0].astype(jnp.float32) \
            + bqkv_ref[0].astype(jnp.float32)            # [B, 3D]
        q = qkv[:, :d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]
        q_s[...] = q * scale
        if quantized:
            ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-1, keepdims=True),
                             1e-12) / 127.0
            k8 = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)
            vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True),
                             1e-12) / 127.0
            v8 = jnp.clip(jnp.round(v / vs), -127, 127).astype(jnp.int8)
            k8_ref[...] = k8
            v8_ref[...] = v8
            ksc_ref[...] = jnp.broadcast_to(ks, ksc_ref.shape)
            vsc_ref[...] = jnp.broadcast_to(vs, vsc_ref.shape)
            kc_s[...] = k8.astype(jnp.float32) * ks
            vc_s[...] = v8.astype(jnp.float32) * vs
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

    def _attn_tile_b(kq4, ks4, vq4, vs4, t_idx, bt, len_vec):
        """One batched online-softmax tile over [1, B, bt, D] blocks.

        len_vec [B]: per-sequence valid-length bound for this cache."""
        n_rows = B * bt
        sel = _sel_matrix(n_rows, B, bt)
        selT = jnp.transpose(sel)
        k_flat = kq4[0].reshape(n_rows, d).astype(cdt)
        v_flat = vq4[0].reshape(n_rows, d).astype(cdt)
        q_exp = jax.lax.dot(sel.astype(cdt), q_s[...].astype(cdt),
                            preferred_element_type=jnp.float32).astype(cdt)
        s = jax.lax.dot(k_flat * q_exp, e.astype(cdt),
                        preferred_element_type=jnp.float32)  # [B*bt, H]
        vs = None
        if quantized:
            s = s * ks4[0].reshape(n_rows, 1).astype(jnp.float32)
            vs = vs4[0].reshape(n_rows, 1).astype(jnp.float32)
        pos_in = t_idx * bt + jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0) % bt
        len_exp = jax.lax.dot(sel, len_vec.astype(jnp.float32),
                              preferred_element_type=jnp.float32)  # [n,1]
        s = jnp.where(pos_in.astype(jnp.float32) < len_exp, s, _NEG)
        m_prev = m_ref[...]                              # [B, H]
        m_cur = jnp.concatenate(
            [jnp.max(s[b * bt: (b + 1) * bt, :], axis=0, keepdims=True)
             for b in range(B)], axis=0)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        m_exp = jax.lax.dot(sel, m_next, preferred_element_type=jnp.float32)
        p = jnp.exp(s - m_exp)
        l_ref[...] = l_ref[...] * alpha + jax.lax.dot(
            selT, p, preferred_element_type=jnp.float32)
        m_ref[...] = m_next
        if quantized:
            p = p * vs
        p_d = jax.lax.dot(p.astype(cdt), et.astype(cdt),
                          preferred_element_type=jnp.float32).astype(cdt)
        contrib = jax.lax.dot(selT.astype(cdt), p_d * v_flat,
                              preferred_element_type=jnp.float32)
        alpha_d = jax.lax.dot(alpha, et, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha_d + contrib

    @pl.when((i >= ph.p1) & (i < ph.p2) & (i - ph.p1 < nt_ref[0]))
    def _p1_body():
        _attn_tile_b(skq_ref, sks_ref, svq_ref, svs_ref, i - ph.p1, bt_s,
                     len_ref[...].astype(jnp.float32))

    @pl.when(i == ph.p2 - 1)
    def _p1_tail():
        s_c = jax.lax.dot(kc_s[...] * q_s[...], e,
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
        attn = acc / l_d
        h_s[...] = attn
        tile3(ht_s, attn, bk)
        y_s[...] = jnp.zeros_like(y_s)

    # ---- P2: self o-proj ----
    @pl.when((i >= ph.p2) & (i < ph.p3))
    def _p2_body():
        ak = row3(ht_s, i - ph.p2).astype(cdt)
        w = wo3_ref[0].astype(cdt)
        y_s[...] += jax.lax.dot(ak, w, preferred_element_type=jnp.float32)

    @pl.when(i == ph.p3 - 1)
    def _p2_tail():
        y = y_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        x32 = x32_s[...] + y
        x32_s[...] = x32
        h = _ln_rows(x32, ln_ref[0, 2:3, :], ln_ref[0, 3:4, :])
        h_s[...] = h
        tile3(ht_s, h, bk)
        q_s[...] = jnp.zeros_like(q_s)

    # ---- P3: cross-q ----
    @pl.when((i >= ph.p3) & (i < ph.p4))
    def _p3_body():
        hk = row3(ht_s, i - ph.p3).astype(cdt)
        w = wo3_ref[0].astype(cdt)
        q_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P4: cross attention ----
    @pl.when(i == ph.p4)
    def _p4_head():
        q = q_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        q_s[...] = q * scale
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when((i >= ph.p4) & (i < ph.p5))
    def _p4_body():
        enc_lens = jnp.full((B, 1), enc_len, jnp.float32)
        _attn_tile_b(ckq_ref, cks_ref, cvq_ref, cvs_ref, i - ph.p4, bt_c,
                     enc_lens)

    @pl.when(i == ph.p5 - 1)
    def _p4_tail():
        l_d = jax.lax.dot(jnp.maximum(l_ref[...], 1e-30), et,
                          preferred_element_type=jnp.float32)
        attn = acc_ref[...] / l_d
        h_s[...] = attn
        tile3(ht_s, attn, bk)
        y_s[...] = jnp.zeros_like(y_s)

    # ---- P5: cross o-proj ----
    @pl.when((i >= ph.p5) & (i < ph.p6))
    def _p5_body():
        ak = row3(ht_s, i - ph.p5).astype(cdt)
        w = wo3_ref[0].astype(cdt)
        y_s[...] += jax.lax.dot(ak, w, preferred_element_type=jnp.float32)

    # ---- P6: residual + LN3 + fc1 ----
    @pl.when(i == ph.p6)
    def _p6_head():
        y = y_s[...] * so3_ref[0].astype(jnp.float32) \
            + bo3_ref[0].astype(jnp.float32)
        x32 = x32_s[...] + y
        x32_s[...] = x32
        h = _ln_rows(x32, ln_ref[0, 4:5, :], ln_ref[0, 5:6, :])
        h_s[...] = h
        tile3(ht_s, h, bk)
        g_s[...] = jnp.zeros_like(g_s)

    @pl.when((i >= ph.p6) & (i < ph.p7))
    def _p6_body():
        hk = row3(ht_s, i - ph.p6).astype(cdt)
        w = w1_ref[0].astype(cdt)
        g_s[...] += jax.lax.dot(hk, w, preferred_element_type=jnp.float32)

    # ---- P7: GELU + fc2 ----
    @pl.when(i == ph.p7)
    def _p7_head():
        t1 = g_s[...] * s1_ref[0].astype(jnp.float32) \
            + b1_ref[0].astype(jnp.float32)
        g = _gelu_exact(t1)
        g_s[...] = g
        tile3(gt_s, g, bh)
        y_s[...] = jnp.zeros_like(y_s)

    @pl.when(i >= ph.p7)
    def _p7_body():
        gk = row3(gt_s, i - ph.p7).astype(cdt)
        w = w2_ref[0].astype(cdt)
        y_s[...] += jax.lax.dot(gk, w, preferred_element_type=jnp.float32)

    @pl.when(i == ph.n - 1)
    def _final():
        y = y_s[...] * f2s_ref[0].astype(jnp.float32) \
            + f2b_ref[0].astype(jnp.float32)
        xo_ref[...] = (x32_s[...] + y).astype(xo_ref.dtype)


def layer_block_batched(x: jnp.ndarray, blk: dict,
                        skq: jnp.ndarray, sks, svq: jnp.ndarray, svs,
                        ckq: jnp.ndarray, cks, cvq: jnp.ndarray, cvs,
                        pos: jnp.ndarray, enc_len: int, layer,
                        n_heads: int,
                        bk: Optional[int] = None, bh: Optional[int] = None,
                        bt_s: int = 64, bt_c: int = 64,
                        interpret: bool = False):
    """Whole decoder layer for B slots per tile (continuous batching).

    Same operands as ``layer_block`` (blk needs add_layer_operands);
    ``pos`` is [B] per-slot valid history lengths. Returns
    ``(x_out [B, D], k_row [B, D], k_scale [B], v_row, v_scale)`` — the
    caller scatters rows at each slot's own position. Self-attention reads
    are bounded by ``max(pos)`` tiles.
    """
    B, D = x.shape
    L = skq.shape[0]
    T_s = skq.shape[2]
    T_c = ckq.shape[2]
    H_ffn = blk["w1"].shape[2]
    quantized = sks is not None
    hd = D // n_heads
    scale = float(hd) ** -0.5
    if bk is None:
        bk = _pick_tile(D, 384)
    if bh is None:
        bh = _pick_tile(H_ffn, 512)
    # VMEM: [B, bt, D] cache tiles double-buffered must stay under budget
    # (measured round-2d: B=8 tiles at bt=128 overflow) — scale by B
    def fit(bt, t):
        bt = min(bt, max(8, 64 * 8 // max(B, 8)))
        while bt > 8 and t % bt:
            bt //= 2
        return max(bt, 8)

    bt_s = fit(bt_s, T_s)
    bt_c = fit(bt_c, T_c)
    ph = _Phases(D, H_ffn, T_s, T_c, bk, bh, bt_s, bt_c)

    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    lengths = pos[:, None]                        # [B, 1] scalar-prefetch
    nt = jnp.maximum((jnp.max(pos) + bt_s - 1) // bt_s, 0).reshape((1,))

    e_mat = jnp.asarray(head_expand_matrix(n_heads, hd))
    et_mat = jnp.transpose(e_mat)
    row_dtype = jnp.int8 if quantized else x.dtype
    kernel = functools.partial(_layer_kernel_b, d=D, b_sz=B, ph=ph,
                               scale=scale, quantized=quantized,
                               enc_len=int(enc_len))

    p1, p4 = ph.p1, ph.p4
    n_sa = ph.p2 - ph.p1
    n_ca = ph.p5 - ph.p4

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    def im(f):
        return lambda i, lens, lyr, nt_r: f(i, lens, lyr, nt_r)

    def j_sa(i, nt_r):
        return clamp(clamp(i - p1, 0, n_sa - 1), 0,
                     jnp.maximum(nt_r[0] - 1, 0))

    def j_ca(i):
        return clamp(i - p4, 0, n_ca - 1)

    const_l = im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0))
    cache_s = pl.BlockSpec(
        (1, B, bt_s, D),
        im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_sa(i, nt_r), 0)))
    cache_c = pl.BlockSpec(
        (1, B, bt_c, D),
        im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_ca(i), 0)))
    if quantized:
        sks_in, svs_in, cks_in, cvs_in = sks, svs, cks, cvs
        ss_s = pl.BlockSpec(
            (1, B, bt_s, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_sa(i, nt_r), 0)))
        ss_c = pl.BlockSpec(
            (1, B, bt_c, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, j_ca(i), 0)))
    else:
        sks_in = svs_in = jnp.zeros((L, B, bt_s, 1), jnp.float32)
        cks_in = cvs_in = jnp.zeros((L, B, bt_c, 1), jnp.float32)
        ss_s = pl.BlockSpec(
            (1, B, bt_s, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0, 0)))
        ss_c = pl.BlockSpec(
            (1, B, bt_c, 1),
            im(lambda i, lens, lyr, nt_r: (lyr[0], 0, 0, 0)))

    def o3_spec(shape_tail):
        def _map(i, lens, lyr, nt_r):
            row = 3 * lyr[0] + jnp.where(i < ph.p3, 0,
                                         jnp.where(i < ph.p5, 1, 2))
            if shape_tail[0] == bk:
                tile = jnp.where(
                    i < ph.p3, clamp(i - ph.p2, 0, D // bk - 1),
                    jnp.where(i < ph.p5, clamp(i - ph.p3, 0, D // bk - 1),
                              clamp(i - ph.p5, 0, D // bk - 1)))
                return (row, tile, 0)
            return (row, 0, 0)
        return pl.BlockSpec((1,) + shape_tail, _map)

    full2 = lambda shp: pl.BlockSpec(
        shp, im(lambda i, lens, lyr, nt_r: (0, 0)))

    in_specs = [
        full2((B, D)),                                             # x
        pl.BlockSpec((1, 6, D), const_l),                          # ln6
        pl.BlockSpec((1, bk, 3 * D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], clamp(i - ph.p0, 0, D // bk - 1), 0))),
        pl.BlockSpec((1, 1, 3 * D), const_l),                      # sqkv
        pl.BlockSpec((1, 1, 3 * D), const_l),                      # bqkv
        cache_s, ss_s, cache_s, ss_s,
        cache_c, ss_c, cache_c, ss_c,
        o3_spec((bk, D)),
        o3_spec((1, D)),
        o3_spec((1, D)),
        pl.BlockSpec((1, bk, H_ffn),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], clamp(i - ph.p6, 0, D // bk - 1), 0))),
        pl.BlockSpec((1, 1, H_ffn), const_l),
        pl.BlockSpec((1, 1, H_ffn), const_l),
        pl.BlockSpec((1, bh, D),
                     im(lambda i, lens, lyr, nt_r:
                        (lyr[0], clamp(i - ph.p7, 0, H_ffn // bh - 1), 0))),
        pl.BlockSpec((1, 1, D), const_l),
        pl.BlockSpec((1, 1, D), const_l),
        pl.BlockSpec((D, n_heads), im(lambda i, lens, lyr, nt_r: (0, 0))),
        pl.BlockSpec((n_heads, D), im(lambda i, lens, lyr, nt_r: (0, 0))),
        full2((B, 1)),                                     # lengths (VMEM)
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((B, D), x.dtype),
        jax.ShapeDtypeStruct((B, D), row_dtype),
        jax.ShapeDtypeStruct((B, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, D), row_dtype),
        jax.ShapeDtypeStruct((B, _LANES), jnp.float32),
    )
    out_specs = (full2((B, D)), full2((B, D)), full2((B, _LANES)),
                 full2((B, D)), full2((B, _LANES)))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ph.n,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),       # x32
                pltpu.VMEM((B, D), jnp.float32),       # h
                pltpu.VMEM((D // bk, B, bk), jnp.float32),      # h tiled
                pltpu.VMEM((H_ffn // bh, B, bh), jnp.float32),  # g tiled
                pltpu.VMEM((B, 3 * D), jnp.float32),   # qkv acc
                pltpu.VMEM((B, H_ffn), jnp.float32),   # g
                pltpu.VMEM((B, D), jnp.float32),       # y acc
                pltpu.VMEM((B, D), jnp.float32),       # q
                pltpu.VMEM((B, D), jnp.float32),       # k current
                pltpu.VMEM((B, D), jnp.float32),       # v current
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, n_heads), jnp.float32),
                pltpu.VMEM((B, D), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths, layer, nt, x, blk["ln6"],
      blk["wqkv"], blk["sqkv"], blk["bqkv"],
      skq, sks_in, svq, svs_in, ckq, cks_in, cvq, cvs_in,
      blk["wo3"], blk["so3"], blk["bo3"],
      blk["w1"], blk["s1"], blk["b1"], blk["w2"],
      blk["fc2_s"], blk["fc2_b"], e_mat, et_mat,
      pos[:, None].astype(jnp.int32))
    x_out, k8, ksc, v8, vsc = outs
    return x_out, k8, ksc[:, 0], v8, vsc[:, 0]
