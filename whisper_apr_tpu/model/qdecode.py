"""Quantized decode fast path: every decoder matvec through the Pallas
``qmatvec`` kernel, with stacked weights addressed by a scalar-prefetch
layer index (zero weight-slice copies inside the scan/while loop).

Why a separate step function: the generic ``decode_step`` scans over the
param pytree, so each layer's weights arrive as scan-sliced arrays — fine
for XLA dots (the slice fuses), fatal for a custom kernel (the slice would
materialize an HBM copy per step). Here the int8 stacks stay whole; only
the tiny leaves (LayerNorms, biases) are scanned.

Semantics spec: reference ``QuantizedLinear::forward_quantized``
(src/model/quantized.rs:2501) — int8 weights, float activations, per-channel
scales folded after the accumulate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, mha
from ..ops.decode_attention import quantize_rows
from ..ops.qmatvec import ffn_fused, qmatvec_stacked
from ..ops.quant import QTensor, is_quantized
from .decoder import KVCache, embed

_LANE = 128

# test hook: run the Pallas kernel in interpret mode (CPU backends)
INTERPRET = False

# k-quant weight modes (fused per-block path is B=1; B>1 stays on the
# scan step — batched k-quant kernels are not implemented)
KQ_MODES = ("q4k", "q5k", "q6k")


@jax.tree_util.register_static
class StaticStr(str):
    """A string that rides a jitted pytree as STATIC metadata.

    ``qd['mode']`` must cross jit boundaries (engine passes qd into the
    jitted greedy/sample/beam bodies); a plain str leaf is not a valid
    JAX type and crashes tracing. Registered-static values hash into the
    compilation cache key instead."""


def qf_supported(qd: Optional[dict], batch: int) -> bool:
    """Can the fused per-block step (decode_step_qf) serve this decode?
    int8 qd: any batch (batched kernels exist). k-quant qd: B == 1 only."""
    if qd is None:
        return False
    return str(qd.get("mode", "int8")) not in KQ_MODES or batch == 1

# the eight stacked decoder linears served by the kernel
_LINS = ("self_q", "self_k", "self_v", "self_o",
         "cross_q", "cross_o", "fc1", "fc2")


def supports_qdecode(params: dict, config: ModelConfig) -> bool:
    """The fast path needs int8 (not int4) stacked block weights and
    MXU-lane-aligned model dims (every real Whisper size qualifies)."""
    blocks = params["decoder"]["blocks"]
    leaves = [blocks["self_attn"]["q_w"], blocks["self_attn"]["k_w"],
              blocks["self_attn"]["v_w"], blocks["self_attn"]["o_w"],
              blocks["cross_attn"]["q_w"], blocks["cross_attn"]["o_w"],
              blocks["fc1"]["w"], blocks["fc2"]["w"],
              params["decoder"]["token_emb"]]
    # group-scaled planes (q4 blocks, planar q5k/q6k from ops/kquants.py)
    # carry [L, K/g, N] scales the int8 kernels don't consume — those
    # route through the generic dequant-fused decode instead
    if not all(is_quantized(w) and not w.int4 and not w.group
               and w.zero is None for w in leaves):
        return False
    d = config.n_text_state
    return d % _LANE == 0 and (4 * d) % _LANE == 0


def prepare_qdecode(params: dict, config: ModelConfig) -> Optional[dict]:
    """One-time (engine init) preparation of the kernel-ready views.

    Everything except the transposed vocab projection aliases the existing
    param buffers. The vocab projection pre-transposes the token embedding
    to ``[1, D, V_pad]`` (input-major, lane-padded) and keeps the embedding
    K-side scale separate — it folds into the activation, not the output.
    """
    if not supports_qdecode(params, config):
        return None
    dec = params["decoder"]
    blocks = dec["blocks"]

    def pair(qt: QTensor) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # scale may be per-tensor [L,1,1]: broadcast to [L,1,N] lazily is
        # free under jit; materialize per-channel layout here once
        q = qt.q
        s = jnp.broadcast_to(qt.scale, (q.shape[0], 1, q.shape[2]))
        return q, jnp.asarray(s, jnp.float32)

    sa, ca = blocks["self_attn"], blocks["cross_attn"]
    # self-attention q/k/v fused into ONE kernel call per layer: concat on
    # the output axis (one-time int8 copy, +3*D^2*L bytes device memory)
    qkv_q = jnp.concatenate([sa["q_w"].q, sa["k_w"].q, sa["v_w"].q], axis=2)
    D = qkv_q.shape[1]
    L = qkv_q.shape[0]

    def bcast_s(qt):
        return jnp.asarray(jnp.broadcast_to(
            qt.scale, (L, 1, qt.q.shape[2])), jnp.float32)

    qkv_s = jnp.concatenate(
        [bcast_s(sa["q_w"]), bcast_s(sa["k_w"]), bcast_s(sa["v_w"])], axis=2)
    lin = {
        "qkv": (qkv_q, qkv_s),
        "self_o": pair(sa["o_w"]),
        "cross_q": pair(ca["q_w"]),
        "cross_o": pair(ca["o_w"]),
    }
    # FFN fused: fc1 scale/bias consumed in-kernel; fc2 per-output-channel
    # scale + bias commute out and are applied by the scanned epilogue
    ffn = {
        "w1": blocks["fc1"]["w"].q,
        "s1": bcast_s(blocks["fc1"]["w"]),
        # consumed in-kernel, stays stacked; [L, 1, H] so the BlockSpec
        # obeys Mosaic's last-two-dims divisibility rule
        "b1": blocks["fc1"]["b"][:, None, :],
        "w2": blocks["fc2"]["w"].q,
    }
    bias = {
        "qkv": jnp.concatenate([sa["q_b"], sa["k_b"], sa["v_b"]], axis=1),
        "self_o": sa["o_b"],
        "cross_q": ca["q_b"],
        "cross_o": ca["o_b"],
        "fc2": blocks["fc2"]["b"],
    }
    rest = {
        "ln1": blocks["ln1"], "ln2": blocks["ln2"], "ln3": blocks["ln3"],
        "bias": bias,
        "fc2_scale": jnp.asarray(jnp.broadcast_to(
            blocks["fc2"]["w"].scale, (L, 1, D)), jnp.float32),
    }

    # vocab projection: y = x @ emb.T with emb [V, D] int8, scale [1, D].
    # The per-channel scale rides the K axis, so it folds into x; the
    # transposed int8 matrix is padded on V to a lane multiple.
    emb = dec["token_emb"]
    V, D = emb.q.shape
    v_pad = (-V) % _LANE
    qT = jnp.transpose(emb.q)  # [D, V]
    if v_pad:
        qT = jnp.pad(qT, ((0, 0), (0, v_pad)))
    ones = jnp.ones((1, 1, V + v_pad), jnp.float32)
    k_scale = jnp.asarray(emb.scale, jnp.float32).reshape(1, D)

    # stacked [L, 1, N] views for the per-block megakernels
    # (ops/decode_blocks.py) — reshapes alias the existing buffers
    def col(a):
        return a[:, None, :] if a.ndim == 2 else a

    blk = {
        "ln1_w": col(blocks["ln1"]["w"]), "ln1_b": col(blocks["ln1"]["b"]),
        "ln2_w": col(blocks["ln2"]["w"]), "ln2_b": col(blocks["ln2"]["b"]),
        "ln3_w": col(blocks["ln3"]["w"]), "ln3_b": col(blocks["ln3"]["b"]),
        "wqkv": qkv_q, "sqkv": qkv_s, "bqkv": col(bias["qkv"]),
        "self_wo": lin["self_o"][0], "self_wos": lin["self_o"][1],
        "self_wob": col(bias["self_o"]),
        "wcq": lin["cross_q"][0], "scq": lin["cross_q"][1],
        "bcq": col(bias["cross_q"]),
        "cross_wo": lin["cross_o"][0], "cross_wos": lin["cross_o"][1],
        "cross_wob": col(bias["cross_o"]),
        "w1": ffn["w1"], "s1": ffn["s1"], "b1": ffn["b1"], "w2": ffn["w2"],
        "fc2_s": rest["fc2_scale"], "fc2_b": col(bias["fc2"]),
    }

    return {
        "lin": lin,
        "ffn": ffn,
        "rest": rest,
        "blk": blk,
        "vocab_qT": qT[None],        # [1, D, V_pad] int8
        "vocab_ones": ones,          # kernel scale (identity)
        "vocab_k_scale": k_scale,    # [1, D] f32, folds into x
    }


def supports_q4k_decode(params: dict, config: ModelConfig) -> bool:
    """The Q4_K fast path needs planar k-quant block weights (kpack
    QTensors, ops/q4k.py) and an int8 token embedding."""
    blocks = params["decoder"]["blocks"]
    leaves = [blocks["self_attn"]["q_w"], blocks["self_attn"]["k_w"],
              blocks["self_attn"]["v_w"], blocks["self_attn"]["o_w"],
              blocks["cross_attn"]["q_w"], blocks["cross_attn"]["o_w"],
              blocks["fc1"]["w"], blocks["fc2"]["w"]]
    emb = params["decoder"]["token_emb"]
    if not all(is_quantized(w) and getattr(w, "kpack", False)
               for w in leaves):
        return False
    return is_quantized(emb) and not emb.int4


def prepare_q4k_decode(params: dict, config: ModelConfig) -> Optional[dict]:
    """qdecode preparation for planar Q4_K params (reference fused path:
    QuantizedLinearQ4K::forward_fused, quantized.rs:355).

    Returns the same qd structure as :func:`prepare_qdecode` but with
    (packed, scale, zero) TRIPLES in ``lin``/``ffn`` — consumed by
    ops/q4k.q4k_matvec_stacked inside decode_step_q — plus
    ``mode='q4k'``. Since round 4, decode_step_qf serves k-quant qds at
    B=1 through the per-block kq megakernels (ops/decode_blocks_kq.py);
    B>1 decodes stay on the scan step (qf_supported guards the callers).
    """
    if not supports_q4k_decode(params, config):
        return None
    dec = params["decoder"]
    blocks = dec["blocks"]
    sa, ca = blocks["self_attn"], blocks["cross_attn"]

    def tri(qt: QTensor):
        return qt.q, jnp.asarray(qt.scale, jnp.float32), \
            jnp.asarray(qt.zero, jnp.float32)

    def cat(qts):
        return (jnp.concatenate([t.q for t in qts], axis=2),
                jnp.concatenate(
                    [jnp.asarray(t.scale, jnp.float32) for t in qts],
                    axis=2),
                jnp.concatenate(
                    [jnp.asarray(t.zero, jnp.float32) for t in qts],
                    axis=2))

    lin = {
        "qkv": cat([sa["q_w"], sa["k_w"], sa["v_w"]]),
        "self_o": tri(sa["o_w"]),
        "cross_q": tri(ca["q_w"]),
        "cross_o": tri(ca["o_w"]),
    }
    ffn = {
        "fc1": tri(blocks["fc1"]["w"]),
        "fc2": tri(blocks["fc2"]["w"]),
    }
    bias = {
        "qkv": jnp.concatenate([sa["q_b"], sa["k_b"], sa["v_b"]], axis=1),
        "self_o": sa["o_b"],
        "cross_q": ca["q_b"],
        "cross_o": ca["o_b"],
        "fc1": blocks["fc1"]["b"],
        "fc2": blocks["fc2"]["b"],
    }
    rest = {
        "ln1": blocks["ln1"], "ln2": blocks["ln2"], "ln3": blocks["ln3"],
        "bias": bias,
    }

    emb = dec["token_emb"]
    V, D = emb.q.shape
    v_pad = (-V) % _LANE
    qT = jnp.transpose(emb.q)
    if v_pad:
        qT = jnp.pad(qT, ((0, 0), (0, v_pad)))
    ones = jnp.ones((1, 1, V + v_pad), jnp.float32)
    k_scale = jnp.asarray(emb.scale, jnp.float32).reshape(1, D)

    return {
        "mode": StaticStr("q4k"),
        "lin": lin,
        "ffn": ffn,
        "rest": rest,
        "vocab_qT": qT[None],
        "vocab_ones": ones,
        "vocab_k_scale": k_scale,
    }


def _kq_block_leaves(params: dict):
    blocks = params["decoder"]["blocks"]
    return [blocks["self_attn"]["q_w"], blocks["self_attn"]["k_w"],
            blocks["self_attn"]["v_w"], blocks["self_attn"]["o_w"],
            blocks["cross_attn"]["q_w"], blocks["cross_attn"]["o_w"],
            blocks["fc1"]["w"], blocks["fc2"]["w"]]


def supports_q5k_decode(params: dict, config: ModelConfig) -> bool:
    """Planar Q5_K block weights (group=32 asymmetric int8-plane QTensors,
    ops/kquants.py) + int8 token embedding."""
    emb = params["decoder"]["token_emb"]
    if not (all(is_quantized(w) and not w.int4
                and not getattr(w, "kpack", False)
                and w.group == 32 and w.zero is not None
                for w in _kq_block_leaves(params))
            and is_quantized(emb) and not emb.int4):
        return False
    return config.n_text_state % _LANE == 0


def supports_q6k_decode(params: dict, config: ModelConfig) -> bool:
    """Planar Q6_K block weights (group=16 symmetric int8-plane QTensors)
    + int8 token embedding."""
    emb = params["decoder"]["token_emb"]
    if not (all(is_quantized(w) and not w.int4
                and not getattr(w, "kpack", False)
                and w.group == 16 and w.zero is None
                for w in _kq_block_leaves(params))
            and is_quantized(emb) and not emb.int4):
        return False
    return config.n_text_state % _LANE == 0


def prepare_kq_decode(params: dict, config: ModelConfig) -> Optional[dict]:
    """qdecode preparation for planar Q5_K/Q6_K params (same fused-forward
    contract as prepare_q4k_decode; reference: quantized.rs:355 — every
    k-quant linear forward is dequant-fused). ``lin``/``ffn`` carry
    (values, scale, zero-or-None) triples consumed by
    ops/kquants.kq_matvec_stacked inside decode_step_q."""
    if supports_q5k_decode(params, config):
        mode = "q5k"
    elif supports_q6k_decode(params, config):
        mode = "q6k"
    else:
        return None
    dec = params["decoder"]
    blocks = dec["blocks"]
    sa, ca = blocks["self_attn"], blocks["cross_attn"]

    def tri(qt: QTensor):
        z = None if qt.zero is None else jnp.asarray(qt.zero, jnp.float32)
        return qt.q, jnp.asarray(qt.scale, jnp.float32), z

    def cat(qts):
        zs = [t.zero for t in qts]
        z = None if zs[0] is None else jnp.concatenate(
            [jnp.asarray(t, jnp.float32) for t in zs], axis=2)
        return (jnp.concatenate([t.q for t in qts], axis=2),
                jnp.concatenate(
                    [jnp.asarray(t.scale, jnp.float32) for t in qts],
                    axis=2), z)

    lin = {
        "qkv": cat([sa["q_w"], sa["k_w"], sa["v_w"]]),
        "self_o": tri(sa["o_w"]),
        "cross_q": tri(ca["q_w"]),
        "cross_o": tri(ca["o_w"]),
    }
    ffn = {
        "fc1": tri(blocks["fc1"]["w"]),
        "fc2": tri(blocks["fc2"]["w"]),
    }
    bias = {
        "qkv": jnp.concatenate([sa["q_b"], sa["k_b"], sa["v_b"]], axis=1),
        "self_o": sa["o_b"],
        "cross_q": ca["q_b"],
        "cross_o": ca["o_b"],
        "fc1": blocks["fc1"]["b"],
        "fc2": blocks["fc2"]["b"],
    }
    rest = {
        "ln1": blocks["ln1"], "ln2": blocks["ln2"], "ln3": blocks["ln3"],
        "bias": bias,
    }

    emb = dec["token_emb"]
    V, D = emb.q.shape
    v_pad = (-V) % _LANE
    qT = jnp.transpose(emb.q)
    if v_pad:
        qT = jnp.pad(qT, ((0, 0), (0, v_pad)))
    ones = jnp.ones((1, 1, V + v_pad), jnp.float32)
    k_scale = jnp.asarray(emb.scale, jnp.float32).reshape(1, D)

    return {
        "mode": StaticStr(mode),
        "lin": lin,
        "ffn": ffn,
        "rest": rest,
        "vocab_qT": qT[None],
        "vocab_ones": ones,
        "vocab_k_scale": k_scale,
    }


def transcode_kq_to_int8(params: dict, config: ModelConfig
                         ) -> Optional[dict]:
    """k-quant decoder blocks -> per-channel int8 qd for BATCHED decode.

    The fused per-block k-quant kernels are B=1-only; the reference's
    fused k-quant linears serve any M (quantized.rs:355 forward_fused).
    For B>1 serving, the k-quant weights are dequantized ONCE at load and
    requantized per-output-channel int8, so serving slots ride the batched
    int8 megakernels at exactly the int8 model's per-stream cost (the
    round-4 fallback — the scan step — measured 1.5-2.7x slower).

    Storage stays k-quant (the .apr and the B=1 path are untouched); the
    int8 copy adds ~d_model^2*16L bytes of HBM (large-v3: ~1.2 GB).
    Transcode error is bounded: int8 per-channel on top of the k-quant
    grid loses <1 dB SQNR vs the k-quant dequant (pinned in tests).

    Returns a prepare_qdecode()-shaped qd (mode "int8"), or None if the
    params are not k-quant."""
    blocks = params["decoder"]["blocks"]
    leaves = _kq_block_leaves(params)
    if not all(is_quantized(w) and (getattr(w, "kpack", False) or w.group)
               for w in leaves):
        return None
    from ..ops.quant import dequant

    @jax.jit
    def requant(qt):
        # QTensor is a registered pytree, so the dequant -> requant runs
        # as ONE fused device program per leaf (the f32 intermediate never
        # persists; peak extra HBM = one leaf)
        w = dequant(qt, jnp.float32)                    # [L, K, N]
        absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return q, scale

    def tr(qt: QTensor) -> QTensor:
        q, s = requant(qt)
        return QTensor(q, s)

    sa_keys = ("q_w", "k_w", "v_w", "o_w")
    new_blocks = dict(blocks)
    new_blocks["self_attn"] = dict(blocks["self_attn"])
    new_blocks["cross_attn"] = dict(blocks["cross_attn"])
    for k in sa_keys:
        new_blocks["self_attn"][k] = tr(blocks["self_attn"][k])
    for k in ("q_w", "o_w"):
        new_blocks["cross_attn"][k] = tr(blocks["cross_attn"][k])
    new_blocks["fc1"] = dict(blocks["fc1"])
    new_blocks["fc2"] = dict(blocks["fc2"])
    new_blocks["fc1"]["w"] = tr(blocks["fc1"]["w"])
    new_blocks["fc2"]["w"] = tr(blocks["fc2"]["w"])
    new_params = dict(params)
    new_params["decoder"] = dict(params["decoder"])
    new_params["decoder"]["blocks"] = new_blocks
    return prepare_qdecode(new_params, config)


def kq_block_operands(qd: dict) -> dict:
    """Stacked operand views for the per-block kq megakernels
    (ops/decode_blocks_kq.py), built from a k-quant qd at TRACE time —
    all views are reshapes of the existing triples (no copies, and the
    engine's qd pytree never grows extra leaves)."""
    lin, ffn, rest = qd["lin"], qd["ffn"], qd["rest"]
    bias = rest["bias"]
    col = lambda a: a[:, None, :]                   # [L, N] -> [L, 1, N]
    return {
        "ln1_w": col(rest["ln1"]["w"]), "ln1_b": col(rest["ln1"]["b"]),
        "ln2_w": col(rest["ln2"]["w"]), "ln2_b": col(rest["ln2"]["b"]),
        "ln3_w": col(rest["ln3"]["w"]), "ln3_b": col(rest["ln3"]["b"]),
        "qkv": lin["qkv"], "bqkv": col(bias["qkv"]),
        "self_o": lin["self_o"], "b_self_o": col(bias["self_o"]),
        "cross_q": lin["cross_q"], "b_cross_q": col(bias["cross_q"]),
        "cross_o": lin["cross_o"], "b_cross_o": col(bias["cross_o"]),
        "fc1": ffn["fc1"], "b_fc1": col(bias["fc1"]),
        "fc2": ffn["fc2"], "b_fc2": col(bias["fc2"]),
    }


def _qmv(x2: jnp.ndarray, lin, l, b, interpret: bool,
         mode: str = "int8") -> jnp.ndarray:
    if mode in ("q5k", "q6k"):        # planar k-quant (values, scale, zero?)
        from ..ops.kquants import kq_matvec_stacked
        q, s, z = lin
        y = kq_matvec_stacked(x2, q, s, z, l, interpret=interpret)
    elif len(lin) == 3:               # planar Q4_K (packed, scale, zero)
        from ..ops.q4k import q4k_matvec_stacked
        q, s, z = lin
        y = q4k_matvec_stacked(x2, q, s, z, l, interpret=interpret)
    else:                             # int8 (q, scale)
        q, s = lin
        y = qmatvec_stacked(x2, q, s, l, interpret=interpret)
    return y + b.astype(y.dtype)


def decode_step_q(params: dict, qd: dict, token: jnp.ndarray,
                  pos: jnp.ndarray, cache: KVCache, config: ModelConfig,
                  compute_dtype: jnp.dtype = jnp.bfloat16,
                  interpret: Optional[bool] = None) -> Tuple[jnp.ndarray, KVCache]:
    """Incremental single-token forward, kernel edition. Same contract as
    ``decode_step``: token [B] at ``pos`` -> (logits [B, V] f32, cache).
    ``pos`` may be a scalar (all sequences aligned) or [B] per-sequence
    positions (continuous batching, like decode_step_multi)."""
    if interpret is None:
        interpret = INTERPRET
    B = token.shape[0]
    multi_pos = jnp.ndim(pos) == 1
    if multi_pos:
        from ..ops.quant import is_quantized
        dec = params["decoder"]
        emb = dec["token_emb"]
        if is_quantized(emb):
            scale = emb.scale.astype(compute_dtype)
            while scale.ndim > 1:
                scale = scale[0]
            tok = emb.q[token].astype(compute_dtype) * scale
        else:
            tok = emb[token].astype(compute_dtype)
        x = (tok + dec["pos_emb"][pos].astype(compute_dtype))[:, None, :]
    else:
        x = embed(params, token[:, None], pos, compute_dtype)  # [B,1,D]
    n_heads = config.n_text_head
    lin, ffn, rest = qd["lin"], qd["ffn"], qd["rest"]
    mode = qd.get("mode", "int8")
    kq_mode = mode in ("q4k", "q5k", "q6k")
    L = config.n_text_layer
    D = config.n_text_state
    if kq_mode:
        block_h = None
    else:
        H = ffn["w1"].shape[2]
        block_h = max(bh for bh in range(_LANE, min(H, 512) + 1, _LANE)
                      if H % bh == 0)
    T_max = cache.self_k.shape[2]
    if multi_pos:
        valid = (jnp.arange(T_max)[None, :]
                 <= pos[:, None])[:, None, None, :]
    else:
        valid = (jnp.arange(T_max) <= pos)[None, None, None, :]

    def _write(c, new):
        if multi_pos:
            return c.at[jnp.arange(B), pos].set(new[:, 0])
        return jax.lax.dynamic_update_slice(c, new, (0, pos, 0))

    def body(x, layer):
        l, r, k_c, v_c, c_k, c_v = layer
        b = r["bias"]
        h = layer_norm(x, r["ln1"]["w"], r["ln1"]["b"])
        qkv = _qmv(h[:, 0, :], lin["qkv"], l, b["qkv"], interpret, mode)
        q = qkv[:, None, :D]
        k_new = qkv[:, None, D:2 * D]
        v_new = qkv[:, None, 2 * D:]
        k_c = _write(k_c, k_new)
        v_c = _write(v_c, v_new)
        attn = mha(q, k_c, v_c, n_heads, mask=valid)
        x = x + _qmv(attn[:, 0, :], lin["self_o"], l,
                     b["self_o"], interpret, mode)[:, None, :]

        h = layer_norm(x, r["ln2"]["w"], r["ln2"]["b"])
        q = _qmv(h[:, 0, :], lin["cross_q"], l, b["cross_q"], interpret,
                 mode)
        attn = mha(q[:, None, :], c_k, c_v, n_heads)
        x = x + _qmv(attn[:, 0, :], lin["cross_o"], l,
                     b["cross_o"], interpret, mode)[:, None, :]

        h = layer_norm(x, r["ln3"]["w"], r["ln3"]["b"])
        if kq_mode:
            t1 = _qmv(h[:, 0, :], ffn["fc1"], l, b["fc1"], interpret, mode)
            y = _qmv(gelu(t1), ffn["fc2"], l, b["fc2"], interpret, mode)
        else:
            y = ffn_fused(h[:, 0, :], ffn["w1"], ffn["s1"], ffn["b1"],
                          ffn["w2"], l, block_h=block_h, interpret=interpret)
            y = (y.astype(jnp.float32) * r["fc2_scale"]
                 + b["fc2"].astype(jnp.float32)).astype(x.dtype)
        x = x + y[:, None, :]
        return x, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (jnp.arange(L), rest, cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])

    # vocab projection: K-side scale folds into the activation in f32
    xs = (x[:, 0, :].astype(jnp.float32) * qd["vocab_k_scale"]).astype(x.dtype)
    logits = qmatvec_stacked(xs, qd["vocab_qT"], qd["vocab_ones"], 0,
                             interpret=interpret, out_dtype=jnp.float32)
    return logits[:, : config.n_vocab], KVCache(new_k, new_v,
                                                cache.cross_k, cache.cross_v)


# ---------------------------------------------------------------------------
# Fused-attention decode step (round-2 "megakernel" path)
# ---------------------------------------------------------------------------
#
# decode_step_q above still pays, per layer, one XLA attention over the KV
# cache plus a separate out-projection kernel. decode_step_qf replaces both
# with ONE fused Pallas call per attention block (ops/decode_attention.py):
# attention streams the cache flash-style and applies the out-projection
# in VMEM. Optionally the KV caches are int8 with per-row scales — exact
# row-scale commutation, ~half the decode's KV bandwidth (the cross K/V
# alone is ~245 MB/step bf16 on large-v3).

class QKVCache(NamedTuple):
    """Stacked decode caches for the fused path.

    ``*_q`` are [L, B, T, D] (int8 when quantized, else compute dtype);
    ``*_s`` are per-row scales [L, B, T, 1] f32 (column layout, as
    ops/decode_attention.py documents), or None in bf16 mode.
    T is padded to a multiple of the kernel block (masked by lengths).
    """

    self_kq: jnp.ndarray
    self_ks: Optional[jnp.ndarray]
    self_vq: jnp.ndarray
    self_vs: Optional[jnp.ndarray]
    cross_kq: jnp.ndarray
    cross_ks: Optional[jnp.ndarray]
    cross_vq: jnp.ndarray
    cross_vs: Optional[jnp.ndarray]


# cache PAD granularity (T rounded up to these) vs kernel TILE sizes —
# tuned on v5e large-v3 (tools/tune_blocks.py): self 128-row tiles and
# cross 256-row tiles double-buffer best; pads stay coarser so shapes
# bucket less often
SELF_BLOCK_T = 256       # pad granularity for the self cache
CROSS_BLOCK_T = 512      # pad granularity for the cross cache
SELF_TILE_T = 128        # kernel block (divides SELF_BLOCK_T)
CROSS_TILE_T = 256       # kernel block (divides CROSS_BLOCK_T)
# batched-kernel tile override for tuning sweeps (None = 64*8/B heuristic)
BATCHED_TILE_T = None
# Defer per-layer KV-row writes: collect the new rows in small [L, B, D]
# carries and scatter each cache ONCE after the layer loop (2L-4L mid-loop
# dynamic_update_slices on the multi-GB stacks -> 2-4 total). Safe because
# the block kernels never read the current row (it is computed in-kernel;
# rows < pos are the history). MEASURED WIN on v5e (round 4,
# probe_layer_kernel --which qf,qf_defer): 1.800 vs 1.855 ms/step on
# large-v3 int8 B=1 — the default since round 4 (pinned bit-identical to
# the interleaved schedule in tests/test_qdecode.py).
DEFER_KV_WRITES = True

# Measurement-only ablations for the fixed-overhead anatomy (round-4
# session 5: the 32-layer pipeline runs at 1.03x its HBM floor; the whole
# 0.48 ms gap is the step's FIXED part). Probes set e.g. {"vocab"} or
# {"scatter"} to carve that pool apart; production leaves this empty.
ABLATE: frozenset = frozenset()


def _pad_t(a: jnp.ndarray, block: int) -> jnp.ndarray:
    """Pad [L, B, T, D] on T up to a multiple of ``block``."""
    t = a.shape[2]
    pad = (-t) % block
    if pad:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return a


def quantize_cache(cache: KVCache, kv_int8: bool = True,
                   mode: Optional[str] = None) -> QKVCache:
    """KVCache -> QKVCache: pad T to kernel blocks; optionally compress
    rows.

    ``mode`` (overrides ``kv_int8``): "bf16" keeps compute-dtype rows;
    "int8" quantizes per row with exact f32 scales (ops/decode_attention);
    "cross8" quantizes ONLY the cross cache (the per-utterance-static
    245 MB/step of large-v3 B=1 traffic) and keeps self rows in the
    best-measured bf16 form — the self path's int8 handling is what made
    full-int8 lose at B=1 (1.903 vs bf16 1.836, BENCH_NOTES round 3);
    "fp8" stores float8_e4m3fn rows with NO scales — the TPU-native
    half-memory option: the f8->bf16 tile cast is a native VPU convert
    measured 2.6x cheaper than int8's (BENCH_NOTES round 3), and all the
    scale plumbing (folds, row writes, selector dots) disappears. The
    kernels treat fp8 exactly like bf16 (cast at read);
    "crossf8" = fp8 rows for the CROSS cache only, bf16 self — the
    batched-serving candidate: at B=8 the cross reads are ~60 MB/layer/
    tick (the dominant per-layer traffic), and the scale-free f8 cast is
    the cheapest row decompression the VPU has."""
    if mode is None:
        mode = "int8" if kv_int8 else "bf16"
    sk = _pad_t(cache.self_k, SELF_BLOCK_T)
    sv = _pad_t(cache.self_v, SELF_BLOCK_T)
    ck = _pad_t(cache.cross_k, CROSS_BLOCK_T)
    cv = _pad_t(cache.cross_v, CROSS_BLOCK_T)
    if mode == "fp8":
        f8 = jnp.float8_e4m3fn
        return QKVCache(sk.astype(f8), None, sv.astype(f8), None,
                        ck.astype(f8), None, cv.astype(f8), None)
    if mode == "cross8":
        ckq, cks = quantize_rows(ck)
        cvq, cvs = quantize_rows(cv)
        return QKVCache(sk, None, sv, None, ckq, cks, cvq, cvs)
    if mode == "crossf8":
        f8 = jnp.float8_e4m3fn
        return QKVCache(sk, None, sv, None,
                        ck.astype(f8), None, cv.astype(f8), None)
    if mode != "int8":
        return QKVCache(sk, None, sv, None, ck, None, cv, None)
    skq, sks = quantize_rows(sk)
    svq, svs = quantize_rows(sv)
    ckq, cks = quantize_rows(ck)
    cvq, cvs = quantize_rows(cv)
    return QKVCache(skq, sks, svq, svs, ckq, cks, cvq, cvs)


def decode_step_qf(params: dict, qd: dict, token: jnp.ndarray,
                   pos: jnp.ndarray, cache: QKVCache, config: ModelConfig,
                   compute_dtype: jnp.dtype = jnp.bfloat16,
                   interpret: Optional[bool] = None,
                   enc_len: Optional[int] = None,
                   greedy_bias: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, QKVCache]:
    """Fused-attention decode step over a ``QKVCache``: THREE per-block
    megakernels per layer (ops/decode_blocks.py — self_block, cross_block,
    ffn_block: LayerNorms, projections, attention, epilogues, and residuals
    all in-kernel). The XLA step body is the embed, four KV-row writes per
    layer, the final LayerNorm, and the vocab projection.

    ``pos`` may be scalar (aligned batch) or [B] (continuous batching).
    ``enc_len`` is the number of VALID encoder positions in the (padded)
    cross cache — pass the pre-padding cross-cache length; defaults to
    ``config.n_audio_ctx`` (exact for full 30 s windows).

    ``greedy_bias`` ([1, V_pad] f32, real suppressions) switches the
    vocab tail to the FUSED GREEDY HEAD (ops/qmatvec.qmatvec_greedy_head):
    returns ``((token [B] i32, max_logit [B] f32, logsumexp [B] f32),
    cache)`` instead of logits — no [B, 52k] logits round-trip and no
    XLA bias/argmax fusions in the greedy loop.
    """
    from ..ops.decode_blocks import (cross_block, cross_block_batched,
                                     ffn_block, ffn_block_batched,
                                     self_block, self_block_batched)

    if interpret is None:
        interpret = INTERPRET
    if enc_len is None:
        enc_len = config.n_audio_ctx
    B = token.shape[0]
    kq_mode = str(qd.get("mode", "int8")) in KQ_MODES
    if kq_mode and B != 1:
        raise NotImplementedError(
            "k-quant fused blocks are B=1 only; guard callers with "
            "qf_supported() (B>1 k-quants decode via decode_step_q)")
    multi_pos = jnp.ndim(pos) == 1
    dec = params["decoder"]
    if multi_pos:
        emb = dec["token_emb"]
        if is_quantized(emb):
            scale = emb.scale.astype(compute_dtype)
            while scale.ndim > 1:
                scale = scale[0]
            tok = emb.q[token].astype(compute_dtype) * scale
        else:
            tok = emb[token].astype(compute_dtype)
        x = tok + dec["pos_emb"][pos].astype(compute_dtype)      # [B, D]
    else:
        x = embed(params, token[:, None], pos, compute_dtype)[:, 0]
    n_heads = config.n_text_head
    if kq_mode:
        blk = kq_block_operands(qd)          # trace-time reshapes
        H = blk["fc1"][0].shape[2]
    else:
        blk = qd["blk"]
        H = blk["w1"].shape[2]
    L = config.n_text_layer
    block_h = max(bh for bh in range(_LANE, min(H, 512) + 1, _LANE)
                  if H % bh == 0)
    qcache = cache
    kv_int8 = qcache.self_ks is not None
    if B == 1:
        self_bt = min(SELF_TILE_T, qcache.self_kq.shape[2])
        cross_bt = min(CROSS_TILE_T, qcache.cross_kq.shape[2])
    else:
        # batched kernels carry B sequences per tile: [B, bt, D] cache
        # blocks double-buffered next to the resident weights must stay
        # under the ~16 MiB VMEM budget (measured: B=8 bt=128 overflows
        # for bf16 AND int8 — Mosaic's scoped accounting charges more
        # than raw tile bytes)
        bt = BATCHED_TILE_T or max(8, 64 * 8 // max(B, 8))
        self_bt = min(bt, qcache.self_kq.shape[2])
        cross_bt = min(bt, qcache.cross_kq.shape[2])

    def row_write(stack, new, l):
        """One [B, D] row (or [B] scale column) at (l, :, pos)."""
        if multi_pos:
            return stack.at[l, jnp.arange(B), pos].set(new)
        return jax.lax.dynamic_update_slice(
            stack, new[None, :, None, :], (l, 0, pos, 0))

    def scale_write(scales, s, l):
        if multi_pos:
            return scales.at[l, jnp.arange(B), pos, 0].set(s)
        return jax.lax.dynamic_update_slice(
            scales, s[None, :, None, None], (l, 0, pos, 0))

    # B == 1: per-sequence kernels (grid (B, tiles)); B > 1: batched
    # kernels (grid (tiles,), all sequences per tile — selector-matrix
    # segmented softmax, M=B projections)
    if kq_mode:
        from ..ops.decode_blocks_kq import (cross_block_kq, ffn_block_kq,
                                            self_block_kq)
        _self, _cross, _ffn = self_block_kq, cross_block_kq, ffn_block_kq
    elif B == 1:
        _self, _cross, _ffn = self_block, cross_block, ffn_block
    else:
        _self, _cross, _ffn = (self_block_batched, cross_block_batched,
                               ffn_block_batched)

    if DEFER_KV_WRITES:
        # kernels only read rows < pos, so the new rows can accumulate in
        # small [L, B, D] carries and land in ONE scatter per cache below
        def body(l, carry):
            x, krows, ksc_all, vrows, vsc_all = carry
            x, k8, ksc, v8, vsc = _self(
                x, blk, qcache.self_kq, qcache.self_ks, qcache.self_vq,
                qcache.self_vs, pos, l, n_heads,
                block_t=self_bt, interpret=interpret)
            krows = jax.lax.dynamic_update_slice(krows, k8[None], (l, 0, 0))
            vrows = jax.lax.dynamic_update_slice(vrows, v8[None], (l, 0, 0))
            if kv_int8:
                ksc_all = jax.lax.dynamic_update_slice(
                    ksc_all, ksc[None], (l, 0))
                vsc_all = jax.lax.dynamic_update_slice(
                    vsc_all, vsc[None], (l, 0))
            x = _cross(
                x, blk, qcache.cross_kq, qcache.cross_ks, qcache.cross_vq,
                qcache.cross_vs, enc_len, l, n_heads,
                block_t=cross_bt, interpret=interpret)
            x = _ffn(x, blk, l, block_h=block_h, interpret=interpret)
            return (x, krows, ksc_all, vrows, vsc_all)

        row_dtype = qcache.self_kq.dtype
        zr = jnp.zeros((L, B, qcache.self_kq.shape[-1]), row_dtype)
        zs = jnp.zeros((L, B), jnp.float32)
        x, krows, ksc_all, vrows, vsc_all = jax.lax.fori_loop(
            0, L, body, (x, zr, zs, zr, zs))

        def rows_write(stack, rows):
            if multi_pos:
                return stack.at[:, jnp.arange(B), pos].set(rows)
            return jax.lax.dynamic_update_slice(
                stack, rows[:, :, None, :], (0, 0, pos, 0))

        def scales_write(scales, s):
            if multi_pos:
                return scales.at[:, jnp.arange(B), pos, 0].set(s)
            return jax.lax.dynamic_update_slice(
                scales, s[:, :, None, None], (0, 0, pos, 0))

        if "scatter" in ABLATE:   # measurement-only: skip the KV scatters
            skq, svq = qcache.self_kq, qcache.self_vq
            sks, svs = qcache.self_ks, qcache.self_vs
        else:
            skq = rows_write(qcache.self_kq, krows)
            svq = rows_write(qcache.self_vq, vrows)
            sks, svs = qcache.self_ks, qcache.self_vs
            if kv_int8:
                sks = scales_write(sks, ksc_all)
                svs = scales_write(svs, vsc_all)
    else:
        def body(l, carry):
            x, skq, sks, svq, svs = carry
            x, k8, ksc, v8, vsc = _self(
                x, blk, skq, sks, svq, svs, pos, l, n_heads,
                block_t=self_bt, interpret=interpret)
            skq = row_write(skq, k8, l)
            svq = row_write(svq, v8, l)
            if kv_int8:
                sks = scale_write(sks, ksc, l)
                svs = scale_write(svs, vsc, l)
            x = _cross(
                x, blk, qcache.cross_kq, qcache.cross_ks, qcache.cross_vq,
                qcache.cross_vs, enc_len, l, n_heads,
                block_t=cross_bt, interpret=interpret)
            x = _ffn(x, blk, l, block_h=block_h, interpret=interpret)
            return (x, skq, sks, svq, svs)

        x, skq, sks, svq, svs = jax.lax.fori_loop(
            0, L, body,
            (x, qcache.self_kq, qcache.self_ks, qcache.self_vq,
             qcache.self_vs))
    new_cache = QKVCache(skq, sks, svq, svs, qcache.cross_kq,
                         qcache.cross_ks, qcache.cross_vq, qcache.cross_vs)
    if greedy_bias is not None:   # fused greedy head: token, no logits
        from ..ops.qmatvec import qmatvec_greedy_head
        x = layer_norm(x, dec["ln_post"]["w"], dec["ln_post"]["b"])
        xs = (x.astype(jnp.float32) * qd["vocab_k_scale"]).astype(x.dtype)
        tok, mx, lz = qmatvec_greedy_head(
            xs, qd["vocab_qT"], greedy_bias, config.n_vocab,
            interpret=interpret)
        return (tok, mx, lz), new_cache
    if "vocab" in ABLATE:         # measurement-only: no final LN / vocab
        # head — a data-dependent (never-true) logit row keeps the layer
        # pipeline live without letting XLA hoist anything loop-invariant
        logits = jnp.where(x[:, :1] > 1e30, 1.0, 0.0) * jnp.zeros(
            (x.shape[0], config.n_vocab), jnp.float32)
    else:
        x = layer_norm(x, dec["ln_post"]["w"], dec["ln_post"]["b"])
        xs = (x.astype(jnp.float32) * qd["vocab_k_scale"]).astype(x.dtype)
        logits = qmatvec_stacked(xs, qd["vocab_qT"], qd["vocab_ones"], 0,
                                 interpret=interpret,
                                 out_dtype=jnp.float32)
    return logits[:, : config.n_vocab], new_cache
