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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, mha
from ..ops.qmatvec import ffn_fused, qmatvec_stacked
from ..ops.quant import QTensor, is_quantized
from .decoder import KVCache, embed

_LANE = 128

# test hook: run the Pallas kernel in interpret mode (CPU backends)
INTERPRET = False

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
    if not all(is_quantized(w) and not w.int4 for w in leaves):
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

    return {
        "lin": lin,
        "ffn": ffn,
        "rest": rest,
        "vocab_qT": qT[None],        # [1, D, V_pad] int8
        "vocab_ones": ones,          # kernel scale (identity)
        "vocab_k_scale": k_scale,    # [1, D] f32, folds into x
    }


def _qmv(x2: jnp.ndarray, lin, l, b, interpret: bool) -> jnp.ndarray:
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
    L = config.n_text_layer
    D = config.n_text_state
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
        qkv = _qmv(h[:, 0, :], lin["qkv"], l, b["qkv"], interpret)
        q = qkv[:, None, :D]
        k_new = qkv[:, None, D:2 * D]
        v_new = qkv[:, None, 2 * D:]
        k_c = _write(k_c, k_new)
        v_c = _write(v_c, v_new)
        attn = mha(q, k_c, v_c, n_heads, mask=valid)
        x = x + _qmv(attn[:, 0, :], lin["self_o"], l,
                     b["self_o"], interpret)[:, None, :]

        h = layer_norm(x, r["ln2"]["w"], r["ln2"]["b"])
        q = _qmv(h[:, 0, :], lin["cross_q"], l, b["cross_q"], interpret)
        attn = mha(q[:, None, :], c_k, c_v, n_heads)
        x = x + _qmv(attn[:, 0, :], lin["cross_o"], l,
                     b["cross_o"], interpret)[:, None, :]

        h = layer_norm(x, r["ln3"]["w"], r["ln3"]["b"])
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
