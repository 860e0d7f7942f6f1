"""Debug/introspection forwards: per-stage norms + attention-weight output.

(reference: Decoder::forward_traced at src/model/decoder.rs:1655 — emits L2
norms per stage, the numerical-debugging workhorse — and the
attention-weight output mode needed by the word-timestamp aligner,
src/timestamps/alignment.rs:223.)

These run the blocks as a Python loop (not scan) so per-layer tensors can be
returned; they are debug paths, not the serving path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, linear, softmax
from .decoder import embed, project_to_vocab


def _layer_slice(tree, i):
    from ..ops.quant import QTensor, is_quantized

    def f(x):
        if is_quantized(x):
            scale = x.scale
            zero = x.zero
            return QTensor(x.q[i], scale[i] if scale.ndim == x.q.ndim else scale,
                           x.int4, x.orig_last, x.group,
                           zero=(zero[i] if zero is not None
                                 and zero.ndim == x.q.ndim else zero),
                           kpack=x.kpack)
        return x[i]
    return jax.tree_util.tree_map(
        f, tree, is_leaf=is_quantized)


def _mha_with_weights(q, k, v, n_heads, mask=None):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // n_heads
    qh = q.reshape(B, Tq, n_heads, hd) * (hd ** -0.5)
    kh = k.reshape(B, Tk, n_heads, hd)
    vh = v.reshape(B, Tk, n_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(vh.dtype), vh)
    return out.reshape(B, Tq, D), weights


def decoder_forward_traced(params: dict, tokens: jnp.ndarray,
                           enc_out: jnp.ndarray, config: ModelConfig
                           ) -> Tuple[jnp.ndarray, Dict[str, List[float]],
                                      jnp.ndarray]:
    """Teacher-forced forward returning (logits, per-stage L2 norms,
    cross-attention weights [L, B, H, T_text, T_audio]).

    (reference: decoder.rs:1655 forward_traced + attention-weight capture
    for src/timestamps/alignment.rs)
    """
    B, T = tokens.shape
    x = embed(params, tokens, 0)
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None, :, :]
    n_heads = config.n_text_head
    blocks = params["decoder"]["blocks"]

    norms: Dict[str, List[float]] = {"self_attn": [], "cross_attn": [], "ffn": []}
    cross_weights = []

    def l2(t):
        return float(jnp.sqrt(jnp.sum(t.astype(jnp.float32) ** 2)))

    for i in range(config.n_text_layer):
        blk = _layer_slice(blocks, i)
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        sa = blk["self_attn"]
        attn, _ = _mha_with_weights(
            linear(h, sa["q_w"], sa["q_b"]), linear(h, sa["k_w"], sa["k_b"]),
            linear(h, sa["v_w"], sa["v_b"]), n_heads, causal)
        x = x + linear(attn, sa["o_w"], sa["o_b"])
        norms["self_attn"].append(l2(x))

        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        ca = blk["cross_attn"]
        attn, w = _mha_with_weights(
            linear(h, ca["q_w"], ca["q_b"]),
            linear(enc_out, ca["k_w"], ca["k_b"]),
            linear(enc_out, ca["v_w"], ca["v_b"]), n_heads)
        cross_weights.append(w)
        x = x + linear(attn, ca["o_w"], ca["o_b"])
        norms["cross_attn"].append(l2(x))

        h = layer_norm(x, blk["ln3"]["w"], blk["ln3"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"])),
                   blk["fc2"]["w"], blk["fc2"]["b"])
        x = x + h
        norms["ffn"].append(l2(x))

    x = layer_norm(x, params["decoder"]["ln_post"]["w"],
                   params["decoder"]["ln_post"]["b"])
    logits = project_to_vocab(params, x)
    return logits, norms, jnp.stack(cross_weights)


def encoder_forward_traced(params: dict, mel: jnp.ndarray,
                           config: ModelConfig
                           ) -> Tuple[jnp.ndarray, List[Dict[str, float]]]:
    """Encoder forward emitting per-layer activation/attention metrics.

    Returns ``(enc_out, metrics)`` where ``metrics[i]`` holds the
    block-output mean/max |activation| and the self-attention entropy of
    layer ``i`` — the data the reference's TUI encoder panel tabulates
    (src/tui/app.rs:96 EncoderLayerMetrics, populated at app.rs:324).

    Python-loop debug path (one layer at a time so weights can be
    captured); the serving path stays the scanned `encoder.encode`.
    """
    from .encoder import conv_stem

    enc = params["encoder"]
    x = conv_stem(mel.astype(jnp.float32), enc["conv1"], enc["conv2"])
    x = x + enc["pos_emb"][None, : x.shape[1], :].astype(x.dtype)
    n_heads = config.n_audio_head

    metrics: List[Dict[str, float]] = []
    for i in range(config.n_audio_layer):
        blk = _layer_slice(enc["blocks"], i)
        h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
        a = blk["attn"]
        attn, w = _mha_with_weights(
            linear(h, a["q_w"], a["q_b"]), linear(h, a["k_w"], a["k_b"]),
            linear(h, a["v_w"], a["v_b"]), n_heads)
        x = x + linear(attn, a["o_w"], a["o_b"])
        h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
        h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"])),
                   blk["fc2"]["w"], blk["fc2"]["b"])
        x = x + h
        w = jnp.clip(w.astype(jnp.float32), 1e-12, 1.0)
        metrics.append({
            "layer": i,
            "mean_activation": float(jnp.mean(jnp.abs(x))),
            "max_activation": float(jnp.max(jnp.abs(x))),
            "attention_entropy": float(
                jnp.mean(-jnp.sum(w * jnp.log(w), axis=-1))),
        })
    out = layer_norm(x, enc["ln_post"]["w"], enc["ln_post"]["b"])
    return out, metrics
