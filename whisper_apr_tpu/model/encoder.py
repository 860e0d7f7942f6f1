"""Whisper audio encoder: conv stem + pre-norm transformer blocks.

Mirrors the reference encoder semantics (reference: src/model/encoder.rs:372
Encoder, :27 Conv1d, :129 ConvFrontend, :346 EncoderBlock) in a TPU-native
formulation:

- the conv stem is two XLA 1-D convolutions (MXU-mapped), not scalar loops
  (reference hot loop: encoder.rs:84-107)
- all transformer blocks run under ONE ``lax.scan`` over stacked layer
  params — a single compiled block body regardless of depth
- attention heads are an einsum dimension (the reference forked rayon
  threads per head, attention.rs:831)

Input is frame-major mel ``[B, 3000, n_mels]`` (the layout the audio
front-end produces and the reference stores, mel.rs:298), output is
``[B, 1500, d_model]``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.basic import gelu, layer_norm, linear, mha

# fidelity-critical matmul precision (see audio/mel.py rationale)
_HIGHEST = jax.lax.Precision.HIGHEST


def conv_stem(mel: jnp.ndarray, conv1: dict, conv2: dict,
              precision=None) -> jnp.ndarray:
    """Two-layer conv frontend (reference: src/model/encoder.rs:129-185).

    conv1: n_mels->d, k=3, stride 1, pad 1, GELU
    conv2: d->d,     k=3, stride 2, pad 1, GELU  (halves 3000 -> 1500)

    mel: [B, T, n_mels] -> [B, T//2, d].

    Each conv runs as ONE MXU GEMM: the k=3 taps are stitched with plain
    slices into a ``[B, T_out, 3*C_in]`` tensor multiplied by the kernel
    reshaped ``[3*C_in, C_out]`` — the same slice-stitch trick the mel
    front-end uses (TPU gathers are pathological, slices are free, and a
    1-D NHC conv leaves layout-pass overhead that a GEMM does not; the
    round-2 encoder anatomy put the stem+glue at most of the 3x gap to
    the encoder's compute floor). Weights arrive in HF's [out, in, k].
    """
    def conv1d_gemm(x, w, b, stride):
        B, T, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        if stride == 1:
            taps = [jax.lax.slice_in_dim(xp, j, j + T, axis=1)
                    for j in range(3)]
            t_out = T
        else:
            t_out = T // 2
            taps = [jax.lax.slice(xp, (0, j, 0),
                                  (B, j + 2 * t_out - 1, C), (1, 2, 1))
                    for j in range(3)]
        x3 = jnp.concatenate(taps, axis=-1)            # [B, T_out, 3C]
        # w [C_out, C_in, K] -> [K, C_in, C_out] -> [3*C_in, C_out]
        kernel = jnp.transpose(w, (2, 1, 0)).reshape(3 * C, -1)
        y = jnp.matmul(x3, kernel.astype(x.dtype), precision=precision)
        return y + b.astype(x.dtype)

    x = gelu(conv1d_gemm(mel, conv1["w"], conv1["b"], 1))
    x = gelu(conv1d_gemm(x, conv2["w"], conv2["b"], 2))
    return x


def encoder_block(x: jnp.ndarray, blk: dict, n_heads: int,
                  precision=None, use_flash: bool = False) -> jnp.ndarray:
    """One pre-norm encoder block (reference: src/model/encoder.rs:346)."""
    h = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"])
    a = blk["attn"]
    q = linear(h, a["q_w"], a["q_b"], precision)
    k = linear(h, a["k_w"], a["k_b"], precision)
    v = linear(h, a["v_w"], a["v_b"], precision)
    if use_flash:
        from ..ops.flash_attention import mha_flash
        attn_out = mha_flash(q, k, v, n_heads)
    else:
        attn_out = mha(q, k, v, n_heads, precision=precision)
    x = x + linear(attn_out, a["o_w"], a["o_b"], precision)

    h = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"])
    h = linear(gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"], precision)),
               blk["fc2"]["w"], blk["fc2"]["b"], precision)
    return x + h


def encode(params: dict, mel: jnp.ndarray, config: ModelConfig,
           compute_dtype: jnp.dtype = jnp.float32,
           precision=None, use_flash: bool = False) -> jnp.ndarray:
    """Full encoder forward (reference: src/model/encoder.rs:450 forward /
    :566 forward_mel): conv stem -> +sinusoidal pos emb -> N blocks -> LN.

    mel: [B, n_frames, n_mels] -> [B, n_frames//2, d_model]
    """
    enc = params["encoder"]
    mel = mel.astype(compute_dtype)
    x = conv_stem(mel, enc["conv1"], enc["conv2"], precision)
    x = x + enc["pos_emb"][None, : x.shape[1], :].astype(compute_dtype)

    n_heads = config.n_audio_head

    def body(carry, blk):
        return encoder_block(carry, blk, n_heads, precision, use_flash), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"]["w"], enc["ln_post"]["b"])


@functools.partial(jax.jit, static_argnames=("config", "compute_dtype",
                                              "fidelity", "use_flash"))
def encode_jit(params: dict, mel: jnp.ndarray, config: ModelConfig,
               compute_dtype: jnp.dtype = jnp.float32,
               fidelity: bool = False, use_flash: bool = False) -> jnp.ndarray:
    """Jitted encoder entry; ``fidelity=True`` forces exact-f32 matmuls."""
    precision = _HIGHEST if fidelity else None
    return encode(params, mel, config, compute_dtype, precision, use_flash)
