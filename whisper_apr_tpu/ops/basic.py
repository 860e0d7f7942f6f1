"""Core compute primitives shared by encoder and decoder.

TPU-native replacements for the reference compute layer (reference:
src/simd.rs — matmul :234, softmax :324, gelu :350, layer_norm :403,
scaled_dot_product_attention :462). Each op is a pure jnp function XLA fuses
into the surrounding program; there is no dispatch layer because the MXU/VPU
split is the compiler's job.

Precision policy: LayerNorm statistics and softmax always accumulate in f32
regardless of the compute dtype (bf16 activations on the fast path); matmuls
take a ``precision`` argument so the fidelity path can force
``Precision.HIGHEST`` (f32-exact on MXU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # reference: src/model/encoder.rs:219 (LayerNorm eps)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = LN_EPS) -> jnp.ndarray:
    """Pre-norm LayerNorm (reference: src/model/encoder.rs:189-250).

    Statistics in f32 for bf16 inputs.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU matching HF Whisper's activation.

    The reference uses the tanh approximation (reference:
    src/model/encoder.rs:314); we match the HF/OpenAI original instead since
    HF is the fidelity oracle. The two differ by <1e-3 and identical argmax
    behavior in practice.
    """
    return jax.nn.gelu(x, approximate=False)


def linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None,
           precision=None) -> jnp.ndarray:
    """y = x @ w (+ b), with w stored input-major ``[d_in, d_out]``.

    The reference caches a transposed weight at load for the same reason
    (reference: src/model/attention.rs:96-105 finalize_weights). ``w`` may be
    a quantized ``{"q","scale"}`` leaf — dequantized in place, the XLA analog
    of the reference's dequant-matmul (quantized.rs:2501).
    """
    from .quant import dequant, is_quantized
    if is_quantized(w):
        from . import int4_matmul as i4
        from . import int8_matmul as i8
        if (not w.int4) and i8.USE_PALLAS_INT8 and \
                jax.default_backend() not in ("cpu",):
            # fused Pallas int8 dequant-matmul: the convert happens in VMEM
            # so HBM traffic stays at the int8 bytes (XLA materializes a
            # converted weight buffer instead)
            return i8.linear_int8(x, w, b)
        if w.int4 and i4.USE_PALLAS_INT4 and \
                jax.default_backend() not in ("cpu",):
            # fused Pallas dequant-matmul (opt-in): measured VPU-bound on
            # v5e single-stream decode — re-unpacking weights each step
            # costs more than int8's native HBM reads. Worth it only when
            # HBM capacity (not time) is the constraint.
            return i4.linear_int4(x, w, b)
        w = dequant(w, x.dtype)
    elif w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jnp.dot(x, w, precision=precision)
    if b is not None:
        # keep the compute dtype: a f32 bias must not silently upcast a
        # bf16 activation stream
        y = y + b.astype(y.dtype)
    return y


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax in f32 (reference: src/simd.rs:324)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    out = jax.nn.softmax(x32, axis=axis)
    return out.astype(orig_dtype)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        n_heads: int, mask: Optional[jnp.ndarray] = None,
        precision=None) -> jnp.ndarray:
    """Multi-head scaled-dot-product attention over projected q/k/v.

    q: [B, Tq, D], k/v: [B, Tk, D] -> [B, Tq, D].

    Heads are a vectorized einsum dimension (the reference forked rayon
    threads per head instead — reference: src/model/attention.rs:831).
    Scale is ``head_dim**-0.5`` applied to q (HF convention; the reference
    applies the same overall scaling inside its per-head loop at
    attention.rs:587-620).
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // n_heads
    qh = q.reshape(B, Tq, n_heads, hd) * (hd ** -0.5)
    kh = k.reshape(B, Tk, n_heads, hd)
    vh = v.reshape(B, Tk, n_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, precision=precision)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh, precision=precision)
    return out.reshape(B, Tq, D)


def causal_mask(t: int) -> jnp.ndarray:
    """Lower-triangular [1, 1, T, T] mask (reference: attention.rs:719)."""
    return jnp.tril(jnp.ones((t, t), dtype=bool))[None, None, :, :]
