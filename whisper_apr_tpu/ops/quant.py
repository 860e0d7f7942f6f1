"""Weight quantization: int8 (per-tensor / per-channel) and packed int4.

Mirrors the reference quantization semantics (reference: src/model/quantized.rs
— ``quantize_f32_to_i8`` :1732 scale=absmax/127, per-channel :1769,
``QuantizedTensorInt4``/``quantize_f32_to_i4_packed`` :1824/:1911,
``MixedPrecisionConfig`` :2221 int4 weights + f32 activations, error metrics
``quantization_error``/``compute_sqnr`` :2555/:2573) in a TPU-native form:

- a quantized weight is a ``QTensor`` — a registered JAX pytree node whose
  children are the int data + f32 scale and whose static aux carries the
  packing metadata, so quantized weights stack and slice under ``lax.scan``
  exactly like plain arrays
- dequantization happens INSIDE the jitted forward (``dequant``); XLA fuses
  the convert+scale into the consumer matmul, so HBM traffic is the
  int8/int4 bytes, not f32
- int4 packs two values per int8 byte along the LAST axis (low nibble =
  even index, mirroring the reference's pair packing, quantized.rs:1911-1960)

Quantizing layer-STACKED weights ``[L, ...]`` keeps a per-layer (and
optionally per-output-channel) scale with leading dim L so scan slicing
yields each layer's own scale.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Quantized weight: int data + scale (+ static packing metadata)."""

    def __init__(self, q, scale, int4: bool = False,
                 orig_last: Optional[int] = None,
                 group: Optional[int] = None,
                 zero: Optional[Any] = None,
                 kpack: bool = False) -> None:
        self.q = q
        self.scale = scale
        self.int4 = int4
        self.orig_last = orig_last
        # group-scale (block) quantization: scale has one entry per
        # ``group`` consecutive values along the K (second-to-last) axis —
        # the TPU-native analog of the reference's Q4_K super-block scales
        # (quantized.rs:355, realizar K-quant format)
        self.group = group
        # asymmetric (k-quant) zero point per group; exact Q4_K carries
        # ``d*ls`` in scale and ``dmin*lm`` here (ops/q4k.py)
        self.zero = zero
        # kpack: nibble pairs packed along the K axis (even rows in low
        # nibbles) instead of the last axis — the planar Q4_K layout
        self.kpack = kpack

    def tree_flatten(self) -> Tuple[tuple, tuple]:
        return ((self.q, self.scale, self.zero),
                (self.int4, self.orig_last, self.group, self.kpack))

    @classmethod
    def tree_unflatten(cls, aux, children) -> "QTensor":
        int4, orig_last, group, kpack = aux
        return cls(children[0], children[1], int4=int4,
                   orig_last=orig_last, group=group, zero=children[2],
                   kpack=kpack)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype

    @property
    def size(self):
        return self.q.size

    def __repr__(self) -> str:
        kind = "int4" if self.int4 else "int8"
        if self.group:
            kind = f"{kind}-g{self.group}"
        return f"QTensor({kind}, q={tuple(self.q.shape)})"


def is_quantized(w: Any) -> bool:
    return isinstance(w, QTensor)


def _scale_axes(w: np.ndarray, per_channel: bool, stacked: bool) -> tuple:
    """Axes reduced by absmax: everything except the layer axis (0, when
    stacked) and the channel axis (last, when per_channel)."""
    axes = list(range(w.ndim))
    if stacked and w.ndim > 1:
        axes.remove(0)
    if per_channel and w.ndim > 1 and (w.ndim - 1) in axes:
        axes.remove(w.ndim - 1)
    return tuple(axes) if axes else (0,)


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------

def quantize_int8(w: np.ndarray, per_channel: bool = False,
                  stacked: bool = False) -> QTensor:
    """Symmetric absmax int8 (reference: quantized.rs:1732 per-tensor,
    :1769 per-channel over output features of a ``[d_in, d_out]`` weight).
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim <= 1:
        per_channel = False
        stacked = False
    axes = _scale_axes(w, per_channel, stacked)
    absmax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QTensor(jnp.asarray(q), jnp.asarray(scale))


# ---------------------------------------------------------------------------
# int4 (packed pairs)
# ---------------------------------------------------------------------------

def quantize_int4(w: np.ndarray, per_channel: bool = False,
                  stacked: bool = False) -> QTensor:
    """Symmetric absmax int4 in [-7, 7], two values packed per byte along the
    last axis (reference: quantized.rs:1824-1960). Odd last dims are padded.
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim <= 1:
        per_channel = False
        stacked = False
    axes = _scale_axes(w, per_channel, stacked)
    absmax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)

    last = q.shape[-1]
    if last % 2:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
        q = np.pad(q, pad)
    lo = q[..., 0::2]  # even indices -> low nibble
    hi = q[..., 1::2]  # odd indices -> high nibble
    packed = ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.int8)
    return QTensor(jnp.asarray(packed), jnp.asarray(scale),
                   int4=True, orig_last=last)


def quantize_q4_block(w: np.ndarray, group: int = 32) -> QTensor:
    """Group-scale int4: one absmax scale per ``group`` consecutive values
    along the K axis (second-to-last), values packed two per byte.

    The TPU-native analog of the reference's Q4_K blocks (quantized.rs:355:
    256-value super-blocks with grouped scales via realizar). 4 bits/weight
    + one f32 scale per 32-group on K = ~5 bits/weight stored (f16 scales
    on disk would be 4.5); SQNR is substantially higher than per-channel
    int4 because outliers only poison their own 32-value block.

    w: [..., K, N] with K % group == 0 ->
    q packed [..., K, N/2-ish? NO — packs along last axis like int4],
    scale [..., K/group, N].
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim < 2:
        return quantize_int4(w)
    K, N = w.shape[-2], w.shape[-1]
    if K % group != 0:
        return quantize_int4(w, per_channel=True, stacked=w.ndim > 2)
    lead = w.shape[:-2]
    wg = w.reshape(lead + (K // group, group, N))
    absmax = np.max(np.abs(wg), axis=-2, keepdims=True)  # [..., K/g, 1, N]
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)
    q = q.reshape(lead + (K, N))

    # pack pairs along the LAST axis (same layout as quantize_int4)
    last = q.shape[-1]
    if last % 2:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
        q = np.pad(q, pad)
    lo = q[..., 0::2]
    hi = q[..., 1::2]
    packed = ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.int8)
    return QTensor(jnp.asarray(packed),
                   jnp.asarray(scale.reshape(lead + (K // group, N))),
                   int4=True, orig_last=last, group=group)


def _unpack_int4(packed: jnp.ndarray, orig_last: int) -> jnp.ndarray:
    """Packed int8 bytes -> int8 values in [-7, 7], original last dim."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8)
    hi = ((u >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,))
    return out[..., :orig_last]


# ---------------------------------------------------------------------------
# dequantization (inside jit)
# ---------------------------------------------------------------------------

def dequant(w, dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Plain array passes through; QTensor dequantizes (XLA fuses this into
    the consuming matmul — the dequant-matmul of quantized.rs:2501)."""
    if not is_quantized(w):
        return w.astype(dtype) if w.dtype != dtype else w
    if w.zero is not None and w.kpack:
        from .q4k import dequant_q4k
        return dequant_q4k(w, dtype)
    if w.zero is not None:
        # asymmetric group dequant, unpacked int8 plane (Q5_K planar form,
        # ops/kquants.py): x = q * scale - zero per K-group
        g = int(w.group)
        q = w.q
        K, N = q.shape[-2], q.shape[-1]
        scale = w.scale.astype(dtype)
        zero = w.zero.astype(dtype)
        while scale.ndim > q.ndim:
            scale = scale[0]
            zero = zero[0]
        # stored as int8 views of uint8 values in [0, 31]
        qg = q.astype(jnp.uint8).astype(dtype).reshape(
            q.shape[:-2] + (K // g, g, N))
        out = qg * scale[..., :, None, :] - zero[..., :, None, :]
        return out.reshape(q.shape[:-2] + (K, N))
    q = w.q
    if w.int4:
        q = _unpack_int4(q, int(w.orig_last))
    scale = w.scale.astype(dtype)
    if w.group:
        # block scales: [.., K/g, N] -> expand over each K-group
        g = int(w.group)
        K, N = q.shape[-2], q.shape[-1]
        while scale.ndim > q.ndim:
            scale = scale[0]
        qg = q.reshape(q.shape[:-2] + (K // g, g, N)).astype(dtype)
        out = qg * scale[..., :, None, :]
        return out.reshape(q.shape[:-2] + (K, N))
    # scan slicing drops the leading layer axis of q but scale keepdims
    # may still carry it; align ranks by squeezing extra leading 1s
    while scale.ndim > q.ndim:
        scale = scale[0]
    return q.astype(dtype) * scale


# ---------------------------------------------------------------------------
# error metrics (reference: quantized.rs:2555-2600)
# ---------------------------------------------------------------------------

def quantization_error(original: np.ndarray, dequantized: np.ndarray) -> float:
    """Mean absolute error (reference: quantized.rs:2555)."""
    a = np.asarray(original, np.float64)
    b = np.asarray(dequantized, np.float64)
    return float(np.mean(np.abs(a - b)))


def compute_sqnr(original: np.ndarray, dequantized: np.ndarray) -> float:
    """Signal-to-quantization-noise ratio in dB (reference: quantized.rs:2573)."""
    a = np.asarray(original, np.float64)
    b = np.asarray(dequantized, np.float64)
    signal = np.mean(a * a)
    noise = np.mean((a - b) ** 2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(signal / max(noise, 1e-30)))
