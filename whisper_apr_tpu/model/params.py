"""Parameter pytrees: schema, random init, and .apr / HF loading.

The model is purely functional — parameters live in nested dicts of jnp
arrays. Per-layer parameters are STACKED along a leading layer axis so the
transformer blocks run under one ``lax.scan`` (single compiled block body
regardless of depth — the TPU-idiomatic layout, unlike the reference's
per-layer structs at src/model/encoder.rs:372 / decoder.rs:1478).

Weight orientation: all linear weights are stored input-major ``[d_in,
d_out]`` (pre-transposed from HF/.apr row-major ``[out, in]``), mirroring the
reference's cached transpose (reference: src/model/attention.rs:96-105).

Tensor naming in .apr files follows the HF-derived names the reference loader
expects (reference: src/lib.rs:757-960 load_encoder_weights /
load_decoder_weights): ``encoder.conv1.weight``,
``encoder.layers.N.self_attn.q_proj.weight``, ``decoder.embed_tokens.weight``…
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..errors import ModelError
from ..format import AprReader

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Random initialization (for tests / fuzzing, reference: tests/pipeline_fuzz.rs)
# ---------------------------------------------------------------------------

def init_params(config: ModelConfig, seed: int = 0,
                dtype: jnp.dtype = jnp.float32) -> Params:
    """Random small-scale parameters with the full schema."""
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.normal(0.0, scale, size=shape), dtype=dtype)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    d_a, d_t = config.n_audio_state, config.n_text_state
    La, Lt = config.n_audio_layer, config.n_text_layer

    def attn_block(L, d, with_kb=False):
        return {
            "q_w": w(L, d, d), "q_b": zeros(L, d),
            "k_w": w(L, d, d), "k_b": zeros(L, d),
            "v_w": w(L, d, d), "v_b": zeros(L, d),
            "o_w": w(L, d, d), "o_b": zeros(L, d),
        }

    encoder = {
        "conv1": {"w": w(d_a, config.n_mels, 3), "b": zeros(d_a)},
        "conv2": {"w": w(d_a, d_a, 3), "b": zeros(d_a)},
        "pos_emb": jnp.asarray(
            sinusoidal_embedding(config.n_audio_ctx, d_a), dtype=dtype),
        "blocks": {
            "ln1": {"w": ones(La, d_a), "b": zeros(La, d_a)},
            "attn": attn_block(La, d_a),
            "ln2": {"w": ones(La, d_a), "b": zeros(La, d_a)},
            "fc1": {"w": w(La, d_a, 4 * d_a), "b": zeros(La, 4 * d_a)},
            "fc2": {"w": w(La, 4 * d_a, d_a), "b": zeros(La, d_a)},
        },
        "ln_post": {"w": ones(d_a), "b": zeros(d_a)},
    }
    decoder = {
        "token_emb": w(config.n_vocab, d_t),
        "pos_emb": w(config.n_text_ctx, d_t),
        "blocks": {
            "ln1": {"w": ones(Lt, d_t), "b": zeros(Lt, d_t)},
            "self_attn": attn_block(Lt, d_t),
            "ln2": {"w": ones(Lt, d_t), "b": zeros(Lt, d_t)},
            "cross_attn": attn_block(Lt, d_t),
            "ln3": {"w": ones(Lt, d_t), "b": zeros(Lt, d_t)},
            "fc1": {"w": w(Lt, d_t, 4 * d_t), "b": zeros(Lt, 4 * d_t)},
            "fc2": {"w": w(Lt, 4 * d_t, d_t), "b": zeros(Lt, d_t)},
        },
        "ln_post": {"w": ones(d_t), "b": zeros(d_t)},
    }
    return {"encoder": encoder, "decoder": decoder}


def sinusoidal_embedding(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal positional embedding
    (reference: src/model/encoder.rs:429 create_positional_embedding).
    """
    log_timescale = np.log(10_000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Loading from .apr
# ---------------------------------------------------------------------------

def _stack(loader: Callable[[int], np.ndarray], n: int) -> jnp.ndarray:
    return jnp.asarray(np.stack([loader(i) for i in range(n)]))


def load_params_from_apr(reader: AprReader,
                         dtype: jnp.dtype = jnp.float32,
                         keep_quantized: bool = False,
                         on_tensor: Optional[Callable[[str, int], None]] = None
                         ) -> Params:
    """Build the stacked parameter pytree from an .apr file.

    Mirrors the reference load path (reference: src/lib.rs:673
    load_from_apr -> load_encoder_weights :757 / load_decoder_weights :844)
    including the embed_positions/positional_embedding name fallbacks.

    ``keep_quantized=True`` on an int8 file keeps the matmul weights as int8
    QTensors with the FILE's per-tensor scales (no dequantize->requantize
    round trip; the reference instead always dequantizes on load,
    format/mod.rs:632); LN/bias/conv/pos tensors still load as f32.

    ``on_tensor(name, i)`` fires after each tensor read — the hook the
    engine's progress plumbing uses (reference: src/lib.rs:700
    load_from_apr_with_progress reports per-phase tensor progress).
    """
    _n_loaded = [0]

    def _count(name: str) -> None:
        _n_loaded[0] += 1
        if on_tensor is not None:
            on_tensor(name, _n_loaded[0])
    cfg = reader.header.to_model_config()
    file_quant = getattr(getattr(reader, "header", None),
                         "quantization", 0)
    native_int8 = bool(keep_quantized) and file_quant == 2
    # q4k files: block linears load bit-exact from the super-blocks
    # (ops/q4k.planar_from_raw); the token embedding (gathered, not
    # matmul'd) re-quantizes to per-channel int8 at load
    native_q4k = bool(keep_quantized) and file_quant == 4
    # q5k/q6k files: same bit-exact planar load (ops/kquants.py)
    native_q5k = bool(keep_quantized) and file_quant == 5
    native_q6k = bool(keep_quantized) and file_quant == 6

    def q_linear(name: str, d_in: int, d_out: int):
        """int8 weight straight from the file: transpose + file scale."""
        from ..ops.quant import QTensor
        raw = np.asarray(reader.load_raw(name)).reshape(d_out, d_in)
        q = np.ascontiguousarray(raw.T)  # [d_in, d_out] int8
        scale = np.float32(reader.scale_for(name))
        _count(name)
        return q, scale

    def get(name: str, *shape, transpose=False) -> np.ndarray:
        arr = reader.load_tensor(name)
        arr = arr.reshape(shape) if shape else arr
        if transpose:
            arr = np.ascontiguousarray(arr.T)
        _count(name)
        return arr

    def get_or(name: str, fallback: str) -> np.ndarray:
        try:
            arr = reader.load_tensor(name)
            _count(name)
            return arr
        except Exception:
            arr = reader.load_tensor(fallback)
            _count(fallback)
            return arr

    def j(arr: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(arr, dtype=dtype)

    d_a, d_t = cfg.n_audio_state, cfg.n_text_state
    La, Lt = cfg.n_audio_layer, cfg.n_text_layer

    def linear_w(prefix: str, d_in: int, d_out: int):
        # HF stores [out, in]; we pre-transpose to [in, out]
        return get(f"{prefix}.weight", d_out, d_in, transpose=True)

    def stack_w(prefix_fn: Callable[[int], str], L: int,
                d_in: int, d_out: int):
        """Stacked [L, d_in, d_out] weight — QTensor on native-quantized
        loads (int8 per-tensor scales, or bit-exact planar Q4_K)."""
        if native_int8:
            from ..ops.quant import QTensor
            pairs = [q_linear(f"{prefix_fn(i)}", d_in, d_out)
                     for i in range(L)]
            q = jnp.asarray(np.stack([p[0] for p in pairs]))
            scale = jnp.asarray(
                np.array([p[1] for p in pairs],
                         np.float32).reshape(L, 1, 1))
            return QTensor(q, scale)
        if (native_q4k or native_q5k or native_q6k) and d_in % 256 == 0:
            from ..ops.quant import QTensor
            if native_q4k:
                from ..ops.q4k import planar_from_raw
            elif native_q5k:
                from ..ops.kquants import \
                    planar_from_raw_q5k as planar_from_raw
            else:
                from ..ops.kquants import \
                    planar_from_raw_q6k as planar_from_raw
            def _raw(name: str) -> np.ndarray:
                arr = np.asarray(reader.load_raw(name))
                _count(name)
                return arr
            qts = [planar_from_raw(_raw(prefix_fn(i)), d_out, d_in)
                   for i in range(L)]
            zero = (jnp.stack([t.zero for t in qts])
                    if qts[0].zero is not None else None)
            return QTensor(
                jnp.stack([t.q for t in qts]),
                jnp.stack([t.scale for t in qts]),
                zero=zero, int4=qts[0].int4, group=qts[0].group,
                kpack=qts[0].kpack)
        # prefix_fn yields the FULL tensor name (incl. ".weight")
        return j(np.stack([get(prefix_fn(i), d_out, d_in, transpose=True)
                           for i in range(L)]))

    def linear_b(prefix: str, d_out: int, required=True):
        try:
            arr = reader.load_tensor(f"{prefix}.bias").reshape(d_out)
            _count(f"{prefix}.bias")
            return arr
        except Exception:
            if required:
                raise
            return np.zeros(d_out, np.float32)

    def attn(prefix_fn: Callable[[int], str], L: int, d: int):
        return {
            "q_w": stack_w(lambda i: f"{prefix_fn(i)}.q_proj.weight", L, d, d),
            "q_b": j(np.stack([linear_b(f"{prefix_fn(i)}.q_proj", d) for i in range(L)])),
            # whisper k_proj has no bias; absent in HF checkpoints
            "k_w": stack_w(lambda i: f"{prefix_fn(i)}.k_proj.weight", L, d, d),
            "k_b": j(np.stack([linear_b(f"{prefix_fn(i)}.k_proj", d, required=False)
                               for i in range(L)])),
            "v_w": stack_w(lambda i: f"{prefix_fn(i)}.v_proj.weight", L, d, d),
            "v_b": j(np.stack([linear_b(f"{prefix_fn(i)}.v_proj", d) for i in range(L)])),
            "o_w": stack_w(lambda i: f"{prefix_fn(i)}.out_proj.weight", L, d, d),
            "o_b": j(np.stack([linear_b(f"{prefix_fn(i)}.out_proj", d) for i in range(L)])),
        }

    def ln(prefix_fn: Callable[[int], str], L: int, d: int):
        return {
            "w": j(np.stack([get(f"{prefix_fn(i)}.weight", d) for i in range(L)])),
            "b": j(np.stack([get(f"{prefix_fn(i)}.bias", d) for i in range(L)])),
        }

    def fc(prefix_fn: Callable[[int], str], L: int, d_in: int, d_out: int):
        return {
            "w": stack_w(lambda i: f"{prefix_fn(i)}.weight", L, d_in, d_out),
            "b": j(np.stack([linear_b(prefix_fn(i), d_out) for i in range(L)])),
        }

    try:
        encoder = {
            "conv1": {"w": j(get("encoder.conv1.weight", d_a, cfg.n_mels, 3)),
                      "b": j(get("encoder.conv1.bias", d_a))},
            "conv2": {"w": j(get("encoder.conv2.weight", d_a, d_a, 3)),
                      "b": j(get("encoder.conv2.bias", d_a))},
            "pos_emb": j(get_or("encoder.embed_positions.weight",
                                "encoder.positional_embedding")
                         .reshape(cfg.n_audio_ctx, d_a)),
            "blocks": {
                "ln1": ln(lambda i: f"encoder.layers.{i}.self_attn_layer_norm", La, d_a),
                "attn": attn(lambda i: f"encoder.layers.{i}.self_attn", La, d_a),
                "ln2": ln(lambda i: f"encoder.layers.{i}.final_layer_norm", La, d_a),
                "fc1": fc(lambda i: f"encoder.layers.{i}.fc1", La, d_a, 4 * d_a),
                "fc2": fc(lambda i: f"encoder.layers.{i}.fc2", La, 4 * d_a, d_a),
            },
            "ln_post": {"w": j(get("encoder.layer_norm.weight", d_a)),
                        "b": j(get("encoder.layer_norm.bias", d_a))},
        }
        if native_int8:
            from ..ops.quant import QTensor
            te_name = ("decoder.embed_tokens.weight"
                       if reader.find_tensor("decoder.embed_tokens.weight")
                       else "decoder.token_embedding")
            token_emb = QTensor(
                jnp.asarray(np.asarray(reader.load_raw(te_name))
                            .reshape(cfg.n_vocab, d_t)),
                jnp.asarray(np.float32(reader.scale_for(te_name))))
            _count(te_name)
        elif native_q4k or native_q5k or native_q6k:
            from ..ops.quant import quantize_int8
            token_emb = quantize_int8(
                get_or("decoder.embed_tokens.weight",
                       "decoder.token_embedding").reshape(cfg.n_vocab, d_t),
                per_channel=True)
        else:
            token_emb = j(get_or("decoder.embed_tokens.weight",
                                 "decoder.token_embedding")
                          .reshape(cfg.n_vocab, d_t))
        decoder = {
            "token_emb": token_emb,
            "pos_emb": j(get_or("decoder.embed_positions.weight",
                                "decoder.positional_embedding")
                         .reshape(cfg.n_text_ctx, d_t)),
            "blocks": {
                "ln1": ln(lambda i: f"decoder.layers.{i}.self_attn_layer_norm", Lt, d_t),
                "self_attn": attn(lambda i: f"decoder.layers.{i}.self_attn", Lt, d_t),
                "ln2": ln(lambda i: f"decoder.layers.{i}.encoder_attn_layer_norm", Lt, d_t),
                "cross_attn": attn(lambda i: f"decoder.layers.{i}.encoder_attn", Lt, d_t),
                "ln3": ln(lambda i: f"decoder.layers.{i}.final_layer_norm", Lt, d_t),
                "fc1": fc(lambda i: f"decoder.layers.{i}.fc1", Lt, d_t, 4 * d_t),
                "fc2": fc(lambda i: f"decoder.layers.{i}.fc2", Lt, 4 * d_t, d_t),
            },
            "ln_post": {"w": j(get("decoder.layer_norm.weight", d_t)),
                        "b": j(get("decoder.layer_norm.bias", d_t))},
        }
    except Exception as e:  # noqa: BLE001 - surface as ModelError with tensor context
        raise ModelError(f"failed to load model weights: {e}") from e

    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Loading from a HF transformers state dict (offline test oracle + converter)
# ---------------------------------------------------------------------------

def hf_state_dict_to_apr_tensors(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Map HF WhisperForConditionalGeneration tensor names to .apr names.

    Strips the ``model.``/``proj_out`` wrappers, keeping the reference's
    expected names (reference: src/cli/model_loader.rs:237 map_tensor_name).
    """
    out: Dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor, dtype=np.float32)
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "proj_out.weight":
            continue  # tied to decoder.embed_tokens.weight
        out[name] = arr
    return out


def params_from_hf_model(hf_model, config: ModelConfig,
                         dtype: jnp.dtype = jnp.float32) -> Params:
    """Directly build params from a transformers WhisperModel /
    WhisperForConditionalGeneration (the offline numerics oracle,
    SURVEY.md §4 test-strategy translation (a)).
    """
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    tensors = hf_state_dict_to_apr_tensors(sd)

    class _DictReader:
        """Duck-typed AprReader over an in-memory dict."""

        def __init__(self, tensors: Dict[str, np.ndarray], cfg: ModelConfig):
            self._t = tensors
            self.header = type("H", (), {"to_model_config": lambda s: cfg})()

        def load_tensor(self, name: str) -> np.ndarray:
            if name not in self._t:
                raise ModelError(f"tensor not found: {name}")
            return self._t[name]

    return load_params_from_apr(_DictReader(tensors, config), dtype=dtype)  # type: ignore


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Runtime weight quantization (reference: src/model/quantized.rs
# QuantizedLinear :2426, QuantizedLinearInt4 :2027, MixedPrecisionLinear :2304)
# ---------------------------------------------------------------------------

def quantize_params(params: Params, mode: str = "int8",
                    per_channel: bool = True) -> Params:
    """Quantize the matmul weights of a loaded f32 tree.

    mode: "int8" — all linear weights + token embedding int8;
          "int4" — block linear weights int4, token embedding int8
                   (the reference's mixed-precision scheme);
          "q4"   — group-scale int4 (32-wide K blocks, symmetric) for
                   block linears, token embedding int8;
          "q4k"  — EXACT Q4_K super-block k-quants (asymmetric 6-bit
                   sub-scales, ops/q4k.py; reference: quantized.rs:355)
                   for block linears whose K axis is 256-aligned, q4
                   fallback otherwise, token embedding int8;
          "q5k" / "q6k" — the remaining exact k-quant formats
                   (ops/kquants.py; 5.5 / 6.5625 bits in .apr files,
                   int8-plane planar form on device), same 256-aligned
                   rule and q4 fallback, token embedding int8;
          "none" — pass through.
    Conv stem, LayerNorms, biases, and positional embeddings stay f32 (they
    are tiny and precision-critical), mirroring ``MixedPrecisionConfig``.
    """
    if mode == "none":
        return params
    if mode not in ("int8", "int4", "mixed", "q4", "q4k", "q5k", "q6k"):
        raise ValueError(f"unknown quantization mode: {mode}")
    from ..ops.quant import quantize_int4, quantize_int8, quantize_q4_block

    if mode in ("q4k", "q5k", "q6k"):
        from ..ops.q4k import QK_K, quantize_q4k
        from ..ops.kquants import quantize_q5k, quantize_q6k
        kq = {"q4k": quantize_q4k, "q5k": quantize_q5k,
              "q6k": quantize_q6k}[mode]

        def block_q(w, per_channel=True, stacked=False):
            w = np.asarray(w)
            if w.shape[-2] % QK_K == 0:
                return kq(w, stacked=stacked)
            return quantize_q4_block(w)
    elif mode == "q4":
        def block_q(w, per_channel=True, stacked=False):
            return quantize_q4_block(w)
    elif mode in ("int4", "mixed"):
        block_q = quantize_int4
    else:
        block_q = quantize_int8

    def q_blocks(blocks: dict) -> dict:
        out = {}
        for name, sub in blocks.items():
            if name.startswith("ln"):
                out[name] = sub
            elif name in ("fc1", "fc2"):
                out[name] = {"w": block_q(np.asarray(sub["w"]), per_channel,
                                          stacked=True),
                             "b": sub["b"]}
            else:  # attention groups
                new = {}
                for k, v in sub.items():
                    if k.endswith("_w"):
                        new[k] = block_q(np.asarray(v), per_channel,
                                         stacked=True)
                    else:
                        new[k] = v
                out[name] = new
        return out

    enc, dec = params["encoder"], params["decoder"]
    return {
        "encoder": {
            "conv1": enc["conv1"], "conv2": enc["conv2"],
            "pos_emb": enc["pos_emb"],
            "blocks": q_blocks(enc["blocks"]),
            "ln_post": enc["ln_post"],
        },
        "decoder": {
            # embedding always int8 per-channel (gather-friendly)
            "token_emb": quantize_int8(np.asarray(dec["token_emb"]), True),
            "pos_emb": dec["pos_emb"],
            "blocks": q_blocks(dec["blocks"]),
            "ln_post": dec["ln_post"],
        },
    }


def quantized_size_bytes(params: Params) -> int:
    """Device-resident weight bytes (int8/int4 leaves counted at their
    stored width)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
