"""HF Whisper checkpoint -> .apr converter.

(reference: tools/convert.rs — safetensors + vocab.json + merges.txt +
added_tokens.json + mel_filters download/parse at :160-310, GPT-2 byte
decode :481, tensor-name mapping via src/cli/model_loader.rs:237.)

Offline converter: takes a LOCAL HF model directory (no downloads — the
reference auto-downloads via hf-hub, which needs network; this framework's
loader accepts any directory produced by ``transformers`` save_pretrained or
``huggingface-cli download``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..config import ModelConfig
from ..errors import FormatError, ModelError
from ..format import AprWriter, MelFilterbankData, QUANT_F32, QUANT_INT8
from ..audio.mel import mel_filterbank
from ..model.params import hf_state_dict_to_apr_tensors
from ..tokenizer import Vocabulary


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load tensors from a .safetensors file (f16/bf16 -> f32, mirroring
    model_loader.rs:172-192)."""
    try:
        from safetensors.numpy import load_file
        return {k: np.asarray(v, dtype=np.float32)
                for k, v in load_file(path).items()}
    except ImportError:
        pass
    # fallback: torch loader handles bf16 which safetensors.numpy may not
    import torch
    from safetensors.torch import load_file as load_torch
    return {k: v.to(torch.float32).numpy()
            for k, v in load_torch(path).items()}


def _config_from_hf_json(cfg_json: dict) -> ModelConfig:
    """Map HF config.json fields onto ModelConfig."""
    d_model = cfg_json["d_model"]
    name_by_dims = {
        (384, 4): "tiny", (512, 6): "base", (768, 12): "small",
        (1024, 24): "medium", (1280, 32): "large",
    }
    model_type = name_by_dims.get(
        (d_model, cfg_json["encoder_layers"]), "tiny")
    if model_type == "large" and cfg_json.get("num_mel_bins", 80) == 128:
        model_type = ("large-v3-turbo"
                      if cfg_json.get("decoder_layers", 32) == 4
                      else "large-v3")
    return ModelConfig(
        model_type=model_type,
        n_vocab=cfg_json["vocab_size"],
        n_audio_ctx=cfg_json["max_source_positions"],
        n_audio_state=d_model,
        n_audio_head=cfg_json["encoder_attention_heads"],
        n_audio_layer=cfg_json["encoder_layers"],
        n_text_ctx=cfg_json["max_target_positions"],
        n_text_state=d_model,
        n_text_head=cfg_json["decoder_attention_heads"],
        n_text_layer=cfg_json["decoder_layers"],
        n_mels=cfg_json.get("num_mel_bins", 80),
    )


def convert_hf_to_apr(input_dir: str, output_path: str,
                      quantization: int = QUANT_F32,
                      container_version: int = 1) -> str:
    """Convert a local HF Whisper checkpoint directory to .apr.

    Expects: config.json, model.safetensors (or pytorch_model.bin),
    vocab.json + merges.txt (+ added_tokens.json). Embeds the exact slaney
    filterbank (computed; bit-matches OpenAI's mel_filters.npz).
    ``container_version=2`` writes the JSON-metadata APR v2 container
    (reference: src/format/mod.rs:46-50 aprender canonical format).
    """
    cfg_path = os.path.join(input_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise FormatError(f"missing config.json in {input_dir}")
    cfg_json = json.load(open(cfg_path))
    config = _config_from_hf_json(cfg_json)

    # tensors
    st_path = os.path.join(input_dir, "model.safetensors")
    if os.path.exists(st_path):
        sd = _load_safetensors(st_path)
    else:
        pt_path = os.path.join(input_dir, "pytorch_model.bin")
        if not os.path.exists(pt_path):
            raise FormatError("no model.safetensors or pytorch_model.bin found")
        import torch
        sd = {k: v.to(torch.float32).numpy()
              for k, v in torch.load(pt_path, map_location="cpu",
                                     weights_only=True).items()}
    tensors = hf_state_dict_to_apr_tensors(sd)

    if container_version == 2:
        from ..format.v2 import AprWriterV2
        writer = AprWriterV2.from_config(config, quantization=quantization)
    else:
        writer = AprWriter.from_config(config, quantization=quantization)
    for name, arr in sorted(tensors.items()):
        writer.add_tensor(name, arr)

    # vocabulary (reference: tools/convert.rs:375 parse_vocabulary)
    vocab_path = os.path.join(input_dir, "vocab.json")
    merges_path = os.path.join(input_dir, "merges.txt")
    if os.path.exists(vocab_path) and os.path.exists(merges_path):
        vocab_json = json.load(open(vocab_path))
        added = None
        added_path = os.path.join(input_dir, "added_tokens.json")
        if os.path.exists(added_path):
            added = json.load(open(added_path))
        merges = open(merges_path).read().splitlines()
        if merges and merges[0].startswith("#"):
            merges = merges[1:]
        vocab = Vocabulary.from_hf_files(vocab_json, merges, added)
        writer.set_vocabulary(vocab.to_bytes())

    # filterbank: exact slaney (bit-matches OpenAI's shipped npz)
    writer.set_mel_filterbank(MelFilterbankData(
        config.n_mels, 201, mel_filterbank(config.n_mels)))

    writer.write_file(output_path)
    return output_path
