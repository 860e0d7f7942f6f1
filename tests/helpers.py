"""Shared test fixtures: small random Whisper models (JAX + HF twins).

The offline numerics oracle (SURVEY.md §4): a random-init transformers
Whisper with identical weights validates every layer without network access.
"""

import dataclasses

import numpy as np

from whisper_apr_tpu.config import ModelConfig

V_TEST = 1000  # small vocab for tests


def small_specials(cfg: "ModelConfig"):
    """Special tokens fitted to a small test vocabulary (real Whisper ids
    like SOT=50258 would exceed it and be clamped by XLA gathers)."""
    from whisper_apr_tpu.tokenizer import SpecialTokens
    return SpecialTokens(
        eot=cfg.n_vocab - 1, sot=cfg.n_vocab - 2,
        lang_base=cfg.n_vocab - 110, transcribe=cfg.n_vocab - 3,
        no_timestamps=cfg.n_vocab - 4, timestamp_base=cfg.n_vocab + 1000,
        is_multilingual=False, translate=cfg.n_vocab - 5)


def small_config(**kw) -> ModelConfig:
    base = dict(
        model_type="tiny", n_vocab=V_TEST, n_audio_ctx=50, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=32, n_text_state=64,
        n_text_head=4, n_text_layer=2, n_mels=80)
    base.update(kw)
    return ModelConfig(**base)


def make_hf_twin(cfg: ModelConfig, seed: int = 0):
    """Random-init HF WhisperForConditionalGeneration matching ``cfg``."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(seed)
    hf_cfg = WhisperConfig(
        vocab_size=cfg.n_vocab, num_mel_bins=cfg.n_mels,
        encoder_layers=cfg.n_audio_layer,
        encoder_attention_heads=cfg.n_audio_head,
        decoder_layers=cfg.n_text_layer,
        decoder_attention_heads=cfg.n_text_head,
        d_model=cfg.n_audio_state,
        encoder_ffn_dim=4 * cfg.n_audio_state,
        decoder_ffn_dim=4 * cfg.n_text_state,
        max_source_positions=cfg.n_audio_ctx,
        max_target_positions=cfg.n_text_ctx,
        pad_token_id=cfg.n_vocab - 1, bos_token_id=cfg.n_vocab - 1,
        eos_token_id=cfg.n_vocab - 1,
        decoder_start_token_id=cfg.n_vocab - 1)
    return WhisperForConditionalGeneration(hf_cfg).eval()


def random_mel(cfg: ModelConfig, batch: int = 2, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    frames = cfg.n_audio_ctx * 2
    return rng.normal(size=(batch, frames, cfg.n_mels)).astype(np.float32)


def tiny_engine_kq(cfg: ModelConfig, mode: str = "q4k", seed: int = 7):
    """A WhisperApr engine over k-quant params with the qdecode fast path
    force-enabled (the CPU backend disables it by default) — for tests of
    the B>1 transcode routing (engine._qd_for)."""
    from whisper_apr_tpu.engine import WhisperApr
    from whisper_apr_tpu.model import qdecode
    from whisper_apr_tpu.model.params import init_params, quantize_params

    pq = quantize_params(init_params(cfg, seed=seed), mode)
    eng = WhisperApr(cfg, pq, specials=small_specials(cfg))
    if mode == "q4k":
        qd = qdecode.prepare_q4k_decode(pq, cfg)
    else:
        qd = qdecode.prepare_kq_decode(pq, cfg)
    assert qd is not None
    eng._qdecode_cache = qd
    return eng
