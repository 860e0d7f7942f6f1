"""Pipeline fuzzing: NaN/shape safety with synthetic weights and hostile inputs.

(reference: tests/pipeline_fuzz.rs:15-65 — synthetic-weight decoder fuzzing,
proptest regressions; src/tokenizer proptest roundtrips.)
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import small_config, small_specials
from whisper_apr_tpu import TranscribeOptions, WhisperApr
from whisper_apr_tpu.audio.mel import MelFilterbank
from whisper_apr_tpu.model.decoder import decoder_forward, greedy_generate
from whisper_apr_tpu.model.encoder import encode_jit
from whisper_apr_tpu.model.params import init_params
from whisper_apr_tpu.tokenizer import BpeTokenizer


@pytest.fixture(scope="module")
def cfg():
    return small_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, seed=7)


class TestDecoderFuzz:
    """Synthetic-weight forward passes must stay finite for hostile inputs
    (reference: pipeline_fuzz.rs:15 create_test_decoder + NaN checks)."""

    def test_random_token_sequences_finite(self, cfg, params):
        rng = np.random.default_rng(0)
        mel = rng.normal(size=(1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32)
        enc = encode_jit(params, jnp.asarray(mel), cfg)
        for seed in range(5):
            toks = np.random.default_rng(seed).integers(
                0, cfg.n_vocab, size=(1, 8)).astype(np.int32)
            logits = np.asarray(decoder_forward(params, jnp.asarray(toks), enc, cfg))
            assert np.isfinite(logits).all(), f"NaN/Inf at seed {seed}"

    def test_extreme_mel_values(self, cfg, params):
        for scale in (0.0, 1e-6, 1e3):
            mel = np.full((1, 2 * cfg.n_audio_ctx, cfg.n_mels), scale, np.float32)
            enc = np.asarray(encode_jit(params, jnp.asarray(mel), cfg))
            assert np.isfinite(enc).all(), f"NaN at mel scale {scale}"

    def test_greedy_on_garbage_weights_terminates(self, cfg, params):
        rng = np.random.default_rng(3)
        mel = rng.normal(size=(1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32)
        enc = encode_jit(params, jnp.asarray(mel), cfg)
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        tokens, lengths, _, _ = greedy_generate(
            params, enc, prompt, bias, eot=cfg.n_vocab - 1, config=cfg,
            max_len=16, prompt_len=3)
        assert (np.asarray(lengths) <= 16).all()
        assert (np.asarray(tokens) < cfg.n_vocab).all()


class TestAudioFuzz:
    def test_mel_hostile_audio(self):
        fb = MelFilterbank.create(80)
        cases = [
            np.full(16_000, 1e6, np.float32),            # clipping blast
            np.full(16_000, -1e6, np.float32),
            np.zeros(16_000, np.float32),                # silence
            np.random.default_rng(0).normal(0, 1e-30, 16_000).astype(np.float32),
        ]
        for audio in cases:
            mel = fb.compute(audio)
            assert np.isfinite(mel).all()

    def test_mel_nan_input_does_not_crash(self):
        fb = MelFilterbank.create(80)
        audio = np.zeros(16_000, np.float32)
        audio[100] = np.nan
        mel = fb.compute(audio)  # output may contain NaN but must not raise
        assert mel.shape[0] > 0

    def test_engine_various_lengths(self, cfg):
        eng = WhisperApr(cfg, init_params(cfg, 1),
                         specials=small_specials(cfg))
        opts = TranscribeOptions(language="en", max_tokens=6)
        for n in (400, 401, 7_919, 2 * cfg.n_audio_ctx * 160 + 13):
            r = eng.transcribe(np.zeros(n, np.float32), opts)
            assert isinstance(r.text, str)


class TestTokenizerFuzz:
    """Roundtrip property over random byte content (reference: proptests)."""

    def test_arbitrary_bytes_roundtrip(self):
        t = BpeTokenizer.with_base_tokens()
        rng = np.random.default_rng(0)
        for _ in range(25):
            n = int(rng.integers(0, 200))
            raw = bytes(rng.integers(0, 256, size=n).tolist())
            text = raw.decode("utf-8", errors="replace")
            assert t.decode(t.encode(text)) == text

    def test_long_merge_chains(self):
        from whisper_apr_tpu.tokenizer import Vocabulary
        v = Vocabulary.with_base_tokens()
        # build a deep merge chain: a, aa, aaaa, ...
        prev = b"a"
        for _ in range(6):
            merged = prev + prev
            v.add_token(merged)
            v.add_merge_rule(prev, prev)
            prev = merged
        t = BpeTokenizer(v)
        text = "a" * 64
        ids = t.encode(text)
        assert t.decode(ids) == text
        assert len(ids) == 1  # fully merged
