"""Sampling + temperature-fallback tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config, small_specials
from whisper_apr_tpu import TranscribeOptions, WhisperApr
from whisper_apr_tpu.inference.sampling import (
    compression_ratio,
    needs_fallback,
    sample_generate,
)
from whisper_apr_tpu.model.decoder import greedy_generate
from whisper_apr_tpu.model.encoder import encode_jit
from whisper_apr_tpu.model.params import params_from_hf_model


@pytest.fixture(scope="module")
def cfg():
    return small_config()


@pytest.fixture(scope="module")
def setup(cfg):
    hf = make_hf_twin(cfg)
    params = params_from_hf_model(hf, cfg)
    enc = encode_jit(params, jnp.asarray(random_mel(cfg)), cfg, fidelity=True)
    return hf, params, enc


class TestSampleGenerate:
    def test_temperature_zero_equals_greedy(self, cfg, setup):
        _, params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        g, gl = greedy_generate(params, enc, prompt, bias, eot=eot,
                                config=cfg, max_len=14, prompt_len=3,
                                fidelity=True)
        s, sl, lp = sample_generate(
            params, enc, prompt, bias, eot, jax.random.PRNGKey(0),
            config=cfg, max_len=14, prompt_len=3, temperature=0.0,
            fidelity=True)
        assert np.array_equal(np.asarray(g), np.asarray(s))
        assert np.array_equal(np.asarray(gl), np.asarray(sl))
        # logprobs are finite and <= 0
        assert (np.asarray(lp) <= 0).all()

    def test_sampling_is_seeded_deterministic(self, cfg, setup):
        _, params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        a, _, _ = sample_generate(params, enc, prompt, bias, eot,
                                  jax.random.PRNGKey(7), config=cfg,
                                  max_len=12, prompt_len=3, temperature=0.8)
        b, _, _ = sample_generate(params, enc, prompt, bias, eot,
                                  jax.random.PRNGKey(7), config=cfg,
                                  max_len=12, prompt_len=3, temperature=0.8)
        c, _, _ = sample_generate(params, enc, prompt, bias, eot,
                                  jax.random.PRNGKey(8), config=cfg,
                                  max_len=12, prompt_len=3, temperature=0.8)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_top_k_restricts_support(self, cfg, setup):
        _, params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        # top_k=1 at any temperature == greedy
        s, _, _ = sample_generate(params, enc[:1], prompt, bias, eot,
                                  jax.random.PRNGKey(3), config=cfg,
                                  max_len=12, prompt_len=3, temperature=1.0,
                                  top_k=1, fidelity=True)
        g, _ = greedy_generate(params, enc[:1], prompt, bias, eot=eot,
                               config=cfg, max_len=12, prompt_len=3,
                               fidelity=True)
        assert np.array_equal(np.asarray(s), np.asarray(g))

    def test_top_p_runs(self, cfg, setup):
        _, params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        s, lengths, _ = sample_generate(
            params, enc[:1], prompt, bias, eot, jax.random.PRNGKey(1),
            config=cfg, max_len=12, prompt_len=3, temperature=0.9, top_p=0.9)
        assert (np.asarray(s) < cfg.n_vocab).all()


class TestQualityGates:
    def test_compression_ratio_flags_repetition(self):
        normal = "the birds can use the wind to fly south in winter"
        loop = "re" * 200
        assert compression_ratio(loop) > compression_ratio(normal)
        assert compression_ratio(loop) > 2.4

    def test_needs_fallback(self):
        assert needs_fallback("re" * 200, -10.0, 100)  # repetitive
        assert needs_fallback("fine text", -500.0, 10)  # bad logprob
        assert not needs_fallback("fine text here", -5.0, 10)

    def test_empty_text(self):
        assert compression_ratio("") == 0.0
        assert needs_fallback("", 0.0, 0)


class TestEngineSampling:
    def test_sampling_strategy(self, cfg, setup):
        hf, _, _ = setup
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        audio = np.random.default_rng(0).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(
            language="en", strategy="sampling", temperature=0.7,
            max_tokens=10, seed=42))
        assert len(r.tokens) <= 10

    def test_fallback_returns_result(self, cfg, setup):
        hf, _, _ = setup
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        audio = np.random.default_rng(1).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe_with_fallback(
            audio, TranscribeOptions(language="en", max_tokens=8),
            temperatures=(0.0, 0.5))
        assert r is not None


class TestBestOf:
    def test_best_of_runs_and_improves_or_matches(self, cfg, setup):
        hf, _, _ = setup
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        audio = np.random.default_rng(2).normal(0, 0.1, 4000).astype(np.float32)
        base = TranscribeOptions(language="en", strategy="sampling",
                                 temperature=0.9, max_tokens=10, seed=1)
        import dataclasses
        r1 = eng.transcribe(audio, base)
        r4 = eng.transcribe(audio, dataclasses.replace(base, best_of=4))
        assert len(r4.tokens) <= 10
        # deterministic under the same seed
        r4b = eng.transcribe(audio, dataclasses.replace(base, best_of=4))
        assert r4.tokens == r4b.tokens

    def test_best_of_batch_consistent(self, cfg, setup):
        hf, _, _ = setup
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        rng = np.random.default_rng(3)
        audios = [rng.normal(0, 0.1, 4000).astype(np.float32) for _ in range(2)]
        opts = TranscribeOptions(language="en", strategy="sampling",
                                 temperature=0.7, max_tokens=8, seed=2,
                                 best_of=3)
        batch = eng.transcribe_batch(audios, opts)
        assert len(batch.results) == 2
        for r in batch.results:
            assert all(t < cfg.n_vocab for t in r.tokens)
