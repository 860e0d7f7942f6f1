"""Speculative self-draft decode: token-exactness + acceptance sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config
from whisper_apr_tpu.inference.speculative import speculative_greedy_generate
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
    enc = encode_jit(params, jnp.asarray(random_mel(cfg))[:1], cfg,
                     fidelity=True)
    return params, enc


def test_token_exact_vs_greedy(cfg, setup):
    """Speculative output must be EXACTLY plain greedy's, no matter how bad
    the draft acceptance is (random weights make the early-exit draft
    nearly useless — the machinery must still never change a token)."""
    params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, jnp.float32)
    ref = greedy_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                          max_len=24, prompt_len=3, fidelity=True)
    for k, ld in ((2, 1), (4, 1), (3, 2)):
        spec = speculative_greedy_generate(
            params, enc, prompt, bias, eot=eot, config=cfg, max_len=24,
            prompt_len=3, draft_tokens=k, draft_layers=ld, fidelity=True)
        assert np.array_equal(np.asarray(spec.tokens), np.asarray(ref.tokens)), \
            (k, ld, np.asarray(spec.tokens), np.asarray(ref.tokens))
        assert np.array_equal(np.asarray(spec.lengths), np.asarray(ref.lengths))


def test_full_depth_draft_accepts_everything(cfg, setup):
    """With draft_layers == n_text_layer the draft IS the full model, so
    every draft must be accepted: verify passes ~ tokens/(k+1)."""
    params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
    # suppress EOT so the decode runs the full window deterministically
    bias = np.zeros(cfg.n_vocab, np.float32)
    bias[eot] = np.finfo(np.float32).min
    bias = jnp.asarray(bias)
    k = 3
    spec = speculative_greedy_generate(
        params, enc, prompt, bias, eot=eot, config=cfg, max_len=30,
        prompt_len=3, draft_tokens=k, draft_layers=cfg.n_text_layer,
        fidelity=True)
    n_ver = int(np.asarray(spec.n_verify_passes))
    n_acc = int(np.asarray(spec.n_accepted))
    assert n_ver > 0
    # all drafts accepted: m == k every round
    assert n_acc == n_ver * k
    ref = greedy_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                          max_len=30, prompt_len=3, fidelity=True)
    assert np.array_equal(np.asarray(spec.tokens), np.asarray(ref.tokens))


def test_engine_speculative_matches_plain(cfg, setup):
    from helpers import small_specials
    from whisper_apr_tpu import TranscribeOptions, WhisperApr
    params, _ = setup
    eng = WhisperApr(cfg, params, specials=small_specials(cfg))
    audio = np.random.default_rng(9).normal(0, 0.1, 4000).astype(np.float32)
    plain = eng.transcribe(audio, TranscribeOptions(language="en",
                                                    max_tokens=12))
    spec = eng.transcribe(audio, TranscribeOptions(
        language="en", max_tokens=12, speculative=True, draft_tokens=3))
    assert spec.tokens == plain.tokens
    assert spec.text == plain.text


def test_engine_speculative_gate_metrics(cfg, setup):
    """The speculative path accumulates the same quality-gate signals as
    plain greedy (round-2 weak item: it skipped them)."""
    from helpers import small_specials
    from whisper_apr_tpu import TranscribeOptions, WhisperApr
    params, _ = setup
    eng = WhisperApr(cfg, params, specials=small_specials(cfg))
    audio = np.random.default_rng(11).normal(0, 0.1, 4000).astype(np.float32)
    plain = eng.transcribe(audio, TranscribeOptions(language="en",
                                                    max_tokens=12))
    spec = eng.transcribe(audio, TranscribeOptions(
        language="en", max_tokens=12, speculative=True, draft_tokens=3))
    assert spec.tokens == plain.tokens
    assert spec.avg_logprob != 0.0
    assert abs(spec.avg_logprob - plain.avg_logprob) < 0.05, \
        (spec.avg_logprob, plain.avg_logprob)


def test_spec_study_acceptance_rises_with_structure():
    """The value-study harness: acceptance increases monotonically as late
    layers matter less (the early-exit premise)."""
    import sys
    sys.path.insert(0, "tools")
    from spec_study import measure_acceptance, structured_params
    from whisper_apr_tpu.config import ModelConfig
    cfg = ModelConfig(
        model_type="tiny", n_vocab=256, n_audio_ctx=16, n_audio_state=64,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=32, n_text_state=64,
        n_text_head=4, n_text_layer=4, n_mels=80)
    e_flat, _ = measure_acceptance(
        cfg, structured_params(cfg, 1.0, 1), 3, 1, n_clips=2, max_len=24)
    e_struct, _ = measure_acceptance(
        cfg, structured_params(cfg, 0.05, 1), 3, 1, n_clips=2, max_len=24)
    assert e_struct >= e_flat - 0.2, (e_flat, e_struct)
    assert e_struct > 1.0
