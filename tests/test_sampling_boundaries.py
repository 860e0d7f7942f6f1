"""Mutation killers for inference/sampling.py round-3e survivors:
quality-gate threshold boundaries, top-p cutoff inclusion, suppress-bias
sign, EOT/length accounting, and loop-bound edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config
from whisper_apr_tpu.inference.sampling import (_pick, compression_ratio,
                                                is_silence, needs_fallback,
                                                sample_generate)
from whisper_apr_tpu.model.decoder import greedy_generate
from whisper_apr_tpu.model.encoder import encode_jit
from whisper_apr_tpu.model.params import params_from_hf_model


# ------------------------------------------------- host-side quality gates

def test_no_speech_gate_is_strict():
    # no_speech_prob == threshold exactly: the gate does NOT fire, so the
    # low-logprob retry still happens
    assert needs_fallback("x", avg_lp=-5.0, n_tokens=1,
                          no_speech_prob=0.6, no_speech_thold=0.6) is True


def test_compression_gate_is_strict():
    text = "hello world, quite unique words here"
    thr = compression_ratio(text)
    assert needs_fallback(text, avg_lp=0.0, n_tokens=5,
                          compression_thold=thr) is False


def test_logprob_gate_is_strict():
    assert needs_fallback("unique words here", avg_lp=-1.0, n_tokens=5,
                          logprob_thold=-1.0) is False


def test_entropy_gate_fires_at_exactly_32_tokens():
    toks = [7] * 32                              # entropy exactly 0.0
    assert needs_fallback("unique words here", avg_lp=0.0, n_tokens=32,
                          entropy_thold=2.0, tokens=toks) is True
    # entropy == threshold exactly: strict < does not fire
    assert needs_fallback("unique words here", avg_lp=0.0, n_tokens=32,
                          entropy_thold=0.0, tokens=toks) is False


def test_is_silence_boundaries_are_strict():
    assert is_silence(0.6, -2.0) is False        # prob == thold: not silence
    assert is_silence(0.9, -1.0) is False        # lp == thold: not silence
    assert is_silence(0.61, -1.01) is True


# --------------------------------------------------------- _pick / top-p

def test_top_p_keeps_cutoff_token():
    # one dominant token: the smallest set with cum >= top_p is exactly
    # {peak}, and the cutoff token ITSELF stays in the support
    logits = jnp.zeros((1, 16), jnp.float32).at[0, 5].set(100.0)
    tok, lp = _pick(logits, jax.random.PRNGKey(0), temperature=1.0,
                    top_k=None, top_p=0.5)
    assert int(tok[0]) == 5
    assert np.isfinite(float(lp[0]))


def test_top_k_one_is_argmax():
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 32)).astype(np.float32))
    tok, _ = _pick(logits, jax.random.PRNGKey(1), temperature=1.0,
                   top_k=1, top_p=None)
    assert np.array_equal(np.asarray(tok),
                          np.asarray(jnp.argmax(logits, axis=-1)))


# ------------------------------------------------- sample_generate edges

@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    hf = make_hf_twin(cfg)
    params = params_from_hf_model(hf, cfg)
    enc = encode_jit(params, jnp.asarray(random_mel(cfg)), cfg,
                     fidelity=True)
    return cfg, params, enc


def test_immediate_eot_length_accounting(setup):
    # bias every non-EOT token to -1e9: the first sampled token IS EOT,
    # so lengths == prompt_len + 1 (the +bias sign and the idx >=
    # prompt_len EOT mask are both pinned by this)
    cfg, params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
    bias = jnp.full(cfg.n_vocab, -1e9, jnp.float32).at[eot].set(0.0)
    toks, lengths, _, _ = sample_generate(
        params, enc, prompt, bias, eot, jax.random.PRNGKey(0),
        config=cfg, max_len=10, prompt_len=3, temperature=0.0,
        fidelity=True)
    assert np.array_equal(np.asarray(lengths), [4, 4])
    assert np.all(np.asarray(toks)[:, 3] == eot)


def test_full_length_decode_matches_greedy_exactly(setup):
    # EOT suppressed: the decode fills max_len exactly; every slot incl.
    # the LAST must match greedy (kills loop-bound off-by-ones that
    # overwrite the final token with a phantom extra step)
    cfg, params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, jnp.float32).at[eot].set(-1e9)
    g, gl, _, _ = greedy_generate(params, enc, prompt, bias, eot=eot,
                                  config=cfg, max_len=12, prompt_len=3,
                                  fidelity=True)
    s, sl, _, _ = sample_generate(
        params, enc, prompt, bias, eot, jax.random.PRNGKey(0),
        config=cfg, max_len=12, prompt_len=3, temperature=0.0,
        fidelity=True)
    assert np.array_equal(np.asarray(g), np.asarray(s))
    assert np.array_equal(np.asarray(gl), np.asarray(sl))
    assert np.all(np.asarray(sl) == 12)


def test_sampling_qd_path_without_qf_mode(setup):
    # qd WITHOUT qf_mode must keep the plain KVCache (decode_step_q path);
    # coercing it through quantize_cache would hand the wrong cache type
    # to the per-token kernel step
    from whisper_apr_tpu.model.params import quantize_params
    from whisper_apr_tpu.model.qdecode import prepare_qdecode
    cfg, params, enc = setup
    qparams = quantize_params(params, "int8")
    qd = prepare_qdecode(qparams, cfg)
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, jnp.float32)
    toks, lengths, _, _ = sample_generate(
        qparams, enc[:1], prompt, bias, eot, jax.random.PRNGKey(0),
        config=cfg, max_len=8, prompt_len=3, temperature=0.0, qd=qd)
    assert np.asarray(toks).shape == (1, 8)
    assert 4 <= int(lengths[0]) <= 8
