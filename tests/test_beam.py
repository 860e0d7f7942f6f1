"""Beam search tests (mirror reference: src/inference/beam.rs inline tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config, small_specials
from whisper_apr_tpu.inference.beam import beam_generate
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
    mel = random_mel(cfg)
    enc = encode_jit(params, jnp.asarray(mel), cfg, fidelity=True)
    return params, enc


def test_beam1_equals_greedy(cfg, setup):
    """beam_size=1 must reproduce greedy exactly (a sanity oracle)."""
    params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
    g_tokens, g_len, _, _ = greedy_generate(
        params, enc, prompt, bias, eot=eot, config=cfg, max_len=16,
        prompt_len=3, fidelity=True)
    b_tokens, b_len, _, _ = beam_generate(
        params, enc, prompt, bias, eot=eot, config=cfg, beam_size=1,
        max_len=16, prompt_len=3, fidelity=True)
    assert np.array_equal(np.asarray(g_tokens), np.asarray(b_tokens))
    assert np.array_equal(np.asarray(g_len), np.asarray(b_len))


def test_beam_score_at_least_greedy(cfg, setup):
    """The beam-5 winner's joint logprob must be >= the greedy path's."""
    params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)

    def path_score(tokens, length):
        """Recompute joint log-prob of a decoded path (teacher-forced)."""
        from whisper_apr_tpu.model.decoder import decoder_forward
        toks = jnp.asarray(tokens[None, :length])
        logits = np.asarray(decoder_forward(params, toks, enc[:1], cfg))
        lp = 0.0
        for i in range(2, length - 1):
            row = logits[0, i]
            row = row - np.log(np.exp(row - row.max()).sum()) - row.max()
            lp += row[tokens[i + 1]]
        return lp

    g_tokens, g_len, _, _ = greedy_generate(
        params, enc, prompt, bias, eot=eot, config=cfg, max_len=12,
        prompt_len=3, fidelity=True)
    b_tokens, b_len, _, _ = beam_generate(
        params, enc, prompt, bias, eot=eot, config=cfg, beam_size=4,
        max_len=12, prompt_len=3, fidelity=True)
    g = np.asarray(g_tokens)[0]
    b = np.asarray(b_tokens)[0]
    gs = path_score(g, int(np.asarray(g_len)[0]))
    bs = path_score(b, int(np.asarray(b_len)[0]))
    assert bs >= gs - 1e-3


def test_nbest_ordering(cfg, setup):
    params, enc = setup
    eot = cfg.n_vocab - 1
    prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
    bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
    tokens, lengths, _, _ = beam_generate(
        params, enc[:1], prompt, bias, eot=eot, config=cfg, beam_size=4,
        max_len=12, prompt_len=3, fidelity=True, return_nbest=True)
    assert tokens.shape == (1, 4, 12)
    assert lengths.shape == (1, 4)
    # beams must be distinct hypotheses
    rows = {tuple(r) for r in np.asarray(tokens)[0]}
    assert len(rows) > 1


def test_forced_eot_completes_all(cfg, setup):
    params, enc = setup
    eot = cfg.n_vocab - 1
    bias = np.full(cfg.n_vocab, np.finfo(np.float32).min, np.float32)
    bias[eot] = 0.0
    bias[7] = 0.0  # leave one ordinary token available
    prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
    tokens, lengths, _, _ = beam_generate(
        params, enc, prompt, jnp.asarray(bias), eot=eot, config=cfg,
        beam_size=3, max_len=10, prompt_len=3)
    # every sequence terminates with EOT well before max_len
    assert (np.asarray(lengths) <= 6).all()
