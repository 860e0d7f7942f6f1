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


def host_beam(params, enc, prompt, cfg, beam_size, max_len, prompt_len,
              length_penalty=1.0):
    """Transparent host-side beam with the SAME rules as beam_generate:
    joint top-K over (beam, token) raw cumulative scores, finished beams
    frozen (extend with EOT at zero cost), final pick by
    score / len^length_penalty (reference normalized_score, beam.rs:45).
    Uses teacher-forced decoder_forward as the logits oracle."""
    import jax
    from whisper_apr_tpu.model.decoder import decoder_forward

    eot = cfg.n_vocab - 1
    V = cfg.n_vocab
    beams = [(list(np.asarray(prompt)[0]), 0.0, False)]
    # first expansion: only the root is alive
    while True:
        lens = [len(t) for t, _, _ in beams]
        if min(lens) >= max_len or all(d for _, _, d in beams):
            break
        cands = []
        for bi, (toks, score, done) in enumerate(beams):
            if done or len(toks) >= max_len:
                cands.append((score, bi, eot, True))
                continue
            logits = decoder_forward(
                params, jnp.asarray(np.asarray(toks, np.int32)[None]),
                enc[:1], cfg, precision=jax.lax.Precision.HIGHEST)
            logp = np.asarray(jax.nn.log_softmax(
                logits[0, -1].astype(jnp.float32)))
            for tok in np.argsort(-logp)[: beam_size].tolist():
                cands.append((score + float(logp[tok]), bi, tok, False))
        cands.sort(key=lambda c: -c[0])
        new_beams = []
        for score, bi, tok, was_done in cands[:beam_size]:
            toks, _, done = beams[bi]
            if was_done:
                new_beams.append((toks, score, True))
            else:
                new_beams.append((toks + [tok], score, tok == eot))
        beams = new_beams
    best, best_norm = None, -np.inf
    for toks, score, done in beams:
        norm = score / (len(toks) ** length_penalty)
        if norm > best_norm:
            best, best_norm = toks, norm
    return best, best_norm


class TestBeamSemantics:
    def test_matches_host_reference(self, cfg, setup):
        """On-device beam (gathered caches, joint top-k) must agree with the
        transparent host implementation on the best hypothesis."""
        params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
        res = beam_generate(params, enc[:1], prompt, bias, eot=eot,
                            config=cfg, beam_size=3, max_len=12,
                            prompt_len=3, fidelity=True, patience=0.0)
        dev = np.asarray(res.tokens)[0, : np.asarray(res.lengths)[0]].tolist()
        host, host_norm = host_beam(params, enc, prompt, cfg, beam_size=3,
                                    max_len=12, prompt_len=3)
        assert dev == host
        dev_norm = float(np.asarray(res.sum_logprob)[0]) / len(dev)
        assert dev_norm == pytest.approx(host_norm, abs=2e-3)

    def test_nbest_ordering_and_score_integrity(self, cfg, setup):
        import jax
        from whisper_apr_tpu.model.decoder import decoder_forward
        params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
        res = beam_generate(params, enc[:1], prompt, bias, eot=eot,
                            config=cfg, beam_size=4, max_len=10, prompt_len=3,
                            fidelity=True, patience=0.0, return_nbest=True)
        toks = np.asarray(res.tokens)[0]
        lens = np.asarray(res.lengths)[0]
        scores = np.asarray(res.sum_logprob)[0]
        norm = scores / lens.astype(np.float64)
        assert (np.diff(norm) <= 1e-5).all()  # sorted best-first
        # score integrity: the best beam's score equals the sum of
        # teacher-forced per-token logprobs of the returned sequence
        seq = toks[0, : lens[0]].tolist()
        logits = decoder_forward(
            params, jnp.asarray(np.asarray(seq, np.int32)[None]), enc[:1],
            cfg, precision=jax.lax.Precision.HIGHEST)
        logp = np.asarray(jax.nn.log_softmax(
            logits[0].astype(jnp.float32), axis=-1))
        want = sum(float(logp[i - 1, seq[i]]) for i in range(3, len(seq)))
        assert scores[0] == pytest.approx(want, abs=5e-3)

    def test_patience_early_stop_triggers(self, cfg, setup):
        """With an aggressive patience the decode must stop early (shorter
        or equal outputs) and still return a completed-looking result."""
        params, enc = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
        eager = beam_generate(params, enc[:1], prompt, bias, eot=eot,
                              config=cfg, beam_size=3, max_len=14,
                              prompt_len=3, fidelity=True, patience=10.0)
        off = beam_generate(params, enc[:1], prompt, bias, eot=eot,
                            config=cfg, beam_size=3, max_len=14,
                            prompt_len=3, fidelity=True, patience=0.0)
        assert int(np.asarray(eager.lengths)[0]) <= int(np.asarray(off.lengths)[0]) + 14
        assert (np.asarray(eager.tokens) < cfg.n_vocab).all()
