"""Timestamp-grammar decoding tests + segment extraction.

(reference: src/timestamps/ extraction semantics; the decoding grammar is
OpenAI's ApplyTimestampRules, which whisper.cpp replicates.)
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config, small_specials
from whisper_apr_tpu import TranscribeOptions, WhisperApr
from whisper_apr_tpu.inference.timestamp_rules import (
    MAX_INITIAL_TIMESTAMP_STEPS,
    apply_rules,
    init_state,
    update_state,
)
from whisper_apr_tpu.model.decoder import greedy_generate
from whisper_apr_tpu.model.encoder import encode_jit
from whisper_apr_tpu.model.params import params_from_hf_model


@pytest.fixture(scope="module")
def cfg():
    # leave room for a timestamp region inside the small vocab
    return small_config()


TS_BASE = 800  # timestamps occupy [800, 1000) of the 1000-token test vocab


@pytest.fixture(scope="module")
def setup(cfg):
    hf = make_hf_twin(cfg)
    params = params_from_hf_model(hf, cfg)
    enc = encode_jit(params, jnp.asarray(random_mel(cfg)), cfg, fidelity=True)
    return params, enc


class TestRuleMasks:
    def test_first_token_must_be_early_timestamp(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 1000)).astype(np.float32))
        out = np.asarray(apply_rules(logits, init_state(2), TS_BASE, eot=999,
                                     is_first=jnp.ones(2, bool)))
        picks = out.argmax(-1)
        assert (picks >= TS_BASE).all()
        assert (picks <= TS_BASE + MAX_INITIAL_TIMESTAMP_STEPS).all()

    def test_opening_timestamp_forces_text(self):
        # right after <|t0|> (seq len 1) the next token must be TEXT
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 1000)).astype(np.float32))
        state = update_state(init_state(1), jnp.asarray([TS_BASE + 3]), TS_BASE)
        out = np.asarray(apply_rules(logits, state, TS_BASE, eot=999,
                                     is_first=jnp.zeros(1, bool)))
        assert out.argmax(-1)[0] < TS_BASE

    def test_closing_timestamp_forces_ts_or_eot(self):
        # "text <|t1|>" -> next must be a timestamp or EOT
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 1000)).astype(np.float32))
        s = init_state(1)
        s = update_state(s, jnp.asarray([TS_BASE + 1]), TS_BASE)  # opening
        s = update_state(s, jnp.asarray([7]), TS_BASE)            # text
        s = update_state(s, jnp.asarray([TS_BASE + 4]), TS_BASE)  # closing
        out = np.asarray(apply_rules(logits, s, TS_BASE, eot=999,
                                     is_first=jnp.zeros(1, bool)))
        pick = out.argmax(-1)[0]
        assert pick >= TS_BASE or pick == 999

    def test_pair_forces_text(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(1, 1000)).astype(np.float32))
        s = init_state(1)
        s = update_state(s, jnp.asarray([TS_BASE + 1]), TS_BASE)  # opening
        s = update_state(s, jnp.asarray([7]), TS_BASE)            # text
        s = update_state(s, jnp.asarray([TS_BASE + 3]), TS_BASE)  # close
        s = update_state(s, jnp.asarray([TS_BASE + 3]), TS_BASE)  # open
        out = np.asarray(apply_rules(logits, s, TS_BASE, eot=999,
                                     is_first=jnp.zeros(1, bool)))
        assert out.argmax(-1)[0] < TS_BASE

    def test_rule4_exact_tie_does_not_force(self):
        # rule 4 fires on STRICT inequality (OpenAI: timestamp_logprob >
        # max_text_logprob). Build an EXACT tie: one live text token and one
        # live timestamp token with bit-identical logits, everything else at
        # -1e9 (underflows out of both the logsumexp and the max), so
        # ts_lse == text_max to the bit and the text token must survive.
        logits = np.full((1, 1000), -1e9, np.float32)
        logits[0, 5] = 2.0          # text
        logits[0, TS_BASE + 50] = 2.0  # timestamp, same value
        s = update_state(init_state(1), jnp.asarray([5]), TS_BASE)
        out = np.asarray(apply_rules(jnp.asarray(logits), s, TS_BASE, 999,
                                     is_first=jnp.zeros(1, bool)))
        assert out[0, 5] > -1e8          # text NOT masked on the tie
        assert out.argmax(-1)[0] == 5
        # and a strictly heavier timestamp side must still force
        logits[0, TS_BASE + 50] = 2.5
        out = np.asarray(apply_rules(jnp.asarray(logits), s, TS_BASE, 999,
                                     is_first=jnp.zeros(1, bool)))
        assert out[0, 5] < -1e8
        assert out.argmax(-1)[0] == TS_BASE + 50

    def test_monotonic_timestamps(self):
        # a logits vector strongly preferring an EARLIER timestamp
        logits = np.zeros((1, 1000), np.float32)
        logits[0, TS_BASE + 2] = 10.0   # earlier than already-emitted max
        logits[0, TS_BASE + 30] = 5.0
        s = init_state(1)
        s = update_state(s, jnp.asarray([TS_BASE + 20]), TS_BASE)
        s = update_state(s, jnp.asarray([TS_BASE + 20]), TS_BASE)
        # after a pair text is forced; relax by simulating text last
        s = update_state(s, jnp.asarray([5]), TS_BASE)
        out = np.asarray(apply_rules(jnp.asarray(logits), s, TS_BASE, 999,
                                     is_first=jnp.zeros(1, bool)))
        # the earlier timestamp must be masked; if a ts is picked it's >= max
        pick = out.argmax(-1)[0]
        assert pick != TS_BASE + 2


class TestGreedyWithTimestamps:
    def test_stream_structure(self, cfg, setup):
        params, enc = setup
        prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        tokens, lengths, _, _ = greedy_generate(
            params, enc, prompt, bias, eot=cfg.n_vocab - 1, config=cfg,
            max_len=20, prompt_len=3, fidelity=True, timestamp_base=TS_BASE)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        for b in range(2):
            gen = tokens[b, 3: lengths[b]]
            gen = [t for t in gen if t != cfg.n_vocab - 1]
            if not gen:
                continue
            # first sampled token is an early timestamp
            assert gen[0] >= TS_BASE
            assert gen[0] <= TS_BASE + MAX_INITIAL_TIMESTAMP_STEPS
            # timestamps non-decreasing
            ts = [t for t in gen if t >= TS_BASE]
            assert ts == sorted(ts)

    def test_engine_timestamps_segments(self, cfg, setup):
        """Engine + real specials: segments must carry increasing times."""
        hf = make_hf_twin(cfg)
        sp = dataclasses.replace(small_specials(cfg), timestamp_base=TS_BASE)
        eng = WhisperApr.from_hf_model(hf, cfg, specials=sp)
        audio = np.random.default_rng(4).normal(0, 0.1, 6000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(
            language="en", max_tokens=16, timestamps=True))
        plen = len(eng.get_initial_tokens("en", "transcribe", timestamps=True))
        gen = r.tokens[plen:]
        if gen and gen[0] != sp.eot:
            assert gen[0] >= TS_BASE
        for s in r.segments:
            assert s.end >= s.start >= 0.0
