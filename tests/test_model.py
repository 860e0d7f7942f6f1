"""Model core tests: HF parity oracle, KV-cache equivalence, greedy decode.

Mirrors the reference test strategy (SURVEY.md §4): batch-vs-incremental
logits equivalence (reference: tests/integration_transcribe.rs:305) and
per-stage HF comparisons (reference: examples/compare_encoder_hf.rs).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config
from whisper_apr_tpu.inference.processors import WhisperTokenSuppressor
from whisper_apr_tpu.model.decoder import (
    decode_step,
    decoder_forward,
    greedy_generate,
    init_cache,
    prefill,
)
from whisper_apr_tpu.model.encoder import encode_jit
from whisper_apr_tpu.model.params import (
    count_params,
    init_params,
    params_from_hf_model,
)


@pytest.fixture(scope="module")
def cfg():
    return small_config()


@pytest.fixture(scope="module")
def hf(cfg):
    return make_hf_twin(cfg)


@pytest.fixture(scope="module")
def params(hf, cfg):
    return params_from_hf_model(hf, cfg)


@pytest.fixture(scope="module")
def mel(cfg):
    return random_mel(cfg)


@pytest.fixture(scope="module")
def enc_out(params, mel, cfg):
    return encode_jit(params, jnp.asarray(mel), cfg, fidelity=True)


class TestHfParity:
    """Per-stage numerical parity vs transformers (the offline golden oracle)."""

    def test_encoder_matches_hf(self, hf, params, mel, cfg, enc_out):
        import torch
        with torch.no_grad():
            hf_enc = hf.model.encoder(
                torch.from_numpy(mel.transpose(0, 2, 1))
            ).last_hidden_state.numpy()
        ours = np.asarray(enc_out)
        assert np.abs(ours - hf_enc).max() < 1e-4

    def test_decoder_logits_match_hf(self, hf, params, mel, cfg, enc_out):
        import torch
        rng = np.random.default_rng(3)
        tokens = rng.integers(0, cfg.n_vocab, size=(2, 7))
        with torch.no_grad():
            out = hf.model(
                input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
                decoder_input_ids=torch.from_numpy(tokens))
            hf_logits = hf.proj_out(out.last_hidden_state).numpy()
        ours = np.asarray(decoder_forward(
            params, jnp.asarray(tokens.astype(np.int32)), enc_out, cfg))
        assert np.abs(ours - hf_logits).max() < 1e-3
        assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()

    def test_greedy_matches_hf_generate(self, hf, params, mel, cfg, enc_out):
        """Full decode-loop parity: our on-device greedy == torch greedy."""
        import torch
        prompt = np.array([[5, 6, 7], [5, 6, 7]], dtype=np.int64)
        eot = cfg.n_vocab - 1
        max_len = 16

        # hand-rolled torch greedy (same semantics as greedy.rs:119-143)
        with torch.no_grad():
            feats = torch.from_numpy(mel.transpose(0, 2, 1))
            enc_t = hf.model.encoder(feats).last_hidden_state
            toks = torch.from_numpy(prompt.copy())
            done = torch.zeros(2, dtype=torch.bool)
            while toks.shape[1] < max_len and not done.all():
                out = hf.model.decoder(input_ids=toks, encoder_hidden_states=enc_t)
                logits = hf.proj_out(out.last_hidden_state[:, -1])
                nxt = logits.argmax(-1)
                nxt = torch.where(done, torch.tensor(eot), nxt)
                toks = torch.cat([toks, nxt[:, None]], dim=1)
                done |= nxt == eot

        bias = jnp.zeros(cfg.n_vocab, dtype=jnp.float32)
        ours, lengths, _, _ = greedy_generate(
            params, enc_out, jnp.asarray(prompt.astype(np.int32)), bias,
            eot=eot, config=cfg, max_len=max_len, prompt_len=3, fidelity=True)
        ours = np.asarray(ours)
        ref = toks.numpy()
        assert (ours[:, : ref.shape[1]] == ref).all()


class TestKVCache:
    """Batch-vs-incremental equivalence: the KV-cache correctness oracle
    (reference: tests/integration_transcribe.rs:305)."""

    def test_incremental_matches_full(self, params, cfg, enc_out):
        rng = np.random.default_rng(4)
        T = 9
        tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(2, T)),
                             dtype=jnp.int32)
        full = np.asarray(decoder_forward(params, tokens, enc_out, cfg))

        cache = init_cache(params, enc_out, cfg, max_len=cfg.n_text_ctx)
        lg, cache = prefill(params, tokens[:, :3], enc_out, cache, cfg)
        assert np.abs(np.asarray(lg) - full[:, 2]).max() < 1e-4
        for i in range(3, T):
            lg, cache = decode_step(params, tokens[:, i], jnp.int32(i), cache, cfg)
            assert np.abs(np.asarray(lg) - full[:, i]).max() < 1e-4

    def test_prefill_lengths(self, params, cfg, enc_out):
        # prefill of length L == L single steps
        rng = np.random.default_rng(5)
        tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(2, 5)),
                             dtype=jnp.int32)
        cache_a = init_cache(params, enc_out, cfg, max_len=16)
        lg_a, _ = prefill(params, tokens, enc_out, cache_a, cfg)

        cache_b = init_cache(params, enc_out, cfg, max_len=16)
        for i in range(5):
            lg_b, cache_b = decode_step(params, tokens[:, i], jnp.int32(i),
                                        cache_b, cfg)
        assert np.abs(np.asarray(lg_a) - np.asarray(lg_b)).max() < 1e-4


class TestGreedySemantics:
    def test_eot_stops_and_pads(self, params, cfg, enc_out):
        # suppress everything except one low token and EOT: forces fast EOT
        eot = cfg.n_vocab - 1
        bias = np.full(cfg.n_vocab, np.finfo(np.float32).min, np.float32)
        bias[eot] = 0.0
        prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
        tokens, lengths, _, _ = greedy_generate(
            params, enc_out, prompt, jnp.asarray(bias), eot=eot, config=cfg,
            max_len=16, prompt_len=3)
        tokens = np.asarray(tokens)
        # first generated token must be EOT, length = prompt + 1
        assert (tokens[:, 3] == eot).all()
        assert (np.asarray(lengths) == 4).all()
        assert (tokens[:, 4:] == eot).all()

    def test_max_len_cap(self, params, cfg, enc_out):
        # suppress EOT: generation must run to max_len (greedy.rs cap semantics)
        eot = cfg.n_vocab - 1
        bias = np.zeros(cfg.n_vocab, np.float32)
        bias[eot] = np.finfo(np.float32).min
        prompt = jnp.asarray(np.full((2, 3), 5, np.int32))
        tokens, lengths, _, _ = greedy_generate(
            params, enc_out, prompt, jnp.asarray(bias), eot=eot, config=cfg,
            max_len=12, prompt_len=3)
        assert (np.asarray(lengths) == 12).all()
        assert not (np.asarray(tokens)[:, 3:] == eot).any()


class TestSuppressor:
    def test_default_suppression_set(self):
        s = WhisperTokenSuppressor(n_vocab=51_865)
        b = s.bias()
        neg = np.finfo(np.float32).min
        # specials (reference: processors.rs:63-71 — the constants, not the
        # doc comment, which lists shifted ids): SOT, NO_SPEECH, TRANSLATE,
        # TRANSCRIBE, PREV, SPEAKER_TURN, NO_TIMESTAMPS
        for t in (50258, 50362, 50358, 50359, 50361, 50360, 50363):
            assert b[t] == neg
        # EOT must never be suppressed or decoding cannot stop
        assert b[50257] == 0.0
        # language tokens
        assert (b[50259:50358] == neg).all()
        # timestamps
        assert (b[50364:] == neg).all()
        # normal text tokens untouched
        assert b[:50257].max() == 0.0 and b[:50257].min() == 0.0

    def test_timestamps_not_suppressed(self):
        b = WhisperTokenSuppressor(suppress_timestamps=False, n_vocab=51_865).bias()
        assert (b[50364:] == 0).all()

    def test_apply_matches_bias(self):
        s = WhisperTokenSuppressor(n_vocab=51_865)
        logits = np.random.default_rng(0).normal(size=51_865).astype(np.float32)
        applied = s.apply(logits)
        via_bias = logits + s.bias()
        # -inf vs min-float both yield identical argmax ordering
        assert applied.argmax() == via_bias.argmax()
        assert np.isneginf(applied[50258])  # SOT suppressed
        assert np.isfinite(applied[50257])  # EOT untouched

    def test_apply_ignores_out_of_range_ids(self):
        """apply() on logits NARROWER than n_vocab must skip ids outside
        the row instead of indexing out of bounds (mutation survivors:
        `0 <= t < n` flipped to `or`/`<=` both turn out-of-range suppress
        ids into an IndexError — including the t == n boundary)."""
        s = WhisperTokenSuppressor(n_vocab=51_865)
        # suppress_ids span 50258..50363; cut the row INSIDE that span so
        # both sides exist, with the boundary id t == n exercised too
        n = 50_300
        assert n in s.suppress_ids     # the t == n boundary case is live
        logits = np.zeros(n, dtype=np.float32)
        applied = s.apply(logits)          # must not raise
        assert applied.shape == (n,)
        in_range = [t for t in s.suppress_ids if t < n]
        assert in_range and all(np.isneginf(applied[t]) for t in in_range)
        assert np.isfinite(applied[50_257])  # EOT still untouched


class TestParams:
    def test_init_params_schema(self, cfg):
        p = init_params(cfg)
        assert p["encoder"]["blocks"]["attn"]["q_w"].shape == (2, 64, 64)
        assert p["decoder"]["token_emb"].shape == (cfg.n_vocab, 64)
        assert count_params(p) > 0

    def test_sinusoidal_pos_emb(self, cfg):
        from whisper_apr_tpu.model.params import sinusoidal_embedding
        pe = sinusoidal_embedding(50, 64)
        assert pe.shape == (50, 64)
        assert abs(pe[0, 0]) < 1e-6      # sin(0) = 0
        assert abs(pe[0, 32] - 1) < 1e-6  # cos(0) = 1


class TestFlashAttention:
    """Pallas flash attention vs the einsum path (interpret mode on CPU)."""

    def test_flash_matches_mha(self):
        import jax
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.basic import mha
        from whisper_apr_tpu.ops.flash_attention import mha_flash
        rng = np.random.default_rng(0)
        B, T, H, hd = 2, 200, 4, 64
        q = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        out_flash = mha_flash(q, k, v, H, interpret=True)
        out_ref = mha(q, k, v, H)
        assert np.abs(np.asarray(out_flash) - np.asarray(out_ref)).max() < 1e-4

    def test_flash_causal(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.basic import causal_mask, mha
        from whisper_apr_tpu.ops.flash_attention import mha_flash
        rng = np.random.default_rng(1)
        B, T, H, hd = 1, 130, 2, 64  # crosses a 128 block boundary
        q = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, H * hd)).astype(np.float32))
        out_flash = mha_flash(q, k, v, H, causal=True, interpret=True)
        out_ref = mha(q, k, v, H, mask=causal_mask(T))
        assert np.abs(np.asarray(out_flash) - np.asarray(out_ref)).max() < 1e-4

    def test_encoder_with_flash(self, params, mel, cfg, enc_out):
        """Flash-enabled encoder must match the einsum encoder."""
        import jax
        from whisper_apr_tpu.model.encoder import encode
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = encode(params, jnp.asarray(mel), cfg, use_flash=True)
        assert np.abs(np.asarray(out) - np.asarray(enc_out)).max() < 1e-3


class TestWordTimestamps:
    def test_transcribe_with_word_timestamps(self, hf, cfg):
        from helpers import small_specials
        from whisper_apr_tpu import TranscribeOptions, WhisperApr
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        audio = np.random.default_rng(9).normal(0, 0.1, 6000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(
            language="en", max_tokens=10, word_timestamps=True))
        # random weights -> possibly empty words, but the path must run and
        # any produced word must carry ordered times
        for w in r.words:
            assert w.end >= w.start >= 0.0
