"""Quantized decode fast path: Pallas qmatvec kernel vs the XLA path.

The kernel runs in interpret mode on the CPU backend; on TPU the engine
enables it automatically for int8 params (see engine._qdecode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.model import qdecode
from whisper_apr_tpu.model.decoder import (
    decode_step, greedy_generate, init_cache, prefill)
from whisper_apr_tpu.model.params import init_params, quantize_params
from whisper_apr_tpu.ops.qmatvec import qmatvec, qmatvec_stacked


@pytest.fixture(scope="module")
def cfg():
    # lane-aligned dims so the kernel path is representative
    return ModelConfig(
        model_type="tiny", n_vocab=700, n_audio_ctx=32, n_audio_state=128,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=24, n_text_state=128,
        n_text_head=4, n_text_layer=3, n_mels=80)


@pytest.fixture(scope="module")
def qsetup(cfg):
    params = quantize_params(init_params(cfg, seed=3), "int8")
    qd = qdecode.prepare_qdecode(params, cfg)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(0, 0.5, (2, cfg.n_audio_ctx,
                                          cfg.n_text_state)).astype(np.float32))
    return params, qd, enc


class TestQmatvecKernel:
    def test_matches_dequant_matmul(self):
        rng = np.random.default_rng(1)
        L, K, N = 3, 256, 384
        wq = rng.integers(-127, 128, (L, K, N), dtype=np.int8)
        s = (rng.random((L, 1, N)) * 0.02 + 1e-3).astype(np.float32)
        x = rng.normal(size=(2, K)).astype(np.float32)
        for l in range(L):
            got = np.asarray(qmatvec_stacked(
                jnp.asarray(x), jnp.asarray(wq), jnp.asarray(s), l,
                interpret=True))
            want = x @ (wq[l].astype(np.float32) * s[l])
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_out_dtype_and_per_tensor_scale(self):
        rng = np.random.default_rng(2)
        K, N = 128, 256
        wq = rng.integers(-127, 128, (K, N), dtype=np.int8)
        x = rng.normal(size=(1, K)).astype(np.float32)
        got = np.asarray(qmatvec(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.float32(0.01), interpret=True))
        want = x @ (wq.astype(np.float32) * 0.01)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestDecodeStepQ:
    def test_supports(self, cfg, qsetup):
        params, qd, _ = qsetup
        assert qd is not None
        assert qdecode.supports_qdecode(params, cfg)
        # f32 params do not qualify
        assert not qdecode.supports_qdecode(init_params(cfg, seed=0), cfg)

    def test_step_matches_xla_path(self, cfg, qsetup):
        params, qd, enc = qsetup
        cache_a = init_cache(params, enc, cfg, max_len=8)
        cache_b = init_cache(params, enc, cfg, max_len=8)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        _, cache_a = prefill(params, prompt, enc, cache_a, cfg)
        _, cache_b = prefill(params, prompt, enc, cache_b, cfg)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        la, cache_a = decode_step(params, tok, jnp.int32(2), cache_a, cfg)
        lb, cache_b = qdecode.decode_step_q(
            params, qd, tok, jnp.int32(2), cache_b, cfg,
            compute_dtype=jnp.float32, interpret=True)
        assert lb.shape == (2, cfg.n_vocab)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cache_a.self_k),
                                   np.asarray(cache_b.self_k),
                                   rtol=2e-4, atol=2e-4)

    def test_greedy_token_exact(self, cfg, qsetup):
        params, qd, enc = qsetup
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        eot = cfg.n_vocab - 1
        qdecode.INTERPRET = True
        try:
            fast = greedy_generate(
                params, enc, prompt, bias, eot=eot, config=cfg,
                max_len=12, prompt_len=2, qd=qd)
        finally:
            qdecode.INTERPRET = False
        ref = greedy_generate(params, enc, prompt, bias, eot=eot,
                              config=cfg, max_len=12, prompt_len=2)
        assert np.array_equal(np.asarray(fast.tokens), np.asarray(ref.tokens))
        assert np.array_equal(np.asarray(fast.lengths), np.asarray(ref.lengths))

    def test_greedy_fused_head_parity(self, cfg, qsetup):
        """The fused greedy head (while_loop tail = in-kernel vocab
        argmax+logsumexp, no [B, V] logits round-trip) must reproduce the
        logits-tail decode exactly: same tokens, lengths, no-speech prob,
        and sum_logprob (logp[argmax] == max - logsumexp). Real -inf
        suppressions exercise the bias fold."""
        params, qd, enc = qsetup
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        bias_np = np.zeros(cfg.n_vocab, np.float32)
        bias_np[[3, 17, 123]] = -np.inf
        bias = jnp.asarray(bias_np)
        eot = cfg.n_vocab - 1
        qdecode.INTERPRET = True
        try:
            on = greedy_generate(
                params, enc, prompt, bias, eot=eot, config=cfg,
                max_len=12, prompt_len=2, no_speech=3, qd=qd,
                qf_mode="bf16", fused_head=True)
            off = greedy_generate(
                params, enc, prompt, bias, eot=eot, config=cfg,
                max_len=12, prompt_len=2, no_speech=3, qd=qd,
                qf_mode="bf16", fused_head=False)
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(on.tokens), np.asarray(off.tokens))
        assert np.array_equal(np.asarray(on.lengths),
                              np.asarray(off.lengths))
        np.testing.assert_allclose(np.asarray(on.sum_logprob),
                                   np.asarray(off.sum_logprob),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(on.no_speech_prob),
                                   np.asarray(off.no_speech_prob),
                                   rtol=1e-6, atol=1e-6)


class TestQdecodeUnified:
    """The kernel path now serves multi-slot, sampling, and beam decodes."""

    def test_multi_pos_matches_decode_step_multi(self, cfg, qsetup):
        from whisper_apr_tpu.model.kv_variants import decode_step_multi
        params, qd, enc = qsetup
        cache_a = init_cache(params, enc, cfg, max_len=10)
        cache_b = init_cache(params, enc, cfg, max_len=10)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        _, cache_a = prefill(params, prompt, enc, cache_a, cfg)
        _, cache_b = prefill(params, prompt, enc, cache_b, cfg)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        pos = jnp.asarray(np.array([2, 2], np.int32))
        for _ in range(3):
            la, cache_a = decode_step_multi(params, tok, pos, cache_a, cfg)
            lb, cache_b = qdecode.decode_step_q(
                params, qd, tok, pos, cache_b, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-4, atol=2e-4)
            tok = jnp.argmax(lb, axis=-1).astype(jnp.int32)
            pos = pos + 1

    def test_multi_steps_with_qd_token_exact(self, cfg, qsetup):
        from whisper_apr_tpu.model.kv_variants import decode_steps_multi
        params, qd, enc = qsetup
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        cache_a = init_cache(params, enc, cfg, max_len=12)
        _, cache_a = prefill(params, prompt, enc, cache_a, cfg)
        cache_b = init_cache(params, enc, cfg, max_len=12)
        _, cache_b = prefill(params, prompt, enc, cache_b, cfg)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        pos = jnp.asarray(np.array([2, 2], np.int32))
        ref, _ = decode_steps_multi(params, tok, pos, bias, cache_a, cfg,
                                    n_steps=4)
        qdecode.INTERPRET = True
        try:
            fast, _ = decode_steps_multi(params, tok, pos, bias, cache_b,
                                         cfg, n_steps=4, qd=qd)
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(ref), np.asarray(fast))

    def test_sampling_with_qd_matches_greedy_qd(self, cfg, qsetup):
        import jax
        from whisper_apr_tpu.inference.sampling import sample_generate
        params, qd, enc = qsetup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            g = greedy_generate(params, enc, prompt, bias, eot=eot,
                                config=cfg, max_len=10, prompt_len=2, qd=qd)
            s = sample_generate(params, enc, prompt, bias, eot,
                                jax.random.PRNGKey(0), config=cfg,
                                max_len=10, prompt_len=2, temperature=0.0,
                                qd=qd)
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(g.tokens), np.asarray(s.tokens))

    def test_beam1_with_qd_matches_greedy_qd(self, cfg, qsetup):
        from whisper_apr_tpu.inference.beam import beam_generate
        params, qd, enc = qsetup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            g = greedy_generate(params, enc, prompt, bias, eot=eot,
                                config=cfg, max_len=10, prompt_len=2, qd=qd)
            b = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                              beam_size=1, max_len=10, prompt_len=2, qd=qd)
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(g.tokens), np.asarray(b.tokens))


class TestFusedDecode:
    """decode_step_qf: fused attention+o-proj Pallas step over QKVCache.

    bf16-KV mode must be bit-identical to decode_step_q (same matvec
    kernels, same f32 softmax — only the fusion boundary moves); int8-KV
    mode trades exactness for half the KV bandwidth and is gated on logit
    closeness + argmax agreement.
    """

    def _prefilled(self, cfg, qsetup, max_len=12):
        params, qd, enc = qsetup
        cache = init_cache(params, enc, cfg, max_len=max_len)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        _, cache = prefill(params, prompt, enc, cache, cfg)
        return params, qd, cache

    def test_bf16_mode_matches_decode_step_q(self, cfg, qsetup):
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_int8_kv_close_and_argmax_agrees(self, cfg, qsetup):
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=True)
        assert qc.self_kq.dtype == jnp.int8
        assert qc.self_kq.shape[2] % qdecode.SELF_BLOCK_T == 0
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            a, b = np.asarray(la), np.asarray(lb)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.999, cos
            assert np.array_equal(a.argmax(-1), b.argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_cross8_kv_close_and_argmax_agrees(self, cfg, qsetup):
        """kv mode "cross8": int8 CROSS cache only (the per-utterance-
        static bulk of B=1 step traffic), self rows kept bf16/f32 —
        the self path's int8 handling is what made full-int8 lose at B=1
        (BENCH_NOTES round 3). Self stays on the exact branch, so like
        int8 mode the gate is logit closeness + argmax agreement."""
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, mode="cross8")
        assert qc.self_ks is None and qc.self_kq.dtype != jnp.int8
        assert qc.cross_ks is not None and qc.cross_kq.dtype == jnp.int8
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            a, b = np.asarray(la), np.asarray(lb)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.999, cos
            assert np.array_equal(a.argmax(-1), b.argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_crossf8_kv_close_and_argmax_agrees(self, cfg, qsetup):
        """kv mode "crossf8": fp8 CROSS cache only, no scales — the same
        byte cut as cross8 with the scale-free f8->compute cast (the
        cheapest row decompression, BENCH_NOTES round 3). Self rows stay
        on the exact branch; fp8 cross rows carry ~2% error, so the gate
        is cosine closeness + argmax agreement (like full fp8)."""
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, mode="crossf8")
        assert qc.self_ks is None and qc.self_kq.dtype != jnp.float8_e4m3fn
        assert qc.cross_ks is None
        assert qc.cross_kq.dtype == jnp.float8_e4m3fn
        assert qc.cross_vq.dtype == jnp.float8_e4m3fn
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            a, b = np.asarray(la), np.asarray(lb)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.99, cos
            assert np.array_equal(a.argmax(-1), b.argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_fused_greedy_head_matches_logits_argmax(self, cfg, qsetup):
        """greedy_bias switches the step's vocab tail to the fused
        argmax+logsumexp kernel; token, max logit and logsumexp must
        match the logits path (same matvec, same f32 accumulation)."""
        from scipy.special import logsumexp
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        vp = qd["vocab_qT"].shape[2]
        rng = np.random.default_rng(5)
        bias = np.zeros((1, vp), np.float32)
        bias[0, rng.integers(0, cfg.n_vocab, 50)] = -np.inf  # suppressions
        gb = jnp.asarray(bias)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, _ = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            (tb, mx, lz), qc = qdecode.decode_step_qf(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True, greedy_bias=gb)
            ref = np.asarray(la) + bias[:, : cfg.n_vocab]
            assert np.array_equal(np.asarray(tb), ref.argmax(-1))
            np.testing.assert_allclose(np.asarray(mx), ref.max(-1),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(lz),
                                       logsumexp(ref, axis=-1),
                                       rtol=1e-5, atol=1e-5)
            tok = jnp.asarray(np.asarray(tb))

    def test_multi_pos_fused(self, cfg, qsetup):
        params, qd, cache = self._prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        pos_v = jnp.asarray(np.array([2, 2], np.int32))
        for _ in range(2):
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos_v, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos_v, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)
            pos_v = pos_v + 1

    def test_tile_bound_crossing(self):
        """Dynamic tile bounding: logits parity while pos crosses a
        64-row tile boundary (nt 1 -> 2) with a mostly-dead cache."""
        import jax.numpy as jnp
        cfg2 = ModelConfig(
            model_type="tiny", n_vocab=700, n_audio_ctx=32,
            n_audio_state=128, n_audio_head=4, n_audio_layer=2,
            n_text_ctx=160, n_text_state=128, n_text_head=4,
            n_text_layer=2, n_mels=80)
        params = quantize_params(init_params(cfg2, seed=7), "int8")
        qd = qdecode.prepare_qdecode(params, cfg2)
        rng = np.random.default_rng(1)
        enc = jnp.asarray(rng.normal(0, 0.5, (2, cfg2.n_audio_ctx,
                                              128)).astype(np.float32))
        cache = init_cache(params, enc, cfg2, max_len=160)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        _, cache = prefill(params, prompt, enc, cache, cfg2)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        pos_v = jnp.asarray(np.array([62, 3], np.int32))
        for _ in range(4):                   # max pos 62..65 crosses bt=64
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos_v, cache, cfg2,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                params, qd, tok, pos_v, qc, cfg2,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)
            pos_v = pos_v + 1

    def test_deferred_kv_writes_bit_identical(self, cfg, qsetup):
        """DEFER_KV_WRITES batches the per-layer row writes into one
        scatter per cache after the layer loop; logits AND caches must be
        bit-identical to the interleaved-write path (same kernel outputs,
        only the write schedule moves). Covers scalar-pos bf16 and
        multi-pos int8 (scales included)."""
        for kv_int8, multi in ((False, False), (True, True)):
            params, qd, cache = self._prefilled(cfg, qsetup)
            qc = qdecode.quantize_cache(cache, kv_int8=kv_int8)
            tok = jnp.asarray(np.array([7, 11], np.int32))
            pos = (jnp.asarray(np.array([2, 3], np.int32)) if multi
                   else jnp.int32(2))
            # run the interleaved path first, then the deferred path on an
            # identical copy (default-agnostic: force each mode explicitly)
            orig = qdecode.DEFER_KV_WRITES
            qdecode.DEFER_KV_WRITES = False
            try:
                la, qa = qdecode.decode_step_qf(
                    params, qd, tok, pos, qc, cfg,
                    compute_dtype=jnp.float32, interpret=True)
                qdecode.DEFER_KV_WRITES = True
                lb, qb = qdecode.decode_step_qf(
                    params, qd, tok, pos, qc, cfg,
                    compute_dtype=jnp.float32, interpret=True)
            finally:
                qdecode.DEFER_KV_WRITES = orig
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            for fa, fb in zip(qa, qb):
                if fa is None:
                    assert fb is None
                    continue
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb))

    def test_fp8_kv_mode(self, cfg, qsetup):
        """kv_mode="fp8": float8_e4m3fn caches, no scales, same tokens.

        fp8 reuses the bf16 kernel branch (tiles cast at read; rows
        written in the cache dtype) — see qdecode.quantize_cache."""
        import jax.numpy as jnp
        params, qd, enc = qsetup
        cache0 = init_cache(params, jnp.asarray(enc), cfg, max_len=16)
        qc = qdecode.quantize_cache(cache0, mode="fp8")
        assert qc.self_kq.dtype == jnp.float8_e4m3fn
        assert qc.self_ks is None and qc.cross_ks is None
        enc1 = enc[:1]
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        eot = cfg.n_vocab - 1
        qdecode.INTERPRET = True
        try:
            ref = greedy_generate(params, enc1, prompt, bias, eot=eot,
                                  config=cfg, max_len=12, prompt_len=2,
                                  qd=qd)
            f8 = greedy_generate(params, enc1, prompt, bias, eot=eot,
                                 config=cfg, max_len=12, prompt_len=2,
                                 qd=qd, qf_mode="fp8")
        finally:
            qdecode.INTERPRET = False
        # fp8 rows carry ~2% error; tokens must still agree on this rig
        assert np.array_equal(np.asarray(ref.tokens), np.asarray(f8.tokens))

    def test_greedy_qf_bf16_token_exact(self, cfg, qsetup):
        params, qd, enc = qsetup
        enc = enc[:1]  # B=1: the drivers use the fused step only
        # single-stream (B>1 falls back to the batched scan step)
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        eot = cfg.n_vocab - 1
        qdecode.INTERPRET = True
        try:
            ref = greedy_generate(params, enc, prompt, bias, eot=eot,
                                  config=cfg, max_len=12, prompt_len=2,
                                  qd=qd)
            fused = greedy_generate(params, enc, prompt, bias, eot=eot,
                                    config=cfg, max_len=12, prompt_len=2,
                                    qd=qd, qf_mode="bf16")
            fused8 = greedy_generate(params, enc, prompt, bias, eot=eot,
                                     config=cfg, max_len=12, prompt_len=2,
                                     qd=qd, qf_mode="int8")
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(ref.tokens),
                              np.asarray(fused.tokens))
        assert np.array_equal(np.asarray(ref.lengths),
                              np.asarray(fused.lengths))
        # int8 KV: same tokens on this rig (logits agree to ~1e-3)
        assert np.array_equal(np.asarray(ref.tokens),
                              np.asarray(fused8.tokens))

    def test_sampling_qf_matches_greedy_qf(self, cfg, qsetup):
        from whisper_apr_tpu.inference.sampling import sample_generate
        params, qd, enc = qsetup
        enc = enc[:1]  # B=1 exercises the fused step (see greedy test)
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            g = greedy_generate(params, enc, prompt, bias, eot=eot,
                                config=cfg, max_len=10, prompt_len=2,
                                qd=qd, qf_mode="bf16")
            s = sample_generate(params, enc, prompt, bias, eot,
                                jax.random.PRNGKey(0), config=cfg,
                                max_len=10, prompt_len=2, temperature=0.0,
                                qd=qd, qf_mode="bf16")
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(g.tokens), np.asarray(s.tokens))

    def test_beam1_qf_matches_greedy_qf(self, cfg, qsetup):
        from whisper_apr_tpu.inference.beam import beam_generate
        params, qd, enc = qsetup
        enc = enc[:1]  # B=1, beam(1): fused; beam(2) falls back to scan
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            g = greedy_generate(params, enc, prompt, bias, eot=eot,
                                config=cfg, max_len=10, prompt_len=2,
                                qd=qd, qf_mode="bf16")
            b = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                              beam_size=2, max_len=10, prompt_len=2,
                              qd=qd, qf_mode="bf16")
            b1 = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                               beam_size=1, max_len=10, prompt_len=2,
                               qd=qd, qf_mode="bf16")
        finally:
            qdecode.INTERPRET = False
        # beam(1) == greedy; beam(2) at least as good by raw score
        assert np.array_equal(np.asarray(g.tokens), np.asarray(b1.tokens))
        assert b.tokens.shape == g.tokens.shape

    def test_beam_cross_reorder_skip_token_exact(self, cfg, qsetup):
        """Beam with the XLA path (cross reorder skipped) still matches the
        scan-kernel beam output token-exactly."""
        from whisper_apr_tpu.inference.beam import beam_generate
        params, qd, enc = qsetup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            a = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                              beam_size=3, max_len=10, prompt_len=2, qd=qd)
        finally:
            qdecode.INTERPRET = False
        b = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                          beam_size=3, max_len=10, prompt_len=2)
        assert np.array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_beam2_qf_matches_scan_beam2(self, cfg, qsetup):
        """Beam K=2 with the fused step (batched kernels + QKVCache beam
        reorder) must match the scan-kernel beam token-exactly (f32)."""
        from whisper_apr_tpu.inference.beam import beam_generate
        params, qd, enc = qsetup
        enc = enc[:1]
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        qdecode.INTERPRET = True
        try:
            a = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                              beam_size=2, max_len=10, prompt_len=2,
                              qd=qd, qf_mode="bf16")
            b = beam_generate(params, enc, prompt, bias, eot=eot, config=cfg,
                              beam_size=2, max_len=10, prompt_len=2, qd=qd)
        finally:
            qdecode.INTERPRET = False
        assert np.array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
