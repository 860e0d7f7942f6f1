"""k-quant fused per-block decode (ops/decode_blocks_kq.py).

Round-4 path: Q4_K/Q5_K/Q6_K models decode through the same three
per-block megakernels as int8 (self/cross/ffn), with in-kernel fused
group-dequant matvecs. Parity oracle: the scan path (decode_step_q)
through the byte-pinned standalone matvec kernels, itself pinned against
XLA dense dequant in tests/test_q4k.py / test_kquants.py.

Reference semantics: decoder block at src/model/decoder.rs:1478; fused
k-quant linear forward QuantizedLinearQ4K::forward_fused,
src/model/quantized.rs:355.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.model import qdecode
from whisper_apr_tpu.model.decoder import init_cache, prefill
from whisper_apr_tpu.model.params import init_params, quantize_params

MODES = ("q4k", "q5k", "q6k")


def _cfg():
    # n_text_state must be a k-quant super-block multiple (256)
    return ModelConfig(
        model_type="tiny", n_vocab=512, n_audio_ctx=32,
        n_audio_state=256, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=16, n_text_state=256, n_text_head=4,
        n_text_layer=2, n_mels=80)


def _prep(mode, cfg, seed=7):
    pq = quantize_params(init_params(cfg, seed=seed), mode)
    if mode == "q4k":
        qd = qdecode.prepare_q4k_decode(pq, cfg)
    else:
        qd = qdecode.prepare_kq_decode(pq, cfg)
    assert qd is not None and qd["mode"] == mode
    return pq, qd


def _prefilled(pq, cfg, b=1, seed=0, max_len=8):
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(
        rng.normal(0, 0.5, (b, cfg.n_audio_ctx,
                            cfg.n_text_state)).astype(np.float32))
    prompt = jnp.full((b, 2), 5, jnp.int32)
    cache = init_cache(pq, enc, cfg, max_len=max_len)
    _, cache = prefill(pq, prompt, enc, cache, cfg)
    return cache


class TestStaticMode:
    def test_mode_is_static_and_jit_safe(self):
        """qd['mode'] must cross jit boundaries (the engine passes qd into
        the jitted decode bodies). Round-4 regression: a plain-str leaf
        crashes tracing, so prepare_* return a registered-static str."""
        cfg = _cfg()
        for mode in MODES:
            _, qd = _prep(mode, cfg)
            assert isinstance(qd["mode"], qdecode.StaticStr)

            @jax.jit
            def read(q_d):
                # static: the python string is visible at trace time
                assert str(q_d["mode"]) == mode
                return q_d["vocab_k_scale"] * 2

            np.testing.assert_allclose(np.asarray(read(qd)),
                                       np.asarray(qd["vocab_k_scale"]) * 2)

    def test_qf_supported_matrix(self):
        cfg = _cfg()
        _, qd = _prep("q4k", cfg)
        assert qdecode.qf_supported(qd, 1)
        assert not qdecode.qf_supported(qd, 2)
        assert not qdecode.qf_supported(None, 1)
        pi = quantize_params(init_params(cfg, seed=1), "int8")
        qdi = qdecode.prepare_qdecode(pi, cfg)
        assert qdecode.qf_supported(qdi, 1) and qdecode.qf_supported(qdi, 8)

    def test_kq_fused_rejects_batch(self):
        cfg = _cfg()
        pq, qd = _prep("q4k", cfg)
        cache = _prefilled(pq, cfg, b=2)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.zeros((2,), jnp.int32)
        with pytest.raises(NotImplementedError):
            qdecode.decode_step_qf(pq, qd, tok, jnp.int32(2), qc, cfg,
                                   interpret=True)


class TestFusedParity:
    @pytest.mark.parametrize("mode", MODES)
    def test_fused_matches_scan_bf16_kv(self, mode):
        """decode_step_qf (kq blocks, bf16 KV) vs decode_step_q over
        multiple steps — same weights, same cache evolution."""
        cfg = _cfg()
        pq, qd = _prep(mode, cfg)
        cache_a = _prefilled(pq, cfg)
        cache_b = _prefilled(pq, cfg)
        qc = qdecode.quantize_cache(cache_b, kv_int8=False)
        tok_a = tok_b = jnp.asarray(np.array([7], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache_a = qdecode.decode_step_q(
                pq, qd, tok_a, pos, cache_a, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                pq, qd, tok_b, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=3e-4)
            assert np.array_equal(np.asarray(la).argmax(-1),
                                  np.asarray(lb).argmax(-1))
            tok_a = tok_b = jnp.argmax(la, -1).astype(jnp.int32)

    @pytest.mark.parametrize("mode", ("q4k", "q6k"))
    def test_fused_int8_kv(self, mode):
        """int8 KV rows compose with k-quant weights: greedy choices must
        match the scan path (logits within row-quantization error)."""
        cfg = _cfg()
        pq, qd = _prep(mode, cfg)
        cache_a = _prefilled(pq, cfg)
        cache_b = _prefilled(pq, cfg)
        qc = qdecode.quantize_cache(cache_b, kv_int8=True)
        tok = jnp.asarray(np.array([7], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, cache_a = qdecode.decode_step_q(
                pq, qd, tok, pos, cache_a, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                pq, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-2, atol=3e-2)
            assert np.array_equal(np.asarray(la).argmax(-1),
                                  np.asarray(lb).argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    @pytest.mark.parametrize("mode", MODES)
    def test_fused_cross8_kv(self, mode):
        """cross8 (int8 CROSS cache only — the round-5 B=1 default) with
        k-quant weights: self rows stay on the exact branch, so the gate
        is logit closeness + argmax agreement vs the scan path."""
        cfg = _cfg()
        pq, qd = _prep(mode, cfg)
        cache_a = _prefilled(pq, cfg)
        cache_b = _prefilled(pq, cfg)
        qc = qdecode.quantize_cache(cache_b, mode="cross8")
        assert qc.self_ks is None and qc.cross_ks is not None
        tok = jnp.asarray(np.array([7], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, cache_a = qdecode.decode_step_q(
                pq, qd, tok, pos, cache_a, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                pq, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-2, atol=3e-2)
            assert np.array_equal(np.asarray(la).argmax(-1),
                                  np.asarray(lb).argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_deferred_writes_bit_identical(self):
        """DEFER_KV_WRITES only moves WHERE the new rows scatter; within
        the kq fused path the two schedules must be bit-identical."""
        cfg = _cfg()
        pq, qd = _prep("q4k", cfg)
        orig = qdecode.DEFER_KV_WRITES
        try:
            outs = {}
            for defer in (False, True):
                qdecode.DEFER_KV_WRITES = defer
                cache = _prefilled(pq, cfg)
                qc = qdecode.quantize_cache(cache, kv_int8=False)
                tok = jnp.asarray(np.array([7], np.int32))
                logits = []
                for step in range(2):
                    l, qc = qdecode.decode_step_qf(
                        pq, qd, tok, jnp.int32(2 + step), qc, cfg,
                        compute_dtype=jnp.float32, interpret=True)
                    logits.append(np.asarray(l))
                    tok = jnp.argmax(l, -1).astype(jnp.int32)
                outs[defer] = (logits, jax.tree_util.tree_map(
                    np.asarray, [f for f in qc if f is not None]))
            for a, b in zip(outs[False][0], outs[True][0]):
                np.testing.assert_array_equal(a, b)
            for a, b in zip(outs[False][1], outs[True][1]):
                np.testing.assert_array_equal(a, b)
        finally:
            qdecode.DEFER_KV_WRITES = orig

    def test_short_encoder_masking(self):
        """enc_len < padded cross length must exclude the same positions
        as the scan path's implicit (unpadded) length."""
        cfg = _cfg()
        pq, qd = _prep("q5k", cfg)
        cache_a = _prefilled(pq, cfg)
        cache_b = _prefilled(pq, cfg)
        qc = qdecode.quantize_cache(cache_b, kv_int8=False)
        tok = jnp.asarray(np.array([7], np.int32))
        la, _ = qdecode.decode_step_q(
            pq, qd, tok, jnp.int32(2), cache_a, cfg,
            compute_dtype=jnp.float32, interpret=True)
        lb, _ = qdecode.decode_step_qf(
            pq, qd, tok, jnp.int32(2), qc, cfg,
            compute_dtype=jnp.float32, interpret=True,
            enc_len=cfg.n_audio_ctx)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=3e-4, atol=3e-4)


class TestGreedyIntegration:
    def test_greedy_uses_fused_at_b1_and_scan_at_b2(self):
        """greedy_generate_body with a k-quant qd + qf_mode: B=1 rides the
        fused blocks, B=2 falls back to the scan step — and both produce
        the SAME tokens for the same (duplicated) input."""
        from whisper_apr_tpu.model.decoder import greedy_generate_body
        cfg = _cfg()
        pq, qd = _prep("q4k", cfg)
        rng = np.random.default_rng(3)
        enc1 = jnp.asarray(
            rng.normal(0, 0.5, (1, cfg.n_audio_ctx,
                                cfg.n_text_state)).astype(np.float32))
        enc2 = jnp.concatenate([enc1, enc1], axis=0)
        prompt1 = jnp.full((1, 2), 5, jnp.int32)
        prompt2 = jnp.full((2, 2), 5, jnp.int32)
        bias = jnp.zeros((cfg.n_vocab,), jnp.float32)
        orig = qdecode.INTERPRET
        qdecode.INTERPRET = True
        try:
            r1 = greedy_generate_body(
                pq, enc1, prompt1, bias, eot=3, config=cfg, max_len=8,
                prompt_len=2, compute_dtype=jnp.float32, qd=qd,
                qf_mode="bf16")
            r2 = greedy_generate_body(
                pq, enc2, prompt2, bias, eot=3, config=cfg, max_len=8,
                prompt_len=2, compute_dtype=jnp.float32, qd=qd,
                qf_mode="bf16")
        finally:
            qdecode.INTERPRET = orig
        t1 = np.asarray(r1.tokens)[0]
        t2 = np.asarray(r2.tokens)
        assert np.array_equal(t1, t2[0]) and np.array_equal(t1, t2[1])


class TestKqTranscode:
    """B>1 k-quant serving: one-time int8 transcode of the decoder block
    linears (qdecode.transcode_kq_to_int8) so batched decode rides the
    int8 megakernels — the reference's fused k-quant linears serve any M
    (quantized.rs:355); the transcode is the TPU answer (the in-kernel
    group-dequant is bandwidth-right at B=1 only)."""

    @pytest.mark.parametrize("mode", MODES)
    def test_transcode_supports_batched_fused(self, mode):
        cfg = _cfg()
        pq, qd = _prep(mode, cfg)
        assert not qdecode.qf_supported(qd, 8)      # kq fused is B=1-only
        qdt = qdecode.transcode_kq_to_int8(pq, cfg)
        assert qdt is not None
        assert str(qdt.get("mode", "int8")) == "int8"
        assert qdecode.qf_supported(qdt, 8)

    def test_transcode_sqnr_vs_kq_dequant(self):
        """int8 per-channel on top of the k-quant grid must stay close to
        the k-quant values themselves (>=30 dB — int8's own grid is ~40+;
        the transcode must not compound errors)."""
        from whisper_apr_tpu.ops.quant import compute_sqnr, dequant
        cfg = _cfg()
        pq, _ = _prep("q4k", cfg)
        qdt = qdecode.transcode_kq_to_int8(pq, cfg)
        # reconstruct the transcoded fc1 weight and compare against the
        # exact k-quant dequant of the same leaf
        want = np.asarray(dequant(pq["decoder"]["blocks"]["fc1"]["w"]))
        got = np.asarray(qdt["ffn"]["w1"]).astype(np.float32) \
            * np.asarray(qdt["ffn"]["s1"])
        sqnr = compute_sqnr(want, got)
        assert sqnr >= 30.0, sqnr

    def test_transcoded_step_tracks_kq_scan_step(self):
        """decode_step_qf at B=2 with the transcoded qd must track the
        exact k-quant scan step (argmax agreement + high cosine)."""
        cfg = _cfg()
        pq, qd = _prep("q4k", cfg)
        qdt = qdecode.transcode_kq_to_int8(pq, cfg)
        cache = _prefilled(pq, cfg, b=2)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7, 9], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                pq, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_qf(
                pq, qdt, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True,
                enc_len=cfg.n_audio_ctx)
            a, b = np.asarray(la), np.asarray(lb)
            cos = float((a * b).sum()
                        / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.99, cos
            assert np.array_equal(a.argmax(-1), b.argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_engine_routes_batched_kq_to_transcode(self):
        """engine._qd_for: B=1 -> the exact k-quant qd; B>1 -> the int8
        transcode (built once, cached)."""
        from tests.helpers import tiny_engine_kq
        eng = tiny_engine_kq(_cfg())
        qd1 = eng._qd_for(1)
        assert str(qd1.get("mode", "int8")) in ("q4k", "q5k", "q6k")
        qd8 = eng._qd_for(8)
        assert str(qd8.get("mode", "int8")) == "int8"
        assert eng._qd_for(8) is qd8   # cached
