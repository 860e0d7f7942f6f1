"""Quantization tests (mirror reference: src/model/quantized.rs inline tests
— SQNR bounds, roundtrip error, quantized forward sanity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config, small_specials
from whisper_apr_tpu.config import ComputeConfig
from whisper_apr_tpu.engine import TranscribeOptions, WhisperApr
from whisper_apr_tpu.model.params import (
    params_from_hf_model,
    quantize_params,
    quantized_size_bytes,
)
from whisper_apr_tpu.ops.quant import (
    compute_sqnr,
    dequant,
    is_quantized,
    quantization_error,
    quantize_int4,
    quantize_int8,
)


class TestInt8:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 64)).astype(np.float32)
        qt = quantize_int8(w)
        deq = np.asarray(dequant(qt))
        scale = np.abs(w).max() / 127.0
        assert np.abs(deq - w).max() <= scale / 2 + 1e-7

    def test_per_channel_better_than_per_tensor(self):
        rng = np.random.default_rng(1)
        # columns with wildly different scales
        w = rng.normal(size=(64, 8)).astype(np.float32)
        w *= np.logspace(-2, 2, 8, dtype=np.float32)[None, :]
        sq_pt = compute_sqnr(w, np.asarray(dequant(quantize_int8(w, False))))
        sq_pc = compute_sqnr(w, np.asarray(dequant(quantize_int8(w, True))))
        assert sq_pc > sq_pt + 5.0

    def test_sqnr_gate(self):
        # int8 on gaussian weights: expect > 30 dB (reference test gate)
        rng = np.random.default_rng(2)
        w = rng.normal(size=(256, 256)).astype(np.float32)
        sq = compute_sqnr(w, np.asarray(dequant(quantize_int8(w))))
        assert sq > 30.0

    def test_zero_tensor(self):
        qt = quantize_int8(np.zeros((4, 4), np.float32))
        assert np.asarray(dequant(qt)).max() == 0.0


class TestInt4:
    def test_pack_unpack_exact(self):
        rng = np.random.default_rng(3)
        w = rng.normal(size=(16, 10)).astype(np.float32)
        qt = quantize_int4(w)
        assert qt.q.shape == (16, 5)  # two values per byte
        deq = np.asarray(dequant(qt))
        assert deq.shape == w.shape
        scale = np.abs(w).max() / 7.0
        assert np.abs(deq - w).max() <= scale / 2 + 1e-6

    def test_odd_last_dim(self):
        w = np.arange(15, dtype=np.float32).reshape(3, 5)
        deq = np.asarray(dequant(quantize_int4(w)))
        assert deq.shape == (3, 5)

    def test_negative_values_sign_extend(self):
        w = np.array([[-7.0, 7.0, -1.0, 1.0]], np.float32)
        qt = quantize_int4(w)
        deq = np.asarray(dequant(qt))
        assert np.allclose(deq, w, atol=1e-6)

    def test_sqnr_above_15db(self):
        rng = np.random.default_rng(4)
        w = rng.normal(size=(128, 128)).astype(np.float32)
        assert compute_sqnr(w, np.asarray(dequant(quantize_int4(w, True)))) > 15.0


class TestQuantizedModel:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = small_config()
        hf = make_hf_twin(cfg)
        return cfg, hf

    def test_quantize_params_shrinks(self, setup):
        cfg, hf = setup
        params = params_from_hf_model(hf, cfg)
        q8 = quantize_params(params, "int8")
        q4 = quantize_params(params, "int4")
        f32_bytes = quantized_size_bytes(params)
        assert quantized_size_bytes(q8) < 0.5 * f32_bytes
        assert quantized_size_bytes(q4) < quantized_size_bytes(q8)
        assert is_quantized(q8["decoder"]["token_emb"])
        # LNs stay f32
        assert not is_quantized(q8["decoder"]["blocks"]["ln1"]["w"])
        # stacked scales keep the layer axis for lax.scan
        assert q8["decoder"]["blocks"]["fc1"]["w"].scale.shape[0] == cfg.n_text_layer

    def test_int8_logits_close_to_f32(self, setup):
        cfg, hf = setup
        sp = small_specials(cfg)
        eng32 = WhisperApr.from_hf_model(hf, cfg, specials=sp)
        eng8 = WhisperApr.from_hf_model(
            hf, cfg, specials=sp,
            compute=ComputeConfig(quantization="int8"))
        rng = np.random.default_rng(5)
        audio = rng.normal(0, 0.1, 6000).astype(np.float32)
        mel = eng32.compute_mel(audio)
        e32 = np.asarray(eng32.encode(mel))
        e8 = np.asarray(eng8.encode(mel))
        # per-channel int8: encoder outputs correlate strongly
        cos = (e32.ravel() @ e8.ravel()) / (
            np.linalg.norm(e32) * np.linalg.norm(e8) + 1e-9)
        assert cos > 0.99

    def test_int8_transcribe_runs(self, setup):
        cfg, hf = setup
        sp = small_specials(cfg)
        eng = WhisperApr.from_hf_model(
            hf, cfg, specials=sp, compute=ComputeConfig(quantization="int8"))
        audio = np.random.default_rng(6).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=8))
        assert len(r.tokens) <= 8

    def test_int4_transcribe_runs(self, setup):
        cfg, hf = setup
        sp = small_specials(cfg)
        eng = WhisperApr.from_hf_model(
            hf, cfg, specials=sp, compute=ComputeConfig(quantization="int4"))
        audio = np.random.default_rng(7).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=8))
        assert len(r.tokens) <= 8


class TestMetrics:
    def test_quantization_error(self):
        a = np.array([1.0, 2.0], np.float32)
        b = np.array([1.1, 1.9], np.float32)
        assert quantization_error(a, b) == pytest.approx(0.1, abs=1e-6)

    def test_sqnr_perfect(self):
        a = np.ones(10, np.float32)
        assert compute_sqnr(a, a) == float("inf")


class TestNativeInt8Load:
    def test_native_load_bit_exact_and_transcribes(self):
        from test_engine import build_apr_bytes
        from whisper_apr_tpu.format import AprReader, QUANT_INT8
        from whisper_apr_tpu.model.params import load_params_from_apr
        from whisper_apr_tpu.ops.quant import dequant, is_quantized

        cfg = small_config()
        hf = make_hf_twin(cfg)
        data = build_apr_bytes(hf, cfg, quant=QUANT_INT8)
        r = AprReader(data)
        p_deq = load_params_from_apr(r)
        p_nat = load_params_from_apr(r, keep_quantized=True)
        assert is_quantized(p_nat["decoder"]["blocks"]["fc1"]["w"])
        w_nat = np.asarray(dequant(p_nat["decoder"]["blocks"]["fc1"]["w"]))
        w_deq = np.asarray(p_deq["decoder"]["blocks"]["fc1"]["w"])
        assert np.array_equal(w_nat, w_deq)

        # engine keeps int8 files native and still transcribes
        eng = WhisperApr.load_from_apr(data, specials=small_specials(cfg))
        assert is_quantized(eng.params["decoder"]["token_emb"])
        audio = np.random.default_rng(0).normal(0, 0.1, 4000).astype(np.float32)
        rr = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=6))
        assert len(rr.tokens) <= 6


class TestInt4Kernel:
    """Pallas fused int4 dequant-matmul (interpret mode)."""

    def test_matches_dequant_reference(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.int4_matmul import int4_matmul, linear_int4
        rng = np.random.default_rng(0)
        for M, K, N in ((4, 64, 96), (130, 256, 250), (1, 384, 512)):
            x = rng.normal(size=(M, K)).astype(np.float32)
            w = rng.normal(size=(K, N)).astype(np.float32)
            qt = quantize_int4(w, per_channel=True)
            ref = x @ np.asarray(dequant(qt))
            out = np.asarray(int4_matmul(
                jnp.asarray(x), qt.q, qt.scale, interpret=True))[:, :N]
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            assert rel < 1e-5, (M, K, N, rel)

    def test_linear_wrapper_with_batch_and_bias(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.int4_matmul import linear_int4
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 64)).astype(np.float32)
        w = rng.normal(size=(64, 100)).astype(np.float32)
        b = rng.normal(size=(100,)).astype(np.float32)
        qt = quantize_int4(w, per_channel=True)
        ref = x @ np.asarray(dequant(qt)) + b
        out = np.asarray(linear_int4(jnp.asarray(x), qt, jnp.asarray(b),
                                     interpret=True))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


class TestInt8Kernel:
    """Pallas fused int8 dequant-matmul (interpret mode)."""

    def test_matches_dequant_reference(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.int8_matmul import int8_matmul, linear_int8
        rng = np.random.default_rng(0)
        for M, K, N in ((4, 64, 96), (130, 256, 250), (1, 384, 512)):
            x = rng.normal(size=(M, K)).astype(np.float32)
            w = rng.normal(size=(K, N)).astype(np.float32)
            qt = quantize_int8(w, per_channel=True)
            ref = x @ np.asarray(dequant(qt))
            out = np.asarray(int8_matmul(
                jnp.asarray(x), qt.q, qt.scale, interpret=True))
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            assert rel < 1e-5, (M, K, N, rel)

    def test_per_tensor_scale(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.int8_matmul import int8_matmul
        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 64)).astype(np.float32)
        w = rng.normal(size=(64, 100)).astype(np.float32)
        qt = quantize_int8(w, per_channel=False)
        ref = x @ np.asarray(dequant(qt))
        out = np.asarray(int8_matmul(jnp.asarray(x), qt.q, qt.scale,
                                     interpret=True))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5

    def test_linear_wrapper(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.ops.int8_matmul import linear_int8
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 64)).astype(np.float32)
        w = rng.normal(size=(64, 100)).astype(np.float32)
        b = rng.normal(size=(100,)).astype(np.float32)
        qt = quantize_int8(w, per_channel=True)
        ref = x @ np.asarray(dequant(qt)) + b
        out = np.asarray(linear_int8(jnp.asarray(x), qt, jnp.asarray(b),
                                     interpret=True))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


class TestQ4Block:
    """Group-scale int4 (Q4_K-class; reference: quantized.rs:355)."""

    def test_roundtrip_and_sqnr_beats_per_channel(self):
        from whisper_apr_tpu.ops.quant import (compute_sqnr, dequant,
                                               quantize_int4,
                                               quantize_q4_block)
        rng = np.random.default_rng(0)
        # outlier-heavy rows: block scales isolate the damage
        w = rng.normal(0, 0.02, (256, 128)).astype(np.float32)
        w[::37] *= 25.0
        qb = quantize_q4_block(w, group=32)
        assert qb.group == 32
        assert qb.scale.shape == (256 // 32, 128)
        deq_b = np.asarray(dequant(qb))
        deq_c = np.asarray(dequant(quantize_int4(w, per_channel=True)))
        sq_b = compute_sqnr(w, deq_b)
        sq_c = compute_sqnr(w, deq_c)
        assert deq_b.shape == w.shape
        assert sq_b > sq_c + 3.0  # block scales materially beat per-channel
        assert sq_b > 15.0

    def test_stacked_scan_slicing(self):
        import jax
        from whisper_apr_tpu.ops.quant import dequant, quantize_q4_block
        rng = np.random.default_rng(1)
        w = rng.normal(0, 0.05, (3, 64, 32)).astype(np.float32)
        qt = quantize_q4_block(w, group=32)
        assert qt.q.shape[0] == 3 and qt.scale.shape == (3, 2, 32)

        def body(_, layer_qt):
            return None, dequant(layer_qt)

        _, deq = jax.lax.scan(body, None, qt)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(dequant(qt)),
                                   rtol=1e-6)

    def test_quantize_params_q4_mode(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.model.params import init_params, quantize_params
        cfg = ModelConfig(
            model_type="tiny", n_vocab=400, n_audio_ctx=16, n_audio_state=64,
            n_audio_head=2, n_audio_layer=2, n_text_ctx=12, n_text_state=64,
            n_text_head=2, n_text_layer=2, n_mels=80)
        params = quantize_params(init_params(cfg, seed=0), "q4")
        w = params["decoder"]["blocks"]["fc1"]["w"]
        assert w.int4 and w.group == 32

    def test_q4_engine_decode_runs(self):
        from helpers import make_hf_twin, small_config, small_specials
        from whisper_apr_tpu import TranscribeOptions, WhisperApr
        from whisper_apr_tpu.config import ComputeConfig
        cfg = small_config()
        eng = WhisperApr.from_hf_model(
            make_hf_twin(cfg), cfg, specials=small_specials(cfg),
            compute=ComputeConfig(quantization="q4"))
        audio = np.random.default_rng(2).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=6))
        assert len(r.tokens) <= 6 + 4
