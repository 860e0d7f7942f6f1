"""Exact Q5_K / Q6_K super-block formats (ops/kquants.py).

Byte layouts pinned by INDEPENDENT scalar decoders written from the
GGML k-quant spec (the format family the reference's realizar loaders
accept; reference: src/model/quantized.rs:88-180 for the Q4_K member),
so a packing bug in the vectorized codecs cannot hide behind its own
round trip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_apr_tpu.ops import kquants
from whisper_apr_tpu.ops.quant import compute_sqnr, dequant


def scalar_dequant_q5k_block(block: np.ndarray) -> np.ndarray:
    """Spec-faithful scalar decode of ONE 176-byte Q5_K super-block."""
    assert block.shape == (176,)
    d = np.frombuffer(block[0:2].tobytes(), dtype="<f2")[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4].tobytes(),
                         dtype="<f2")[0].astype(np.float32)
    sc = block[4:16]
    qh = block[16:48]
    qs = block[48:176]

    def scale_min(j):
        if j < 4:
            return sc[j] & 63, sc[j + 4] & 63
        s = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4)
        m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4)
        return s, m

    out = np.zeros(256, np.float32)
    is_ = 0
    q = 0
    u1, u2 = 1, 2
    for chunk in range(4):
        s1, m1 = scale_min(is_)
        s2, m2 = scale_min(is_ + 1)
        d1, mm1 = d * s1, dmin * m1
        d2, mm2 = d * s2, dmin * m2
        for l in range(32):
            out[chunk * 64 + l] = (
                d1 * ((qs[q + l] & 0xF) + (16 if qh[l] & u1 else 0)) - mm1)
            out[chunk * 64 + 32 + l] = (
                d2 * ((qs[q + l] >> 4) + (16 if qh[l] & u2 else 0)) - mm2)
        q += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return out


def scalar_dequant_q6k_block(block: np.ndarray) -> np.ndarray:
    """Spec-faithful scalar decode of ONE 210-byte Q6_K super-block."""
    assert block.shape == (210,)
    ql = block[0:128].astype(np.int32)
    qh = block[128:192].astype(np.int32)
    sc = block[192:208].view(np.int8).astype(np.int32)
    d = np.frombuffer(block[208:210].tobytes(),
                      dtype="<f2")[0].astype(np.float32)
    out = np.zeros(256, np.float32)
    for n in range(2):
        yo, lo, ho, so = 128 * n, 64 * n, 32 * n, 8 * n
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[lo + l] & 0xF) | (((qh[ho + l] >> 0) & 3) << 4)) - 32
            q2 = ((ql[lo + l + 32] & 0xF)
                  | (((qh[ho + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[lo + l] >> 4) | (((qh[ho + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[lo + l + 32] >> 4)
                  | (((qh[ho + l] >> 6) & 3) << 4)) - 32
            out[yo + l] = d * sc[so + is_] * q1
            out[yo + l + 32] = d * sc[so + 2 + is_] * q2
            out[yo + l + 64] = d * sc[so + 4 + is_] * q3
            out[yo + l + 96] = d * sc[so + 6 + is_] * q4
    return out


class TestQ5kCodec:
    def test_roundtrip_against_scalar_decoder(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.3, (3, 512)).astype(np.float32)
        raw = kquants.quantize_q5k_raw(x)
        assert raw.shape == (3, 2, 176) and raw.dtype == np.uint8
        fast = kquants.dequantize_q5k_raw(raw)
        for r in range(3):
            for s in range(2):
                want = scalar_dequant_q5k_block(raw[r, s])
                np.testing.assert_allclose(
                    fast[r, s * 256:(s + 1) * 256], want, rtol=0, atol=0)

    def test_reconstruction_tighter_than_q4k(self):
        from whisper_apr_tpu.ops import q4k
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.5, (8, 512)).astype(np.float32)
        y5 = kquants.dequantize_q5k_raw(kquants.quantize_q5k_raw(x))
        y4 = q4k.dequantize_q4k_raw(q4k.quantize_q4k_raw(x))
        assert compute_sqnr(x, y5) > compute_sqnr(x, y4) + 3.0

    def test_zero_block_exact(self):
        x = np.zeros((1, 256), np.float32)
        raw = kquants.quantize_q5k_raw(x)
        np.testing.assert_array_equal(kquants.dequantize_q5k_raw(raw), x)

    def test_storage_density(self):
        assert kquants.q5k_bytes(256) == 176          # 5.5 bits/weight
        with pytest.raises(ValueError):
            kquants.q5k_bytes(100)

    def test_bad_k_raises(self):
        with pytest.raises(ValueError):
            kquants.quantize_q5k_raw(np.zeros((1, 100), np.float32))
        with pytest.raises(ValueError):
            kquants.quantize_q5k(np.zeros((100, 4), np.float32))
        # 1-D input must hit the ndim guard ALONE (K axis is aligned)
        with pytest.raises(ValueError):
            kquants.quantize_q5k(np.zeros(256, np.float32))

    def test_uses_all_32_levels(self):
        # a ramp must exercise the 5th bit (values > 15)
        x = np.linspace(-1, 1, 256, dtype=np.float32)[None]
        raw = kquants.quantize_q5k_raw(x)
        q, _, _ = kquants._decode_parts_q5k(raw)
        assert int(q.max()) > 15


class TestQ6kCodec:
    def test_roundtrip_against_scalar_decoder(self):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 0.3, (3, 512)).astype(np.float32)
        raw = kquants.quantize_q6k_raw(x)
        assert raw.shape == (3, 2, 210) and raw.dtype == np.uint8
        fast = kquants.dequantize_q6k_raw(raw)
        for r in range(3):
            for s in range(2):
                want = scalar_dequant_q6k_block(raw[r, s])
                np.testing.assert_allclose(
                    fast[r, s * 256:(s + 1) * 256], want, rtol=0, atol=0)

    def test_reconstruction_tighter_than_q5k(self):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 0.5, (8, 512)).astype(np.float32)
        y6 = kquants.dequantize_q6k_raw(kquants.quantize_q6k_raw(x))
        y5 = kquants.dequantize_q5k_raw(kquants.quantize_q5k_raw(x))
        assert compute_sqnr(x, y6) > compute_sqnr(x, y5) + 3.0

    def test_zero_block_exact(self):
        x = np.zeros((1, 256), np.float32)
        raw = kquants.quantize_q6k_raw(x)
        np.testing.assert_array_equal(kquants.dequantize_q6k_raw(raw), x)

    def test_storage_density(self):
        assert kquants.q6k_bytes(256) == 210          # 6.5625 bits/weight
        with pytest.raises(ValueError):
            kquants.q6k_bytes(100)

    def test_bad_k_raises(self):
        with pytest.raises(ValueError):
            kquants.quantize_q6k_raw(np.zeros((1, 100), np.float32))
        with pytest.raises(ValueError):
            kquants.quantize_q6k(np.zeros((100, 4), np.float32))
        with pytest.raises(ValueError):
            kquants.quantize_q6k(np.zeros(256, np.float32))

    def test_negative_values_signed(self):
        x = -np.abs(np.linspace(0.1, 1, 256, dtype=np.float32))[None]
        y = kquants.dequantize_q6k_raw(kquants.quantize_q6k_raw(x))
        assert np.all(y <= 0)


class TestPlanar:
    def test_q5k_planar_matches_raw_dequant_bitexact(self):
        rng = np.random.default_rng(4)
        w = rng.normal(0, 0.2, (512, 384)).astype(np.float32)  # [K, N]
        qt = kquants.quantize_q5k(w)
        assert qt.q.shape == (512, 384) and qt.zero is not None
        assert qt.group == 32 and not qt.kpack
        dense = np.asarray(dequant(qt))
        raw = kquants.quantize_q5k_raw(w.T)       # quantized along K rows
        want = kquants.dequantize_q5k_raw(raw).T
        np.testing.assert_array_equal(dense, want)

    def test_q6k_planar_matches_raw_dequant_bitexact(self):
        rng = np.random.default_rng(5)
        w = rng.normal(0, 0.2, (512, 384)).astype(np.float32)
        qt = kquants.quantize_q6k(w)
        assert qt.q.shape == (512, 384) and qt.zero is None
        assert qt.group == 16
        dense = np.asarray(dequant(qt))
        raw = kquants.quantize_q6k_raw(w.T)
        want = kquants.dequantize_q6k_raw(raw).T
        np.testing.assert_array_equal(dense, want)

    def test_planar_from_raw_bitexact(self):
        rng = np.random.default_rng(6)
        w = rng.normal(0, 0.2, (384, 512)).astype(np.float32)  # [N, K] HF
        raw5 = kquants.quantize_q5k_raw(w).reshape(-1, 176)
        qt5 = kquants.planar_from_raw_q5k(raw5, d_out=384, d_in=512)
        qt5b = kquants.quantize_q5k(np.ascontiguousarray(w.T))
        np.testing.assert_array_equal(np.asarray(qt5.q), np.asarray(qt5b.q))
        np.testing.assert_array_equal(np.asarray(qt5.scale),
                                      np.asarray(qt5b.scale))
        np.testing.assert_array_equal(np.asarray(qt5.zero),
                                      np.asarray(qt5b.zero))
        raw6 = kquants.quantize_q6k_raw(w).reshape(-1, 210)
        qt6 = kquants.planar_from_raw_q6k(raw6, d_out=384, d_in=512)
        qt6b = kquants.quantize_q6k(np.ascontiguousarray(w.T))
        np.testing.assert_array_equal(np.asarray(qt6.q), np.asarray(qt6b.q))
        np.testing.assert_array_equal(np.asarray(qt6.scale),
                                      np.asarray(qt6b.scale))

    def test_stacked_layers(self):
        rng = np.random.default_rng(7)
        w = rng.normal(0, 0.2, (3, 256, 128)).astype(np.float32)
        for quantize in (kquants.quantize_q5k, kquants.quantize_q6k):
            qt = quantize(w, stacked=True)
            dense = np.asarray(dequant(qt))
            for l in range(3):
                np.testing.assert_array_equal(
                    dense[l], np.asarray(dequant(quantize(w[l]))))


class TestQuantizeParams:
    @pytest.mark.parametrize("mode", ["q5k", "q6k"])
    def test_mode_and_decode(self, mode):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.model.decoder import (decode_step, init_cache,
                                                   prefill)
        from whisper_apr_tpu.model.params import (init_params,
                                                  quantize_params)
        from whisper_apr_tpu.model import qdecode
        cfg = ModelConfig(
            model_type="tiny", n_vocab=512, n_audio_ctx=32,
            n_audio_state=256, n_audio_head=4, n_audio_layer=2,
            n_text_ctx=16, n_text_state=256, n_text_head=4,
            n_text_layer=2, n_mels=80)
        p32 = init_params(cfg, seed=7)
        pq = quantize_params(p32, mode)
        # group planes must NOT be claimed by the int8 or q4k fast paths
        assert not qdecode.supports_qdecode(pq, cfg)
        assert not qdecode.supports_q4k_decode(pq, cfg)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(0, 0.5, (1, 32, 256)).astype(np.float32))
        prompt = jnp.full((1, 2), 5, jnp.int32)
        cache = init_cache(pq, enc, cfg, max_len=8)
        _, cache = prefill(pq, prompt, enc, cache, cfg)
        logits, _ = decode_step(pq, jnp.array([7], jnp.int32), jnp.int32(2),
                                cache, cfg)
        c32 = init_cache(p32, enc, cfg, max_len=8)
        _, c32 = prefill(p32, prompt, enc, c32, cfg)
        l32, _ = decode_step(p32, jnp.array([7], jnp.int32), jnp.int32(2),
                             c32, cfg)
        a, b = np.asarray(l32), np.asarray(logits)
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.98, cos


class TestAprCarriage:
    @pytest.mark.parametrize("name,code,block_bytes", [
        ("q5k", 5, 176), ("q6k", 6, 210)])
    def test_v1_roundtrip_and_native_load(self, tmp_path, name, code,
                                          block_bytes):
        from whisper_apr_tpu.format.container import (AprHeader, AprReader,
                                                      AprWriter)
        rng = np.random.default_rng(8)
        w = rng.normal(0, 0.1, (64, 512)).astype(np.float32)
        bias = rng.normal(0, 0.1, (64,)).astype(np.float32)
        writer = AprWriter(AprHeader(quantization=code))
        writer.add_tensor("block.weight", w)
        writer.add_tensor("block.bias", bias)
        path = str(tmp_path / "m.apr")
        writer.write_file(path)

        r = AprReader.from_file(path)
        assert r.verify_crc()
        assert r.header.quantization_name == name
        got = r.load_tensor("block.weight")
        if name == "q5k":
            want = kquants.dequantize_q5k_raw(kquants.quantize_q5k_raw(w))
            planar = kquants.planar_from_raw_q5k(
                np.asarray(r.load_raw("block.weight")), d_out=64, d_in=512)
        else:
            want = kquants.dequantize_q6k_raw(kquants.quantize_q6k_raw(w))
            planar = kquants.planar_from_raw_q6k(
                np.asarray(r.load_raw("block.weight")), d_out=64, d_in=512)
        np.testing.assert_array_equal(got, want)
        # bias below the 256-alignment bar stays exact f32
        np.testing.assert_array_equal(r.load_tensor("block.bias"), bias)
        # native planar load is bit-identical to dequantizing the file
        np.testing.assert_array_equal(np.asarray(dequant(planar)).T, got)


class TestKqFastPath:
    """Fused dequant-matvec kernel + decode_step_q wiring (the q5k/q6k
    analog of tests/test_q4k.py TestQ4kFastPath; reference fused-forward
    semantics: quantized.rs:355)."""

    @pytest.mark.parametrize("quant", [kquants.quantize_q5k,
                                       kquants.quantize_q6k])
    def test_matvec_kernel_matches_dequant(self, quant):
        rng = np.random.default_rng(11)
        L, K, N = 2, 256, 384
        w = rng.normal(0, 0.2, (L, K, N)).astype(np.float32)
        qt = quant(w, stacked=True)
        dense = np.asarray(dequant(qt, jnp.float32))
        for m in (1, 4):
            x = rng.normal(0, 1, (m, K)).astype(np.float32)
            for l in range(L):
                got = np.asarray(kquants.kq_matvec_stacked(
                    jnp.asarray(x), qt.q, qt.scale, qt.zero, l,
                    interpret=True))
                np.testing.assert_allclose(got, x @ dense[l],
                                           rtol=2e-5, atol=2e-5)

    def test_pick_block_n_tiling(self):
        # direct pins: the kernel is correct under any divisor tiling, so
        # only these catch tile-heuristic regressions
        assert kquants._pick_block_n_kq(256, 384) == 384
        # byte cap bites mid-scan (q6k fc2: K=5120 int8 rows)
        assert kquants._pick_block_n_kq(5120, 1280) == 256
        # full-N winner with lane-aligned half is halved for pipelining
        assert kquants._pick_block_n_kq(1280, 1024) == 512
        # a tile of EXACTLY 2 MB is allowed (cap is exclusive)
        assert kquants._pick_block_n_kq(8192, 1280) == 256

    def test_matvec_bad_shapes_raise(self):
        rng = np.random.default_rng(12)
        qt = kquants.quantize_q6k(
            rng.normal(0, 0.2, (1, 256, 384)).astype(np.float32),
            stacked=True)
        with pytest.raises(AssertionError):   # K mismatch
            kquants.kq_matvec_stacked(jnp.zeros((1, 512)), qt.q, qt.scale,
                                      qt.zero, 0, interpret=True)
        with pytest.raises(AssertionError):   # non-lane-aligned N
            kquants.kq_matvec_stacked(
                jnp.zeros((1, 256)), qt.q[..., :200], qt.scale[..., :200],
                None, 0, interpret=True)
        with pytest.raises(AssertionError):   # group count must divide K
            kquants.kq_matvec_stacked(jnp.zeros((1, 256)), qt.q,
                                      qt.scale[:, :3], None, 0,
                                      interpret=True)

    @pytest.mark.parametrize("qmode", ["q5k", "q6k"])
    def test_decode_step_q_matches_xla(self, qmode):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.model import qdecode
        from whisper_apr_tpu.model.decoder import (decode_step, init_cache,
                                                   prefill)
        from whisper_apr_tpu.model.params import (init_params,
                                                  quantize_params)
        cfg = ModelConfig(
            model_type="tiny", n_vocab=512, n_audio_ctx=32,
            n_audio_state=256, n_audio_head=4, n_audio_layer=2,
            n_text_ctx=16, n_text_state=256, n_text_head=4,
            n_text_layer=2, n_mels=80)
        pq = quantize_params(init_params(cfg, seed=7), qmode)
        assert not qdecode.supports_qdecode(pq, cfg)
        assert not qdecode.supports_q4k_decode(pq, cfg)
        if qmode == "q5k":
            assert qdecode.supports_q5k_decode(pq, cfg)
            assert not qdecode.supports_q6k_decode(pq, cfg)
        else:
            assert qdecode.supports_q6k_decode(pq, cfg)
            assert not qdecode.supports_q5k_decode(pq, cfg)
        qd = qdecode.prepare_kq_decode(pq, cfg)
        assert qd is not None and qd["mode"] == qmode
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(0, 0.5, (2, 32, 256)).astype(np.float32))
        prompt = jnp.full((2, 2), 5, jnp.int32)
        cache_a = init_cache(pq, enc, cfg, max_len=8)
        cache_b = init_cache(pq, enc, cfg, max_len=8)
        _, cache_a = prefill(pq, prompt, enc, cache_a, cfg)
        _, cache_b = prefill(pq, prompt, enc, cache_b, cfg)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, cache_a = decode_step(pq, tok, pos, cache_a, cfg)
            lb, cache_b = qdecode.decode_step_q(
                pq, qd, tok, pos, cache_b, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=3e-4)
            tok = jnp.argmax(la, -1).astype(jnp.int32)
