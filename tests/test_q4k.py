"""Exact Q4_K super-block format (ops/q4k.py).

The byte layout is pinned by an INDEPENDENT scalar decoder written from
the k-quant spec (reference: src/model/quantized.rs:88-180 — 144-byte
super-blocks, 6-bit sub-scales, nibble chunking), so a packing bug in the
vectorized codec cannot hide behind its own round trip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_apr_tpu.ops import q4k
from whisper_apr_tpu.ops.quant import (compute_sqnr, dequant,
                                       quantize_q4_block)


def scalar_dequant_block(block: np.ndarray) -> np.ndarray:
    """Spec-faithful scalar decode of ONE 144-byte super-block."""
    assert block.shape == (144,)
    d = np.frombuffer(block[0:2].tobytes(), dtype="<f2")[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4].tobytes(),
                         dtype="<f2")[0].astype(np.float32)
    sc = block[4:16]
    qs = block[16:144]

    def scale_min(j):
        if j < 4:
            return sc[j] & 63, sc[j + 4] & 63
        s = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4)
        m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4)
        return s, m

    out = np.zeros(256, np.float32)
    is_ = 0
    q = 0
    for chunk in range(4):
        s1, m1 = scale_min(is_)
        s2, m2 = scale_min(is_ + 1)
        d1, mm1 = d * s1, dmin * m1
        d2, mm2 = d * s2, dmin * m2
        for l in range(32):
            out[chunk * 64 + l] = d1 * (qs[q + l] & 0xF) - mm1
            out[chunk * 64 + 32 + l] = d2 * (qs[q + l] >> 4) - mm2
        q += 32
        is_ += 2
    return out


class TestCodec:
    def test_roundtrip_against_scalar_decoder(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.3, (3, 512)).astype(np.float32)
        raw = q4k.quantize_q4k_raw(x)
        assert raw.shape == (3, 2, 144) and raw.dtype == np.uint8
        fast = q4k.dequantize_q4k_raw(raw)
        for r in range(3):
            for s in range(2):
                want = scalar_dequant_block(raw[r, s])
                np.testing.assert_allclose(
                    fast[r, s * 256:(s + 1) * 256], want, rtol=0, atol=0)

    def test_reconstruction_error_bounded(self):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.5, (8, 256)).astype(np.float32)
        y = q4k.dequantize_q4k_raw(q4k.quantize_q4k_raw(x))
        # error per value is bounded by ~the sub-block scale step
        step = (x.reshape(8, 8, 32).max(-1) - x.reshape(8, 8, 32).min(-1)) / 15
        err = np.abs(y - x).reshape(8, 8, 32).max(-1)
        assert np.all(err <= step * 1.2 + 1e-6)

    def test_zero_block_exact(self):
        x = np.zeros((1, 256), np.float32)
        raw = q4k.quantize_q4k_raw(x)
        np.testing.assert_array_equal(q4k.dequantize_q4k_raw(raw), x)

    def test_storage_density(self):
        assert q4k.q4k_bytes(256) == 144          # 4.5 bits/weight
        assert q4k.q4k_bytes(1280 * 5120) == 1280 * 5120 // 256 * 144

    def test_bad_k_raises(self):
        with pytest.raises(ValueError):
            q4k.quantize_q4k_raw(np.zeros((1, 100), np.float32))

    def test_one_dim_guard_is_valueerror(self):
        # the ndim guard must short-circuit BEFORE shape[-2] is touched
        # (an `and` there turns the 1-D case into an IndexError)
        with pytest.raises(ValueError):
            q4k.quantize_q4k(np.zeros(256, np.float32))


class TestPlanar:
    def test_planar_matches_raw_dequant_bitexact(self):
        rng = np.random.default_rng(2)
        w = rng.normal(0, 0.2, (512, 384)).astype(np.float32)  # [K, N]
        qt = q4k.quantize_q4k(w)
        assert qt.q.shape == (256, 384) and qt.zero is not None
        assert qt.kpack and qt.group == 32
        dense = np.asarray(q4k.dequant_q4k(qt))
        raw = q4k.quantize_q4k_raw(w.T)           # quantized along K rows
        want = q4k.dequantize_q4k_raw(raw).T
        np.testing.assert_array_equal(dense, want)

    def test_planar_from_raw_bitexact(self):
        rng = np.random.default_rng(3)
        w = rng.normal(0, 0.2, (384, 512)).astype(np.float32)  # [N, K] HF
        raw = q4k.quantize_q4k_raw(w).reshape(-1, 144)
        qt = q4k.planar_from_raw(raw, d_out=384, d_in=512)
        qt2 = q4k.quantize_q4k(np.ascontiguousarray(w.T))
        np.testing.assert_array_equal(np.asarray(qt.q), np.asarray(qt2.q))
        np.testing.assert_array_equal(np.asarray(qt.scale),
                                      np.asarray(qt2.scale))
        np.testing.assert_array_equal(np.asarray(qt.zero),
                                      np.asarray(qt2.zero))

    def test_dequant_dispatches_on_zero(self):
        rng = np.random.default_rng(4)
        w = rng.normal(0, 0.2, (256, 128)).astype(np.float32)
        qt = q4k.quantize_q4k(w)
        via_generic = np.asarray(dequant(qt))
        via_direct = np.asarray(q4k.dequant_q4k(qt))
        np.testing.assert_array_equal(via_generic, via_direct)

    def test_stacked_layers(self):
        rng = np.random.default_rng(5)
        w = rng.normal(0, 0.2, (3, 256, 128)).astype(np.float32)
        qt = q4k.quantize_q4k(w, stacked=True)
        assert qt.q.shape == (3, 128, 128)
        dense = np.asarray(q4k.dequant_q4k(qt))
        for l in range(3):
            np.testing.assert_array_equal(
                dense[l], np.asarray(q4k.dequant_q4k(
                    q4k.quantize_q4k(w[l]))))


class TestQuality:
    def test_sqnr_at_least_q4_group_mode(self):
        """The exact k-quant format must not regress on the repo's own
        symmetric group-scale mode (VERDICT r2 gate)."""
        rng = np.random.default_rng(6)
        # realistic weight stats: gaussian + occasional outlier columns
        w = rng.normal(0, 0.05, (1280, 512)).astype(np.float32)
        w[:, ::97] *= 4.0
        wq4k = np.asarray(q4k.dequant_q4k(q4k.quantize_q4k(w)))
        wq4 = np.asarray(dequant(quantize_q4_block(w)))
        s_new = compute_sqnr(w, wq4k)
        s_old = compute_sqnr(w, wq4)
        assert s_new >= s_old - 0.1, (s_new, s_old)
        # ~4.5 bits/weight lands near the 4-bit theoretical ceiling
        assert s_new > 20.0, s_new


class TestQuantizeParams:
    def test_q4k_mode_and_decode(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.model.decoder import (decode_step, init_cache,
                                                   prefill)
        from whisper_apr_tpu.model.params import (init_params,
                                                  quantize_params)
        cfg = ModelConfig(
            model_type="tiny", n_vocab=512, n_audio_ctx=32,
            n_audio_state=256, n_audio_head=4, n_audio_layer=2,
            n_text_ctx=16, n_text_state=256, n_text_head=4,
            n_text_layer=2, n_mels=80)
        p32 = init_params(cfg, seed=7)
        pq = quantize_params(p32, "q4k")
        assert pq["decoder"]["blocks"]["fc1"]["w"].zero is not None
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(0, 0.5, (1, 32, 256)).astype(np.float32))
        prompt = jnp.full((1, 2), 5, jnp.int32)
        cache = init_cache(pq, enc, cfg, max_len=8)
        _, cache = prefill(pq, prompt, enc, cache, cfg)
        logits, _ = decode_step(pq, jnp.array([7], jnp.int32), jnp.int32(2),
                                cache, cfg)
        l32_cache = init_cache(p32, enc, cfg, max_len=8)
        _, l32_cache = prefill(p32, prompt, enc, l32_cache, cfg)
        l32, _ = decode_step(p32, jnp.array([7], jnp.int32), jnp.int32(2),
                             l32_cache, cfg)
        a, b = np.asarray(l32), np.asarray(logits)
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.98, cos


class TestQ4kFastPath:
    def test_pick_block_n_tiling(self):
        # pins the tile-size heuristic directly (the kernel is correct
        # under ANY divisor tiling, so only direct pins catch regressions)
        # small: whole N fits one 2 MB tile and n/2 is not lane-aligned
        assert q4k._pick_block_n(128, 384) == 384
        # byte cap bites: 2560*1280 > 2 MB, largest fitting divisor is 640
        assert q4k._pick_block_n(2560, 1280) == 640
        # full-N winner with lane-aligned half is halved for pipelining
        assert q4k._pick_block_n(640, 1024) == 512
        # non-divisor candidates are skipped (1280 % 256 == 0 but 384 no)
        assert q4k._pick_block_n(2560, 384) == 384
        # a tile of EXACTLY 2 MB is allowed (cap is exclusive)
        assert q4k._pick_block_n(2048, 2048) == 1024

    def test_matvec_bad_shapes_raise(self):
        rng = np.random.default_rng(13)
        qt = q4k.quantize_q4k(
            rng.normal(0, 0.2, (1, 256, 384)).astype(np.float32),
            stacked=True)
        with pytest.raises(AssertionError):   # K != 2 * KH
            q4k.q4k_matvec_stacked(jnp.zeros((1, 512)), qt.q, qt.scale,
                                   qt.zero, 0, interpret=True)
        with pytest.raises(AssertionError):   # K % 32 != 0 (K == 2*KH)
            q4k.q4k_matvec_stacked(jnp.zeros((1, 48)), qt.q[:, :24],
                                   qt.scale, qt.zero, 0, interpret=True)
        with pytest.raises(AssertionError):   # non-lane-aligned N
            q4k.q4k_matvec_stacked(jnp.zeros((1, 256)), qt.q[..., :200],
                                   qt.scale[..., :200], qt.zero[..., :200],
                                   0, interpret=True)

    def test_matvec_kernel_matches_dequant(self):
        rng = np.random.default_rng(10)
        L, K, N = 2, 256, 384
        w = rng.normal(0, 0.2, (L, K, N)).astype(np.float32)
        qt = q4k.quantize_q4k(w, stacked=True)
        dense = np.asarray(q4k.dequant_q4k(qt))
        for m in (1, 4):
            x = rng.normal(0, 1, (m, K)).astype(np.float32)
            for l in range(L):
                got = np.asarray(q4k.q4k_matvec_stacked(
                    jnp.asarray(x), qt.q, qt.scale, qt.zero, l,
                    interpret=True))
                np.testing.assert_allclose(got, x @ dense[l],
                                           rtol=2e-5, atol=2e-5)

    def test_decode_step_q_q4k_matches_xla(self):
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
        pq = quantize_params(init_params(cfg, seed=7), "q4k")
        assert not qdecode.supports_qdecode(pq, cfg)     # not int8
        assert qdecode.supports_q4k_decode(pq, cfg)
        qd = qdecode.prepare_q4k_decode(pq, cfg)
        assert qd is not None and qd["mode"] == "q4k"
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


class TestAprCarriage:
    def test_v1_roundtrip_and_native_load(self, tmp_path):
        from whisper_apr_tpu.format.container import (AprHeader, AprReader,
                                                      AprWriter, QUANT_Q4K)
        rng = np.random.default_rng(8)
        w = rng.normal(0, 0.1, (64, 512)).astype(np.float32)
        bias = rng.normal(0, 0.1, (64,)).astype(np.float32)
        writer = AprWriter(AprHeader(quantization=QUANT_Q4K))
        writer.add_tensor("block.weight", w)
        writer.add_tensor("block.bias", bias)
        path = str(tmp_path / "m.apr")
        writer.write_file(path)

        r = AprReader.from_file(path)
        assert r.verify_crc()
        assert r.header.quantization_name == "q4k"
        got = r.load_tensor("block.weight")
        want = q4k.dequantize_q4k_raw(q4k.quantize_q4k_raw(w))
        np.testing.assert_array_equal(got, want)
        # bias below the 256-alignment bar stays exact f32
        np.testing.assert_array_equal(r.load_tensor("block.bias"), bias)
        # native planar load is bit-identical to dequantizing the file
        raw = r.load_raw("block.weight")
        qt = q4k.planar_from_raw(np.asarray(raw), d_out=64, d_in=512)
        np.testing.assert_array_equal(
            np.asarray(q4k.dequant_q4k(qt)).T, got)
