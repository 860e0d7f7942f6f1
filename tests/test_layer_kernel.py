"""Whole-layer decode megakernel (ops/decode_layer.py) vs the scan path.

Runs in Pallas interpret mode on the CPU backend. The layer kernel is the
single-stream (B=1) fast path; every test drives several real decode steps
and checks logits + cache contents against decode_step_q (the per-kernel
scan reference, itself gated against the pure-XLA decode_step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.model import qdecode
from whisper_apr_tpu.model.decoder import init_cache, prefill
from whisper_apr_tpu.model.params import init_params, quantize_params


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        model_type="tiny", n_vocab=700, n_audio_ctx=32, n_audio_state=128,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=24, n_text_state=128,
        n_text_head=4, n_text_layer=3, n_mels=80)


@pytest.fixture(scope="module")
def qsetup(cfg):
    params = quantize_params(init_params(cfg, seed=3), "int8")
    qd = qdecode.prepare_qdecode(params, cfg)
    qd = qdecode.add_layer_operands(qd)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(0, 0.5, (1, cfg.n_audio_ctx,
                                          cfg.n_text_state)).astype(np.float32))
    return params, qd, enc


def _prefilled(cfg, qsetup, max_len=12):
    params, qd, enc = qsetup
    cache = init_cache(params, enc, cfg, max_len=max_len)
    prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
    _, cache = prefill(params, prompt, enc, cache, cfg)
    return params, qd, cache


class TestLayerOperands:
    def test_stacks_shapes_and_values(self, cfg, qsetup):
        _, qd, _ = qsetup
        blk = qd["blk"]
        L, D = cfg.n_text_layer, cfg.n_text_state
        assert blk["ln6"].shape == (L, 6, D)
        assert blk["wo3"].shape == (3 * L, D, D)
        assert blk["so3"].shape == (3 * L, 1, D)
        np.testing.assert_array_equal(np.asarray(blk["wo3"][3 * 1 + 0]),
                                      np.asarray(blk["self_wo"][1]))
        np.testing.assert_array_equal(np.asarray(blk["wo3"][3 * 1 + 1]),
                                      np.asarray(blk["wcq"][1]))
        np.testing.assert_array_equal(np.asarray(blk["wo3"][3 * 2 + 2]),
                                      np.asarray(blk["cross_wo"][2]))
        np.testing.assert_array_equal(np.asarray(blk["ln6"][2, 4]),
                                      np.asarray(blk["ln3_w"][2, 0]))
        # idempotent
        assert qdecode.add_layer_operands(qd) is qd


class TestDecodeStepQL:
    @pytest.mark.parametrize("alias_kv", [False, True])
    def test_bf16_matches_scan_path(self, cfg, qsetup, alias_kv):
        params, qd, cache = _prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_ql(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True,
                alias_kv=alias_kv)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-5)
            # the in-kernel (or XLA) row write must land at row `pos`
            np.testing.assert_allclose(
                np.asarray(cache.self_k[:, :, 2 + step]),
                np.asarray(qc.self_kq[:, :, 2 + step]),
                rtol=2e-5, atol=2e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    @pytest.mark.parametrize("alias_kv", [False, True])
    def test_int8_kv_argmax_agrees(self, cfg, qsetup, alias_kv):
        params, qd, cache = _prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=True)
        assert qc.self_kq.dtype == jnp.int8
        tok = jnp.asarray(np.array([7], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, cache = qdecode.decode_step_q(
                params, qd, tok, pos, cache, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc = qdecode.decode_step_ql(
                params, qd, tok, pos, qc, cfg,
                compute_dtype=jnp.float32, interpret=True,
                alias_kv=alias_kv)
            a, b = np.asarray(la), np.asarray(lb)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.999, cos
            assert np.array_equal(a.argmax(-1), b.argmax(-1))
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_matches_qf_fused_path(self, cfg, qsetup):
        """ql and qf share kernels' numerics contract: ~1e-5 logits."""
        params, qd, cache = _prefilled(cfg, qsetup)
        qc1 = qdecode.quantize_cache(cache, kv_int8=False)
        qc2 = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7], np.int32))
        for step in range(2):
            pos = jnp.int32(2 + step)
            la, qc1 = qdecode.decode_step_qf(
                params, qd, tok, pos, qc1, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc2 = qdecode.decode_step_ql(
                params, qd, tok, pos, qc2, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_short_encoder_enc_len(self, cfg, qsetup):
        """enc_len masks the padded cross-cache rows (advisor finding)."""
        params, qd, enc = qsetup
        short = enc[:, :16]
        cache = init_cache(params, short, cfg, max_len=12)
        prompt = jnp.asarray(np.full((1, 2), 5, np.int32))
        _, cache = prefill(params, prompt, short, cache, cfg)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7], np.int32))
        la, cache = qdecode.decode_step_q(
            params, qd, tok, jnp.int32(2), cache, cfg,
            compute_dtype=jnp.float32, interpret=True)
        lb, qc = qdecode.decode_step_ql(
            params, qd, tok, jnp.int32(2), qc, cfg,
            compute_dtype=jnp.float32, interpret=True, enc_len=16)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-5)


class TestBatchedLayerKernel:
    @pytest.fixture(scope="class")
    def bsetup(self, cfg):
        params = quantize_params(init_params(cfg, seed=3), "int8")
        qd = qdecode.prepare_qdecode(params, cfg)
        qd = qdecode.add_layer_operands(qd)
        rng = np.random.default_rng(1)
        enc = jnp.asarray(rng.normal(0, 0.5, (2, cfg.n_audio_ctx,
                                              cfg.n_text_state)
                                     ).astype(np.float32))
        cache = init_cache(params, enc, cfg, max_len=12)
        prompt = jnp.asarray(np.full((2, 2), 5, np.int32))
        _, cache = prefill(params, prompt, enc, cache, cfg)
        return params, qd, cache

    @pytest.mark.parametrize("kv_int8", [False, True])
    def test_matches_qf_batched(self, cfg, bsetup, kv_int8):
        """B=2 aligned: the batched layer kernel vs the per-block fused
        step (decode_step_qf), several steps."""
        params, qd, cache = bsetup
        qc1 = qdecode.quantize_cache(cache, kv_int8=kv_int8)
        qc2 = qdecode.quantize_cache(cache, kv_int8=kv_int8)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        for step in range(3):
            pos = jnp.int32(2 + step)
            la, qc1 = qdecode.decode_step_qf(
                params, qd, tok, pos, qc1, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc2 = qdecode.decode_step_ql(
                params, qd, tok, pos, qc2, cfg,
                compute_dtype=jnp.float32, interpret=True)
            a, b = np.asarray(la), np.asarray(lb)
            if kv_int8:
                assert np.array_equal(a.argmax(-1), b.argmax(-1))
            else:
                np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)

    def test_multi_pos_matches_qf(self, cfg, bsetup):
        """Per-slot positions (continuous batching contract)."""
        params, qd, cache = bsetup
        qc1 = qdecode.quantize_cache(cache, kv_int8=False)
        qc2 = qdecode.quantize_cache(cache, kv_int8=False)
        tok = jnp.asarray(np.array([7, 11], np.int32))
        pos_v = jnp.asarray(np.array([2, 2], np.int32))
        for _ in range(2):
            la, qc1 = qdecode.decode_step_qf(
                params, qd, tok, pos_v, qc1, cfg,
                compute_dtype=jnp.float32, interpret=True)
            lb, qc2 = qdecode.decode_step_ql(
                params, qd, tok, pos_v, qc2, cfg,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-5, atol=3e-5)
            tok = jnp.argmax(la, -1).astype(jnp.int32)
            pos_v = pos_v + 1
