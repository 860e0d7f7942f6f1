"""Parity for the transposed-score attention tiles (decode_blocks.TRANSPOSED).

The variant moves every VPU softmax op from [bt, H] (H of 128 lanes live)
to [H, bt] (full lanes) via one small in-tile transpose, and the value
contraction becomes a native [H, bt] @ [bt, D] matmul. Logits must match
the production layout to tight f32 tolerance (lane-axis reductions change
last-bit rounding; in bf16 mode the k*q elementwise additionally moves
onto the MXU via the qe matrix) with argmax equality throughout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import small_config
from whisper_apr_tpu.model import qdecode
from whisper_apr_tpu.model.decoder import init_cache, prefill
from whisper_apr_tpu.model.params import init_params, quantize_params
from whisper_apr_tpu.ops import decode_blocks


@pytest.fixture(scope="module")
def cfg():
    # n_text_state 128: the fused qf path needs lane-aligned D
    return small_config(n_audio_ctx=50, n_audio_state=128, n_audio_head=4,
                        n_audio_layer=2, n_text_ctx=24, n_text_state=128,
                        n_text_head=4, n_text_layer=2)


@pytest.fixture(scope="module")
def qsetup(cfg):
    params = quantize_params(init_params(cfg, seed=3), "int8")
    qd = qdecode.prepare_qdecode(params, cfg)
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


def _steps(params, qd, qc, cfg, n=3, pos0=2, **kw):
    """Run n fused steps, returning stacked logits."""
    tok = jnp.asarray(np.array([7], np.int32))
    outs = []
    for step in range(n):
        pos = jnp.int32(pos0 + step)
        l, qc = qdecode.decode_step_qf(params, qd, tok, pos, qc, cfg,
                                       compute_dtype=jnp.float32,
                                       interpret=True, **kw)
        outs.append(np.asarray(l))
        tok = jnp.argmax(l, -1).astype(jnp.int32)
    return np.stack(outs)


def _both_layouts(cfg, qsetup, kv_int8, **kw):
    params, qd, cache = _prefilled(cfg, qsetup)
    qc = qdecode.quantize_cache(cache, kv_int8=kv_int8)
    assert decode_blocks.TRANSPOSED is False
    base = _steps(params, qd, qc, cfg, **kw)
    decode_blocks.TRANSPOSED = True
    try:
        qc2 = qdecode.quantize_cache(cache, kv_int8=kv_int8)
        trans = _steps(params, qd, qc2, cfg, **kw)
    finally:
        decode_blocks.TRANSPOSED = False
    return base, trans


class TestTransposedScores:
    def test_int8_kv_tight_parity(self, cfg, qsetup):
        """int8-KV: both layouts run the same f32 score/softmax math and
        the same exact f32 x int8 MXU dots, but lane-axis reductions
        replace sublane-axis ones so float ordering differs at the last
        bit — pin a tight tolerance plus argmax equality."""
        base, trans = _both_layouts(cfg, qsetup, kv_int8=True)
        np.testing.assert_allclose(trans, base, rtol=1e-4, atol=1e-5)
        assert np.array_equal(base.argmax(-1), trans.argmax(-1))

    def test_bf16_kv_close_and_argmax_agrees(self, cfg, qsetup):
        base, trans = _both_layouts(cfg, qsetup, kv_int8=False)
        np.testing.assert_allclose(base, trans, rtol=2e-4, atol=2e-4)
        assert np.array_equal(base.argmax(-1), trans.argmax(-1))

    def test_multi_pos_vector(self, cfg, qsetup):
        """pos as a [B] vector (continuous-batching form, B=1)."""
        params, qd, cache = _prefilled(cfg, qsetup)
        qc = qdecode.quantize_cache(cache, kv_int8=True)
        tok = jnp.asarray(np.array([7], np.int32))
        pos_v = jnp.asarray(np.array([2], np.int32))
        la, _ = qdecode.decode_step_qf(params, qd, tok, pos_v, qc, cfg,
                                       compute_dtype=jnp.float32,
                                       interpret=True)
        decode_blocks.TRANSPOSED = True
        try:
            lb, _ = qdecode.decode_step_qf(params, qd, tok, pos_v, qc, cfg,
                                           compute_dtype=jnp.float32,
                                           interpret=True)
        finally:
            decode_blocks.TRANSPOSED = False
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-4, atol=1e-5)

    def test_short_encoder_masking(self, cfg, qsetup):
        """enc_len < padded cross length: the transposed valid mask
        ([1, bt] lane iota) must exclude the same padded positions."""
        base, trans = _both_layouts(cfg, qsetup, kv_int8=True,
                                    enc_len=cfg.n_audio_ctx - 7)
        np.testing.assert_allclose(trans, base, rtol=1e-4, atol=1e-5)
        assert np.array_equal(base.argmax(-1), trans.argmax(-1))

    def test_deferred_kv_writes_compose(self, cfg, qsetup):
        """TRANSPOSED x DEFER_KV_WRITES: deferral only moves WHERE the new
        KV rows are scattered, never their values — within the transposed
        layout the two must be bit-identical."""
        params, qd, cache = _prefilled(cfg, qsetup)
        decode_blocks.TRANSPOSED = True
        orig = qdecode.DEFER_KV_WRITES
        try:
            qdecode.DEFER_KV_WRITES = False
            qc = qdecode.quantize_cache(cache, kv_int8=True)
            base = _steps(params, qd, qc, cfg)
            qdecode.DEFER_KV_WRITES = True
            qc2 = qdecode.quantize_cache(cache, kv_int8=True)
            trans = _steps(params, qd, qc2, cfg)
        finally:
            qdecode.DEFER_KV_WRITES = orig
            decode_blocks.TRANSPOSED = False
        np.testing.assert_array_equal(base, trans)
