"""APR v2 container (JSON metadata + tensor index + CRC; reference:
src/format/mod.rs:46-50 aprender re-export)."""

import numpy as np
import pytest

from helpers import make_hf_twin, small_config, small_specials
from whisper_apr_tpu import WhisperApr
from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.errors import FormatError
from whisper_apr_tpu.format import (AprMetadata, AprReaderV2, AprWriterV2,
                                    MelFilterbankData, QUANT_INT8, is_v2)


@pytest.fixture(scope="module")
def cfg():
    return small_config()


def test_roundtrip_f32(cfg):
    w = AprWriterV2.from_config(cfg)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    w.add_tensor("alpha", a)
    w.add_tensor("beta", b)
    data = w.to_bytes()
    assert is_v2(data)
    r = AprReaderV2(data)
    assert r.verify_crc()
    assert r.header.to_model_config().n_vocab == cfg.n_vocab
    np.testing.assert_array_equal(r.load_tensor("alpha"), a)
    np.testing.assert_array_equal(r.load_tensor("beta"), b)
    assert [d.name for d in r.tensors] == ["alpha", "beta"]


def test_roundtrip_int8_with_scales(cfg):
    w = AprWriterV2.from_config(cfg, quantization=QUANT_INT8)
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.3, size=(8, 8)).astype(np.float32)
    w.add_tensor("weight", a)
    r = AprReaderV2(w.to_bytes())
    deq = r.load_tensor("weight")
    assert deq.dtype == np.float32
    np.testing.assert_allclose(deq, a, atol=np.abs(a).max() / 100)
    q, scale = r.load_tensor_quantized("weight")
    assert q.dtype == np.int8 and scale is not None
    assert r.scale_for("weight") == pytest.approx(float(scale[0]))


def test_vocab_and_filterbank_sections(cfg):
    w = AprWriterV2.from_config(cfg)
    w.set_vocabulary(b"\x01\x02vocab-bytes")
    fb = MelFilterbankData(4, 6, np.arange(24, dtype=np.float32).reshape(4, 6))
    w.set_mel_filterbank(fb)
    r = AprReaderV2(w.to_bytes())
    assert r.read_vocabulary_bytes() == b"\x01\x02vocab-bytes"
    got = r.read_mel_filterbank()
    assert got.n_mels == 4 and got.n_freqs == 6
    np.testing.assert_array_equal(got.data, fb.data)
    assert r.header.has_vocab and r.header.has_filterbank


def test_crc_detects_corruption(cfg):
    w = AprWriterV2.from_config(cfg)
    w.add_tensor("t", np.ones((4, 4), np.float32))
    data = bytearray(w.to_bytes())
    r = AprReaderV2(bytes(data))
    assert r.verify_crc()
    data[-10] ^= 0xFF
    assert not AprReaderV2(bytes(data)).verify_crc()


def test_rejects_v1_and_garbage():
    with pytest.raises(FormatError):
        AprReaderV2(b"APR1" + b"\x00" * 100)
    with pytest.raises(FormatError):
        AprReaderV2(b"nope")


def test_engine_loads_v2_end_to_end(cfg):
    """Full engine load from a v2 container (converter-equivalent path)."""
    from test_engine import build_apr_bytes  # reuse the HF-twin builder
    from whisper_apr_tpu.model.params import params_from_hf_model
    from whisper_apr_tpu.tokenizer import Vocabulary
    from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
    from whisper_apr_tpu.audio.mel import mel_filterbank

    hf = make_hf_twin(cfg)
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    tensors = hf_state_dict_to_apr_tensors(sd)
    w = AprWriterV2.from_config(cfg)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    vocab = Vocabulary.with_base_tokens()
    while len(vocab) < cfg.n_vocab:
        vocab.add_token(b"<|tok%d|>" % len(vocab))
    w.set_vocabulary(vocab.to_bytes())
    w.set_mel_filterbank(MelFilterbankData(80, 201, mel_filterbank(80)))
    data = w.to_bytes()

    eng = WhisperApr.load_from_apr(data, specials=small_specials(cfg))
    from whisper_apr_tpu import TranscribeOptions
    audio = np.random.default_rng(5).normal(0, 0.1, 3200).astype(np.float32)
    r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=6))
    assert len(r.tokens) >= 3

    # parity with the v1 container load of the same weights
    eng1 = WhisperApr.load_from_apr(build_apr_bytes(hf, cfg),
                                    specials=small_specials(cfg))
    r1 = eng1.transcribe(audio, TranscribeOptions(language="en", max_tokens=6))
    assert r.tokens == r1.tokens
