"""Tests for the .apr container (mirrors reference: src/format/mod.rs inline tests)."""

import numpy as np
import pytest

from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.errors import FormatError
from whisper_apr_tpu.format import (
    QUANT_F32,
    QUANT_INT8,
    AprHeader,
    AprReader,
    AprValidator,
    AprWriter,
    MelFilterbankData,
    TensorDescriptor,
    crc32,
)
from whisper_apr_tpu.tokenizer import Vocabulary


def make_test_apr(quant=QUANT_F32, with_vocab=False, with_filterbank=False):
    """Minimal valid .apr (analog of reference format::create_test_apr, mod.rs:1536)."""
    cfg = ModelConfig.tiny()
    w = AprWriter.from_config(cfg, quantization=quant)
    rng = np.random.default_rng(0)
    w.add_tensor("encoder.conv1.weight", rng.normal(size=(4, 8, 3)).astype(np.float32))
    w.add_tensor("encoder.conv1.bias", rng.normal(size=(4,)).astype(np.float32))
    w.add_tensor("decoder.embed_tokens.weight", rng.normal(size=(16, 4)).astype(np.float32))
    if with_vocab:
        v = Vocabulary.with_base_tokens()
        v.add_merge_rule(b"a", b"b")
        w.set_vocabulary(v.to_bytes())
    if with_filterbank:
        fb = np.abs(rng.normal(size=(80, 201))).astype(np.float32)
        w.set_mel_filterbank(MelFilterbankData(80, 201, fb))
    return w.to_bytes()


class TestCrc32:
    def test_known_value(self):
        # reference: src/format/checksum.rs doc-test pins this value
        assert crc32(b"Hello, World!") == 0xEC4AC3D0

    def test_empty(self):
        assert crc32(b"") == 0


class TestHeader:
    def test_roundtrip(self):
        h = AprHeader.from_config(ModelConfig.base(), QUANT_INT8)
        h.n_tensors = 42
        h.has_vocab = True
        parsed = AprHeader.parse(h.to_bytes())
        assert parsed == h

    def test_header_too_short(self):
        with pytest.raises(FormatError):
            AprHeader.parse(b"\x00" * 10)

    def test_bad_quantization(self):
        data = bytearray(AprHeader().to_bytes())
        data[3] = 99
        with pytest.raises(FormatError):
            AprHeader.parse(bytes(data))

    def test_config_roundtrip(self):
        for name in ("tiny", "base", "small", "medium", "large", "large-v3"):
            cfg = ModelConfig.from_name(name)
            h = AprHeader.from_config(cfg)
            assert h.to_model_config() == cfg

    def test_large_v3_mels(self):
        h = AprHeader.from_config(ModelConfig.large_v3())
        assert h.n_mels == 128
        assert h.n_vocab == 51_866


class TestTensorDescriptor:
    def test_roundtrip(self):
        d = TensorDescriptor("encoder.conv1.weight", 128, 512, 128, (4, 8, 3, 0), 3)
        parsed = TensorDescriptor.parse(d.to_bytes())
        assert parsed == d
        assert parsed.dims == (4, 8, 3)

    def test_name_truncation(self):
        d = TensorDescriptor("x" * 60, 0, 0, 0, (0, 0, 0, 0), 0)
        parsed = TensorDescriptor.parse(d.to_bytes())
        assert parsed.name == "x" * 47


class TestReaderWriter:
    def test_f32_roundtrip(self):
        data = make_test_apr()
        r = AprReader(data)
        assert r.header.n_tensors == 3
        assert r.verify_crc()
        w = r.load_tensor("encoder.conv1.weight")
        assert w.shape == (4, 8, 3)
        assert w.dtype == np.float32

    def test_int8_dequant(self):
        rng = np.random.default_rng(1)
        orig = rng.normal(size=(16, 4)).astype(np.float32)
        w = AprWriter.from_config(ModelConfig.tiny(), quantization=QUANT_INT8)
        w.add_tensor("decoder.embed_tokens.weight", orig)
        r = AprReader(w.to_bytes())
        deq = r.load_tensor("decoder.embed_tokens.weight")
        # int8 absmax symmetric: max error is scale/2 = absmax/254
        scale = np.abs(orig).max() / 127.0
        assert np.abs(deq - orig).max() <= scale / 2 + 1e-7
        assert r.verify_crc()

    def test_f16_roundtrip(self):
        # f16 .apr: header quantization=1, every tensor stored <f2 and
        # promoted to f32 on load (reference: src/format/mod.rs:63-70,
        # src/cli/model_loader.rs:172-192)
        from whisper_apr_tpu.format import QUANT_F16
        rng = np.random.default_rng(2)
        orig = rng.normal(size=(16, 8)).astype(np.float32)
        w = AprWriter.from_config(ModelConfig.tiny(), quantization=QUANT_F16)
        w.add_tensor("decoder.embed_tokens.weight", orig)
        blob = w.to_bytes()
        r = AprReader(blob)
        assert r.header.quantization == QUANT_F16
        assert r.verify_crc()
        got = r.load_tensor("decoder.embed_tokens.weight")
        assert got.dtype == np.float32
        np.testing.assert_array_equal(
            got, orig.astype(np.float16).astype(np.float32))
        # stored payload is 2 bytes/element, half of f32
        assert r.tensors[0].size == orig.size * 2
        # raw view preserves the f16 dtype
        assert r.load_raw("decoder.embed_tokens.weight").dtype == np.float16

    def test_missing_tensor(self):
        r = AprReader(make_test_apr())
        with pytest.raises(FormatError):
            r.load_tensor("nonexistent")

    def test_bad_magic(self):
        with pytest.raises(FormatError):
            AprReader(b"NOPE" + b"\x00" * 100)

    def test_crc_detects_corruption(self):
        data = bytearray(make_test_apr())
        data[200] ^= 0xFF
        r = AprReader(bytes(data))
        assert not r.verify_crc()

    def test_vocab_section(self):
        r = AprReader(make_test_apr(with_vocab=True))
        vb = r.read_vocabulary_bytes()
        assert vb is not None
        v = Vocabulary.from_bytes(vb)
        assert len(v) == 256
        assert v.merge_priority(b"a", b"b") == 0

    def test_filterbank_section(self):
        r = AprReader(make_test_apr(with_vocab=True, with_filterbank=True))
        fb = r.read_mel_filterbank()
        assert fb is not None
        assert fb.data.shape == (80, 201)
        assert r.verify_crc()

    def test_no_vocab_returns_none(self):
        r = AprReader(make_test_apr())
        assert r.read_vocabulary_bytes() is None
        assert r.read_mel_filterbank() is None


class TestValidator:
    def test_valid_file_passes_structural(self):
        r = AprReader(make_test_apr())
        report = AprValidator(r).validate_all()
        structural = report.checks_by_category("A")
        assert all(c.passed for c in structural)
        assert len(report.checks) == 25

    def test_corrupt_crc_fails(self):
        data = bytearray(make_test_apr())
        data[-1] ^= 0xFF
        report = AprValidator(AprReader(bytes(data))).validate_all()
        crc_check = [c for c in report.checks if c.id == 5][0]
        assert not crc_check.passed


class TestLz4:
    """Pure-Python LZ4 (reference: src/format/compress.rs)."""

    def test_roundtrip(self):
        from whisper_apr_tpu.format.compress import (
            compress_block, decompress_block)
        rng = np.random.default_rng(0)
        for data in (b"a", b"hello hello hello hello",
                     bytes(rng.integers(0, 256, 5000).tolist()),
                     b"xyz" * 40_000):
            assert decompress_block(compress_block(data), len(data)) == data

    def test_repetitive_compresses(self):
        from whisper_apr_tpu.format.compress import compress_block
        data = b"ab" * 10_000
        assert len(compress_block(data)) < len(data) // 50

    def test_corrupt_rejected(self):
        from whisper_apr_tpu.format.compress import (
            compress_block, decompress_block)
        from whisper_apr_tpu.errors import FormatError
        comp = bytearray(compress_block(b"hello world, hello world!"))
        with pytest.raises(FormatError):
            decompress_block(bytes(comp), 9999)  # wrong size

    def test_block_framing(self):
        from whisper_apr_tpu.format.compress import (
            compress_blocks, decompress_blocks)
        rng = np.random.default_rng(1)
        blob = bytes(rng.integers(0, 16, 200_000).tolist())
        assert decompress_blocks(compress_blocks(blob)) == blob


class TestCompressedApr:
    def test_compressed_roundtrip(self):
        cfg = ModelConfig.tiny()
        w = AprWriter.from_config(cfg)
        w.header.compressed = True
        rng = np.random.default_rng(2)
        t1 = rng.normal(size=(16, 8)).astype(np.float32)
        # a highly compressible tensor
        t2 = np.zeros((64, 64), np.float32)
        w.add_tensor("decoder.embed_tokens.weight", t1)
        w.add_tensor("encoder.conv1.bias", t2)
        v = Vocabulary.with_base_tokens()
        w.set_vocabulary(v.to_bytes())
        data = w.to_bytes()

        r = AprReader(data)
        assert r.header.compressed
        assert r.verify_crc()
        assert np.allclose(r.load_tensor("decoder.embed_tokens.weight"), t1)
        assert (r.load_tensor("encoder.conv1.bias") == 0).all()
        assert r.read_vocabulary_bytes() is not None

    def test_compressed_smaller_for_sparse(self):
        cfg = ModelConfig.tiny()
        plain = AprWriter.from_config(cfg)
        comp = AprWriter.from_config(cfg)
        comp.header.compressed = True
        z = np.zeros((256, 256), np.float32)
        plain.add_tensor("encoder.conv1.weight", z)
        comp.add_tensor("encoder.conv1.weight", z)
        assert len(comp.to_bytes()) < len(plain.to_bytes()) // 10


class TestIncrementalCrc32:
    def test_chunked_matches_oneshot(self):
        """Mutation survivor (mutate.py: finalize's & -> |): the
        incremental class must equal the one-shot function."""
        from whisper_apr_tpu.format.checksum import Crc32, crc32
        data = bytes(range(256)) * 11
        c = Crc32()
        for i in range(0, len(data), 97):
            c.update(data[i:i + 97])
        assert c.finalize() == crc32(data)
        assert 0 <= c.finalize() <= 0xFFFFFFFF
        # a fresh instance over empty data matches too
        assert Crc32().finalize() == crc32(b"")


class TestLz4FrameErrorPaths:
    """Frame-parser failure branches (round-3 coverage push)."""

    def _frame(self, data=b"hello world " * 10):
        from whisper_apr_tpu.format.compress import lz4_frame_compress
        return lz4_frame_compress(data), data

    def test_roundtrip_sanity(self):
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        frame, data = self._frame()
        assert lz4_frame_decompress(frame) == data

    def test_truncated_and_bad_magic(self):
        from whisper_apr_tpu.errors import FormatError
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        frame, _ = self._frame()
        with pytest.raises(FormatError):
            lz4_frame_decompress(frame[:5])
        with pytest.raises(FormatError):
            lz4_frame_decompress(b"\x00\x00\x00\x00" + frame[4:])

    def test_header_checksum_mismatch(self):
        from whisper_apr_tpu.errors import FormatError
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        frame, _ = self._frame()
        # flip the header-checksum byte (offset 6: magic 4 + FLG + BD)
        bad = bytearray(frame)
        bad[6] ^= 0xFF
        with pytest.raises(FormatError):
            lz4_frame_decompress(bytes(bad))

    def test_truncated_block(self):
        from whisper_apr_tpu.errors import FormatError
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        frame, _ = self._frame(b"abcabcabc" * 50)
        with pytest.raises(FormatError):
            lz4_frame_decompress(frame[:-6])  # cut inside the last block

    def test_bad_version_bits(self):
        from whisper_apr_tpu.errors import FormatError
        from whisper_apr_tpu.format.compress import (lz4_frame_decompress,
                                                     xxh32)
        frame, _ = self._frame()
        bad = bytearray(frame)
        bad[4] = (bad[4] & 0x3F) | 0x80          # version bits 0b10
        # refresh the header checksum so the version check is what trips
        desc = bytes(bad[4:6])
        bad[6] = (xxh32(desc) >> 8) & 0xFF
        with pytest.raises(FormatError):
            lz4_frame_decompress(bytes(bad))


class TestValidatorFailureBranches:
    """Corrupted-model checks must FAIL, not silently pass (round-3
    coverage push; reference: validation.rs per-check failure paths)."""

    def _bad_model_report(self, corrupt):
        """Build a tiny real-shaped model, corrupt it, validate."""
        import sys
        sys.path.insert(0, "tests")
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu.format.container import AprWriter
        from whisper_apr_tpu.format.validation import AprValidator
        from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
        cfg = small_config()
        hf = make_hf_twin(cfg, seed=0)
        sd = {k: v.detach().cpu().numpy()
              for k, v in hf.state_dict().items()}
        tensors = hf_state_dict_to_apr_tensors(sd)
        corrupt(tensors)
        w = AprWriter.from_config(cfg)
        for name, arr in tensors.items():
            w.add_tensor(name, arr)
        r = AprReader(w.to_bytes())
        return AprValidator(r).validate_all()

    def test_nan_ln_and_bad_means_fail(self):
        def corrupt(t):
            for name in list(t):
                if name.endswith("self_attn_layer_norm.weight"):
                    t[name] = t[name] * 0 + 100.0      # out-of-range mean
                if name.endswith("final_layer_norm.bias"):
                    bad = t[name].copy()
                    bad[0] = np.nan
                    t[name] = bad
        rep = self._bad_model_report(corrupt)
        assert not rep.passed
        failed = {c.id for c in rep.checks if not c.passed}
        assert 8 in failed or 9 in failed      # LN mean checks
        assert 10 in failed                    # NaN in LN

    def test_zero_embedding_fails(self):
        def corrupt(t):
            for name in list(t):
                if "embed_tokens" in name:
                    t[name] = np.zeros_like(t[name])
        rep = self._bad_model_report(corrupt)
        failed = {c.id for c in rep.checks if not c.passed}
        assert 17 in failed                    # token embedding stats

    def test_inf_attention_weight_fails(self):
        def corrupt(t):
            for name in list(t):
                if name.endswith("0.self_attn.q_proj.weight"):
                    bad = t[name].copy()
                    bad[0, 0] = np.inf
                    t[name] = bad
        rep = self._bad_model_report(corrupt)
        assert not rep.passed
