"""Round-3 coverage push: the dark paths the fresh line map showed.

Targets (tools/coverage.py --merge map, round 3): the pure-Python LZ4
fallback decoder + frame error paths (format/compress.py — the native C++
decoder normally shadows it), native/__init__ lib-unavailable fallbacks,
AprReader corrupt-file raises, QTensor surface + odd-shape quantizers,
ModelConfig preset table, CLI dispatch edges, and small engine branches.
Reference parity: the reference's error paths live in
src/format/compress.rs / mod.rs and are exercised by its inline tests.
"""

import struct

import numpy as np
import pytest

from whisper_apr_tpu.errors import FormatError


# ---------------------------------------------------------------------------
# LZ4: pure-Python fallback decoder (native shadowed)
# ---------------------------------------------------------------------------

@pytest.fixture()
def no_native(monkeypatch):
    """Force every native-accelerated path onto its Python fallback."""
    import whisper_apr_tpu.native as native
    monkeypatch.setattr(native, "lz4_decompress_block", lambda *a: None)
    return native


class TestLz4PythonFallback:
    def test_roundtrip_compressible(self, no_native):
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        data = b"abcd" * 200 + b"tail"        # long matches (>15 ext bytes)
        comp = compress_block(data)
        assert len(comp) < len(data)
        assert decompress_block(comp, len(data)) == data

    def test_roundtrip_incompressible(self, no_native):
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
        comp = compress_block(data)
        assert decompress_block(comp, len(data)) == data

    def test_long_literal_run(self, no_native):
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        rng = np.random.default_rng(1)
        # >=15 literals before a match forces the 15-extension literal path
        lit = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
        data = lit + b"abcd" * 50
        assert decompress_block(compress_block(data), len(data)) == data

    def test_truncated_literal_length(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        with pytest.raises(FormatError, match="literal length"):
            decompress_block(bytes([0xF0]), 100)

    def test_truncated_literals(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        with pytest.raises(FormatError, match="literals"):
            decompress_block(bytes([0x50, 65, 66]), 100)

    def test_truncated_match_offset(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        with pytest.raises(FormatError, match="match offset"):
            decompress_block(bytes([0x00, 0x01]), 100)

    def test_invalid_match_offset(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        with pytest.raises(FormatError, match="invalid LZ4 match offset"):
            decompress_block(bytes([0x00, 0x00, 0x00]), 100)

    def test_offset_beyond_output(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        # 1 literal then a match at offset 5 > len(out)=1
        with pytest.raises(FormatError, match="invalid LZ4 match offset"):
            decompress_block(bytes([0x10, 65, 0x05, 0x00]), 100)

    def test_truncated_match_length(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_block
        # lit=1, matchlen nibble 15 -> needs extension byte that's missing
        with pytest.raises(FormatError, match="match length"):
            decompress_block(bytes([0x1F, 65, 0x01, 0x00]), 100)

    def test_output_exceeds_declared_size(self, no_native):
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        comp = compress_block(b"a" * 300)
        with pytest.raises(FormatError):
            decompress_block(comp, 10)

    def test_python_matches_native(self):
        """The fallback and the C++ decoder agree byte-for-byte."""
        import whisper_apr_tpu.native as native
        from whisper_apr_tpu.format import compress as C
        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(2)
        for data in (b"xyz" * 333, rng.integers(0, 256, 777,
                                                dtype=np.uint8).tobytes()):
            comp = C.compress_block(data)
            fast = native.lz4_decompress_block(comp, len(data))
            assert fast == data
            # force the Python loop for the same payload
            orig = native.lz4_decompress_block
            try:
                native.lz4_decompress_block = lambda *a: None
                assert C._decode_block(comp, len(data)) == data
            finally:
                native.lz4_decompress_block = orig


class TestLz4BlocksFraming:
    def test_decompressor_class(self, no_native):
        from whisper_apr_tpu.format.compress import (Decompressor,
                                                     compress_block)
        d = Decompressor()
        data = b"hello world " * 40
        assert d.decompress_block(compress_block(data), len(data)) == data

    def test_blocks_truncated_header(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_blocks
        with pytest.raises(FormatError, match="block header"):
            decompress_blocks(b"\x01\x02\x03")

    def test_blocks_truncated_payload(self, no_native):
        from whisper_apr_tpu.format.compress import decompress_blocks
        blob = struct.pack("<II", 100, 50) + b"xx"
        with pytest.raises(FormatError, match="block payload"):
            decompress_blocks(blob)


class TestLz4Frames:
    def _frame(self, data):
        from whisper_apr_tpu.format.compress import lz4_frame_compress
        return bytearray(lz4_frame_compress(data))

    def test_roundtrip(self, no_native):
        from whisper_apr_tpu.format.compress import (lz4_frame_compress,
                                                     lz4_frame_decompress)
        for data in (b"", b"abc" * 1000,
                     np.random.default_rng(3).integers(
                         0, 256, 999, dtype=np.uint8).tobytes()):
            assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    def test_bad_magic(self, no_native):
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        f = self._frame(b"abc")
        f[0] ^= 0xFF
        with pytest.raises(FormatError, match="magic"):
            lz4_frame_decompress(bytes(f))

    def test_header_checksum_mismatch(self, no_native):
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        f = self._frame(b"abc")
        f[14] ^= 0xFF                       # hc byte (magic4+flg+bd+csize8)
        with pytest.raises(FormatError, match="header checksum"):
            lz4_frame_decompress(bytes(f))

    def test_invalid_block_size_code(self, no_native):
        from whisper_apr_tpu.format.compress import (lz4_frame_decompress,
                                                     xxh32)
        f = self._frame(b"abc")
        f[5] = 0x00                          # bd: block size code 0
        desc = bytes(f[4:14])
        f[14] = (xxh32(desc) >> 8) & 0xFF    # fix hc for modified desc
        with pytest.raises(FormatError, match="block size code"):
            lz4_frame_decompress(bytes(f))

    def test_truncated_block_header(self, no_native):
        from whisper_apr_tpu.format.compress import lz4_frame_decompress
        f = self._frame(b"abc")
        with pytest.raises(FormatError, match="frame block header"):
            lz4_frame_decompress(bytes(f[:15]))   # cut right after header

    def test_content_size_mismatch(self, no_native):
        from whisper_apr_tpu.format.compress import (lz4_frame_decompress,
                                                     xxh32)
        f = self._frame(b"abcd")
        f[6:14] = struct.pack("<Q", 9999)    # lie about content size
        desc = bytes(f[4:14])
        f[14] = (xxh32(desc) >> 8) & 0xFF
        with pytest.raises(FormatError, match="content size"):
            lz4_frame_decompress(bytes(f))

    def test_block_checksum_paths(self, no_native):
        from whisper_apr_tpu.format.compress import (LZ4_MAGIC,
                                                     lz4_frame_decompress,
                                                     xxh32)
        # hand-build a frame with block checksums (flg bit 0x10)
        payload = b"stored-data"
        flg = 0x40 | 0x10                    # version 01, B.Checksum
        bd = 0x40
        desc = bytes([flg, bd])
        hc = (xxh32(desc) >> 8) & 0xFF
        block = struct.pack("<I", len(payload) | 0x80000000) + payload
        good = (struct.pack("<I", LZ4_MAGIC) + desc + bytes([hc]) + block
                + struct.pack("<I", xxh32(payload))
                + struct.pack("<I", 0))
        assert lz4_frame_decompress(good) == payload
        bad = (struct.pack("<I", LZ4_MAGIC) + desc + bytes([hc]) + block
               + struct.pack("<I", xxh32(payload) ^ 1)
               + struct.pack("<I", 0))
        with pytest.raises(FormatError, match="block checksum"):
            lz4_frame_decompress(bad)


# ---------------------------------------------------------------------------
# native/__init__: unavailable-library fallbacks
# ---------------------------------------------------------------------------

class TestNativeFallbacks:
    def test_all_fallbacks_when_lib_missing(self, monkeypatch):
        import whisper_apr_tpu.native as native
        monkeypatch.setattr(native, "get_lib", lambda: None)
        assert native.crc32(b"Hello, World!") == 0xEC4AC3D0  # zlib fallback
        assert native.resample_sinc(np.zeros(10, np.float32),
                                    8000, 16000) is None
        assert native.pcm16_to_f32_mono(np.zeros(4, np.int16), 2) is None
        assert native.lz4_decompress_block(b"\x00", 4) is None
        assert native.frame_energy_zcr(np.zeros(100, np.float32),
                                       25) is None

    def test_build_failure_path(self, tmp_path, monkeypatch):
        import whisper_apr_tpu.native as native
        bad_src = tmp_path / "bad.cpp"
        bad_src.write_text("this is not C++")
        monkeypatch.setattr(native, "_SRC", str(bad_src))
        monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "out.so"))
        assert native._build() is None       # g++ fails -> None


# ---------------------------------------------------------------------------
# AprReader: corrupt-file raises
# ---------------------------------------------------------------------------

class TestContainerCorruption:
    def _apr(self, **kw):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_format import make_test_apr
        return make_test_apr(**kw)

    def test_unsupported_version(self):
        from whisper_apr_tpu.format.container import AprReader
        data = bytearray(self._apr())
        data[4:6] = struct.pack("<H", 99)    # version field
        with pytest.raises(FormatError):
            AprReader(bytes(data))

    def test_file_too_short_for_index(self):
        from whisper_apr_tpu.format.container import AprReader
        data = self._apr()
        with pytest.raises(FormatError):
            AprReader(data[:80])

    def test_scale_table_requires_int8(self):
        from whisper_apr_tpu.format.container import AprReader
        r = AprReader(self._apr())              # f32 model
        with pytest.raises(FormatError, match="scale table"):
            r.scale_for("encoder.conv1.weight")

    def test_tensor_names(self):
        from whisper_apr_tpu.format.container import AprReader
        r = AprReader(self._apr())
        assert "encoder.conv1.weight" in r.tensor_names()


class TestWriterValidation:
    def test_name_too_long(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.format.container import AprWriter
        w = AprWriter.from_config(ModelConfig.tiny())
        with pytest.raises(FormatError, match="name too long"):
            w.add_tensor("x" * 64, np.zeros(4, np.float32))

    def test_rank_too_high(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.format.container import AprWriter
        w = AprWriter.from_config(ModelConfig.tiny())
        with pytest.raises(FormatError, match="rank"):
            w.add_tensor("t", np.zeros((1, 1, 1, 1, 1), np.float32))


# ---------------------------------------------------------------------------
# QTensor surface + odd-shape quantizers (ops/quant.py)
# ---------------------------------------------------------------------------

class TestQuantSurface:
    def test_qtensor_properties(self):
        from whisper_apr_tpu.ops.quant import quantize_int8, quantize_int4
        q = quantize_int8(np.ones((8, 4), np.float32))
        assert q.shape == (8, 4)
        assert q.size == 32
        assert str(q.dtype) == "int8"
        assert "int8" in repr(q)
        q4 = quantize_int4(np.ones((8, 4), np.float32))
        assert "int4" in repr(q4)

    def test_quantize_1d_falls_back_to_per_tensor(self):
        from whisper_apr_tpu.ops.quant import (dequant, quantize_int4,
                                               quantize_int8)
        w = np.linspace(-1, 1, 7).astype(np.float32)
        for quant in (quantize_int8, quantize_int4):
            q = quant(w, per_channel=True, stacked=True)  # ndim<=1 branch
            err = np.abs(np.asarray(dequant(q))[: len(w)] - w).max()
            assert err < 0.2

    def test_group_quant_odd_shapes(self):
        from whisper_apr_tpu.ops.quant import dequant, quantize_q4_block
        # K not divisible by group -> falls back to per-channel int4
        w = np.random.default_rng(0).normal(size=(12, 6)).astype(np.float32)
        q = quantize_q4_block(w, group=32)
        deq = np.asarray(dequant(q))[:, :6]
        assert np.abs(deq - w).max() < 0.5
        # 1-D input -> plain int4
        w1 = np.linspace(-2, 2, 9).astype(np.float32)
        q1 = quantize_q4_block(w1)
        assert np.abs(np.asarray(dequant(q1))[: 9] - w1).max() < 0.5

    def test_group_quant_odd_last_dim(self):
        from whisper_apr_tpu.ops.quant import dequant, quantize_q4_block
        w = np.random.default_rng(1).normal(size=(64, 5)).astype(np.float32)
        q = quantize_q4_block(w, group=32)   # odd N -> pair padding
        deq = np.asarray(dequant(q))[:, :5]
        assert np.abs(deq - w).max() < 0.5


# ---------------------------------------------------------------------------
# ModelConfig presets + ComputeConfig validation
# ---------------------------------------------------------------------------

class TestConfigSurface:
    def test_all_presets_valid(self):
        from whisper_apr_tpu.config import ModelConfig
        for name in ("tiny.en", "base", "base.en", "small.en", "medium.en",
                     "large", "large-v1", "large-v2"):
            cfg = ModelConfig.from_name(name)
            assert cfg.n_text_state % cfg.n_text_head == 0
            assert cfg.model_type == name
        assert not ModelConfig.tiny_en().is_multilingual
        assert ModelConfig.base().is_multilingual

    def test_invalid_head_division(self):
        import dataclasses
        from whisper_apr_tpu.config import ConfigError, ModelConfig
        with pytest.raises(ConfigError, match="n_text_state"):
            dataclasses.replace(ModelConfig.tiny(), n_text_head=5)

    def test_compute_config_kv_mode_validation(self):
        from whisper_apr_tpu.config import ComputeConfig
        with pytest.raises(ValueError, match="kv_mode"):
            ComputeConfig(kv_mode="fp16")
        cc = ComputeConfig(kv_mode="int8")
        assert cc.replace(kv_mode="bf16").kv_mode == "bf16"


# ---------------------------------------------------------------------------
# CLI dispatch edges
# ---------------------------------------------------------------------------

class TestCliDispatch:
    def test_unknown_command(self, capsys):
        # argparse rejects unknown subcommands at the parser boundary
        from whisper_apr_tpu.cli import run
        with pytest.raises(SystemExit):
            run(["definitely-not-a-command"])
        assert "invalid choice" in capsys.readouterr().err

    def test_error_boundary(self, capsys):
        from whisper_apr_tpu.cli import run
        rc = run(["model", "-m", "/nonexistent/path.apr"])
        assert rc == 1
        assert "error" in capsys.readouterr().err

    def test_main_exits(self, monkeypatch):
        import whisper_apr_tpu.cli as cli
        monkeypatch.setattr("sys.argv", ["apr", "definitely-not-a-command"])
        with pytest.raises(SystemExit):
            cli.main()


# ---------------------------------------------------------------------------
# Engine small branches
# ---------------------------------------------------------------------------

class TestEngineBranches:
    def test_is_float_helper(self):
        from whisper_apr_tpu.engine import _is_float
        assert _is_float("0.5")
        assert not _is_float("abc")

    def test_batch_result_len(self):
        from whisper_apr_tpu.engine import (BatchTranscriptionResult,
                                            TranscriptionResult)
        r = TranscriptionResult("hi", "en", [], [])
        b = BatchTranscriptionResult([r, r], 0.1)
        assert len(b) == 2


# ---------------------------------------------------------------------------
# Validator FAIL branches not hit by the existing corrupted-model tests
# ---------------------------------------------------------------------------

class TestValidatorMoreBranches:
    def _report(self, mutate_tensors=None, writer_tweak=None):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu.format.container import AprReader, AprWriter
        from whisper_apr_tpu.format.validation import AprValidator
        from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
        cfg = small_config()
        hf = make_hf_twin(cfg, seed=0)
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        tensors = hf_state_dict_to_apr_tensors(sd)
        if mutate_tensors:
            mutate_tensors(tensors)
        w = AprWriter.from_config(cfg)
        for name, arr in tensors.items():
            w.add_tensor(name, arr)
        if writer_tweak:
            writer_tweak(w)
        return AprValidator(AprReader(w.to_bytes())).validate_all()

    def test_empty_model_fails_structure(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.format.container import AprReader, AprWriter
        from whisper_apr_tpu.format.validation import AprValidator
        w = AprWriter.from_config(ModelConfig.tiny())
        rep = AprValidator(AprReader(w.to_bytes())).validate_all()
        failed = {c.id for c in rep.checks if not c.passed}
        assert 3 in failed                     # no tensors
        assert 6 in failed and 7 in failed     # LN weights not found
        assert 16 in failed                    # token embedding not found
        assert not rep.passed
        text = rep.summary()
        assert "FAIL" in text and "!!" in text

    def test_bad_qkv_and_ffn_means(self):
        def corrupt(t):
            for name in list(t):
                if name.endswith("0.self_attn.q_proj.weight"):
                    t[name] = t[name] + 5.0          # mean far from 0
                if name.endswith("0.fc1.weight"):
                    t[name] = t[name] + 5.0
        rep = self._report(corrupt)
        failed = {c.id for c in rep.checks if not c.passed}
        assert 11 in failed and 12 in failed

    def test_huge_std_fails(self):
        def corrupt(t):
            for name in list(t):
                if name.endswith("0.self_attn.v_proj.weight"):
                    t[name] = t[name] * 1000.0       # std > 20
        rep = self._report(corrupt)
        failed = {c.id for c in rep.checks if not c.passed}
        assert 13 in failed

    def test_wrong_embedding_shapes(self):
        def corrupt(t):
            for name in list(t):
                if "embed_positions" in name and "decoder" in name:
                    t[name] = t[name][:-1]           # wrong n_text_ctx
        rep = self._report(corrupt)
        failed = {c.id for c in rep.checks if not c.passed}
        assert 18 in failed


# ---------------------------------------------------------------------------
# Paged cache dark paths + quantized token embeddings
# ---------------------------------------------------------------------------

class TestPagedDarkPaths:
    def _paged(self):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from helpers import small_config
        from whisper_apr_tpu.model.kv_variants import PagedKVCache
        cfg = small_config()
        return PagedKVCache(cfg, n_pages=8), cfg

    def test_page_table_padded(self):
        pk, cfg = self._paged()
        pk.alloc(7, 3)
        tab = pk.page_table(7, 6)
        assert tab.shape == (6,)
        assert (tab[3:] == 0).all()

    def test_fetch_empty_sequence(self):
        pk, _ = self._paged()
        pk.alloc(1, 1)
        pk._lengths[1] = 0
        k, v = pk.gather_layer(1, layer=0)
        assert k.shape[0] == 0 and v.shape[0] == 0

    def test_fetch_unknown_raises(self):
        from whisper_apr_tpu.errors import InferenceError
        pk, _ = self._paged()
        with pytest.raises(InferenceError):
            pk.gather_layer(99, layer=0)
        with pytest.raises(InferenceError):
            pk.gather(99)


class TestQuantizedTokenEmbedding:
    def test_decode_step_multi_int8_params(self):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        import jax.numpy as jnp
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu.model.decoder import init_cache
        from whisper_apr_tpu.model.encoder import encode_jit
        from whisper_apr_tpu.model.kv_variants import decode_step_multi
        from whisper_apr_tpu.model.params import (params_from_hf_model,
                                                  quantize_params)
        cfg = small_config()
        params = quantize_params(
            params_from_hf_model(make_hf_twin(cfg), cfg), "int8")
        rng = np.random.default_rng(0)
        mel = rng.normal(size=(1, 2 * cfg.n_audio_ctx,
                               cfg.n_mels)).astype(np.float32)
        enc = encode_jit(params, jnp.asarray(mel), cfg)
        cache = init_cache(params, enc, cfg, max_len=8)
        logits, cache = decode_step_multi(
            params, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32), cache, cfg)
        assert np.isfinite(np.asarray(logits)).all()


class TestXxh32KnownAnswers:
    """Known-answer vectors (xxHash spec / python-xxhash docs): the frame
    round-trip tests are SELF-consistent (compressor and decompressor
    share the implementation), so only pinned digests catch a wrong
    constant or rotation — the round-3 mutation run proved every xxh32
    mutant survived without these."""

    def test_vectors(self):
        from whisper_apr_tpu.format.compress import xxh32
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"a") == 0x550D7456
        assert xxh32(b"abc") == 0x32D153FF
        # >=16 bytes: exercises the 4-lane stripe loop
        assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F

    def test_seed_changes_digest(self):
        from whisper_apr_tpu.format.compress import xxh32
        assert xxh32(b"abc", 1) != xxh32(b"abc", 0)

    def test_against_independent_spec_implementation(self):
        """From-spec scalar xxh32 written independently here; random
        lengths 0..40 cover every stripe/lane/byte tail combination —
        including the tail lane ending exactly at EOF (i == n-4), which
        the known-answer vectors miss (mutation survivor Lt->LtE @247)."""
        from whisper_apr_tpu.format.compress import xxh32
        P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                              668265263, 374761393)
        M = 0xFFFFFFFF

        def rotl(x, r):
            return ((x << r) | (x >> (32 - r))) & M

        def ref_xxh32(data, seed=0):
            n, i = len(data), 0
            if n >= 16:
                v1, v2 = (seed + P1 + P2) & M, (seed + P2) & M
                v3, v4 = seed & M, (seed - P1) & M
                while i + 16 <= n:
                    for j, v in enumerate((v1, v2, v3, v4)):
                        lane = int.from_bytes(data[i + 4 * j:i + 4 * j + 4],
                                              "little")
                        v = (v + lane * P2) & M
                        v = (rotl(v, 13) * P1) & M
                        if j == 0:
                            v1 = v
                        elif j == 1:
                            v2 = v
                        elif j == 2:
                            v3 = v
                        else:
                            v4 = v
                    i += 16
                h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
                     + rotl(v4, 18)) & M
            else:
                h = (seed + P5) & M
            h = (h + n) & M
            while i + 4 <= n:
                lane = int.from_bytes(data[i:i + 4], "little")
                h = (h + lane * P3) & M
                h = (rotl(h, 17) * P4) & M
                i += 4
            while i < n:
                h = (h + data[i] * P5) & M
                h = (rotl(h, 11) * P1) & M
                i += 1
            h ^= h >> 15
            h = (h * P2) & M
            h ^= h >> 13
            h = (h * P3) & M
            h ^= h >> 16
            return h

        rng = np.random.default_rng(11)
        for n in range(41):
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert xxh32(data) == ref_xxh32(data), n
            assert xxh32(data, 7) == ref_xxh32(data, 7), n

    def test_decompress_block_size_cap_boundary(self, no_native):
        """Exactly MAX_BLOCK_SIZE must decompress; one byte over raises
        (mutation survivor Gt->GtE @26)."""
        from whisper_apr_tpu.format.compress import (MAX_BLOCK_SIZE,
                                                     compress_block,
                                                     decompress_block)
        from whisper_apr_tpu.errors import FormatError
        data = b"\x00" * MAX_BLOCK_SIZE
        comp = compress_block(data)
        assert decompress_block(comp, MAX_BLOCK_SIZE) == data
        with pytest.raises(FormatError):
            decompress_block(comp, MAX_BLOCK_SIZE + 1)


class TestLz4BoundaryLengths:
    def test_literal_run_exactly_270(self, no_native):
        """lit_len == 270 puts the extension byte exactly at 255: the
        encoder must emit [255, 0], not a bare [255] (mutation survivor
        cmp GtE->Gt @emit)."""
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        rng = np.random.default_rng(7)
        lit = rng.integers(0, 256, 270, dtype=np.uint8).tobytes()
        data = lit + b"abcd" * 10
        assert decompress_block(compress_block(data), len(data)) == data

    def test_match_len_boundaries(self, no_native):
        from whisper_apr_tpu.format.compress import (compress_block,
                                                     decompress_block)
        # match lengths around the 19 (=15+4) extension threshold and the
        # 274 (=255+15+4) second-extension-byte boundary
        for mlen in (18, 19, 20, 273, 274, 275):
            data = b"Q" * mlen + b"%" + b"Q" * mlen + b"#tail-bytes#"
            assert decompress_block(compress_block(data),
                                    len(data)) == data


class TestWavParserBoundaries:
    """Mutation-survivor killers for the WAV chunk walker (audio/wav.py):
    exact-boundary sizes and misordered conditions that self-consistent
    round-trip tests cannot distinguish."""

    @staticmethod
    def _wav(wave_tag=b"WAVE", fmt_body=None, chunks=(), data=b""):
        import struct as st
        if fmt_body is None:
            fmt_body = st.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        body = bytearray()
        body += b"fmt " + st.pack("<I", len(fmt_body)) + fmt_body
        for cid, cbody in chunks:
            body += cid + st.pack("<I", len(cbody)) + cbody
            if len(cbody) & 1:
                body += b"\x00"                  # writer pads; parser must
        body += b"data" + st.pack("<I", len(data)) + data
        riff = b"RIFF" + st.pack("<I", 4 + len(body)) + wave_tag + bytes(body)
        return riff

    def test_minimal_44_byte_file(self):
        from whisper_apr_tpu.audio.wav import parse_wav
        f = self._wav()                          # header only, 0 samples
        assert len(f) == 44
        samples, sr = parse_wav(f)
        assert sr == 16000 and len(samples) == 0

    def test_wave_tag_checked_independently(self):
        from whisper_apr_tpu.audio.wav import parse_wav
        from whisper_apr_tpu.errors import AudioError
        f = self._wav(wave_tag=b"XXXX")
        with pytest.raises(AudioError, match="RIFF/WAVE"):
            parse_wav(f)

    def test_odd_sized_chunk_alignment(self):
        import struct as st
        from whisper_apr_tpu.audio.wav import parse_wav
        pcm = st.pack("<4h", 1000, -1000, 2000, -2000)
        f = self._wav(chunks=((b"LIST", b"odd"),), data=pcm)
        samples, sr = parse_wav(f)
        assert len(samples) == 4
        np.testing.assert_allclose(samples[0], 1000 / 32768.0, atol=1e-6)

    def test_truncated_fmt_chunk(self):
        import struct as st
        from whisper_apr_tpu.audio.wav import parse_wav
        from whisper_apr_tpu.errors import AudioError
        f = self._wav(fmt_body=st.pack("<HHI", 1, 1, 16000),   # 8 < 16
                      data=b"\x00" * 12)                # keep len >= 44
        with pytest.raises(AudioError, match="fmt"):
            parse_wav(f)

    def test_plain_pcm_with_long_fmt_not_extensible(self):
        import struct as st
        from whisper_apr_tpu.audio.wav import parse_wav
        # format code 1 with a 26-byte fmt body: the extensible GUID
        # rewrite must NOT fire (it only applies to code 0xFFFE)
        fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\x99" * 14
        pcm = st.pack("<2h", 123, -123)
        samples, sr = parse_wav(self._wav(fmt_body=fmt, data=pcm))
        assert sr == 8000 and len(samples) == 2

    def test_extensible_fmt_exactly_26_bytes(self):
        import struct as st
        from whisper_apr_tpu.audio.wav import parse_wav
        # 0xFFFE + fmt of exactly 26 bytes: GUID format code at offset 24
        fmt = (st.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
               + st.pack("<HHHH", 16, 22, 0, 1))[:24] + st.pack("<H", 1)
        pcm = st.pack("<2h", 500, -500)
        samples, sr = parse_wav(self._wav(fmt_body=fmt, data=pcm))
        assert len(samples) == 2


class TestValidatorGoodModelStrict:
    """A clean real-shaped model must pass EVERY check with an empty
    critical list — kills the mutation survivors that flip a condition
    and silently fail (or mis-collect) checks on good models."""

    def _validate(self, mutate_tensors=None, extra=None):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu.format.container import AprReader, AprWriter
        from whisper_apr_tpu.format.validation import AprValidator
        from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
        cfg = small_config()
        hf = make_hf_twin(cfg, seed=0)
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        tensors = hf_state_dict_to_apr_tensors(sd)
        if mutate_tensors:
            mutate_tensors(tensors)
        if extra:
            tensors.update(extra)
        w = AprWriter.from_config(cfg)
        for name, arr in tensors.items():
            w.add_tensor(name, arr)
        return AprValidator(AprReader(w.to_bytes())).validate_all()

    def test_every_check_passes(self):
        rep = self._validate()
        failed = [(c.id, c.message) for c in rep.checks if not c.passed]
        assert failed == []
        assert rep.critical_failures == []
        assert rep.passed

    def test_ln_bias_mean_exactly_two_passes(self):
        # |mean| == 2.0 sits ON the boundary: the check is strict-greater
        def corrupt(t):
            for name in list(t):
                if name.endswith("0.final_layer_norm.bias"):
                    t[name] = np.full_like(t[name], 2.0)
        rep = self._validate(corrupt)
        assert all(c.passed for c in rep.checks if c.id == 9)

    def test_1d_weight_huge_std_ignored(self):
        # the std sweep applies to matrices only (n_dims >= 2)
        extra = {"extra.weight":
                 (np.random.default_rng(0).normal(size=32) * 1000)
                 .astype(np.float32)}
        rep = self._validate(extra=extra)
        assert all(c.passed for c in rep.checks if c.id == 13)


class TestBpeBoundaries:
    """BPE serialization / HF-import mutation-survivor killers."""

    def test_from_bytes_empty_vocab_exact_8(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary.from_bytes(struct.pack("<II", 0, 0))
        assert len(v) == 0

    def test_roundtrip_zero_length_and_tail_token(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary()
        v.add_token(b"")                      # zero-length token
        v.add_token(b"end-of-buffer")         # last bytes of the stream
        w = Vocabulary.from_bytes(v.to_bytes())
        assert len(w) == 2
        assert w.get_id(b"end-of-buffer") == 1

    def test_hf_import_dense_ids_no_fillers(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary.from_hf_files({"a": 0, "b": 1, "c": 2}, [])
        assert len(v) == 3
        assert v.get_id(b"a") == 0 and v.get_id(b"c") == 2

    def test_hf_import_merges_applied_comments_ignored(self):
        from whisper_apr_tpu.tokenizer.bpe import BpeTokenizer, Vocabulary
        vocab_json = {"a": 0, "b": 1, "ab": 2}
        v = Vocabulary.from_hf_files(vocab_json, ["#x y", "", "a b"])
        tok = BpeTokenizer(v)
        assert tok.encode("ab") == [2]        # merge a+b -> ab applied
        # the comment line must NOT have produced a bogus merge
        assert v.get_id(b"#x") is None

    def test_decode_with_options_drops_eot_itself(self):
        import whisper_apr_tpu.tokenizer.special_tokens as st
        from whisper_apr_tpu.tokenizer.bpe import BpeTokenizer, Vocabulary
        v = Vocabulary()
        for i in range(4):
            v.add_token(b"t%d" % i)
        eot = st.SpecialTokens.for_vocab_size(len(v)).eot
        tok = BpeTokenizer(v)
        assert tok.decode_with_options([0, eot], skip_special=True) == "t0"


# ---------------------------------------------------------------------------
# Small utility dark paths (memory, detection, trace, progress, mel)
# ---------------------------------------------------------------------------

class TestUtilityDarkPaths:
    def test_memory_stats_backends_without_support(self):
        from whisper_apr_tpu.utils.memory import (MemoryStats,
                                                  device_memory_stats)

        class NoStats:
            pass

        class RaisingStats:
            def memory_stats(self):
                raise RuntimeError("nope")

        class EmptyStats:
            def memory_stats(self):
                return {}

        class FullStats:
            def memory_stats(self):
                return {"bytes_in_use": 10, "bytes_limit": 100}

        assert device_memory_stats(NoStats()) is None
        assert device_memory_stats(RaisingStats()) is None
        assert device_memory_stats(EmptyStats()) is None
        st = device_memory_stats(FullStats())
        assert st.utilization == pytest.approx(0.1)
        assert MemoryStats(5, 0, 5).utilization == 0.0

    def test_detection_min_confidence_floor(self):
        from whisper_apr_tpu.detection import LanguageDetector
        import whisper_apr_tpu.tokenizer.special_tokens as st
        specials = st.SpecialTokens.for_vocab_size(51_865)
        logits = np.zeros(51_865, np.float32)   # uniform -> low confidence
        det = LanguageDetector(min_confidence=0.99)
        lang, p, probs = det.detect(logits)
        assert lang == "en" and p < 0.99

    def test_profile_context_manager(self, tmp_path, monkeypatch):
        import whisper_apr_tpu.utils.trace as trace
        calls = []
        import jax
        monkeypatch.setattr(jax.profiler, "start_trace",
                            lambda d: calls.append(("start", d)))
        monkeypatch.setattr(jax.profiler, "stop_trace",
                            lambda: calls.append(("stop",)))
        with trace.profile(str(tmp_path)):
            pass
        assert calls[0][0] == "start" and calls[-1] == ("stop",)

    def test_progress_start_phase_and_bytes(self):
        from whisper_apr_tpu.utils.progress import (ProgressTracker,
                                                    format_bytes)
        p = ProgressTracker.model_loading()
        p.start_phase(p.phases[1].name)
        assert p._idx == 1
        p.start_phase("not-a-phase")          # no-op
        assert p._idx == 1
        assert format_bytes(10) == "10 B"
        assert "KB" in format_bytes(2048) or "KiB" in format_bytes(2048)

    def test_quantize_row_helper(self):
        from whisper_apr_tpu.ops.decode_attention import quantize_row
        import jax.numpy as jnp
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 8)).astype(np.float32))
        q, s = quantize_row(x)
        deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        np.testing.assert_allclose(deq, np.asarray(x), atol=np.asarray(s).max())

    def test_mel_scale_helpers_roundtrip(self):
        from whisper_apr_tpu.audio.mel import hz_to_mel_htk, mel_to_hz_htk
        for hz in (0.0, 440.0, 8000.0):
            assert mel_to_hz_htk(hz_to_mel_htk(hz)) == pytest.approx(hz)

    def test_mel_filterbank_shape_validation(self):
        from whisper_apr_tpu.audio.mel import MelFilterbank
        from whisper_apr_tpu.errors import AudioError
        with pytest.raises(AudioError, match="filterbank shape"):
            MelFilterbank(np.zeros((80, 7), np.float32), n_fft=400)

    def test_compute_mel_convenience_truncates_long_audio(self):
        from whisper_apr_tpu.audio.mel import log_mel_spectrogram as compute_mel
        long_audio = np.zeros(16_000 * 31, np.float32)   # > 30 s
        m = compute_mel(long_audio, n_mels=80, pad_to_30s=True)
        assert m.shape[0] == 3000
        short = compute_mel(np.zeros(4000, np.float32), n_mels=80,
                            pad_to_30s=False)
        assert short.shape[1] == 80


class TestBpeTruncationGuards:
    """from_bytes must raise on every truncation point (the guards are
    dead code on well-formed input, so round-trips can't kill their
    mutants)."""

    def _vocab_bytes(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary()
        v.add_token(b"alpha")
        v.add_token(b"beta")
        v.add_merge_rule(b"al", b"pha")
        return v.to_bytes()

    def test_truncations_raise_everywhere(self):
        from whisper_apr_tpu.errors import TokenizerError
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        data = self._vocab_bytes()
        # cut at every byte boundary: anything shorter than the full
        # stream must raise, never mis-parse
        for cut in range(8, len(data)):
            with pytest.raises(TokenizerError):
                Vocabulary.from_bytes(data[:cut])

    def test_hf_import_gap_fillers(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary.from_hf_files({"a": 0, "z": 5}, [])
        assert len(v) == 6
        assert v.get_id(b"z") == 5
        assert v.get_id(b"<|unused_3|>") == 3   # exact filler names

    def test_comment_merge_line_ignored(self):
        from whisper_apr_tpu.tokenizer.bpe import Vocabulary
        v = Vocabulary.from_hf_files({"a": 0, "b": 1}, ["#x y"])
        assert v.merge_priority(b"#x", b"y") is None


class TestTimestampGrammarUnit:
    """Direct unit tests of the in-loop grammar masks — the round-3
    mutation run showed the E2E timestamp tests leave most rule
    comparisons unconstrained (33% kill). Vocab layout: ids 0..8 text,
    9 EOT, 10.. timestamps (base 10)."""

    BASE, EOT = 10, 9

    def _mask(self, state, is_first=False, B=1, V=70, logits=None):
        import jax.numpy as jnp
        from whisper_apr_tpu.inference.timestamp_rules import apply_rules
        lg = (jnp.zeros((B, V), jnp.float32) if logits is None
              else jnp.asarray(logits, jnp.float32))
        out = apply_rules(lg, state, self.BASE, self.EOT,
                          jnp.full((B,), is_first, bool))
        return np.asarray(out)

    def _state(self, last=False, penult=False, max_ts=0, n=0):
        import jax.numpy as jnp
        from whisper_apr_tpu.inference.timestamp_rules import TimestampState
        return TimestampState(
            last_was_ts=jnp.asarray([last]),
            penult_was_ts=jnp.asarray([penult]),
            max_ts=jnp.asarray([max_ts], jnp.int32),
            n_sampled=jnp.asarray([n], jnp.int32))

    def test_rule1_first_token_window(self):
        from whisper_apr_tpu.inference.timestamp_rules import (
            MAX_INITIAL_TIMESTAMP_STEPS)
        cap = self.BASE + MAX_INITIAL_TIMESTAMP_STEPS
        out = self._mask(self._state(), is_first=True)[0]
        assert (out[: self.BASE] < -1e30).all()          # text + EOT masked
        assert out[self.BASE] == 0.0                     # <|t0|> allowed
        assert out[cap] == 0.0                           # cap INCLUSIVE
        assert out[cap + 1] < -1e30                      # beyond cap masked

    def test_rule2b_after_opening_ts_text_required(self):
        # opening <|t0|>: n_sampled=1 counts penult as ts -> pair branch
        out = self._mask(self._state(last=True, penult=False,
                                     max_ts=self.BASE, n=1))[0]
        assert (out[self.BASE:] < -1e30).all()           # no timestamps
        assert out[0] == 0.0                             # text allowed

    def test_rule2a_lone_closing_ts_forces_pair(self):
        # strong EOT logit so rule 4 (timestamp-mass) does not also fire
        lg = np.zeros((1, 70), np.float32)
        lg[0, self.EOT] = 8.0
        out = self._mask(self._state(last=True, penult=False,
                                     max_ts=12, n=5), logits=lg)[0]
        assert (out[:9] < -1e30).all()                   # text masked
        assert out[self.EOT] > -1e30                     # EOT allowed
        assert out[12] > -1e30                           # REPEAT allowed
        assert out[11] < -1e30                           # below last masked

    def test_rule3_strict_increase_after_pair(self):
        out = self._mask(self._state(last=False, penult=False,
                                     max_ts=12, n=6))[0]
        assert out[12] < -1e30                           # no repeat
        assert out[13] == 0.0                            # strictly greater

    def test_rule4_timestamp_mass_forces_timestamp(self):
        lg = np.zeros((1, 70), np.float32)
        lg[0, self.BASE:] = 3.0                          # ts mass dominates
        out = self._mask(self._state(last=False, penult=True,
                                     max_ts=0, n=4), logits=lg)[0]
        assert (out[: self.BASE] < -1e30).all()          # all text masked
        assert out[self.BASE] > -1e30

    def test_rule4_not_forced_when_text_dominates(self):
        lg = np.zeros((1, 70), np.float32)
        lg[0, 3] = 8.0                                   # one strong text tok
        out = self._mask(self._state(last=False, penult=True,
                                     max_ts=0, n=4), logits=lg)[0]
        assert out[3] > -1e30                            # text survives

    def test_update_state_transitions(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.inference.timestamp_rules import (init_state,
                                                               update_state)
        s = init_state(1)
        s = update_state(s, jnp.asarray([12]), self.BASE)     # timestamp
        assert bool(s.last_was_ts[0]) and int(s.max_ts[0]) == 12
        assert int(s.n_sampled[0]) == 1
        s = update_state(s, jnp.asarray([3]), self.BASE)      # text
        assert not bool(s.last_was_ts[0]) and bool(s.penult_was_ts[0])
        assert int(s.max_ts[0]) == 12                         # unchanged
        s = update_state(s, jnp.asarray([11]), self.BASE)     # lower ts
        assert int(s.max_ts[0]) == 12                         # max kept
        assert int(s.n_sampled[0]) == 3

    def test_lone_closing_at_exactly_two_sampled(self):
        # [text, ts] -> n_sampled == 2 sits ON the penult-convention
        # boundary: it must count as a LONE closing timestamp (pair forced)
        lg = np.zeros((1, 70), np.float32)
        lg[0, self.EOT] = 8.0
        out = self._mask(self._state(last=True, penult=False,
                                     max_ts=12, n=2), logits=lg)[0]
        assert (out[:9] < -1e30).all()                   # text masked

    def test_update_state_token_exactly_base_is_timestamp(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.inference.timestamp_rules import (init_state,
                                                               update_state)
        s = update_state(init_state(1), jnp.asarray([self.BASE]), self.BASE)
        assert bool(s.last_was_ts[0])                    # <|t0|> IS a ts
        assert int(s.max_ts[0]) == self.BASE
