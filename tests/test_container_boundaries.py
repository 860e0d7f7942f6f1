"""Second-wave mutation killers for format/container.py (MUTATION.json
round-3e: 17 survivors after the first killer pass). Each test pins one
exact boundary; line refs are to container.py at the pinned revision."""

import struct

import numpy as np
import pytest

from whisper_apr_tpu.errors import FormatError
from whisper_apr_tpu.format import container as fc


def test_filterbank_truncated_raises_with_expected_count():
    # :266 len check arithmetic AND :268 message arithmetic
    orig = fc.MelFilterbankData(2, 3, np.arange(6, dtype=np.float32).reshape(2, 3))
    blob = orig.to_bytes()
    with pytest.raises(FormatError, match="expected 32 bytes"):
        fc.MelFilterbankData.from_bytes(blob[:-2])


def test_zero_tensor_compressed_flag_reads_sections():
    # :316 `compressed and n_tensors > 0`: with ZERO tensors the compressed
    # branch must be skipped entirely (there is no payload to parse)
    h = fc.AprHeader(compressed=True, n_tensors=0, has_vocab=True)
    data = fc.MAGIC + h.to_bytes() + struct.pack("<I", 5) + b"HELLO"
    r = fc.AprReader(data)
    assert r._payload is None
    assert r.read_vocabulary_bytes() == b"HELLO"


def _int8_file():
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_INT8))
    w.add_tensor("a", np.linspace(-1, 1, 64).astype(np.float32))
    return w.to_bytes()


def test_int8_tensor_at_exact_file_end_loads():
    # :386 `end > len(blob)` is strict: data ending exactly at the tensor
    # boundary (CRC stripped) still loads
    full = _int8_file()
    r0 = fc.AprReader(full)
    end = r0.tensor_data_offset + 64
    r = fc.AprReader(full[:end])
    assert r.load_raw("a").shape == (64,)


def test_f32_truncated_tensor_raises_format_error():
    # :409/:410 f32 bounds arithmetic
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("a", np.ones(16, np.float32))
    full = w.to_bytes()
    off = fc.AprReader(full).tensor_data_offset
    r = fc.AprReader(full[: off + 16 * 4 - 1])
    with pytest.raises(FormatError, match="out of bounds"):
        r.load_raw("a")


def _q4k_file():
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_Q4K))
    big = np.random.default_rng(3).standard_normal((64, 64)).astype(np.float32)
    w.add_tensor("w", big)
    return w.to_bytes(), big


def test_q4k_tensor_at_exact_file_end_loads():
    # :403 strict bound: super-block data ending exactly at file end loads
    full, _ = _q4k_file()
    r0 = fc.AprReader(full)
    desc = r0.tensors[0]
    end = r0.tensor_data_offset + desc.offset + desc.size
    r = fc.AprReader(full[:end])
    raw = r.load_raw("w")
    assert raw.dtype == np.uint8 and raw.shape == (16, 144)


def test_q4k_truncated_tensor_raises_format_error():
    # :402 bounds arithmetic on the super-block byte size
    full, _ = _q4k_file()
    r0 = fc.AprReader(full)
    desc = r0.tensors[0]
    end = r0.tensor_data_offset + desc.offset + desc.size
    r = fc.AprReader(full[: end - 1])
    with pytest.raises(FormatError, match="out of bounds"):
        r.load_raw("w")


def test_q4k_2d_weights_are_actually_quantized():
    # :539/:540 writer routing: a 2-D tensor of EXACTLY 4096 elements is
    # k-quant packed (size != count*4), so the roundtrip is lossy
    full, big = _q4k_file()
    r = fc.AprReader(full)
    desc = r.tensors[0]
    assert desc.size != desc.n_elements * 4      # packed, not f32
    loaded = r.load_tensor("w")
    assert not np.array_equal(loaded, big)       # quantization is lossy
    assert np.abs(loaded - big).max() < 0.5      # ...but accurate


def test_int8_all_zero_tensor_scale_is_one():
    # :535 `absmax > 0` strict: an all-zero tensor gets scale 1.0 (not 0,
    # which would poison the quantize divide)
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_INT8))
    w.add_tensor("z", np.zeros(8, np.float32))
    r = fc.AprReader(w.to_bytes())
    assert r.scale_for("z") == 1.0
    assert np.array_equal(r.load_tensor("z"), np.zeros(8, np.float32))


def test_compressed_header_truncated_message():
    # :320 arithmetic: file cut inside the comp_len field reports the
    # specific payload-header error (not a struct unpack crash)
    h = fc.AprHeader(compressed=True, n_tensors=1)
    desc = fc.TensorDescriptor("t", 0, 4, 1, (1, 0, 0, 0), 1)
    data = fc.MAGIC + h.to_bytes() + desc.to_bytes() + b"\x01\x02"
    with pytest.raises(FormatError, match="payload header"):
        fc.AprReader(data)


def test_magic_only_lz4_blob_routes_to_frame_decoder():
    # :327 `len(blob) >= 4` non-strict: a 4-byte blob equal to the LZ4
    # magic must route to the FRAME decoder (whose error names the frame),
    # not the legacy block decoder
    from whisper_apr_tpu.format.compress import LZ4_MAGIC
    h = fc.AprHeader(compressed=True, n_tensors=1)
    desc = fc.TensorDescriptor("t", 0, 4, 1, (1, 0, 0, 0), 1)
    blob = struct.pack("<I", LZ4_MAGIC)
    data = (fc.MAGIC + h.to_bytes() + desc.to_bytes()
            + struct.pack("<I", len(blob)) + blob)
    with pytest.raises(FormatError, match="LZ4 frame"):
        fc.AprReader(data)


def test_vocab_skip_truncated_filterbank_returns_none():
    # :461 arithmetic: filterbank read with the vocab-size field cut short
    # returns None (never a struct unpack crash)
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    w.set_vocabulary(b"VOCAB!")
    w.set_mel_filterbank(
        fc.MelFilterbankData(2, 3, np.arange(6, dtype=np.float32).reshape(2, 3)))
    data = w.to_bytes()
    start = fc.AprReader(data)._section_after_tensors()
    assert fc.AprReader(data[: start + 3]).read_mel_filterbank() is None


def test_zero_size_filterbank_section_raises():
    # :465 strict bound: has_filterbank + size field 0 + file ending right
    # there -> the parser reaches from_bytes(b"") and reports the format
    # error (the non-strict mutant would silently return None)
    h = fc.AprHeader(n_tensors=0, has_filterbank=True)
    data = fc.MAGIC + h.to_bytes() + struct.pack("<I", 0)
    with pytest.raises(FormatError, match="filterbank"):
        fc.AprReader(data).read_mel_filterbank()
