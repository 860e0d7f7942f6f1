"""Property-based tests (hypothesis) — the analog of the reference's
proptest suite (reference: src/tokenizer/mod.rs:490-560 tokenizer
properties, tests/pipeline_fuzz.rs synthetic fuzzing, README.md:481-486
"19 property tests").

Host-side invariants only (no jit compiles): tokenizer byte-roundtrip, LZ4
block and frame roundtrips, xxh32/CRC32 reference parity, quantization SQNR
bounds, ring-buffer vs a model deque, row-quantization exactness bounds.
"""

import zlib
from collections import deque

import numpy as np
from hypothesis import given, settings, strategies as st

from whisper_apr_tpu.audio.ring_buffer import RingBuffer
from whisper_apr_tpu.format.checksum import crc32
from whisper_apr_tpu.format.compress import (compress_block, decompress_block,
                                             compress_blocks,
                                             decompress_blocks,
                                             lz4_frame_compress,
                                             lz4_frame_decompress, xxh32)
from whisper_apr_tpu.ops.quant import quantize_int8, quantization_error
from whisper_apr_tpu.tokenizer.bpe import BpeTokenizer

_EX = 40  # examples per property: 1-CPU budget


class TestTokenizerProperties:
    @given(st.text(min_size=0, max_size=200))
    @settings(max_examples=_EX, deadline=None)
    def test_encode_decode_roundtrip(self, text):
        """Byte-level BPE with base tokens must roundtrip ANY text
        (reference property: tokenizer roundtrip, mod.rs:490)."""
        tok = BpeTokenizer.with_base_tokens()
        ids = tok.encode(text)
        assert tok.decode(ids) == text

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=_EX, deadline=None)
    def test_encode_ids_in_range(self, raw):
        text = raw.decode("utf-8", errors="replace")
        tok = BpeTokenizer.with_base_tokens()
        for t in tok.encode(text):
            assert 0 <= t < tok.vocab_size()


class TestCompressionProperties:
    @given(st.binary(min_size=0, max_size=5000))
    @settings(max_examples=_EX, deadline=None)
    def test_lz4_block_roundtrip(self, data):
        comp = compress_block(data)
        assert decompress_block(comp, len(data)) == data

    @given(st.binary(min_size=0, max_size=5000))
    @settings(max_examples=_EX, deadline=None)
    def test_lz4_frame_roundtrip(self, data):
        assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    @given(st.binary(min_size=0, max_size=5000))
    @settings(max_examples=_EX, deadline=None)
    def test_multiblock_roundtrip(self, data):
        assert decompress_blocks(compress_blocks(data, block_size=512)) == data

    @given(st.lists(st.integers(0, 255), min_size=1, max_size=400))
    @settings(max_examples=_EX, deadline=None)
    def test_compressible_data_shrinks(self, vals):
        # long runs compress: repeat the pattern enough to beat headers
        data = bytes(vals) * 50
        comp = compress_block(data)
        assert len(comp) < len(data)
        assert decompress_block(comp, len(data)) == data

    @given(st.binary(min_size=0, max_size=2000),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=_EX, deadline=None)
    def test_xxh32_deterministic_and_seeded(self, data, seed):
        a = xxh32(data, seed)
        assert 0 <= a < 2**32
        assert a == xxh32(data, seed)

    @given(st.binary(min_size=0, max_size=4000))
    @settings(max_examples=_EX, deadline=None)
    def test_crc32_matches_zlib(self, data):
        assert crc32(data) == zlib.crc32(data) & 0xFFFFFFFF


class TestQuantizationProperties:
    @given(st.integers(0, 2**31 - 1), st.floats(0.01, 100.0))
    @settings(max_examples=_EX, deadline=None)
    def test_int8_sqnr_bound(self, seed, scale):
        """Symmetric int8 of gaussian data keeps SQNR above 30 dB at ANY
        scale — step = absmax/127 with absmax ~4-5 sigma puts the RMS
        error near 1.1% => ~39 dB (reference SQNR gates: quantized.rs
        tests). SQNR is scale-invariant; quantization_error (mean-abs,
        quantized.rs:2555) is checked to scale linearly with the data."""
        from whisper_apr_tpu.ops.quant import compute_sqnr
        rng = np.random.default_rng(seed)
        w = (rng.normal(0, scale, (32, 64))).astype(np.float32)
        qt = quantize_int8(w)
        deq = np.asarray(qt.q, np.float32) * np.asarray(qt.scale, np.float32)
        assert compute_sqnr(w, deq) > 30.0
        assert quantization_error(w, deq) < 0.02 * scale

    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=_EX, deadline=None)
    def test_per_row_kv_quant_exact_bound(self, seed):
        """ops.decode_attention.quantize_rows: |deq - x| <= s/2 per row."""
        from whisper_apr_tpu.ops.decode_attention import quantize_rows
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 1, (2, 1, 8, 16)).astype(np.float32)
        q, s = quantize_rows(x)  # s: [..., T, 1]
        q = np.asarray(q, np.float32)
        s_row = np.asarray(s)                           # [..., T, 1]
        deq = q * s_row
        assert np.all(np.abs(deq - x) <= s_row / 2 + 1e-7)


class TestRingBufferProperties:
    @given(st.lists(
        st.tuples(st.sampled_from(["write", "read", "skip", "peek"]),
                  st.integers(0, 40)),
        min_size=1, max_size=60))
    @settings(max_examples=_EX, deadline=None)
    def test_matches_deque_model(self, ops):
        """RingBuffer (overwrite-oldest) behaves like a bounded deque."""
        cap = 32
        rb = RingBuffer(cap)
        model = deque(maxlen=cap)
        counter = 0.0
        for op, n in ops:
            if op == "write":
                data = np.arange(counter, counter + n, dtype=np.float32)
                counter += n
                rb.write_overwrite(data)
                model.extend(data.tolist())
            elif op == "read":
                got = rb.read(n)
                want = [model.popleft() for _ in range(min(n, len(model)))]
                assert got.tolist() == want
            elif op == "peek":
                got = rb.peek(n)
                want = list(model)[: min(n, len(model))]
                assert got.tolist() == want
            else:
                k = rb.skip(n)
                want_k = min(n, len(model))
                assert k == want_k
                for _ in range(want_k):
                    model.popleft()
            assert len(rb) == len(model)


class TestTimestampGrammarProperties:
    """Hypothesis sweep of the in-loop timestamp grammar
    (inference/timestamp_rules.py; OpenAI ApplyTimestampRules semantics).

    For arbitrary logits the masked-argmax decode must satisfy the
    grammar invariants: first token is a capped timestamp, timestamps
    never decrease, runs of timestamps never exceed a pair, and a lone
    segment-closing timestamp is always followed by a timestamp or EOT.
    """

    TS_BASE = 40
    EOT = 39
    V = 80

    def _decode(self, logits_seq):
        import jax.numpy as jnp
        from whisper_apr_tpu.inference import timestamp_rules as tsr
        state = tsr.init_state(1)
        toks = []
        for i, row in enumerate(logits_seq):
            logits = jnp.asarray(np.asarray(row, np.float32)[None])
            masked = tsr.apply_rules(
                logits, state, self.TS_BASE, self.EOT,
                is_first=jnp.asarray([i == 0]))
            tok = int(np.asarray(jnp.argmax(masked, -1))[0])
            toks.append(tok)
            if tok == self.EOT:
                break
            state = tsr.update_state(state, jnp.asarray([tok]),
                                     self.TS_BASE)
        return toks

    @settings(max_examples=25, deadline=None)
    @given(st.lists(
        st.lists(st.floats(-4, 4, allow_nan=False, width=32),
                 min_size=80, max_size=80),
        min_size=2, max_size=10))
    def test_grammar_invariants(self, logits_seq):
        toks = self._decode(logits_seq)
        ts = [t for t in toks if t >= self.TS_BASE]
        # rule 1: first sampled token is a timestamp within the cap
        assert toks[0] >= self.TS_BASE
        assert toks[0] <= self.TS_BASE + 50
        # rule 3: timestamps never decrease
        assert all(a <= b for a, b in zip(ts, ts[1:]))
        # rule 2: never three consecutive timestamps
        run = 0
        for t in toks:
            run = run + 1 if t >= self.TS_BASE else 0
            assert run <= 2
        # rule 2a: text -> lone ts -> text is illegal
        for i in range(1, len(toks) - 1):
            if (toks[i] >= self.TS_BASE
                    and toks[i - 1] < self.TS_BASE
                    and toks[i - 1] != self.EOT):
                nxt = toks[i + 1]
                assert nxt >= self.TS_BASE or nxt == self.EOT, toks


class TestPagedAllocatorProperties:
    """alloc/extend/free invariants of the paged KV pool
    (model/kv_variants.PagedKVCache; reference: decoder.rs:880-961)."""

    @settings(max_examples=30, deadline=None)
    @given(st.lists(
        st.tuples(st.sampled_from(["alloc", "extend", "free"]),
                  st.integers(0, 5), st.integers(0, 40)),
        min_size=1, max_size=40))
    def test_invariants(self, ops):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.errors import InferenceError
        from whisper_apr_tpu.model.kv_variants import (PAGE_SIZE,
                                                       PagedKVCache)
        cfg = ModelConfig(
            model_type="tiny", n_vocab=64, n_audio_ctx=8, n_audio_state=64,
            n_audio_head=2, n_audio_layer=1, n_text_ctx=8, n_text_state=64,
            n_text_head=2, n_text_layer=1, n_mels=80)
        pool = PagedKVCache(cfg, n_pages=8)
        live = {}
        for op, seq, n in ops:
            before_free = pool.free_pages
            before_tables = {s: list(p) for s, p in pool._tables.items()}
            try:
                if op == "alloc":
                    pool.alloc(seq, n)
                    live[seq] = n
                elif op == "extend":
                    pool.extend(seq, max(n, 1))
                    live[seq] += max(n, 1)
                else:
                    pool.free(seq)
                    live.pop(seq, None)
            except InferenceError:
                # failure must be a clean rollback: nothing changed
                assert pool.free_pages == before_free
                assert {s: list(p) for s, p in pool._tables.items()} \
                    == before_tables
                continue
            # no page owned twice; free + owned partitions the pool
            owned = [p for t in pool._tables.values() for p in t]
            assert len(owned) == len(set(owned))
            assert sorted(owned + pool._free) == list(range(8))
            # capacity covers each sequence's length
            for s, ln in live.items():
                assert len(pool._tables[s]) * PAGE_SIZE >= ln
                assert pool.seq_len(s) == ln
