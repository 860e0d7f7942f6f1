"""Tokenizer tests (mirror reference: src/tokenizer/mod.rs:220+ inline tests
and the proptest roundtrip suite at src/tokenizer/mod.rs:490-560)."""

import numpy as np
import pytest

from whisper_apr_tpu.tokenizer import (
    EOT,
    SOT,
    BpeTokenizer,
    SpecialTokens,
    Vocabulary,
    language_offset,
    language_token,
)
from whisper_apr_tpu.tokenizer.bpe import gpt2_byte_to_unicode, gpt2_decode_token


class TestVocabulary:
    def test_base_tokens(self):
        v = Vocabulary.with_base_tokens()
        assert len(v) == 256
        assert v.get_id(b"a") == ord("a")
        assert v.get_bytes(65) == b"A"

    def test_serialization_roundtrip(self):
        v = Vocabulary.with_base_tokens()
        v.add_token(b"th")
        v.add_token(b"the")
        v.add_merge_rule(b"t", b"h")
        v.add_merge_rule(b"th", b"e")
        v2 = Vocabulary.from_bytes(v.to_bytes())
        assert len(v2) == len(v)
        assert v2.get_id(b"the") == v.get_id(b"the")
        assert v2.merge_priority(b"t", b"h") == 0
        assert v2.merge_priority(b"th", b"e") == 1

    def test_decode(self):
        v = Vocabulary.with_base_tokens()
        assert v.decode([ord("h"), ord("i")]) == "hi"

    def test_decode_invalid(self):
        v = Vocabulary.with_base_tokens()
        assert v.decode([9999]) is None


class TestBpe:
    def make_tokenizer(self):
        v = Vocabulary.with_base_tokens()
        v.add_token(b"he")
        v.add_token(b"ll")
        v.add_token(b"hell")
        v.add_token(b"hello")
        v.add_merge_rule(b"h", b"e")
        v.add_merge_rule(b"l", b"l")
        v.add_merge_rule(b"he", b"ll")
        v.add_merge_rule(b"hell", b"o")
        return BpeTokenizer(v)

    def test_encode_applies_merges_in_priority_order(self):
        t = self.make_tokenizer()
        ids = t.encode("hello")
        assert ids == [t.vocab.get_id(b"hello")]

    def test_encode_decode_roundtrip(self):
        t = self.make_tokenizer()
        for text in ("hello", "hello hello", "x", "", "hhhh"):
            assert t.decode(t.encode(text)) == text

    def test_roundtrip_unicode_base_tokens(self):
        t = BpeTokenizer.with_base_tokens()
        for text in ("héllo wörld", "日本語テスト", "emoji 🎤 test"):
            assert t.decode(t.encode(text)) == text

    def test_roundtrip_random_ascii(self):
        # property-test analog (reference: src/tokenizer/mod.rs proptests)
        rng = np.random.default_rng(42)
        t = self.make_tokenizer()
        for _ in range(50):
            n = int(rng.integers(0, 64))
            text = "".join(chr(int(c)) for c in rng.integers(32, 127, size=n))
            assert t.decode(t.encode(text)) == text

    def test_equal_rank_tie_merges_leftmost(self):
        """Repeated same-rank pairs must merge LEFT-first (GPT-2 greedy
        convention): 'aaa' with merge (a,a) -> [aa, a], never [a, aa]."""
        v = Vocabulary.with_base_tokens()
        v.add_token(b"aa")
        v.add_merge_rule(b"a", b"a")
        t = BpeTokenizer(v)
        assert t.encode("aaa") == [v.get_id(b"aa"), v.get_id(b"a")]

    def test_truncated_token_bytes_raise(self):
        """Declared token length runs past EOF -> TokenizerError (not a
        silent short slice)."""
        import struct
        from whisper_apr_tpu.errors import TokenizerError
        data = struct.pack("<II", 1, 0) + struct.pack("<H", 5) + b"ab"
        with pytest.raises(TokenizerError):
            Vocabulary.from_bytes(data)

    def test_truncated_merge_bytes_raise(self):
        import struct
        from whisper_apr_tpu.errors import TokenizerError
        data = (struct.pack("<II", 1, 1) + struct.pack("<H", 1) + b"a"
                + struct.pack("<H", 4) + b"x")
        with pytest.raises(TokenizerError):
            Vocabulary.from_bytes(data)

    def test_zero_length_token_at_eof_parses(self):
        """A zero-length token whose 2-byte header ends exactly at EOF is
        valid (boundary: off+2 == len must NOT raise)."""
        import struct
        data = struct.pack("<II", 1, 0) + struct.pack("<H", 0)
        v = Vocabulary.from_bytes(data)
        assert len(v) == 1 and v.get_bytes(0) == b""

    def test_skip_special(self):
        t = BpeTokenizer.with_base_tokens()
        ids = t.encode("hi")
        assert t.decode_with_options(ids + [EOT], skip_special=True) == "hi"


class TestSpecialTokens:
    def test_multilingual_ids(self):
        s = SpecialTokens.multilingual()
        assert s.eot == 50257 and s.sot == 50258 and s.lang_base == 50259
        assert s.transcribe == 50359 and s.no_timestamps == 50363
        assert s.timestamp_base == 50364

    def test_english_ids(self):
        s = SpecialTokens.english_only()
        assert s.eot == 50256 and s.sot == 50257

    def test_for_vocab_size(self):
        assert SpecialTokens.for_vocab_size(51865).is_multilingual
        assert SpecialTokens.for_vocab_size(51866).is_multilingual
        assert not SpecialTokens.for_vocab_size(51864).is_multilingual

    def test_initial_tokens(self):
        assert SpecialTokens.multilingual().initial_tokens() == (
            50258, 50259, 50359, 50363)

    def test_language_offsets_match_reference(self):
        # reference: src/tokenizer/vocab.rs:184+ (first 50 languages)
        assert language_offset("en") == 0
        assert language_offset("zh") == 1
        assert language_offset("mk") == 49
        assert language_token("en") == 50259
        assert language_token("ja") == 50259 + 7
        assert language_offset("yue") == 99
        assert language_offset("xx") is None


class TestGpt2Bytes:
    def test_byte_map_reversible(self):
        b2u = gpt2_byte_to_unicode()
        assert len(b2u) == 256
        assert len(set(b2u.values())) == 256

    def test_decode_token(self):
        # "Ġ" is GPT-2's escaped space
        assert gpt2_decode_token("Ġhello") == b" hello"
        assert gpt2_decode_token("abc") == b"abc"


class TestDecodeSkipSpecialBoundary:
    def test_eot_itself_is_dropped(self):
        # decode_with_options keeps ids STRICTLY below the variant EOT;
        # the EOT token itself must be skipped (reference:
        # src/tokenizer/mod.rs:180 decode_with_options).
        v = Vocabulary.with_base_tokens()
        while len(v) < 50257:               # EN-variant size -> eot = 50256
            v.add_token(b"<|tok%d|>" % len(v))
        assert SpecialTokens.for_vocab_size(len(v)).eot == 50256
        tok = BpeTokenizer(v)
        out = tok.decode_with_options([ord("h"), ord("i"), 50256],
                                      skip_special=True)
        assert out == "hi"

    def test_merge_rule_empty_part_at_eof(self):
        # a trailing empty merge part puts the final u16 length read
        # flush against EOF — a VALID read (off + 2 == len)
        v = Vocabulary.with_base_tokens()
        v.add_merge_rule(b"x", b"")
        w = Vocabulary.from_bytes(v.to_bytes())
        assert w.merge_priority(b"x", b"") == 0
