"""Byte-level BPE vocabulary and tokenizer.

Mirrors the reference semantics (reference: src/tokenizer/mod.rs:75-160
``BpeTokenizer::encode``/``decode``, src/tokenizer/vocab.rs Vocabulary with
``to_bytes``/``from_bytes`` at :494/:527): tokens are raw byte sequences,
merges are an ordered rule list, encoding greedily applies the
lowest-priority-index merge until none apply.

The serialized form is byte-compatible with the reference so vocabularies
embedded in reference-produced `.apr` files load directly:

    u32 n_tokens, u32 n_merges,
    n_tokens x (u16 len + bytes),
    n_merges x (u16 len + first bytes, u16 len + second bytes)
"""

from __future__ import annotations

import dataclasses
import struct
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from ..errors import TokenizerError
from . import special_tokens as st


@dataclasses.dataclass(frozen=True)
class MergeRule:
    """One BPE merge (reference: src/tokenizer/vocab.rs MergeRule)."""

    first: bytes
    second: bytes


@lru_cache(maxsize=1)
def gpt2_byte_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte->unicode map.

    Used to decode HF ``vocab.json``/``merges.txt`` entries back into raw
    bytes (reference: tools/convert.rs:481 gpt2_decode_token).
    """
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@lru_cache(maxsize=1)
def gpt2_unicode_to_byte() -> Dict[str, int]:
    return {v: k for k, v in gpt2_byte_to_unicode().items()}


def gpt2_decode_token(token: str) -> bytes:
    """Convert a GPT-2 unicode-escaped token string to raw bytes."""
    u2b = gpt2_unicode_to_byte()
    try:
        return bytes(u2b[ch] for ch in token)
    except KeyError:
        # Special tokens like <|endoftext|> are stored as their UTF-8 text
        return token.encode("utf-8")


class Vocabulary:
    """Byte-sequence vocabulary + ordered merge rules.

    (reference: src/tokenizer/vocab.rs Vocabulary)
    """

    def __init__(self) -> None:
        self.id_to_bytes: List[bytes] = []
        self._bytes_to_id: Dict[bytes, int] = {}
        self.merge_rules: List[MergeRule] = []
        self._merge_rank: Dict[Tuple[bytes, bytes], int] = {}

    # -- construction -------------------------------------------------------
    def add_token(self, token_bytes: bytes) -> int:
        token_bytes = bytes(token_bytes)
        idx = len(self.id_to_bytes)
        self.id_to_bytes.append(token_bytes)
        # first id wins on duplicates, matching reference HashMap entry().or_insert
        self._bytes_to_id.setdefault(token_bytes, idx)
        return idx

    def add_merge_rule(self, first: bytes, second: bytes) -> None:
        rule = MergeRule(bytes(first), bytes(second))
        self._merge_rank.setdefault((rule.first, rule.second), len(self.merge_rules))
        self.merge_rules.append(rule)

    @staticmethod
    def with_base_tokens() -> "Vocabulary":
        """256 single-byte tokens, no merges (reference: vocab.rs with_base_tokens)."""
        v = Vocabulary()
        for b in range(256):
            v.add_token(bytes([b]))
        return v

    # -- lookup ---------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.id_to_bytes)

    def get_id(self, token_bytes: bytes) -> Optional[int]:
        return self._bytes_to_id.get(bytes(token_bytes))

    def get_bytes(self, token_id: int) -> Optional[bytes]:
        if 0 <= token_id < len(self.id_to_bytes):
            return self.id_to_bytes[token_id]
        return None

    def merge_priority(self, first: bytes, second: bytes) -> Optional[int]:
        return self._merge_rank.get((bytes(first), bytes(second)))

    def decode(self, tokens: Sequence[int]) -> Optional[str]:
        parts = []
        for t in tokens:
            b = self.get_bytes(int(t))
            if b is None:
                return None
            parts.append(b)
        return b"".join(parts).decode("utf-8", errors="replace")

    # -- serialization (reference: vocab.rs:494-590) --------------------------
    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack("<II", len(self.id_to_bytes), len(self.merge_rules))
        for tok in self.id_to_bytes:
            out += struct.pack("<H", len(tok))
            out += tok
        for rule in self.merge_rules:
            out += struct.pack("<H", len(rule.first))
            out += rule.first
            out += struct.pack("<H", len(rule.second))
            out += rule.second
        return bytes(out)

    @staticmethod
    def from_bytes(data: bytes) -> "Vocabulary":
        if len(data) < 8:
            raise TokenizerError("vocabulary data too short")
        n_tokens, n_merges = struct.unpack_from("<II", data, 0)
        off = 8
        v = Vocabulary()
        for _ in range(n_tokens):
            if off + 2 > len(data):
                raise TokenizerError("truncated vocabulary tokens")
            (length,) = struct.unpack_from("<H", data, off)
            off += 2
            if off + length > len(data):
                raise TokenizerError("truncated vocabulary token bytes")
            v.add_token(data[off:off + length])
            off += length
        for _ in range(n_merges):
            parts = []
            for _ in range(2):
                if off + 2 > len(data):
                    raise TokenizerError("truncated merge rules")
                (length,) = struct.unpack_from("<H", data, off)
                off += 2
                if off + length > len(data):
                    raise TokenizerError("truncated merge rule bytes")
                parts.append(data[off:off + length])
                off += length
            v.add_merge_rule(parts[0], parts[1])
        return v

    # -- HF import (reference: tools/convert.rs:375-530 parse_vocabulary) -----
    @staticmethod
    def from_hf_files(vocab_json: dict, merges_lines: Iterable[str],
                      added_tokens: Optional[dict] = None) -> "Vocabulary":
        """Build from HF ``vocab.json`` + ``merges.txt`` (+ added_tokens.json).

        Token strings use GPT-2 unicode escaping; ids must be dense.
        """
        v = Vocabulary()
        entries = sorted(vocab_json.items(), key=lambda kv: kv[1])
        merged = dict(entries)
        if added_tokens:
            for tok, idx in added_tokens.items():
                merged[tok] = idx
        by_id = sorted(merged.items(), key=lambda kv: kv[1])
        next_id = 0
        for tok, idx in by_id:
            while next_id < idx:
                # fill gaps so ids stay aligned
                v.add_token(b"<|unused_%d|>" % next_id)
                next_id += 1
            v.add_token(gpt2_decode_token(tok))
            next_id += 1
        for line in merges_lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                continue
            v.add_merge_rule(gpt2_decode_token(parts[0]), gpt2_decode_token(parts[1]))
        return v


class BpeTokenizer:
    """Byte-level BPE encode/decode (reference: src/tokenizer/mod.rs:28-210)."""

    def __init__(self, vocab: Vocabulary) -> None:
        self.vocab = vocab

    @staticmethod
    def from_vocabulary(vocab: Vocabulary) -> "BpeTokenizer":
        return BpeTokenizer(vocab)

    @staticmethod
    def with_base_tokens() -> "BpeTokenizer":
        return BpeTokenizer(Vocabulary.with_base_tokens())

    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> List[int]:
        """Greedy best-priority BPE merge loop (reference: mod.rs:75-117).

        Equivalent to the reference algorithm but O(n log n): adjacent pairs
        are merged in global rank order using a doubly-linked list walk.
        """
        if not text:
            return []
        data = text.encode("utf-8")
        tokens: List[bytes] = [data[i:i + 1] for i in range(len(data))]
        rank = self.vocab.merge_priority

        while len(tokens) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(tokens) - 1):
                r = rank(tokens[i], tokens[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_idx = i
            if best_rank is None:
                break
            tokens[best_idx:best_idx + 2] = [tokens[best_idx] + tokens[best_idx + 1]]

        ids = []
        for tok in tokens:
            tid = self.vocab.get_id(tok)
            if tid is None:
                raise TokenizerError(f"unknown token: {tok!r}")
            ids.append(tid)
        return ids

    def decode(self, tokens: Sequence[int]) -> str:
        if not len(tokens):
            return ""
        out = self.vocab.decode(tokens)
        if out is None:
            raise TokenizerError("invalid token ID")
        return out

    def decode_with_options(self, tokens: Sequence[int], skip_special: bool = True) -> str:
        """Decode, optionally dropping ids >= EOT (reference: mod.rs:180-205).

        Variant-aware: the EOT threshold derives from the vocab size, so
        English-only models (EOT=50256) drop ``<|endoftext|>`` too.
        """
        if skip_special:
            eot = st.SpecialTokens.for_vocab_size(len(self.vocab)).eot
            tokens = [t for t in tokens if t < eot]
        return self.decode(tokens)
