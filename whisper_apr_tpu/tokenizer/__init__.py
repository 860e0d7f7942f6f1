"""GPT-2-style byte-level BPE tokenizer for Whisper.

Mirrors the reference tokenizer (reference: src/tokenizer/mod.rs BpeTokenizer,
src/tokenizer/vocab.rs Vocabulary/special_tokens): a byte-level vocabulary with
ordered merge rules, greedy best-priority merging, and the dual
English-only/multilingual special-token tables.
"""

from .bpe import BpeTokenizer, MergeRule, Vocabulary
from .special_tokens import (
    EOT,
    LANG_BASE,
    LANGUAGES,
    NO_SPEECH,
    NO_TIMESTAMPS,
    PREV,
    SOT,
    SPEAKER_TURN,
    TIMESTAMP_BASE,
    TRANSCRIBE,
    TRANSLATE,
    SpecialTokens,
    language_name,
    language_offset,
    language_token,
)

__all__ = [
    "BpeTokenizer", "MergeRule", "Vocabulary", "SpecialTokens",
    "EOT", "SOT", "LANG_BASE", "TRANSLATE", "TRANSCRIBE", "SPEAKER_TURN",
    "PREV", "NO_SPEECH", "NO_TIMESTAMPS", "TIMESTAMP_BASE", "LANGUAGES",
    "language_offset", "language_token", "language_name",
]
