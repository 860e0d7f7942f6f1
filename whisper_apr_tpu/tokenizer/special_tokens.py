"""Whisper special-token IDs and language tables.

Mirrors the dual-variant token tables of the reference
(reference: src/tokenizer/vocab.rs:25-180 ``special_tokens`` module):
English-only models use the GPT-2 tokenizer (EOT=50256), multilingual models
use the extended tokenizer (EOT=50257). The language list is Whisper's
canonical 99-language ordering (LANG_BASE + offset gives the language token;
reference: src/tokenizer/vocab.rs:184+ language_token / language_offset).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Vocabulary size threshold for multilingual models
# (reference: src/tokenizer/vocab.rs:27)
MULTILINGUAL_VOCAB_THRESHOLD = 51_865

# English-only (GPT-2) tokens (reference: src/tokenizer/vocab.rs:33-37)
EOT_ENGLISH = 50_256
SOT_ENGLISH = 50_257

# Multilingual tokens (reference: src/tokenizer/vocab.rs:43-51)
EOT_MULTILINGUAL = 50_257
SOT_MULTILINGUAL = 50_258
LANG_BASE_MULTILINGUAL = 50_259
TRANSCRIBE_MULTILINGUAL = 50_359
NO_TIMESTAMPS_MULTILINGUAL = 50_363

# Legacy multilingual aliases (reference: src/tokenizer/vocab.rs:58-78)
EOT = EOT_MULTILINGUAL
SOT = SOT_MULTILINGUAL
LANG_BASE = LANG_BASE_MULTILINGUAL
TRANSLATE = 50_358
TRANSCRIBE = TRANSCRIBE_MULTILINGUAL
SPEAKER_TURN = 50_360
PREV = 50_361
NO_SPEECH = 50_362
NO_TIMESTAMPS = NO_TIMESTAMPS_MULTILINGUAL
TIMESTAMP_BASE = 50_364

# Whisper's canonical language ordering: token id = LANG_BASE + index.
# (reference: src/tokenizer/vocab.rs:184+ covers the first 50; the rest follow
# OpenAI's canonical ordering. large-v3 appends "yue" as index 99.)
LANGUAGES = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr",
    "pl", "ca", "nl", "ar", "sv", "it", "id", "hi", "fi", "vi",
    "he", "uk", "el", "ms", "cs", "ro", "da", "hu", "ta", "no",
    "th", "ur", "hr", "bg", "lt", "la", "mi", "ml", "cy", "sk",
    "te", "fa", "lv", "bn", "sr", "az", "sl", "kn", "et", "mk",
    "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc",
    "ka", "be", "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo",
    "ht", "ps", "tk", "nn", "mt", "sa", "lb", "my", "bo", "tl",
    "mg", "as", "tt", "haw", "ln", "ha", "ba", "jw", "su", "yue",
)

LANGUAGE_NAMES = {
    "en": "english", "zh": "chinese", "de": "german", "es": "spanish",
    "ru": "russian", "ko": "korean", "fr": "french", "ja": "japanese",
    "pt": "portuguese", "tr": "turkish", "pl": "polish", "ca": "catalan",
    "nl": "dutch", "ar": "arabic", "sv": "swedish", "it": "italian",
    "id": "indonesian", "hi": "hindi", "fi": "finnish", "vi": "vietnamese",
    "he": "hebrew", "uk": "ukrainian", "el": "greek", "ms": "malay",
    "cs": "czech", "ro": "romanian", "da": "danish", "hu": "hungarian",
    "ta": "tamil", "no": "norwegian", "th": "thai", "ur": "urdu",
    "hr": "croatian", "bg": "bulgarian", "lt": "lithuanian", "la": "latin",
    "mi": "maori", "ml": "malayalam", "cy": "welsh", "sk": "slovak",
    "te": "telugu", "fa": "persian", "lv": "latvian", "bn": "bengali",
    "sr": "serbian", "az": "azerbaijani", "sl": "slovenian", "kn": "kannada",
    "et": "estonian", "mk": "macedonian", "br": "breton", "eu": "basque",
    "is": "icelandic", "hy": "armenian", "ne": "nepali", "mn": "mongolian",
    "bs": "bosnian", "kk": "kazakh", "sq": "albanian", "sw": "swahili",
    "gl": "galician", "mr": "marathi", "pa": "punjabi", "si": "sinhala",
    "km": "khmer", "sn": "shona", "yo": "yoruba", "so": "somali",
    "af": "afrikaans", "oc": "occitan", "ka": "georgian", "be": "belarusian",
    "tg": "tajik", "sd": "sindhi", "gu": "gujarati", "am": "amharic",
    "yi": "yiddish", "lo": "lao", "uz": "uzbek", "fo": "faroese",
    "ht": "haitian creole", "ps": "pashto", "tk": "turkmen", "nn": "nynorsk",
    "mt": "maltese", "sa": "sanskrit", "lb": "luxembourgish", "my": "myanmar",
    "bo": "tibetan", "tl": "tagalog", "mg": "malagasy", "as": "assamese",
    "tt": "tatar", "haw": "hawaiian", "ln": "lingala", "ha": "hausa",
    "ba": "bashkir", "jw": "javanese", "su": "sundanese", "yue": "cantonese",
}

_OFFSETS = {code: i for i, code in enumerate(LANGUAGES)}


def language_offset(lang_code: str) -> Optional[int]:
    """Offset of a language in the token table, or None if unsupported."""
    return _OFFSETS.get(lang_code)


def language_token(lang_code: str) -> Optional[int]:
    """Multilingual token ID for a language code (reference: vocab.rs:184)."""
    off = _OFFSETS.get(lang_code)
    return None if off is None else LANG_BASE + off


def language_name(lang_code: str) -> Optional[str]:
    return LANGUAGE_NAMES.get(lang_code)


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    """Dynamic special-token lookup (reference: src/tokenizer/vocab.rs:86-160)."""

    eot: int
    sot: int
    lang_base: int
    transcribe: int
    no_timestamps: int
    timestamp_base: int
    is_multilingual: bool
    translate: int = TRANSLATE
    speaker_turn: int = SPEAKER_TURN
    prev: int = PREV
    no_speech: int = NO_SPEECH

    @staticmethod
    def for_vocab_size(n_vocab: int) -> "SpecialTokens":
        if n_vocab >= MULTILINGUAL_VOCAB_THRESHOLD:
            return SpecialTokens.multilingual()
        return SpecialTokens.english_only()

    @staticmethod
    def multilingual() -> "SpecialTokens":
        return SpecialTokens(
            eot=EOT_MULTILINGUAL, sot=SOT_MULTILINGUAL,
            lang_base=LANG_BASE_MULTILINGUAL, transcribe=TRANSCRIBE_MULTILINGUAL,
            no_timestamps=NO_TIMESTAMPS_MULTILINGUAL, timestamp_base=50_364,
            is_multilingual=True, translate=TRANSLATE,
            speaker_turn=SPEAKER_TURN, prev=PREV, no_speech=NO_SPEECH)

    @staticmethod
    def english_only() -> "SpecialTokens":
        # English-only (*.en) models shift every special id down by 1
        # relative to multilingual (reference: src/tokenizer/vocab.rs:135-144).
        return SpecialTokens(
            eot=EOT_ENGLISH, sot=SOT_ENGLISH, lang_base=50_258,
            transcribe=50_358, no_timestamps=50_362, timestamp_base=50_363,
            is_multilingual=False, translate=50_357,
            speaker_turn=50_359, prev=50_360, no_speech=50_361)

    def initial_tokens(self) -> tuple:
        """[SOT, lang_en, transcribe, no_timestamps] (reference: vocab.rs:152)."""
        return (self.sot, self.lang_base, self.transcribe, self.no_timestamps)
