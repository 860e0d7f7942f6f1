"""Error hierarchy for whisper_apr_tpu.

Mirrors the reference error taxonomy (reference: src/error.rs:6-60,
``WhisperError`` enum with Format/Audio/Model/Inference/... variants) as a
Python exception hierarchy.
"""

from __future__ import annotations


class WhisperError(Exception):
    """Base error for all whisper_apr_tpu failures (reference: src/error.rs:6)."""


class FormatError(WhisperError):
    """Invalid or corrupt .apr container data (reference: src/error.rs Format variant)."""


class AudioError(WhisperError):
    """Audio parsing / preprocessing failure (reference: src/error.rs Audio variant)."""


class ModelError(WhisperError):
    """Model construction or weight-loading failure (reference: src/error.rs Model variant)."""


class InferenceError(WhisperError):
    """Decoding / generation failure (reference: src/error.rs Inference variant)."""


class TokenizerError(WhisperError):
    """BPE vocabulary or encode/decode failure."""


class ConfigError(WhisperError):
    """Invalid configuration values."""
