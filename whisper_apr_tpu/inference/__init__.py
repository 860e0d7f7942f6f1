"""Decoding strategies: greedy (on-device), beam search, processors.

(reference: src/inference/ — greedy.rs, beam.rs, processors.rs)
"""

from .processors import WhisperTokenSuppressor, suppression_bias

__all__ = ["WhisperTokenSuppressor", "suppression_bias"]
