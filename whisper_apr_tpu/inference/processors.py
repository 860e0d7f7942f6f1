"""Logit processors: Whisper token suppression.

Mirrors the reference suppressor exactly (reference:
src/inference/processors.rs:40-160 WhisperTokenSuppressor): SOT, NO_SPEECH,
TRANSLATE, TRANSCRIBE, PREV, SPEAKER_TURN, NO_TIMESTAMPS, all 100 language
tokens, and (optionally) all timestamp tokens are forced to -inf on every
decode step.

TPU-native formulation: the suppressor is a precomputed ``[n_vocab]`` f32
bias vector (0 or -inf) ADDED to logits inside the jitted decode loop — one
fused vector add instead of a host-side scatter per token.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np

from ..tokenizer import special_tokens as st

NEG_INF = float(np.finfo(np.float32).min)


class WhisperTokenSuppressor:
    """Builds the suppression bias (reference: processors.rs:40)."""

    def __init__(self, suppress_timestamps: bool = True,
                 n_vocab: int = 51_865,
                 extra_tokens: Optional[Iterable[int]] = None) -> None:
        ids: List[int] = [
            st.SOT, st.NO_SPEECH, st.TRANSLATE, st.TRANSCRIBE,
            st.PREV, st.SPEAKER_TURN, st.NO_TIMESTAMPS,
        ]
        # all language tokens 50259..50357 (reference: processors.rs:74-77)
        ids.extend(range(st.LANG_BASE, st.TRANSLATE))
        if extra_tokens:
            ids.extend(extra_tokens)
        self.suppress_ids = ids
        self.suppress_timestamps = suppress_timestamps
        self.n_vocab = n_vocab

    def add_suppression(self, token: int) -> None:
        if token not in self.suppress_ids:
            self.suppress_ids.append(token)

    def bias(self) -> np.ndarray:
        """The [n_vocab] additive bias for the on-device decode loop."""
        b = np.zeros(self.n_vocab, dtype=np.float32)
        for t in self.suppress_ids:
            if 0 <= t < self.n_vocab:
                b[t] = NEG_INF
        if self.suppress_timestamps:
            b[st.TIMESTAMP_BASE: self.n_vocab] = NEG_INF
        return b

    def apply(self, logits: np.ndarray) -> np.ndarray:
        """Host-side application for parity tests (reference: processors.rs:129)."""
        out = np.array(logits, dtype=np.float32, copy=True)
        n = out.shape[-1]
        for t in self.suppress_ids:
            if 0 <= t < n:
                out[..., t] = -np.inf
        if self.suppress_timestamps and st.TIMESTAMP_BASE < self.n_vocab:
            out[..., st.TIMESTAMP_BASE: self.n_vocab] = -np.inf
        return out


def suppression_bias(n_vocab: int, suppress_timestamps: bool = True,
                     extra_tokens: Optional[Sequence[int]] = None) -> np.ndarray:
    """One-shot builder."""
    return WhisperTokenSuppressor(
        suppress_timestamps, n_vocab, extra_tokens).bias()
