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
    """Builds the suppression bias (reference: processors.rs:40).

    Variant-aware: the id set derives from a ``SpecialTokens`` table so
    English-only models (n_vocab=51864, every special id shifted by -1)
    suppress the right slots. Default derives from ``n_vocab``.
    """

    def __init__(self, suppress_timestamps: bool = True,
                 n_vocab: int = 51_865,
                 extra_tokens: Optional[Iterable[int]] = None,
                 tokens: Optional[st.SpecialTokens] = None) -> None:
        tok = tokens if tokens is not None else st.SpecialTokens.for_vocab_size(n_vocab)
        ids: List[int] = [
            tok.sot, tok.no_speech, tok.translate, tok.transcribe,
            tok.prev, tok.speaker_turn, tok.no_timestamps,
        ]
        # all language tokens (reference: processors.rs:74-77)
        ids.extend(range(tok.lang_base, tok.translate))
        if extra_tokens:
            ids.extend(extra_tokens)
        self.tokens = tok
        self.suppress_ids = ids
        self.suppress_timestamps = suppress_timestamps
        self.n_vocab = n_vocab
        self._timestamp_base = tok.timestamp_base

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
            b[self._timestamp_base: self.n_vocab] = NEG_INF
        return b

    def apply(self, logits: np.ndarray) -> np.ndarray:
        """Host-side application for parity tests (reference: processors.rs:129)."""
        out = np.array(logits, dtype=np.float32, copy=True)
        n = out.shape[-1]
        for t in self.suppress_ids:
            if 0 <= t < n:
                out[..., t] = -np.inf
        if self.suppress_timestamps and self._timestamp_base < self.n_vocab:
            out[..., self._timestamp_base: self.n_vocab] = -np.inf
        return out


def suppression_bias(n_vocab: int, suppress_timestamps: bool = True,
                     extra_tokens: Optional[Sequence[int]] = None,
                     tokens: Optional[st.SpecialTokens] = None) -> np.ndarray:
    """One-shot builder."""
    return WhisperTokenSuppressor(
        suppress_timestamps, n_vocab, extra_tokens, tokens=tokens).bias()
