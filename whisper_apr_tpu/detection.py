"""Language detection from first-decode logits.

(reference: src/detection.rs — ``LanguageProbs::from_logits`` softmax over the
100 language-token slots at :41, ``LanguageDetector::detect`` at :179.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from .tokenizer import special_tokens as st


@dataclasses.dataclass
class LanguageProbs:
    """Per-language probabilities (reference: src/detection.rs:41)."""

    probs: Dict[str, float]

    @staticmethod
    def from_logits(logits: np.ndarray,
                    lang_base: int = st.LANG_BASE,
                    n_languages: int = len(st.LANGUAGES)) -> "LanguageProbs":
        """Softmax over the language-token slice of the logits."""
        logits = np.asarray(logits, dtype=np.float64).reshape(-1)
        n = min(n_languages, max(0, logits.shape[0] - lang_base))
        lang_logits = logits[lang_base: lang_base + n]
        m = lang_logits.max() if n else 0.0
        e = np.exp(lang_logits - m)
        p = e / e.sum() if n else e
        return LanguageProbs({st.LANGUAGES[i]: float(p[i]) for i in range(n)})

    def top(self, k: int = 5) -> List[Tuple[str, float]]:
        return sorted(self.probs.items(), key=lambda kv: -kv[1])[:k]

    @property
    def best(self) -> Tuple[str, float]:
        return max(self.probs.items(), key=lambda kv: kv[1])


class LanguageDetector:
    """Detect language from SOT-step logits (reference: detection.rs:179)."""

    def __init__(self, min_confidence: float = 0.0) -> None:
        self.min_confidence = min_confidence

    def detect(self, logits: np.ndarray) -> Tuple[str, float, LanguageProbs]:
        probs = LanguageProbs.from_logits(logits)
        lang, p = probs.best
        if p < self.min_confidence:
            return "en", p, probs
        return lang, p, probs
