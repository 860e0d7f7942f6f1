"""Streaming transcription: couples the audio chunker with the engine.

(reference: src/inference/streaming.rs:121 StreamingTranscriber —
max_tokens_per_chunk=224, overlap_tokens=10 at :41-63, process() :197,
finalize() :276; and the engine-level StreamingSession at src/lib.rs:1555.)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..audio.streaming import StreamingConfig, StreamingProcessor
from ..config import SAMPLE_RATE

MAX_TOKENS_PER_CHUNK = 224  # reference: src/inference/streaming.rs:41
OVERLAP_TOKENS = 10         # reference: src/inference/streaming.rs:63


@dataclasses.dataclass
class StreamingResult:
    """One emitted piece of transcript."""

    kind: str  # "partial" | "chunk" | "final"
    text: str
    time: float = 0.0


class StreamingTranscriber:
    """File/mic streaming transcription (reference: streaming.rs:121)."""

    def __init__(self, engine, config: Optional[StreamingConfig] = None,
                 language: Optional[str] = None,
                 emit_partials: bool = False) -> None:
        from ..engine import TranscribeOptions
        self.engine = engine
        self.processor = StreamingProcessor(
            config or StreamingConfig.with_sample_rate(SAMPLE_RATE))
        self.language = language
        self.emit_partials = emit_partials
        self._opts = TranscribeOptions(
            language=language, max_tokens=MAX_TOKENS_PER_CHUNK)
        self._transcript: List[str] = []

    def push(self, samples: np.ndarray) -> List[StreamingResult]:
        """Feed audio; returns any new results (reference: streaming.rs:197)."""
        self.processor.push_audio(samples)
        events = self.processor.process()
        out: List[StreamingResult] = []
        for ev in events:
            if ev.kind == "chunk_ready":
                chunk = self.processor.get_chunk()
                if chunk is not None and len(chunk) >= 400:
                    r = self.engine.transcribe(chunk, self._opts)
                    if r.text:
                        self._transcript.append(r.text)
                        out.append(StreamingResult("chunk", r.text, ev.time))
        if self.emit_partials and self.processor.has_partial():
            partial = self.processor.get_partial()
            if partial is not None and len(partial) >= 400:
                r = self.engine.transcribe(partial, self._opts)
                if r.text:
                    out.append(StreamingResult("partial", r.text))
        return out

    def finalize(self) -> str:
        """Flush and return the full transcript (reference: streaming.rs:276)."""
        chunk = self.processor.flush()
        if chunk is not None and len(chunk) >= 400:
            r = self.engine.transcribe(chunk, self._opts)
            if r.text:
                self._transcript.append(r.text)
        return " ".join(self._transcript)

    @property
    def transcript(self) -> str:
        return " ".join(self._transcript)


class StreamingSession:
    """Engine-level session facade (reference: src/lib.rs:1555
    create_streaming_session / :1640 push / :1686 finalize)."""

    def __init__(self, engine, options=None, input_sample_rate: int = 44_100,
                 config: Optional[StreamingConfig] = None) -> None:
        cfg = config or StreamingConfig.with_sample_rate(input_sample_rate)
        self._t = StreamingTranscriber(
            engine, cfg,
            language=getattr(options, "language", None) if options else None,
            emit_partials=True)
        self.results: List[StreamingResult] = []

    def push(self, samples: np.ndarray) -> List[StreamingResult]:
        res = self._t.push(samples)
        self.results.extend(res)
        return res

    def has_partial(self) -> bool:
        return self._t.processor.has_partial()

    def get_partial(self) -> Optional[str]:
        if not self.has_partial():
            return None
        partial = self._t.processor.get_partial()
        if partial is None or len(partial) < 400:
            return None
        return self._t.engine.transcribe(partial, self._t._opts).text

    def finalize(self) -> str:
        return self._t.finalize()
