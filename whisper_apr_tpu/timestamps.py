"""Timestamp-token segment extraction.

(reference: src/timestamps/ — ``has_timestamps``/``extract_segments`` used by
the engine at src/lib.rs:385-387.) Timestamp tokens encode times at 20 ms
resolution starting at TIMESTAMP_BASE: time_s = (id - TIMESTAMP_BASE) * 0.02.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

from .tokenizer import special_tokens as st

TIME_PER_TOKEN = 0.02  # 20 ms per timestamp step


@dataclasses.dataclass
class Segment:
    """A timestamped span (reference: src/lib.rs:186 Segment)."""

    start: float
    end: float
    text: str
    tokens: List[int]


def is_timestamp(token: int, timestamp_base: int = st.TIMESTAMP_BASE) -> bool:
    return token >= timestamp_base


def has_timestamps(tokens: Sequence[int],
                   timestamp_base: int = st.TIMESTAMP_BASE) -> bool:
    return any(is_timestamp(t, timestamp_base) for t in tokens)


def token_time(token: int, timestamp_base: int = st.TIMESTAMP_BASE) -> float:
    return (token - timestamp_base) * TIME_PER_TOKEN


def extract_segments(tokens: Sequence[int], tokenizer,
                     timestamp_base: int = st.TIMESTAMP_BASE,
                     eot: int = st.EOT,
                     default_end: float = 0.0) -> List[Segment]:
    """Split a decoded token stream into timestamped segments.

    Pattern: <|t_start|> text... <|t_end|> [<|t_start'|> ...]. Tokens outside
    any timestamp pair fall into an open-ended trailing segment.
    """
    segments: List[Segment] = []
    cur_tokens: List[int] = []
    start_time = 0.0
    in_segment = False

    for t in tokens:
        t = int(t)
        if t == eot:
            break
        if is_timestamp(t, timestamp_base):
            if not in_segment:
                start_time = token_time(t, timestamp_base)
                in_segment = True
                cur_tokens = []
            else:
                end_time = token_time(t, timestamp_base)
                text = tokenizer.decode_with_options(cur_tokens, skip_special=True)
                if cur_tokens:
                    segments.append(Segment(start_time, end_time, text, cur_tokens))
                in_segment = False
                cur_tokens = []
        elif in_segment:
            cur_tokens.append(t)
        else:
            # text outside a timestamp pair (e.g. timestamps disabled)
            cur_tokens.append(t)

    if cur_tokens:
        # decode ended before the closing timestamp: close at the clip end
        text = tokenizer.decode_with_options(cur_tokens, skip_special=True)
        if text.strip():
            segments.append(Segment(start_time,
                                    max(default_end, start_time),
                                    text, cur_tokens))
    return segments
