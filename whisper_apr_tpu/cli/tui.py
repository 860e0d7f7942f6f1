"""Terminal dashboard for transcription.

(reference: src/tui/ — ratatui dashboard with the pipeline state machine
Idle -> Mel -> Encode -> Decode -> Complete at app.rs:76, panels and
waveform/mel ASCII visualization at visualization.rs:13,51, live per-stage
state during a real run at app.rs:152.)

Pure-stdlib curses. Rendering helpers are pure string functions so they
are testable headless; the curses loop is a thin shell around them. The
decode stage streams LIVE: a host-stepped greedy loop emits one token per
device step and the dashboard redraws with the growing transcript, the
token rate, and per-stage timings.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Callable, List, Optional

import numpy as np


class PipelineState(enum.Enum):
    """(reference: src/tui/app.rs:76)"""

    IDLE = "idle"
    MEL = "computing mel"
    ENCODE = "encoding"
    DECODE = "decoding"
    COMPLETE = "complete"
    ERROR = "error"


@dataclasses.dataclass
class StageTimings:
    """Per-stage wall times, filled as the pipeline advances
    (reference: the per-stage state panel, app.rs:152)."""

    mel_s: float = 0.0
    encode_s: float = 0.0
    decode_s: float = 0.0
    tokens: int = 0
    max_tokens: int = 0
    audio_s: float = 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.decode_s if self.decode_s > 0 else 0.0

    @property
    def rtf(self) -> float:
        total = self.mel_s + self.encode_s + self.decode_s
        return total / self.audio_s if self.audio_s > 0 else 0.0


# -- pure visualization helpers (reference: src/tui/visualization.rs) --------

_BLOCKS = " ▁▂▃▄▅▆▇█"


def render_waveform(audio: np.ndarray, width: int = 60) -> str:
    """Audio -> one-line block-character waveform (visualization.rs:13)."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.size == 0:
        return " " * width
    n = audio.size // width if audio.size >= width else 1
    chunks = [audio[i * n:(i + 1) * n] for i in range(min(width, audio.size))]
    peaks = np.array([np.abs(c).max() if len(c) else 0.0 for c in chunks])
    top = peaks.max() or 1.0
    out = "".join(_BLOCKS[int(p / top * (len(_BLOCKS) - 1))] for p in peaks)
    return out.ljust(width)


def render_mel(mel: np.ndarray, width: int = 60, height: int = 8) -> List[str]:
    """[T, n_mels] log-mel -> ASCII heat rows (visualization.rs:51)."""
    mel = np.asarray(mel, dtype=np.float32)
    if mel.ndim != 2 or mel.size == 0:
        return [" " * width] * height
    T, M = mel.shape
    t_idx = np.linspace(0, T - 1, width).astype(int)
    m_idx = np.linspace(0, M - 1, height).astype(int)
    grid = mel[np.ix_(t_idx, m_idx)]
    lo, hi = float(grid.min()), float(grid.max())
    span = (hi - lo) or 1.0
    rows = []
    for m in reversed(range(height)):  # high mel bands on top
        row = "".join(
            _BLOCKS[int((grid[t, m] - lo) / span * (len(_BLOCKS) - 1))]
            for t in range(width))
        rows.append(row)
    return rows


def render_progress(fraction: float, width: int = 40) -> str:
    done = int(max(0.0, min(1.0, fraction)) * width)
    return "[" + "#" * done + "-" * (width - done) + f"] {100 * fraction:3.0f}%"


def render_stage_panel(state: PipelineState, t: StageTimings,
                       width: int = 68) -> List[str]:
    """Per-stage status rows: a check, a spinner marker, or a dash.

    (reference: the stage list panel, app.rs:152-230)"""
    order = [PipelineState.MEL, PipelineState.ENCODE, PipelineState.DECODE]
    cur = order.index(state) if state in order else (
        len(order) if state in (PipelineState.COMPLETE,
                                PipelineState.ERROR) else -1)
    rows = []
    vals = {PipelineState.MEL: f"{t.mel_s * 1e3:7.1f} ms",
            PipelineState.ENCODE: f"{t.encode_s * 1e3:7.1f} ms",
            PipelineState.DECODE:
                f"{t.decode_s * 1e3:7.1f} ms  {t.tokens:4d} tok  "
                f"{t.tokens_per_s:6.1f} tok/s"}
    for n, st in enumerate(order):
        mark = "x" if n < cur else (">" if n == cur else "-")
        rows.append(f"  {mark} {st.value:<14} {vals[st]}"[:width])
    if state == PipelineState.DECODE and t.max_tokens:
        rows.append("    " + render_progress(
            t.tokens / t.max_tokens, min(40, width - 12)))
    if state == PipelineState.COMPLETE:
        rows.append(f"    RTF {t.rtf:7.4f}  "
                    f"({1.0 / t.rtf if t.rtf else 0:5.0f}x realtime)")
    return rows


def render_dashboard(state: PipelineState, audio: Optional[np.ndarray],
                     mel: Optional[np.ndarray], text: str,
                     elapsed: float, width: int = 72,
                     timings: Optional[StageTimings] = None) -> List[str]:
    """Full frame as text lines (panel layout, reference: src/tui/app.rs)."""
    lines = []
    lines.append("=" * width)
    lines.append(f" whisper-apr-tpu   state: {state.value:<16} "
                 f"elapsed: {elapsed:6.2f}s")
    lines.append("=" * width)
    lines.append(" pipeline")
    for row in render_stage_panel(state, timings or StageTimings(),
                                  width - 2):
        lines.append(row)
    lines.append("-" * width)
    lines.append(" waveform")
    lines.append("  " + (render_waveform(audio, width - 4)
                         if audio is not None else " " * (width - 4)))
    lines.append(" mel spectrogram")
    for row in (render_mel(mel, width - 4, 6) if mel is not None
                else [" " * (width - 4)] * 6):
        lines.append("  " + row)
    lines.append("-" * width)
    lines.append(" transcript")
    body = text if text else "(pending)"
    for i in range(0, max(len(body), 1), width - 4):
        lines.append("  " + body[i: i + width - 4])
    lines.append("=" * width)
    return lines


def live_decode(engine, enc, prompt_list: List[int], bias_np: np.ndarray,
                max_tokens: int,
                on_token: Callable[[List[int]], None]) -> List[int]:
    """Host-stepped greedy decode emitting each token as it lands.

    The fused on-device loop cannot surface per-token progress; this loop
    (the hotword-path pattern, engine._transcribe_hotwords) trades ~one
    dispatch per token for a live view. Returns generated tokens (no
    prompt, no EOT)."""
    import jax.numpy as jnp

    from ..model.decoder import decode_step, init_cache, prefill

    cache = init_cache(engine.params, enc, engine.config, max_tokens,
                       compute_dtype=engine._compute_dtype)
    prompt = jnp.asarray(np.asarray(prompt_list, np.int32)[None])
    logits, cache = prefill(engine.params, prompt, enc, cache, engine.config,
                            compute_dtype=engine._compute_dtype)
    eot = engine.specials.eot
    gen: List[int] = []
    pos = len(prompt_list)
    logits_np = np.asarray(logits, dtype=np.float32)
    while pos < max_tokens:
        tok = int(np.argmax(logits_np[0] + bias_np))
        if tok == eot:
            break
        gen.append(tok)
        on_token(gen)
        if pos + 1 >= max_tokens:
            break
        logits, cache = decode_step(
            engine.params, jnp.asarray([tok], np.int32), jnp.int32(pos),
            cache, engine.config, compute_dtype=engine._compute_dtype)
        logits_np = np.asarray(logits, dtype=np.float32)
        pos += 1
    return gen


# -- curses app ---------------------------------------------------------------

def run_tui(args) -> int:
    """Interactive transcription dashboard with a LIVE decode (q to quit)."""
    import curses

    from ..inference.processors import WhisperTokenSuppressor
    from .commands import _load_audio, _load_engine

    engine = _load_engine(args)
    audio = _load_audio(args.audio)
    max_tokens = min(getattr(args, "max_tokens", None)
                     or engine.config.n_text_ctx, engine.config.n_text_ctx)

    t = StageTimings(audio_s=len(audio) / 16_000.0,
                     max_tokens=max_tokens)
    state = {"s": PipelineState.IDLE, "mel": None, "text": "",
             "t0": time.time()}

    def snapshot():
        return render_dashboard(state["s"], audio, state["mel"],
                                state["text"], time.time() - state["t0"],
                                timings=t)

    def main(stdscr):
        curses.curs_set(0)
        stdscr.nodelay(True)

        def draw():
            stdscr.erase()
            maxy, maxx = stdscr.getmaxyx()
            for i, line in enumerate(snapshot()[: maxy - 1]):
                stdscr.addnstr(i, 0, line, maxx - 1)
            stdscr.refresh()

        state["s"] = PipelineState.MEL
        draw()
        t0 = time.time()
        state["mel"] = engine.compute_mel(audio)
        t.mel_s = time.time() - t0
        state["s"] = PipelineState.ENCODE
        draw()
        t0 = time.time()
        enc = engine.encode(state["mel"])
        t.encode_s = time.time() - t0
        state["s"] = PipelineState.DECODE
        draw()

        lang = getattr(args, "language", None) or "en"
        prompt_list = engine.get_initial_tokens(lang)
        bias = WhisperTokenSuppressor(
            n_vocab=engine.config.n_vocab, tokens=engine.specials).bias()
        t0 = time.time()

        def on_token(gen):
            t.tokens = len(gen)
            t.decode_s = time.time() - t0
            state["text"] = engine.tokenizer.decode_with_options(
                gen, skip_special=True) if engine.tokenizer else ""
            draw()

        gen = live_decode(engine, enc, prompt_list, np.asarray(bias),
                          max_tokens, on_token)
        t.decode_s = time.time() - t0
        t.tokens = len(gen)
        state["s"] = PipelineState.COMPLETE
        draw()
        while True:
            ch = stdscr.getch()
            if ch in (ord("q"), 27):
                return
            time.sleep(0.05)

    curses.wrapper(main)
    return 0
