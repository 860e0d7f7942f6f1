"""Terminal dashboard for transcription.

(reference: src/tui/ — ratatui dashboard with the pipeline state machine
Idle -> Mel -> Encode -> Decode -> Complete at app.rs:76, panels and
waveform/mel ASCII visualization at visualization.rs:13,51.)

Pure-stdlib curses. Rendering helpers are pure string functions so they are
testable headless; the curses loop is a thin shell around them.
"""

from __future__ import annotations

import enum
import time
from typing import List, Optional

import numpy as np


class PipelineState(enum.Enum):
    """(reference: src/tui/app.rs:76)"""

    IDLE = "idle"
    MEL = "computing mel"
    ENCODE = "encoding"
    DECODE = "decoding"
    COMPLETE = "complete"
    ERROR = "error"


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


def render_dashboard(state: PipelineState, audio: Optional[np.ndarray],
                     mel: Optional[np.ndarray], text: str,
                     elapsed: float, width: int = 72) -> List[str]:
    """Full frame as text lines (panel layout, reference: src/tui/app.rs)."""
    lines = []
    lines.append("=" * width)
    lines.append(f" whisper-apr-tpu   state: {state.value:<16} "
                 f"elapsed: {elapsed:6.2f}s")
    lines.append("=" * width)
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


# -- curses app ---------------------------------------------------------------

def run_tui(args) -> int:
    """Interactive transcription dashboard (q to quit)."""
    import curses

    from .commands import _load_audio, _load_engine, _options_from_args

    engine = _load_engine(args)
    audio = _load_audio(args.audio)

    frames: List[List[str]] = []
    state = {"s": PipelineState.IDLE, "mel": None, "text": "", "t0": time.time()}

    def snapshot():
        return render_dashboard(state["s"], audio, state["mel"],
                                state["text"], time.time() - state["t0"])

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
        state["mel"] = engine.compute_mel(audio)
        state["s"] = PipelineState.ENCODE
        draw()
        enc = engine.encode(state["mel"])
        state["s"] = PipelineState.DECODE
        draw()
        opts = _options_from_args(args, "transcribe")
        result = engine.transcribe(audio, opts)
        state["text"] = result.text
        state["s"] = PipelineState.COMPLETE
        draw()
        while True:
            ch = stdscr.getch()
            if ch in (ord("q"), 27):
                return
            time.sleep(0.05)

    curses.wrapper(main)
    return 0
