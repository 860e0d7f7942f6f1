"""CLI tests (mirror reference: tests/cli_parity_tests.rs — arg parsing,
output-format snapshots, WER calculation)."""

import json
import os

import numpy as np
import pytest

from helpers import make_hf_twin, small_config, small_specials
from whisper_apr_tpu.cli.args import build_parser, expand_response_files
from whisper_apr_tpu.cli.output import FORMATS, format_result
from whisper_apr_tpu.cli.parity import calculate_wer, levenshtein, normalize_text
from whisper_apr_tpu.engine import TranscriptionResult
from whisper_apr_tpu.timestamps import Segment


class TestArgs:
    def test_all_subcommands_parse(self):
        p = build_parser()
        cases = [
            ["transcribe", "a.wav", "-m", "m.apr"],
            ["translate", "a.wav", "-m", "m.apr", "--beam-size", "5"],
            ["batch", "a.wav", "b.wav", "-m", "m.apr", "-of", "srt"],
            ["stream", "a.wav", "-m", "m.apr", "--chunk-seconds", "2"],
            ["detect-language", "a.wav", "-m", "m.apr"],
            ["model", "-m", "m.apr"],
            ["validate", "-m", "m.apr"],
            ["quantize", "-m", "m.apr", "-o", "out.apr"],
            ["convert", "in_dir", "out.apr", "--int8"],
            ["benchmark", "--duration", "10", "--emit", "json"],
            ["parity", "a.wav", "ref.txt", "-m", "m.apr"],
            ["diagnose"],
            ["test"],
            ["serve", "-m", "m.apr", "--port", "8123"],
            ["tui", "a.wav", "-m", "m.apr"],
            ["record", "-m", "m.apr", "--sample-format", "s16le"],
            ["command", "a.wav", "cmds.txt", "-m", "m.apr"],
        ]
        for argv in cases:
            args = p.parse_args(argv)
            assert args.command == argv[0]

    def test_whisper_cpp_parity_flags(self):
        # (reference: src/cli/args.rs:160-410)
        p = build_parser()
        args = p.parse_args([
            "transcribe", "a.wav", "-m", "m.apr", "-l", "de", "-bs", "8",
            "--best-of", "3", "--temperature", "0.2", "--entropy-thold", "2.0",
            "--logprob-thold", "-0.5", "--no-speech-thold", "0.4",
            "--threads", "4", "--flash-attn", "--timestamps", "-of", "vtt"])
        assert args.language == "de" and args.beam_size == 8
        assert args.flash_attn and not args.no_timestamps
        assert args.output_format == "vtt"

    def test_response_file(self, tmp_path):
        rf = tmp_path / "args.txt"
        rf.write_text("transcribe a.wav -m m.apr")
        out = expand_response_files([f"@{rf}"])
        assert out == ["transcribe", "a.wav", "-m", "m.apr"]


class TestOutputFormats:
    def result(self):
        return TranscriptionResult(
            text="hello world",
            language="en",
            segments=[Segment(0.0, 1.5, "hello world", [1, 2])],
            tokens=[1, 2])

    def test_txt(self):
        assert format_result(self.result(), "txt") == "hello world\n"

    def test_srt(self):
        out = format_result(self.result(), "srt")
        assert "1\n00:00:00,000 --> 00:00:01,500\nhello world" in out

    def test_vtt(self):
        out = format_result(self.result(), "vtt")
        assert out.startswith("WEBVTT")
        assert "00:00:00.000 --> 00:00:01.500" in out

    def test_json(self):
        data = json.loads(format_result(self.result(), "json"))
        assert data == {"text": "hello world", "language": "en"}

    def test_json_full(self):
        data = json.loads(format_result(self.result(), "json-full"))
        assert data["segments"][0]["end"] == 1.5
        assert data["tokens"] == [1, 2]

    def test_csv(self):
        out = format_result(self.result(), "csv")
        assert out.splitlines()[0] == "start,end,text"
        assert '"hello world"' in out

    def test_lrc(self):
        assert format_result(self.result(), "lrc").startswith("[00:00.00]")

    def test_md(self):
        assert "| 0.00 | 1.50 | hello world |" in format_result(self.result(), "md")

    def test_all_formats_covered(self):
        for fmt in FORMATS:
            assert format_result(self.result(), fmt)

    def test_unknown_format(self):
        with pytest.raises(ValueError):
            format_result(self.result(), "xml")


class TestWer:
    def test_identical(self):
        assert calculate_wer("hello world", "Hello, World!") == 0.0

    def test_substitution(self):
        assert calculate_wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_insert_delete(self):
        assert calculate_wer("a b c", "a c") == pytest.approx(1 / 3)
        assert calculate_wer("a c", "a b c") == pytest.approx(1 / 2)

    def test_empty_reference(self):
        assert calculate_wer("", "") == 0.0
        assert calculate_wer("", "word") == 1.0

    def test_levenshtein(self):
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("abc", "axc") == 1
        assert levenshtein("", "abc") == 3


class TestCliE2E:
    """Drive the real CLI surface with a twin .apr on disk."""

    @pytest.fixture(scope="class")
    def model_path(self, tmp_path_factory):
        from test_engine import build_apr_bytes
        cfg = small_config()
        hf = make_hf_twin(cfg)
        path = tmp_path_factory.mktemp("cli") / "twin.apr"
        path.write_bytes(build_apr_bytes(hf, cfg))
        return str(path)

    @pytest.fixture(scope="class")
    def wav_path(self, tmp_path_factory):
        from whisper_apr_tpu.audio.wav import write_wav
        path = tmp_path_factory.mktemp("cli") / "t.wav"
        rng = np.random.default_rng(0)
        write_wav(str(path), rng.normal(0, 0.1, 8000).astype(np.float32))
        return str(path)

    def test_model_info(self, model_path, capsys):
        from whisper_apr_tpu.cli import run
        assert run(["model", "-m", model_path]) == 0
        out = capsys.readouterr().out
        assert "tensors:" in out and "crc32: ok" in out

    def test_validate(self, model_path, capsys):
        from whisper_apr_tpu.cli import run
        run(["validate", "-m", model_path])
        out = capsys.readouterr().out
        assert "checks passed" in out

    def test_quantize(self, model_path, tmp_path, capsys):
        from whisper_apr_tpu.cli import run
        out_path = str(tmp_path / "int8.apr")
        assert run(["quantize", "-m", model_path, "-o", out_path]) == 0
        assert os.path.getsize(out_path) < os.path.getsize(model_path)

    def test_diagnose(self, capsys):
        from whisper_apr_tpu.cli import run
        assert run(["diagnose"]) == 0
        out = capsys.readouterr().out
        assert "[OK] jax backend" in out

    def test_record_without_stdin_pipe(self, model_path, capsys, monkeypatch):
        import io, sys
        from whisper_apr_tpu.cli import run
        # no pipe on stdin -> usage error (exit 2)
        class Tty(io.StringIO):
            def isatty(self):
                return True
        monkeypatch.setattr(sys, "stdin", Tty())
        assert run(["record", "-m", model_path]) == 2

    def test_missing_file_is_clean_error(self, capsys):
        from whisper_apr_tpu.cli import run
        assert run(["model", "-m", "/nonexistent.apr"]) == 1
        assert "error:" in capsys.readouterr().err


class TestTuiRendering:
    """Headless tests of the pure TUI renderers (reference: src/tui/)."""

    def test_waveform(self):
        from whisper_apr_tpu.cli.tui import render_waveform
        x = np.sin(np.arange(6000) * 0.01).astype(np.float32)
        out = render_waveform(x, width=40)
        assert len(out) == 40
        assert any(c != " " for c in out)

    def test_waveform_empty(self):
        from whisper_apr_tpu.cli.tui import render_waveform
        assert render_waveform(np.zeros(0, np.float32), 20) == " " * 20

    def test_mel_heatmap(self):
        from whisper_apr_tpu.cli.tui import render_mel
        mel = np.random.default_rng(0).normal(size=(100, 80)).astype(np.float32)
        rows = render_mel(mel, width=30, height=5)
        assert len(rows) == 5
        assert all(len(r) == 30 for r in rows)

    def test_dashboard_frame(self):
        from whisper_apr_tpu.cli.tui import PipelineState, render_dashboard
        lines = render_dashboard(
            PipelineState.DECODE,
            np.zeros(1000, np.float32),
            np.zeros((50, 80), np.float32),
            "hello world", 1.5)
        joined = "\n".join(lines)
        assert "decoding" in joined
        assert "hello world" in joined

    def test_progress_bar(self):
        from whisper_apr_tpu.cli.tui import render_progress
        assert render_progress(0.5, 10).startswith("[#####-----]")


class TestTuiLiveDashboard:
    """Round-3 TUI depth: per-stage panel, live decode, stage timings
    (reference: src/tui/app.rs:152 live pipeline dashboard)."""

    def test_stage_panel_states(self):
        from whisper_apr_tpu.cli.tui import (PipelineState, StageTimings,
                                             render_stage_panel)
        t = StageTimings(mel_s=0.002, encode_s=0.01, decode_s=0.5,
                         tokens=25, max_tokens=100, audio_s=5.0)
        rows = render_stage_panel(PipelineState.DECODE, t)
        joined = "\n".join(rows)
        assert "x computing mel" in joined     # finished
        assert "> decoding" in joined          # current
        assert "tok/s" in joined
        assert "[" in joined                   # progress bar while decoding
        done = "\n".join(render_stage_panel(PipelineState.COMPLETE, t))
        assert "RTF" in done and ">" not in done

    def test_stage_timings_derived(self):
        from whisper_apr_tpu.cli.tui import StageTimings
        t = StageTimings(mel_s=0.1, encode_s=0.4, decode_s=0.5,
                         tokens=50, audio_s=10.0)
        assert t.tokens_per_s == pytest.approx(100.0)
        assert t.rtf == pytest.approx(0.1)

    def test_dashboard_includes_stage_panel(self):
        from whisper_apr_tpu.cli.tui import (PipelineState, StageTimings,
                                             render_dashboard)
        lines = render_dashboard(
            PipelineState.ENCODE, np.zeros(100, np.float32), None, "",
            0.5, timings=StageTimings(mel_s=0.003))
        joined = "\n".join(lines)
        assert "pipeline" in joined
        assert "> encoding" in joined

    def test_live_decode_streams_tokens(self):
        """live_decode emits each token through the callback and matches
        the engine's own greedy output."""
        from helpers import make_hf_twin, small_config, small_specials
        from whisper_apr_tpu import TranscribeOptions, WhisperApr
        from whisper_apr_tpu.cli.tui import live_decode
        from whisper_apr_tpu.inference.processors import \
            WhisperTokenSuppressor
        cfg = small_config()
        eng = WhisperApr.from_hf_model(make_hf_twin(cfg, seed=8), cfg,
                                       specials=small_specials(cfg))
        audio = np.random.default_rng(3).normal(0, 0.2, 8000) \
            .astype(np.float32)
        plain = eng.transcribe(audio, TranscribeOptions(language="en",
                                                        max_tokens=12))
        enc = eng.encode(eng.compute_mel(audio))
        prompt = eng.get_initial_tokens("en")
        bias = np.asarray(WhisperTokenSuppressor(
            n_vocab=cfg.n_vocab, tokens=eng.specials).bias())
        seen = []
        gen = live_decode(eng, enc, prompt, bias, 12,
                          on_token=lambda g: seen.append(len(g)))
        assert seen == list(range(1, len(gen) + 1))   # one event per token
        want = [t for t in plain.tokens[len(prompt):]
                if t != eng.specials.eot]
        assert gen == want


class TestMainModule:
    def test_python_dash_m_entry(self):
        """`python -m whisper_apr_tpu.cli --help` — the documented entry
        point (reference: src/bin/whisper-apr-cli.rs:17, a thin shell) —
        must exit 0 and list the subcommands."""
        import subprocess
        import sys
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in ("/root/.axon_site",
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))),
                        env.get("PYTHONPATH", "")) if p)
        out = subprocess.run(
            [sys.executable, "-m", "whisper_apr_tpu.cli", "--help"],
            capture_output=True, text=True, timeout=300, env=env)
        assert out.returncode == 0, out.stderr
        for sub in ("transcribe", "serve", "quantize", "diagnose"):
            assert sub in out.stdout
