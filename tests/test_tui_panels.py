"""Panel-system TUI tests (round-3 depth push toward the reference's
full dashboard: src/tui/app.rs WhisperPanel/WhisperApp, panels.rs,
visualization.rs multi-row renderers). All headless: TuiApp.frame is a
pure function of app state."""

import numpy as np
import pytest

from whisper_apr_tpu.cli.tui import (DecoderToken, EncoderLayerMetrics,
                                     Panel, PipelineState, StageTimings,
                                     TuiApp, render_attention_heatmap,
                                     render_encoder_table, render_help_rows,
                                     render_metrics_rows, render_status,
                                     render_tabs, render_token_table,
                                     render_waveform_rows)


class TestPanelEnum:
    def test_titles_cover_all_panels(self):
        assert len(Panel.titles()) == len(Panel) == 8

    def test_from_key_digits(self):
        assert Panel.from_key(ord("1")) == Panel.WAVEFORM
        assert Panel.from_key(ord("5")) == Panel.ATTENTION
        assert Panel.from_key(ord("7")) == Panel.METRICS
        assert Panel.from_key(ord("?")) == Panel.HELP
        assert Panel.from_key(ord("x")) is None
        assert Panel.from_key(ord("8")) is None


class TestRenderers:
    def test_waveform_rows_shape_and_midline(self):
        x = np.sin(np.arange(8000) * 0.01).astype(np.float32)
        rows = render_waveform_rows(x, width=40, height=9)
        assert len(rows) == 9 and all(len(r) == 40 for r in rows)
        assert "-" in rows[4]                      # midline
        assert any("█" in r for r in rows)         # peaks drawn

    def test_waveform_rows_height_one_falls_back(self):
        x = np.sin(np.arange(4000) * 0.02).astype(np.float32)
        rows = render_waveform_rows(x, 30, 1)
        assert len(rows) == 1 and len(rows[0]) == 30

    def test_waveform_rows_empty(self):
        rows = render_waveform_rows(np.zeros(0, np.float32), 20, 5)
        assert rows == [" " * 20] * 5

    def test_attention_heatmap(self):
        w = np.eye(12, 50, dtype=np.float32)     # diagonal alignment
        rows = render_attention_heatmap(w, width=25, height=6)
        assert len(rows) == 6 and all(len(r) == 25 for r in rows)
        # diagonal: the hot cell advances rightward row by row
        assert rows[0].index("█") < rows[2].index("█") < rows[4].index("█")

    def test_encoder_table(self):
        ms = [EncoderLayerMetrics(i, 0.5 + i, 2.0 + i, 1.3) for i in range(4)]
        rows = render_encoder_table(ms)
        assert "attn entropy" in rows[0]
        assert len(rows) == 5
        assert "3" in rows[-1]

    def test_encoder_table_elides_middle(self):
        ms = [EncoderLayerMetrics(i, 1.0, 2.0, 1.0) for i in range(32)]
        rows = render_encoder_table(ms, max_rows=8)
        assert any("..." in r for r in rows)
        assert "31" in rows[-1]                   # last layer always shown

    def test_token_table(self):
        toks = [DecoderToken(50364, "<|0.00|>", -0.1),
                DecoderToken(1234, " hello", -1.5)]
        rows = render_token_table(toks)
        assert "log p" in rows[0]
        assert " hello" in rows[-1] and "-1.50" in rows[-1]

    def test_token_table_empty(self):
        assert "(no tokens yet)" in render_token_table([])[0]

    def test_metrics_rows(self):
        t = StageTimings(mel_s=0.01, encode_s=0.02, decode_s=0.07,
                         tokens=70, audio_s=10.0)
        rows = render_metrics_rows(t, model="large-v3", quant="int8")
        joined = "\n".join(rows)
        assert "large-v3" in joined and "int8" in joined
        assert "0.0100" in joined                  # RTF
        assert "100x realtime" in joined

    def test_help_mentions_keys(self):
        joined = "\n".join(render_help_rows())
        assert "1-7" in joined and "q / ESC" in joined

    def test_tabs_highlight_active(self):
        bar = render_tabs(Panel.DECODER, width=100)
        assert "[Decoder]" in bar and "[Waveform]" not in bar

    def test_status_bar_width(self):
        s = render_status(PipelineState.DECODE, "hello", width=30)
        assert len(s) == 30 and "decoding" in s


class TestTuiApp:
    def _app(self):
        app = TuiApp(model_name="tiny", quant="int8")
        app.load_audio(np.sin(np.arange(16000) * 0.01).astype(np.float32))
        app.mel = np.random.default_rng(0).normal(
            size=(100, 80)).astype(np.float32)
        app.encoder_metrics = [EncoderLayerMetrics(0, 1.0, 2.0, 1.1)]
        app.tokens = [DecoderToken(1, " hi", -0.5)]
        app.attention = np.eye(4, 20, dtype=np.float32)
        app.text = "hi there"
        return app

    def test_every_panel_renders(self):
        app = self._app()
        for p in Panel:
            app.panel = p
            lines = app.frame(width=72, height=24)
            assert 0 < len(lines) <= 24
            assert all(len(line) <= 72 for line in lines)

    def test_frame_contains_tab_bar_and_status(self):
        app = self._app()
        app.state = PipelineState.DECODE
        lines = app.frame()
        assert "[Waveform]" in lines[0]
        assert "decoding" in lines[-1]

    def test_empty_placeholders(self):
        app = TuiApp()
        for p, needle in [(Panel.WAVEFORM, "no audio"),
                          (Panel.MEL, "not computed"),
                          (Panel.ENCODER, "not run"),
                          (Panel.DECODER, "no tokens"),
                          (Panel.ATTENTION, "after the decode")]:
            app.panel = p
            assert needle in "\n".join(app.frame())

    def test_handle_key_switches_panels(self):
        app = self._app()
        assert app.handle_key(ord("4")) is False
        assert app.panel == Panel.DECODER
        app.handle_key(ord("\t"))
        assert app.panel == Panel.ATTENTION
        app.handle_key(ord("h"))
        assert app.panel == Panel.DECODER
        assert app.handle_key(ord("q")) is True
        assert app.handle_key(27) is True

    def test_reset_clears_run_state_keeps_audio(self):
        app = self._app()
        app.state = PipelineState.COMPLETE
        app.timings.mel_s = 0.5
        app.reset()
        assert app.state == PipelineState.IDLE
        assert app.mel is None and app.tokens == [] and app.text == ""
        assert app.timings.mel_s == 0.0
        assert app.audio is not None
        assert app.timings.audio_s == pytest.approx(1.0)

    def test_fail_sets_error_state(self):
        app = self._app()
        app.fail("boom")
        assert app.state == PipelineState.ERROR
        assert "boom" in "\n".join(app.frame())


class TestEncoderTraced:
    def test_encoder_forward_traced_matches_encode(self):
        import jax.numpy as jnp
        from helpers import make_hf_twin, small_config, small_specials

        from whisper_apr_tpu import WhisperApr
        from whisper_apr_tpu.model.encoder import encode
        from whisper_apr_tpu.model.traced import encoder_forward_traced
        cfg = small_config()
        eng = WhisperApr.from_hf_model(make_hf_twin(cfg, seed=5), cfg,
                                       specials=small_specials(cfg))
        params = eng.params
        mel = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
        ref = encode(params, mel, cfg)
        out, metrics = encoder_forward_traced(params, mel, cfg)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
        assert len(metrics) == cfg.n_audio_layer
        m = metrics[0]
        assert m["mean_activation"] > 0
        assert m["max_activation"] >= m["mean_activation"]
        # attention entropy is bounded by log(T_ctx)
        assert 0.0 <= m["attention_entropy"] <= np.log(cfg.n_audio_ctx) + 1e-5


class TestRunTuiKeysAndErrors:
    def _fixture(self, tmp_path):
        import wave

        from helpers import make_hf_twin, small_config

        from whisper_apr_tpu.audio.mel import mel_filterbank
        from whisper_apr_tpu.format import AprWriter, MelFilterbankData
        from whisper_apr_tpu.tokenizer import Vocabulary
        from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
        cfg = small_config(n_vocab=51_865)
        hf = make_hf_twin(cfg, seed=0)
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        w = AprWriter.from_config(cfg)
        for name, arr in hf_state_dict_to_apr_tensors(sd).items():
            w.add_tensor(name, arr)
        vocab = Vocabulary.with_base_tokens()
        while len(vocab) < cfg.n_vocab:
            vocab.add_token(b"<|t%d|>" % len(vocab))
        w.set_vocabulary(vocab.to_bytes())
        w.set_mel_filterbank(MelFilterbankData(80, 201, mel_filterbank(80)))
        model = str(tmp_path / "m.apr")
        w.write_file(model)
        clip = str(tmp_path / "c.wav")
        pcm = (np.clip(np.random.default_rng(0).normal(0, 0.1, 4000), -1, 1)
               * 32767).astype(np.int16)
        with wave.open(clip, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())
        return model, clip

    def _stub_curses(self, keys):
        lines = []

        class StubScreen:
            def nodelay(self, *_):
                pass

            def erase(self):
                pass

            def getmaxyx(self):
                return (40, 100)

            def addnstr(self, y, x, s, n):
                lines.append(s)

            def refresh(self):
                pass

            def getch(self):
                return keys.pop(0) if keys else ord("q")

        class StubCurses:
            error = Exception

            @staticmethod
            def wrapper(fn):
                return fn(StubScreen())

            @staticmethod
            def curs_set(*_):
                pass

        return StubCurses, lines

    def test_panel_keys_during_run(self, tmp_path, monkeypatch):
        import argparse
        import sys as _sys

        import whisper_apr_tpu.cli.tui as tui_mod
        model, clip = self._fixture(tmp_path)
        # draws pop one key each: MEL, ENCODE, then the DECODE-stage draw
        # (metrics now exist) gets '3' -> encoder panel renders during the
        # live decode; '5' lands in the wait loop -> attention panel
        stub, lines = self._stub_curses(
            [-1, -1, ord("3")] + [-1] * 20 + [ord("5")])
        monkeypatch.setitem(_sys.modules, "curses", stub)
        args = argparse.Namespace(model=model, audio=clip, language="en",
                                  max_tokens=12, verbose=False, quiet=True)
        assert tui_mod.run_tui(args) == 0
        joined = "\n".join(lines)
        assert "attn entropy" in joined        # encoder panel was shown
        assert "tokens (rows) x audio frames" in joined  # attention panel
        assert "complete" in joined            # status bar reached complete

    def test_error_path_and_rerun(self, tmp_path, monkeypatch):
        import argparse
        import sys as _sys

        import whisper_apr_tpu.cli.tui as tui_mod
        model, clip = self._fixture(tmp_path)

        def boom(*a, **k):
            raise RuntimeError("kernel exploded")

        monkeypatch.setattr(tui_mod, "live_decode", boom)
        # the four stage draws (mel/encode/decode/fail) pop one key each;
        # 'r' must land in the wait loop to trigger the rerun
        stub, lines = self._stub_curses(
            [-1, -1, -1, -1, ord("r")] + [-1] * 4)
        monkeypatch.setitem(_sys.modules, "curses", stub)
        args = argparse.Namespace(model=model, audio=clip, language="en",
                                  max_tokens=4, verbose=False, quiet=True)
        assert tui_mod.run_tui(args) == 0      # error is surfaced, not raised
        joined = "\n".join(lines)
        assert "kernel exploded" in joined
        assert joined.count("kernel exploded") >= 2   # the rerun also failed
