"""End-to-end CLI subcommand tests against a real-shaped tiny .apr.

The round-2 coverage run showed cli/commands.py at 41% — only transcribe
had an E2E test path. These tests build ONE full-vocabulary tiny .apr
(random HF-twin weights; text output is gibberish but every pipeline layer
runs) and drive the actual subcommand entry points, like the reference's
cli_parity_tests.rs does against its test .apr."""

import json
import os
import wave

import numpy as np
import pytest

from whisper_apr_tpu.cli import run


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """tiny.apr (full 51865 vocab, random weights) + a 1.5 s WAV."""
    d = tmp_path_factory.mktemp("cli_e2e")

    from helpers import make_hf_twin
    from whisper_apr_tpu.audio.mel import mel_filterbank
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.format import AprWriter, MelFilterbankData
    from whisper_apr_tpu.tokenizer import Vocabulary
    from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors

    cfg = ModelConfig.tiny()
    hf = make_hf_twin(cfg, seed=0)
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    w = AprWriter.from_config(cfg)
    for name, arr in hf_state_dict_to_apr_tensors(sd).items():
        w.add_tensor(name, arr)
    vocab = Vocabulary.with_base_tokens()
    while len(vocab) < cfg.n_vocab:
        vocab.add_token(b"<|tok%d|>" % len(vocab))
    w.set_vocabulary(vocab.to_bytes())
    w.set_mel_filterbank(MelFilterbankData(80, 201, mel_filterbank(80)))
    model = str(d / "tiny.apr")
    w.write_file(model)

    audio = np.fromfile("/root/reference/test_data/ref_a_audio.bin",
                        dtype=np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    clip = str(d / "clip.wav")
    with wave.open(clip, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    return {"dir": d, "model": model, "clip": clip}


class TestCliSubcommands:
    def test_transcribe_json(self, workdir, capsys):
        rc = run(["transcribe", workdir["clip"], "-m", workdir["model"],
                  "-of", "json", "--max-tokens", "8", "-l", "en"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "text" in out and "language" in out

    def test_translate(self, workdir, capsys):
        rc = run(["translate", workdir["clip"], "-m", workdir["model"],
                  "--max-tokens", "6", "-l", "en"])
        assert rc == 0

    def test_detect_language(self, workdir, capsys):
        rc = run(["detect-language", workdir["clip"], "-m", workdir["model"]])
        assert rc == 0
        out = capsys.readouterr().out
        assert ":" in out or len(out.strip()) > 0

    def test_batch_srt(self, workdir, capsys):
        rc = run(["batch", workdir["clip"], workdir["clip"],
                  "-m", workdir["model"], "-of", "srt",
                  "--max-tokens", "6", "-l", "en"])
        assert rc == 0

    def test_quantize_roundtrip(self, workdir, capsys):
        out = str(workdir["dir"] / "tiny-int8.apr")
        rc = run(["quantize", "-m", workdir["model"], "-o", out])
        assert rc == 0
        assert os.path.getsize(out) < os.path.getsize(workdir["model"])
        rc = run(["model", "-m", out])
        assert rc == 0
        assert "int8" in capsys.readouterr().out

    def test_quantize_q4k_and_transcribe(self, workdir, capsys):
        out = str(workdir["dir"] / "tiny-q4k.apr")
        rc = run(["quantize", "-m", workdir["model"], "-o", out,
                  "--format", "q4k"])
        assert rc == 0
        # k-quants beat int8 on size (4.5 vs 8 bits for eligible tensors)
        int8_path = str(workdir["dir"] / "tiny-int8-b.apr")
        assert run(["quantize", "-m", workdir["model"],
                    "-o", int8_path]) == 0
        assert os.path.getsize(out) < os.path.getsize(int8_path)
        capsys.readouterr()
        rc = run(["model", "-m", out])
        assert rc == 0
        assert "q4k" in capsys.readouterr().out
        rc = run(["transcribe", workdir["clip"], "-m", out, "-of", "json",
                  "--max-tokens", "4", "-l", "en"])
        assert rc == 0

    def test_quantize_q6k_and_transcribe(self, workdir, capsys):
        out = str(workdir["dir"] / "tiny-q6k.apr")
        rc = run(["quantize", "-m", workdir["model"], "-o", out,
                  "--format", "q6k"])
        assert rc == 0
        # 6.5625 bits/weight for eligible tensors still beats f32
        assert os.path.getsize(out) < os.path.getsize(workdir["model"])
        capsys.readouterr()
        rc = run(["model", "-m", out])
        assert rc == 0
        assert "q6k" in capsys.readouterr().out
        rc = run(["transcribe", workdir["clip"], "-m", out, "-of", "json",
                  "--max-tokens", "4", "-l", "en"])
        assert rc == 0

    def test_parity(self, workdir, capsys):
        ref = str(workdir["dir"] / "ref.txt")
        open(ref, "w").write("hello world")
        rc = run(["parity", workdir["clip"], ref, "-m", workdir["model"],
                  "--max-tokens", "6", "-l", "en"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "WER" in out or "wer" in out

    def test_diagnose(self, workdir, capsys):
        rc = run(["diagnose", "-m", workdir["model"]])
        assert rc == 0

    def test_stream(self, workdir, capsys):
        rc = run(["stream", workdir["clip"], "-m", workdir["model"],
                  "--chunk-seconds", "1", "-l", "en", "--max-tokens", "6"])
        assert rc == 0

    def test_benchmark_micro(self, workdir, capsys):
        rc = run(["benchmark", "--duration", "1", "--tokens", "2",
                  "--emit", "json"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["tokens_per_second"] > 0

    def test_record_stdin(self, workdir, monkeypatch):
        """`record` consumes raw PCM from stdin (the reference stubs this,
        commands.rs:770)."""
        import io
        import sys as _sys
        audio = np.fromfile("/root/reference/test_data/ref_a_audio.bin",
                            dtype=np.float32)

        class FakeStdin:
            buffer = io.BytesIO(audio.astype("<f4").tobytes())

            @staticmethod
            def isatty():
                return False

        monkeypatch.setattr(_sys, "stdin", FakeStdin())
        rc = run(["record", "-m", workdir["model"],
                  "--sample-format", "f32le", "--chunk-seconds", "0.5",
                  "-l", "en", "--seconds", "1.5"])
        assert rc == 0

    def test_command_matching(self, workdir, capsys):
        cmds = str(workdir["dir"] / "cmds.txt")
        open(cmds, "w").write("turn on the lights\nstop\n")
        rc = run(["command", workdir["clip"], cmds, "-m", workdir["model"],
                  "--max-tokens", "6", "-l", "en", "--threshold", "10"])
        # threshold 10 always matches (gibberish decode still picks best)
        assert rc == 0
        out = capsys.readouterr().out
        assert "heard:" in out and "command:" in out


class TestCliDarkPaths:
    """Round-3 coverage: option paths the main suite skipped."""

    def test_transcribe_to_file_verbose(self, workdir, capsys):
        out = str(workdir["dir"] / "out.txt")
        rc = run(["transcribe", workdir["clip"], "-m", workdir["model"],
                  "-o", out, "--max-tokens", "4", "-l", "en", "--verbose"])
        assert rc == 0
        assert os.path.exists(out)
        err = capsys.readouterr().err
        assert "rtf=" in err
        # --verbose surfaces model-load phase progress
        # (reference: lib.rs:700 load_from_apr_with_progress)
        load_lines = [l for l in err.splitlines() if l.startswith("[load]")]
        assert load_lines, err
        phases = [l.split()[1] for l in load_lines]
        for ph in ("read", "parse", "encoder", "decoder", "finalize"):
            assert ph in phases, (ph, phases)

    def test_load_progress_monotone(self, workdir):
        from whisper_apr_tpu.engine import WhisperApr
        seen = []
        WhisperApr.load_from_apr(workdir["model"], progress=seen.append)
        overall = [p.overall for p in seen]
        assert overall == sorted(overall)
        assert overall[-1] == 1.0 and seen[-1].phase == "finalize"
        order = []
        for p in seen:
            if not order or order[-1] != p.phase:
                order.append(p.phase)
        assert order == ["read", "parse", "encoder", "decoder", "finalize"]

    def test_transcribe_nbest_beam(self, workdir, capsys):
        rc = run(["transcribe", workdir["clip"], "-m", workdir["model"],
                  "--beam-size", "2", "--n-best", "2",
                  "--max-tokens", "4", "-l", "en"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "[1]" in out and "[2]" in out

    def test_batch_missing_file_errors(self, workdir, capsys):
        # a no-match glob falls through as a literal path -> load error
        rc = run(["batch", str(workdir["dir"] / "nope-*.wav"),
                  "-m", workdir["model"]])
        assert rc == 1
        assert "error" in capsys.readouterr().err

    def test_batch_threaded_load(self, workdir, capsys):
        rc = run(["batch", workdir["clip"], workdir["clip"],
                  "-m", workdir["model"], "--threads", "2",
                  "--max-tokens", "4", "-l", "en"])
        assert rc == 0

    def test_quantize_already_quantized(self, workdir, capsys):
        int8_path = str(workdir["dir"] / "tiny-int8-c.apr")
        assert run(["quantize", "-m", workdir["model"],
                    "-o", int8_path]) == 0
        rc = run(["quantize", "-m", int8_path,
                  "-o", str(workdir["dir"] / "again.apr")])
        assert rc == 1
        assert "already quantized" in capsys.readouterr().err

    def test_not_implemented_stub(self, capsys):
        from whisper_apr_tpu.cli.commands import run_not_implemented
        assert run_not_implemented("foo") == 2
        assert "not yet implemented" in capsys.readouterr().err
