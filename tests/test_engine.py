"""Engine E2E tests: .apr load -> transcribe -> text, vs the HF twin.

The offline analog of the reference ground-truth suite
(reference: tests/ground_truth_tests.rs, tests/integration_transcribe.rs:23).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, random_mel, small_config, small_specials
from whisper_apr_tpu import TranscribeOptions, WhisperApr
from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.errors import ModelError
from whisper_apr_tpu.format import AprWriter, MelFilterbankData, QUANT_INT8
from whisper_apr_tpu.audio.mel import mel_filterbank
from whisper_apr_tpu.model.params import hf_state_dict_to_apr_tensors
from whisper_apr_tpu.tokenizer import BpeTokenizer, Vocabulary


@pytest.fixture(scope="module")
def cfg():
    return small_config()


@pytest.fixture(scope="module")
def hf(cfg):
    return make_hf_twin(cfg)


def build_apr_bytes(hf, cfg, quant=None) -> bytes:
    """HF twin -> .apr bytes with vocab + filterbank (converter round-trip)."""
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    tensors = hf_state_dict_to_apr_tensors(sd)
    w = AprWriter.from_config(cfg, quantization=quant) if quant is not None \
        else AprWriter.from_config(cfg)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    vocab = Vocabulary.with_base_tokens()
    while len(vocab) < cfg.n_vocab:
        vocab.add_token(b"<|tok%d|>" % len(vocab))
    w.set_vocabulary(vocab.to_bytes())
    w.set_mel_filterbank(MelFilterbankData(80, 201, mel_filterbank(80)))
    return w.to_bytes()


@pytest.fixture(scope="module")
def apr_bytes(hf, cfg):
    return build_apr_bytes(hf, cfg)


class TestLoadFromApr:
    def test_load(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        assert eng.config == cfg
        assert eng.tokenizer.vocab_size() == cfg.n_vocab
        assert eng.mel_filters.n_mels == 80

    def test_corrupt_rejected(self, apr_bytes):
        bad = bytearray(apr_bytes)
        bad[len(bad) // 2] ^= 0xFF
        with pytest.raises(ModelError):
            WhisperApr.load_from_apr(bytes(bad))

    def test_apr_params_match_hf_params(self, apr_bytes, hf, cfg):
        """The .apr round-trip must preserve weights exactly (f32)."""
        import jax
        eng_apr = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        eng_hf = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        for a, b in zip(jax.tree_util.tree_leaves(eng_apr.params),
                        jax.tree_util.tree_leaves(eng_hf.params)):
            assert np.array_equal(np.asarray(a), np.asarray(b))


class TestTranscribe:
    def test_transcribe_runs_and_is_deterministic(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.1, size=8000).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=16)
        r1 = eng.transcribe(audio, opts)
        r2 = eng.transcribe(audio, opts)
        assert r1.tokens == r2.tokens
        assert r1.language == "en"

    def test_batch_matches_single(self, apr_bytes, cfg):
        """Batched decode must equal per-item decode (the batching oracle)."""
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        rng = np.random.default_rng(1)
        audios = [rng.normal(0, 0.1, size=6000).astype(np.float32)
                  for _ in range(3)]
        opts = TranscribeOptions(language="en", max_tokens=16)
        batch = eng.transcribe_batch(audios, opts)
        for i, audio in enumerate(audios):
            single = eng.transcribe(audio, opts)
            assert batch.results[i].tokens == single.tokens

    def test_max_tokens_cap(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        audio = np.zeros(4000, np.float32)
        r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=8))
        assert len(r.tokens) <= 8


class TestDetectLanguage:
    def test_probs_sum_to_one(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        # small vocab (1000) has no language slots; detection still returns
        # a normalized (possibly empty) distribution — exercise the API shape
        audio = np.zeros(4000, np.float32)
        probs = eng.detect_language(audio)
        total = sum(probs.probs.values())
        assert total == pytest.approx(1.0, abs=1e-3) or len(probs.probs) == 0


class TestQuantizedLoad:
    def test_int8_apr_transcribes(self, hf, cfg):
        """int8 .apr loads via dequant and produces a valid decode."""
        data = build_apr_bytes(hf, cfg, quant=QUANT_INT8)
        eng = WhisperApr.load_from_apr(data, specials=small_specials(cfg))
        audio = np.random.default_rng(2).normal(0, 0.1, 4000).astype(np.float32)
        r = eng.transcribe(audio, TranscribeOptions(language="en", max_tokens=8))
        assert isinstance(r.text, str)


class TestLongAudio:
    def test_long_audio_chunks_and_stitches(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        window = 2 * cfg.n_audio_ctx * 160  # samples per window
        rng = np.random.default_rng(5)
        audio = rng.normal(0, 0.1, int(window * 2.5)).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=8)
        r = eng.transcribe_long(audio, opts, overlap_seconds=0.05)
        assert isinstance(r.text, str)
        # 2.5 windows -> 3 chunks -> up to 3 segments with increasing offsets
        if len(r.segments) >= 2:
            assert r.segments[1].start >= r.segments[0].start

    def test_short_audio_passthrough(self, apr_bytes, cfg):
        eng = WhisperApr.load_from_apr(apr_bytes, specials=small_specials(cfg))
        audio = np.zeros(4000, np.float32)
        opts = TranscribeOptions(language="en", max_tokens=6)
        a = eng.transcribe_long(audio, opts)
        b = eng.transcribe(audio, opts)
        assert a.tokens == b.tokens


class TestEngineDarkPaths:
    """Round-3 coverage: engine conveniences the main suite skipped."""

    @pytest.fixture(scope="class")
    def eng(self, hf, cfg):
        from whisper_apr_tpu.engine import WhisperApr
        return WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))

    def test_transcribe_partial_passthrough(self, eng):
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.1, 4000).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=4)
        r = eng.transcribe_partial(audio, is_final=False, options=opts)
        assert r.tokens == eng.transcribe(audio, opts).tokens

    def test_transcribe_file_with_resample(self, eng, tmp_path):
        import struct as st
        import wave
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.1, 8000).astype(np.float32)
        pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        path = str(tmp_path / "clip8k.wav")
        with wave.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)                 # != 16k -> resampler
            f.writeframes(pcm.tobytes())
        opts = TranscribeOptions(language="en", max_tokens=4)
        r = eng.transcribe_file(path, opts)
        assert isinstance(r.text, str)

    def test_nbest_language_autodetect(self, eng):
        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.1, 4000).astype(np.float32)
        opts = TranscribeOptions(language=None, strategy="beam",
                                 beam_size=2, max_tokens=4)
        out = eng.transcribe_nbest(audio, opts, n=2)
        assert len(out) >= 1
        assert out[0].language                   # auto-detected something

    def test_create_streaming_session(self, eng):
        sess = eng.create_streaming_session()
        assert sess is not None
