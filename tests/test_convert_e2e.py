"""Converter end-to-end: HF checkpoint DIRECTORY -> .apr -> engine.

The coverage run showed tools/convert.py at 43% — only the state-dict
mapping helper had tests. These drive ``convert_hf_to_apr`` the way a
user does (reference: tools/convert.rs main flow), against a directory
saved by ``transformers`` itself."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, small_config, small_specials
from whisper_apr_tpu import WhisperApr
from whisper_apr_tpu.errors import FormatError
from whisper_apr_tpu.format import QUANT_INT8
from whisper_apr_tpu.tools.convert import convert_hf_to_apr


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf_ckpt"))
    cfg = small_config()
    hf = make_hf_twin(cfg, seed=11)
    hf.save_pretrained(d, safe_serialization=True)
    # full-coverage vocab + merges (converter embeds them; decode of any
    # model token id must resolve)
    vocab = {f"<x{i}>": i for i in range(cfg.n_vocab)}
    json.dump(vocab, open(os.path.join(d, "vocab.json"), "w"))
    open(os.path.join(d, "merges.txt"), "w").write("#version: 0.2\n! !\n")
    return d, cfg


class TestConvertE2E:
    def test_v1_roundtrip_weights_exact(self, hf_dir, tmp_path):
        d, cfg = hf_dir
        out = str(tmp_path / "m.apr")
        convert_hf_to_apr(d, out)
        eng = WhisperApr.load_from_apr(out, specials=small_specials(cfg))
        assert eng.config.n_vocab == cfg.n_vocab
        # spot-check an exact weight round-trip (f32 container)
        from safetensors.numpy import load_file
        sd = load_file(os.path.join(d, "model.safetensors"))
        want = sd["model.decoder.embed_tokens.weight"]
        got = np.asarray(
            jnp.asarray(eng.params["decoder"]["token_emb"], jnp.float32))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_v2_container(self, hf_dir, tmp_path):
        d, cfg = hf_dir
        out = str(tmp_path / "m2.apr")
        convert_hf_to_apr(d, out, container_version=2)
        assert open(out, "rb").read(4) == b"APR2"
        eng = WhisperApr.load_from_apr(out, specials=small_specials(cfg))
        res = eng.transcribe(np.zeros(3200, np.float32))
        assert isinstance(res.text, str)

    def test_int8_smaller(self, hf_dir, tmp_path):
        d, cfg = hf_dir
        f32 = str(tmp_path / "f.apr")
        i8 = str(tmp_path / "i.apr")
        convert_hf_to_apr(d, f32)
        convert_hf_to_apr(d, i8, quantization=QUANT_INT8)
        assert os.path.getsize(i8) < 0.5 * os.path.getsize(f32)
        eng = WhisperApr.load_from_apr(i8, specials=small_specials(cfg))
        res = eng.transcribe(np.zeros(3200, np.float32))
        assert isinstance(res.text, str)

    def test_missing_config_raises(self, tmp_path):
        with pytest.raises(FormatError):
            convert_hf_to_apr(str(tmp_path), str(tmp_path / "x.apr"))


class TestStreamingSession:
    def test_partials_and_finalize(self):
        """StreamingSession: 44.1 kHz input resampled, partial polling,
        finalize (reference: WASM streaming session wrappers,
        src/wasm/mod.rs:1090-1560)."""
        from whisper_apr_tpu.inference.streaming import StreamingSession
        cfg = small_config()
        hf = make_hf_twin(cfg, seed=2)
        eng = WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))
        sess = StreamingSession(eng, input_sample_rate=44_100)
        rng = np.random.default_rng(0)
        for _ in range(4):
            sess.push(rng.normal(0, 0.2, 44_100).astype(np.float32))
        # partial may or may not be ready depending on VAD; the API must
        # behave either way
        if sess.has_partial():
            assert isinstance(sess.get_partial(), str)
        final = sess.finalize()
        assert isinstance(final, str)
