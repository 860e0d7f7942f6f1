"""Aux subsystem tests: hotwords, diarization, alignment, trace, progress.

(mirror reference inline tests in src/vocabulary/, src/diarization/,
src/timestamps/, src/trace.rs, src/progress.rs)
"""

import numpy as np
import pytest

from whisper_apr_tpu.alignment import (
    AlignmentConfig,
    CrossAttentionAlignment,
    WordTimestampExtractor,
    refine_boundaries_by_silence,
)
from whisper_apr_tpu.diarization import (
    Diarizer,
    DiarizationConfig,
    EmbeddingExtractor,
    agglomerative_cluster,
    cosine_distance,
    kmeans_cluster,
)
from whisper_apr_tpu.tokenizer import BpeTokenizer, Vocabulary
from whisper_apr_tpu.utils.progress import ProgressTracker, format_bytes
from whisper_apr_tpu.vocabulary import (
    DomainAdapter,
    HotwordBooster,
    VocabularyCustomizer,
    VocabularyTrie,
)


def word_tokenizer():
    v = Vocabulary.with_base_tokens()
    v.add_token(b" hello")   # 256
    v.add_token(b" world")   # 257
    v.add_token(b" hel")     # 258
    v.add_token(b"lo")       # 259
    return BpeTokenizer(v)


class TestVocabularyTrie:
    def test_insert_and_continuations(self):
        t = VocabularyTrie()
        t.insert([1, 2, 3], 5.0)
        t.insert([1, 9], 2.0)
        assert len(t) == 2
        # after [1], both 2 and 9 continue phrases
        conts = dict(t.continuations([1]))
        assert 2 in conts and 9 in conts
        assert conts[9] == 2.0

    def test_suffix_matching(self):
        t = VocabularyTrie()
        t.insert([7, 8], 3.0)
        # context [5, 6, 7]: suffix [7] matches the prefix -> boost 8
        conts = dict(t.continuations([5, 6, 7]))
        assert conts.get(8) == 3.0

    def test_apply_prefix_boost(self):
        t = VocabularyTrie()
        t.insert([3, 4], 10.0)
        logits = np.zeros(10, np.float32)
        out = t.apply_prefix_boost(logits, [3])
        assert out[4] == 10.0
        assert out[5] == 0.0

    def test_empty_context_boosts_phrase_starts(self):
        t = VocabularyTrie()
        t.insert([6, 7], 4.0)
        conts = dict(t.continuations([]))
        assert 6 in conts


class TestHotwordBooster:
    def test_boost_applied_to_continuation(self):
        tok = word_tokenizer()
        b = HotwordBooster(tok, boost=6.0)
        b.add_hotword("hello")
        ids = tok.encode(" hello")
        logits = np.zeros(300, np.float32)
        out = b.apply(logits, [])
        assert out[ids[0]] == 6.0

    def test_domain_adapter_static_bias(self):
        tok = word_tokenizer()
        a = DomainAdapter(300)
        a.boost_words(tok, ["hello"], amount=2.5)
        bias = a.bias()
        # without merge rules " hello" splits into bytes; repeated bytes
        # accumulate boost
        assert bias.max() >= 2.5
        assert (bias > 0).sum() >= 4

    def test_customizer_composition(self):
        tok = word_tokenizer()
        c = VocabularyCustomizer()
        a = DomainAdapter(300)
        a.boost_token(42, 1.5)
        c.add_adapter(a)
        b = HotwordBooster(tok, boost=3.0)
        b.add_hotword("world")
        c.add_booster(b)
        out = c.apply(np.zeros(300, np.float32), [])
        assert out[42] == 1.5
        assert out.max() >= 3.0
        static = c.static_bias(300)
        assert static[42] == 1.5


class TestDiarization:
    def two_speaker_audio(self):
        # two alternating "speakers": different fundamental + formants
        sr = 16_000
        t = np.arange(sr * 2) / sr
        s1 = (0.4 * np.sin(2 * np.pi * 110 * t)
              + 0.2 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
        s2 = (0.4 * np.sin(2 * np.pi * 280 * t)
              + 0.2 * np.sin(2 * np.pi * 2500 * t)).astype(np.float32)
        return np.concatenate([s1, s2, s1, s2])

    def test_embeddings_distinguish_speakers(self):
        e = EmbeddingExtractor()
        audio = self.two_speaker_audio()
        sr = 16_000
        a = e.extract(audio[: sr])
        b = e.extract(audio[2 * sr: 3 * sr])
        a2 = e.extract(audio[4 * sr: 5 * sr])
        assert cosine_distance(a, b) > cosine_distance(a, a2)

    def test_diarizer_finds_two_speakers(self):
        d = Diarizer(DiarizationConfig(num_speakers=2))
        segs = d.process(self.two_speaker_audio())
        assert d.speaker_count(segs) == 2
        assert len(segs) >= 2

    def test_agglomerative_merges_identical(self):
        emb = np.array([[1, 0], [1, 0.01], [0, 1], [0.01, 1]], np.float32)
        labels = agglomerative_cluster(emb, threshold=0.3, max_clusters=4)
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2]

    def test_kmeans_two_clusters(self):
        emb = np.array([[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9]], np.float32)
        labels = kmeans_cluster(emb, 2)
        assert labels[0] == labels[1] and labels[2] == labels[3]

    def test_short_audio(self):
        d = Diarizer()
        segs = d.process(np.zeros(1000, np.float32))
        assert len(segs) <= 1


class TestAlignment:
    def fake_weights(self, n_tokens=4, n_frames=100, L=2, H=3):
        # token i attends around frame 10 + 20*i
        w = np.full((L, 1, H, n_tokens, n_frames), 1e-4, np.float32)
        for i in range(n_tokens):
            w[:, :, :, i, 10 + 20 * i] = 1.0
        return w

    def test_token_peaks(self):
        al = CrossAttentionAlignment()
        aligns = al.extract_token_alignments(self.fake_weights(), [5, 6, 7, 8])
        assert [a.start_frame for a in aligns] == [10, 30, 50, 70]
        # end = next token's peak (reference semantics)
        assert aligns[0].end_frame == 30
        assert aligns[0].start_time == pytest.approx(0.2)

    def test_layer_head_selection(self):
        w = self.fake_weights()
        w[1] = 1e-4  # second layer uninformative
        al = CrossAttentionAlignment(AlignmentConfig(layers=[0]))
        aligns = al.extract_token_alignments(w, [1, 2, 3, 4])
        assert aligns[0].start_frame == 10

    def test_word_grouping(self):
        tok = word_tokenizer()
        ids = [258, 259, 257]  # " hel" "lo" " world"
        ext = WordTimestampExtractor(tok)
        w = self.fake_weights(n_tokens=3)
        words = ext.extract(w, ids)
        assert [x.word for x in words] == ["hello", "world"]
        assert words[0].start < words[1].start

    def test_boundary_refinement(self):
        from whisper_apr_tpu.alignment import WordTimestamp
        sr = 16_000
        # loud - silence - loud: boundary should snap into the silence
        audio = np.concatenate([
            0.5 * np.ones(sr // 2), np.zeros(sr // 10),
            0.5 * np.ones(sr // 2)]).astype(np.float32)
        words = [WordTimestamp("a", 0.0, 0.52, 1.0, [1])]
        refined = refine_boundaries_by_silence(words, audio)
        assert 0.5 <= refined[0].end <= 0.62


class TestProgress:
    def test_phases(self):
        t = ProgressTracker.model_loading()
        p = t.to_progress()
        assert p.phase == "read" and p.overall == 0.0
        t.advance(); t.advance()
        t.update_phase_progress(0.5)
        p = t.to_progress()
        assert p.phase == "encoder"
        assert 0.2 < p.overall < 0.6

    def test_format_bytes(self):
        assert format_bytes(512) == "512 B"
        assert format_bytes(2048) == "2.0 KB"
        assert "MB" in format_bytes(5 * 1024 * 1024)


class TestBatchPreprocessor:
    def test_process_batch_shape(self):
        from whisper_apr_tpu.audio.batch import BatchPreprocessor
        bp = BatchPreprocessor()
        audios = [np.zeros(8000, np.float32), np.zeros(16000, np.float32)]
        out = bp.process_batch(audios, n_frames=100)
        assert out.shape == (2, 100, 80)

    def test_to_padded_tensor(self):
        from whisper_apr_tpu.audio.batch import BatchPreprocessor
        bp = BatchPreprocessor()
        mels = [np.ones((10, 80), np.float32), np.ones((20, 80), np.float32)]
        out = bp.to_padded_tensor(mels)
        assert out.shape == (2, 20, 80)
        assert out[0, 15, 0] == -1.0  # HF pad value

    def test_split_into_chunks(self):
        from whisper_apr_tpu.audio.batch import split_into_chunks
        audio = np.arange(100, dtype=np.float32)
        chunks = split_into_chunks(audio, chunk_samples=40, overlap_samples=10)
        assert chunks[0][-1] == 39
        assert chunks[1][0] == 30  # overlap carried
        assert sum(len(c) for c in chunks) >= 100

    def test_short_audio_single_chunk(self):
        from whisper_apr_tpu.audio.batch import split_into_chunks
        assert len(split_into_chunks(np.zeros(10, np.float32), 100)) == 1


class TestMemory:
    def test_plan_memory(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.utils.memory import plan_memory
        plan = plan_memory(ModelConfig.tiny(), batch=1)
        assert plan.weights_bytes > 100e6  # ~150MB f32
        assert plan.fits(16 << 30)
        big = plan_memory(ModelConfig.large_v3(), batch=64)
        assert big.total_bytes > plan.total_bytes

    def test_tree_bytes(self):
        import jax.numpy as jnp
        from whisper_apr_tpu.utils.memory import tree_bytes
        tree = {"a": jnp.zeros((10, 10), jnp.float32),
                "b": jnp.zeros(5, jnp.int8)}
        assert tree_bytes(tree) == 405

    def test_device_memory_stats_shape(self):
        from whisper_apr_tpu.utils.memory import device_memory_stats
        stats = device_memory_stats()
        # CPU backend may not expose stats; both outcomes valid
        if stats is not None:
            assert stats.bytes_in_use >= 0


class TestDispatch:
    def test_capabilities_detect(self):
        from whisper_apr_tpu.ops.dispatch import DeviceCapabilities
        caps = DeviceCapabilities.detect()
        assert caps.n_devices >= 1
        assert caps.platform in ("cpu", "tpu", "axon")

    def test_attention_selection(self):
        from whisper_apr_tpu.ops.dispatch import (
            DeviceCapabilities, KernelBackend, KernelSelector)
        tpu_caps = DeviceCapabilities("tpu", 1, 16 << 30, True, True, (128, 128))
        sel = KernelSelector(caps=tpu_caps)
        # small cross-attn step: XLA; big encoder self-attn: flash
        assert sel.attention(1, 448) == KernelBackend.XLA
        assert sel.attention(4096, 4096) == KernelBackend.PALLAS
        # explicit override wins
        assert sel.attention(1, 1, KernelBackend.PALLAS) == KernelBackend.PALLAS

    def test_cpu_never_pallas(self):
        from whisper_apr_tpu.ops.dispatch import (
            DeviceCapabilities, KernelBackend, KernelSelector)
        cpu = DeviceCapabilities("cpu", 1, 16 << 30, True, False, (1, 1))
        sel = KernelSelector(caps=cpu)
        assert sel.attention(8192, 8192) == KernelBackend.XLA
        assert sel.dequant_matmul(4) == KernelBackend.XLA


class TestGoldenTrace:
    def test_capture_and_compare(self, tmp_path):
        import jax.numpy as jnp
        from helpers import make_hf_twin, small_config, small_specials
        from whisper_apr_tpu import WhisperApr
        from whisper_apr_tpu.tools.golden import GoldenTrace

        cfg = small_config()
        eng = WhisperApr.from_hf_model(make_hf_twin(cfg), cfg,
                                       specials=small_specials(cfg))
        audio = np.random.default_rng(0).normal(0, 0.1, 4000).astype(np.float32)
        a = GoldenTrace(str(tmp_path / "a"))
        b = GoldenTrace(str(tmp_path / "b"))
        a.capture_pipeline(eng, audio, tokens=[5, 6, 7])
        b.capture_pipeline(eng, audio, tokens=[5, 6, 7])
        results = a.compare(str(tmp_path / "b"))
        assert len(results) == 4
        assert all(c.passed for c in results), GoldenTrace.summary(results)

    def test_detects_divergence(self, tmp_path):
        from whisper_apr_tpu.tools.golden import GoldenTrace
        a = GoldenTrace(str(tmp_path / "a"))
        b = GoldenTrace(str(tmp_path / "b"))
        rng = np.random.default_rng(0)
        mel = rng.normal(size=(100, 80)).astype(np.float32)
        a.dump("mel", mel)
        b.dump("mel", mel + 0.5)
        results = a.compare(str(tmp_path / "b"))
        assert any(not c.passed for c in results)


class TestCheckpoint:
    def test_roundtrip_plain(self, tmp_path):
        import jax
        from whisper_apr_tpu.model.params import init_params
        from whisper_apr_tpu.utils.checkpoint import load_params, save_params
        from helpers import small_config
        params = init_params(small_config(), 3)
        path = str(tmp_path / "p.npz")
        save_params(path, params)
        back = load_params(path)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_roundtrip_quantized(self, tmp_path):
        import jax
        from whisper_apr_tpu.model.params import init_params, quantize_params
        from whisper_apr_tpu.ops.quant import is_quantized
        from whisper_apr_tpu.utils.checkpoint import load_params, save_params
        from helpers import small_config
        q8 = quantize_params(init_params(small_config(), 4), "int8")
        path = str(tmp_path / "q.npz")
        save_params(path, q8)
        back = load_params(path)
        assert is_quantized(back["decoder"]["token_emb"])
        assert back["decoder"]["blocks"]["fc1"]["w"].q.dtype == np.int8
        for a, b in zip(jax.tree_util.tree_leaves(q8),
                        jax.tree_util.tree_leaves(back)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_v1_pickled_treedef_refused(self, tmp_path):
        # v1 files carried a pickled treedef (arbitrary-code-execution on
        # load); the loader must refuse them rather than unpickle.
        import json
        import pytest
        from whisper_apr_tpu.utils.checkpoint import load_params
        path = str(tmp_path / "v1.npz")
        meta = {"version": 1, "n_leaves": 1, "treedef": "deadbeef"}
        with open(path, "wb") as f:
            np.savez(f, __meta__=np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8),
                leaf_0=np.zeros(3, np.float32))
        with pytest.raises(ValueError, match="version 1"):
            load_params(path)

    def test_roundtrip_structures(self, tmp_path):
        # tuples, lists, Nones, and nested dicts survive the declarative spec
        from whisper_apr_tpu.utils.checkpoint import load_params, save_params
        tree = {"a": (np.arange(4.0), [np.ones(2), None]),
                "b": {"c": np.int32(7) * np.ones(1, np.int32)}}
        path = str(tmp_path / "s.npz")
        save_params(path, tree)
        back = load_params(path, device_put=False)
        assert isinstance(back["a"], tuple) and isinstance(back["a"][1], list)
        assert back["a"][1][1] is None
        assert np.array_equal(back["a"][0], np.arange(4.0))
        assert np.array_equal(back["b"]["c"], np.full(1, 7, np.int32))


class TestMmapRead:
    def test_mmap_matches_plain(self, tmp_path):
        from test_format import make_test_apr
        from whisper_apr_tpu.format import AprReader
        path = str(tmp_path / "m.apr")
        open(path, "wb").write(make_test_apr(with_vocab=True))
        a = AprReader.from_file(path)
        b = AprReader.from_file(path, use_mmap=False)
        assert a.verify_crc() and b.verify_crc()
        assert np.array_equal(a.load_tensor("encoder.conv1.weight"),
                              b.load_tensor("encoder.conv1.weight"))


class TestTurboPreset:
    def test_large_v3_turbo_config(self):
        from whisper_apr_tpu.config import ModelConfig
        c = ModelConfig.from_name("large-v3-turbo")
        assert c.n_text_layer == 4 and c.n_audio_layer == 32
        assert c.n_mels == 128 and c.n_vocab == 51_866
        assert ModelConfig.from_name("turbo").model_type == "large-v3-turbo"

    def test_turbo_header_roundtrip(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.format.container import AprHeader
        c = ModelConfig.large_v3_turbo()
        c2 = AprHeader.parse(
            AprHeader.from_config(c).to_bytes()).to_model_config()
        assert c2.model_type == "large-v3-turbo"
        assert c2.n_text_layer == 4

    def test_turbo_hf_detection(self):
        from whisper_apr_tpu.tools.convert import _config_from_hf_json
        cfg = _config_from_hf_json({
            "num_mel_bins": 128, "d_model": 1280, "encoder_layers": 32,
            "encoder_attention_heads": 20, "decoder_layers": 4,
            "decoder_attention_heads": 20, "vocab_size": 51_866,
            "max_source_positions": 1500, "max_target_positions": 448})
        assert cfg.model_type == "large-v3-turbo"


class TestRecommendModel:
    def test_monotone_and_bounds(self):
        """recommend_model (reference: recommendedModelForMemory,
        wasm/mod.rs:640): more memory never recommends a smaller model."""
        from whisper_apr_tpu.utils.memory import recommend_model
        order = ["tiny", "base", "small", "medium", "large-v3"]
        prev = 0
        for hbm in (2 << 28, 1 << 30, 4 << 30, 16 << 30, 64 << 30):
            m = recommend_model(hbm)
            idx = order.index(m)
            assert idx >= prev
            prev = idx
        assert recommend_model(64 << 30) == "large-v3"
        assert recommend_model(1 << 20) == "tiny"  # floor
