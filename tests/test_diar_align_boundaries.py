"""Mutation killers for diarization.py and alignment.py round-3e
survivors: clustering boundaries, window arithmetic, snap-to-silence
edges, confidence guards."""

import numpy as np
import pytest

from whisper_apr_tpu.diarization import (DiarizationConfig, Diarizer,
                                         EmbeddingExtractor, SpeakerSegment,
                                         agglomerative_cluster,
                                         cosine_distance, kmeans_cluster)

SR = 16_000


# ------------------------------------------------------------ diarization.py

def test_speaker_segment_duration():
    assert SpeakerSegment(0, 1.0, 2.5).duration() == 1.5


def test_embedding_two_mel_frames_accepted():
    # the <2-frames guard is strict: exactly 2 frames yields an embedding
    ex = EmbeddingExtractor()
    for n in range(300, 1200, 80):
        mel = ex._fb.compute(np.ones(n, np.float32))
        if mel.shape[0] == 2:
            assert ex.extract(np.ones(n, np.float32)) is not None
            break
    else:
        pytest.skip("no window size yields exactly 2 frames")


def test_embedding_zero_norm_passthrough(monkeypatch):
    # norm == 0: the embedding is returned as-is (no 0/0 division)
    ex = EmbeddingExtractor()
    monkeypatch.setattr(ex, "_fb", type("F", (), {
        "compute": staticmethod(lambda x: np.zeros((3, 40), np.float32))})())
    emb = ex.extract(np.ones(1000, np.float32))
    assert emb is not None and np.all(emb == 0.0)
    assert np.all(np.isfinite(emb))


def test_cosine_distance_zero_vector_is_one():
    a = np.zeros(4)
    b = np.ones(4)
    assert cosine_distance(a, b) == 1.0
    assert cosine_distance(b, a) == 1.0


def test_agglomerative_merges_at_exact_threshold():
    # d == threshold: NOT a stop (strict >): orthogonal pair at cosine
    # distance exactly 1.0 merges under threshold 1.0
    e = np.eye(2, 8, dtype=np.float64)
    labels = agglomerative_cluster(e, threshold=1.0, max_clusters=4)
    assert labels[0] == labels[1]


def test_agglomerative_stops_at_max_clusters_inclusive():
    # len(clusters) == max_clusters satisfies the stop (<=): three
    # mutually-orthogonal embeddings stay 3 clusters at max_clusters=3
    e = np.eye(3, 8, dtype=np.float64)
    labels = agglomerative_cluster(e, threshold=0.5, max_clusters=3)
    assert len(set(labels.tolist())) == 3


def test_kmeans_separates_three_blobs():
    rng = np.random.default_rng(0)
    blobs = [np.array([0.0, 0.0]), np.array([10.0, 0.0]),
             np.array([0.0, 10.0])]
    pts = np.concatenate([c + 0.01 * rng.normal(size=(20, 2))
                          for c in blobs])
    labels = kmeans_cluster(pts, 3)
    groups = [set(labels[i * 20:(i + 1) * 20].tolist()) for i in range(3)]
    assert all(len(g) == 1 for g in groups)      # each blob uniform
    assert len(set.union(*groups)) == 3          # ...and distinct


def test_diarizer_window_arithmetic_exact_two_windows():
    cfg = DiarizationConfig(window_seconds=1.5, hop_seconds=0.75,
                            num_speakers=1, min_segment_seconds=0.5)
    d = Diarizer(cfg)
    n = int((1.5 + 0.75) * SR)                  # exactly 2 window starts
    audio = np.sin(np.arange(n) * 0.01).astype(np.float32)
    segs = d.process(audio)
    assert len(segs) == 1
    assert segs[0].start == 0.0
    assert segs[0].end == pytest.approx(0.75 + 1.5)


def test_diarizer_merges_windows_touching_exactly():
    cfg = DiarizationConfig(window_seconds=1.5, hop_seconds=1.5,
                            num_speakers=1, min_segment_seconds=0.5)
    d = Diarizer(cfg)
    audio = np.sin(np.arange(3 * SR) * 0.01).astype(np.float32)
    segs = d.process(audio)                      # windows at 0.0 and 1.5
    assert len(segs) == 1 and segs[0].end == pytest.approx(3.0)


def test_diarizer_keeps_segment_at_exact_min_duration():
    cfg = DiarizationConfig(window_seconds=1.5, hop_seconds=1.5,
                            num_speakers=1, min_segment_seconds=1.5)
    d = Diarizer(cfg)
    audio = np.sin(np.arange(int(1.5 * SR) + 100) * 0.01).astype(np.float32)
    segs = d.process(audio)                      # one 1.5 s window
    assert len(segs) == 1 and segs[0].duration() == pytest.approx(1.5)


# -------------------------------------------------------------- alignment.py

def _weights(peaks, n_frames=20):
    """[1, 1, 1, T_text, T_audio] one-hot attention at given peaks."""
    w = np.zeros((1, 1, 1, len(peaks), n_frames), np.float32)
    for i, p in enumerate(peaks):
        if p is not None:
            w[0, 0, 0, i, p] = 1.0
    return w


def test_alignment_zero_row_confidence_zero():
    from whisper_apr_tpu.alignment import CrossAttentionAlignment
    w = _weights([3, None, 7])                   # middle token: all-zero row
    aligns = CrossAttentionAlignment().extract_token_alignments(
        w, [10, 11, 12])
    assert aligns[1].confidence == 0.0
    assert np.isfinite(aligns[1].confidence)


def test_alignment_equal_peaks_end_is_peak_plus_one():
    from whisper_apr_tpu.alignment import CrossAttentionAlignment
    w = _weights([5, 5])                         # both tokens peak at 5
    aligns = CrossAttentionAlignment().extract_token_alignments(w, [1, 2])
    assert aligns[0].start_frame == 5
    assert aligns[0].end_frame == 6              # max(end, peak+1)


class _Tok:
    def __init__(self, table):
        self.table = table

    def decode_with_options(self, ids, skip_special=True):
        return self.table.get(ids[0], "")


def test_word_extractor_skips_blank_words():
    from whisper_apr_tpu.alignment import WordTimestampExtractor
    tok = _Tok({1: " hello", 2: "   ", 3: " world"})
    w = _weights([2, 5, 9])
    words = WordTimestampExtractor(tok).extract(w, [1, 2, 3])
    assert [x.word for x in words] == ["hello", "world"]
    assert all(x.word.strip() for x in words)


def _word(word="w", start=0.0, end=0.3):
    from whisper_apr_tpu.alignment import WordTimestamp
    return WordTimestamp(word=word, start=start, end=end,
                         confidence=1.0, tokens=[1])


def test_refine_snaps_into_silence_dip():
    from whisper_apr_tpu.alignment import refine_boundaries_by_silence
    # loud audio with a 10 ms silent dip at 0.20 s
    audio = np.full(SR, 0.5, np.float32)
    audio[int(0.20 * SR):int(0.21 * SR)] = 0.0
    words = [_word(start=0.25, end=0.80)]
    out = refine_boundaries_by_silence(words, audio, window_s=0.1)
    assert out[0].start == pytest.approx(0.20, abs=0.011)
    assert out[0].end == pytest.approx(0.80, abs=0.11)


def test_refine_beyond_audio_is_identity():
    from whisper_apr_tpu.alignment import refine_boundaries_by_silence
    audio = np.full(1600, 0.5, np.float32)       # 10 energy frames
    # end time EXACTLY at len(energy)+window: snap window is empty
    t = (10 + 10) / 100.0
    words = [_word(start=0.01, end=t)]
    out = refine_boundaries_by_silence(words, audio, window_s=0.1)
    assert out[0].end == pytest.approx(t)


def test_refine_degenerate_snap_restores_end():
    from whisper_apr_tpu.alignment import refine_boundaries_by_silence
    # one dip; both boundaries within window of it -> both snap there;
    # the zero-length result must fall back to the original end
    audio = np.full(SR, 0.5, np.float32)
    audio[int(0.30 * SR):int(0.31 * SR)] = 0.0
    words = [_word(start=0.28, end=0.33)]
    out = refine_boundaries_by_silence(words, audio, window_s=0.1)
    assert out[0].end == pytest.approx(0.33)
    assert out[0].end > out[0].start

def test_refine_window_covers_exact_upper_edge():
    # the snap window's hi bound is c + window + 1 (inclusive of frame
    # c+window): a dip EXACTLY at the upper edge must be found
    from whisper_apr_tpu.alignment import refine_boundaries_by_silence
    audio = np.full(SR, 0.5, np.float32)
    audio[int(0.35 * SR):int(0.36 * SR)] = 0.0    # dip at frame 35
    words = [_word(start=0.02, end=0.25)]          # end c=25, window 10
    out = refine_boundaries_by_silence(words, audio, window_s=0.1)
    assert out[0].end == pytest.approx(0.35, abs=0.006)


class TestDtwAlignment:
    """AlignmentConfig(method="dtw"): native-DP dynamic time warping."""

    def test_dtw_path_native_matches_python_fallback(self):
        from whisper_apr_tpu import native
        rng = np.random.default_rng(0)
        cost = rng.normal(size=(12, 37)).astype(np.float32)
        ti_n, tj_n = native.dtw_path(cost)  # native (lib is built in CI)
        lib = native.get_lib()
        try:
            native._lib = None
            native._build_failed = True  # force the Python fallback
            ti_p, tj_p = native.dtw_path(cost)
        finally:
            native._lib = lib
            native._build_failed = lib is None
        np.testing.assert_array_equal(ti_n, ti_p)
        np.testing.assert_array_equal(tj_n, tj_p)

    def test_dtw_path_is_monotonic_and_covers(self):
        from whisper_apr_tpu import native
        rng = np.random.default_rng(1)
        cost = rng.normal(size=(5, 50)).astype(np.float32)
        ti, tj = native.dtw_path(cost)
        assert ti[0] == 0 and tj[0] == 0
        assert ti[-1] == 4 and tj[-1] == 49
        assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()
        # every step advances at least one axis by exactly 0 or 1
        assert (np.diff(ti) <= 1).all() and (np.diff(tj) <= 1).all()
        assert ((np.diff(ti) + np.diff(tj)) >= 1).all()

    def test_dtw_recovers_clean_diagonal_alignment(self):
        """Attention concentrated at frame 10+20i per token: DTW spans
        must each contain their token's true peak, partition the frame
        axis, and stay monotonic."""
        from whisper_apr_tpu.alignment import (AlignmentConfig,
                                               CrossAttentionAlignment)
        n_tokens, n_frames = 4, 100
        w = np.full((2, 1, 3, n_tokens, n_frames), 1e-4, np.float32)
        for i in range(n_tokens):
            w[:, :, :, i, 10 + 20 * i] = 1.0
        al = CrossAttentionAlignment(AlignmentConfig(method="dtw"))
        aligns = al.extract_token_alignments(w, [5, 6, 7, 8])
        prev_end = 0
        for i, a in enumerate(aligns):
            assert a.start_frame <= 10 + 20 * i < a.end_frame
            assert a.start_frame == prev_end  # partition, no gaps
            prev_end = a.end_frame
            assert a.confidence > 0
        assert aligns[-1].end_frame == n_frames

    def test_dtw_beats_peak_on_a_noisy_row(self):
        """A token whose argmax is a spurious early spike: the DTW path
        (held by its neighbors) stays near the true diagonal, while the
        peak method's monotonic clamp keeps the outlier."""
        from whisper_apr_tpu.alignment import (AlignmentConfig,
                                               CrossAttentionAlignment)
        n_tokens, n_frames = 5, 60
        w = np.full((1, 1, 1, n_tokens, n_frames), 1e-4, np.float32)
        true = [5, 15, 25, 35, 45]
        for i, p in enumerate(true):
            w[0, 0, 0, i, p] = 1.0
        w[0, 0, 0, 3, 55] = 1.2  # spurious late spike on token 3
        dtw = CrossAttentionAlignment(AlignmentConfig(method="dtw"))
        peak = CrossAttentionAlignment(AlignmentConfig(method="peak"))
        a_dtw = dtw.extract_token_alignments(w, list(range(5)))
        a_peak = peak.extract_token_alignments(w, list(range(5)))
        err_dtw = sum(abs(a.start_frame - t) <= 10
                      for a, t in zip(a_dtw, true))
        # peak method: token 3 jumps to 55 and drags token 4 with it
        assert a_peak[3].start_frame == 55
        assert err_dtw >= 4  # dtw keeps at least tokens 0-3 near truth

    def test_dtw_zero_attention_row_confidence_zero(self):
        """An all-zero attention row must yield confidence exactly 0.0
        (no 0/0 NaN) and still get a valid >=1-frame span."""
        from whisper_apr_tpu.alignment import (AlignmentConfig,
                                               CrossAttentionAlignment)
        w = _weights([3, None, 7], n_frames=12)  # middle row all-zero
        al = CrossAttentionAlignment(AlignmentConfig(method="dtw"))
        aligns = al.extract_token_alignments(w, [10, 11, 12])
        assert aligns[1].confidence == 0.0
        assert np.isfinite(aligns[1].confidence)
        for a in aligns:
            assert a.end_frame > a.start_frame

    def test_word_extractor_with_dtw(self):
        from whisper_apr_tpu.alignment import (AlignmentConfig,
                                               WordTimestampExtractor)
        tok = _Tok({258: " hel", 259: "lo", 257: " world"})
        w = np.full((1, 1, 1, 3, 90), 1e-4, np.float32)
        for i in range(3):
            w[0, 0, 0, i, 10 + 25 * i] = 1.0
        ext = WordTimestampExtractor(tok, AlignmentConfig(method="dtw"))
        words = ext.extract(w, [258, 259, 257])
        assert [x.word for x in words] == ["hello", "world"]
        assert words[0].start < words[1].start
        assert words[0].end <= words[1].start + 1e-9
