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
