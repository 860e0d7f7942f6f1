"""Mutation killers for utils/progress.py round-3e survivors."""

import pytest

from whisper_apr_tpu.utils.progress import (Phase, ProgressTracker,
                                            format_bytes)


def test_weighted_total_normalizes():
    t = ProgressTracker([Phase("a", 1.0), Phase("b", 3.0)])
    t.advance()                      # into phase b, progress 0
    assert t.to_progress().overall == pytest.approx(0.25)


def test_zero_weight_phases_fall_back_to_one():
    t = ProgressTracker([Phase("a", 0.0)])
    assert t.to_progress().overall == 0.0     # no ZeroDivision


def test_advance_at_last_phase_stays_put():
    t = ProgressTracker([Phase("only", 1.0)])
    t.advance()
    p = t.to_progress()
    assert p.phase == "only" and p.overall == pytest.approx(1.0)
    t.advance()                      # idempotent at the end
    assert t.to_progress().overall == pytest.approx(1.0)


def test_format_bytes_exact_1024_rolls_over():
    assert format_bytes(1024) == "1.0 KB"
    assert format_bytes(1023) == "1023 B"
    assert format_bytes(1024 * 1024) == "1.0 MB"
