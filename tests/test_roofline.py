"""Roofline model tests: the analytic floors must reproduce the measured
anatomy in BENCH_NOTES (round-2c: large-v3 int8 decode floor ~1.32
ms/step; encoder ~2.3 TFLOP -> single-digit-ms compute floor)."""

import pytest

from whisper_apr_tpu.config import ModelConfig
from whisper_apr_tpu.utils.roofline import (V5E, decode_step_floor_ms,
                                            decoder_weight_bytes,
                                            encoder_floor_ms, encoder_flops,
                                            rtf_floor,
                                            streams_per_chip_floor)


@pytest.fixture(scope="module")
def large():
    return ModelConfig.from_name("large-v3")


def test_large_v3_decode_floor_matches_bench_notes(large):
    # BENCH_NOTES round-2c: 1.322 ms HBM floor (int8 weights + live KV)
    floor = decode_step_floor_ms(large, quant="int8", pos=112, kv="bf16")
    assert floor == pytest.approx(1.32, abs=0.05)


def test_decoder_weight_bytes_large_v3_int8(large):
    gb = decoder_weight_bytes(large, "int8") / 1e9
    assert 0.75 < gb < 0.90          # ~0.8 GB of int8 decoder weights


def test_quant_ordering(large):
    # lighter quants strictly lower the floor
    f = {q: decode_step_floor_ms(large, quant=q)
         for q in ("f32", "bf16", "int8", "q6k", "q5k", "q4k", "int4")}
    assert f["f32"] > f["bf16"] > f["int8"] > f["q6k"] > f["q5k"] \
        > f["q4k"] > f["int4"]


def test_kv_mode_and_position_effects(large):
    # int8 KV halves KV traffic; deeper positions cost more
    assert decode_step_floor_ms(large, kv="int8") \
        < decode_step_floor_ms(large, kv="bf16")
    assert decode_step_floor_ms(large, pos=400) \
        > decode_step_floor_ms(large, pos=16)


def test_batch_amortizes_weights(large):
    # 8 streams cost far less than 8x one stream: weights are read once
    b1 = decode_step_floor_ms(large, batch=1)
    b8 = decode_step_floor_ms(large, batch=8)
    assert b8 < 3 * b1
    assert b8 / 8 < b1 / 2           # per-slot floor at least halves


def test_encoder_flops_and_floor(large):
    # ~2.3 TFLOP per 30 s window (profile_encoder.py's headline number)
    tf = encoder_flops(large) / 1e12
    assert tf == pytest.approx(2.3, abs=0.5)
    ms = encoder_floor_ms(large)
    assert 5.0 < ms < 20.0           # single/low-double-digit ms on v5e

    tiny = ModelConfig.tiny()
    assert encoder_flops(tiny) < encoder_flops(large) / 50


def test_rtf_floor_sanity(large):
    # the measured large-v3 RTF (0.0156) must sit ABOVE the floor, and
    # the floor must leave the 0.02 north star achievable
    floor = rtf_floor(large, decode_tokens=224, quant="int8")
    assert floor < 0.0156
    assert floor < 0.02


def test_streams_per_chip_bound_admits_batched_serving(large):
    # batched serving amortizes weights: the chip-level bound must sit
    # ABOVE both the B=1 rate (1/rtf_floor ~ 99) and the measured round-4
    # B=32 point (211 realtime streams/chip), but stay a finite roofline
    bound = streams_per_chip_floor(large, quant="int8", kv="bf16")
    assert bound > 1 / rtf_floor(large, decode_tokens=224, quant="int8")
    assert bound > 211                  # measured B=32, BENCH_NOTES round 4
    assert bound < 1000

    # int8 KV halves per-stream traffic AND doubles resident slots
    assert streams_per_chip_floor(large, kv="int8") > bound


def test_v5e_spec_values():
    assert V5E.hbm_gb_s == 819.0 and V5E.bf16_tflops == 197.0
