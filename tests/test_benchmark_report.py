"""BenchmarkReport + roofline wiring tests (utils/benchmark.py)."""

import json

import numpy as np

from whisper_apr_tpu.utils.benchmark import (BenchmarkReport,
                                             ComponentTiming,
                                             run_pipeline_benchmark)


def _report(floor=0.01):
    comps = [ComponentTiming("mel", 0.01, 0.1),
             ComponentTiming("encode", 0.03, 0.3),
             ComponentTiming("decode", 0.06, 0.6)]
    return BenchmarkReport(audio_seconds=10.0, total_seconds=0.1,
                           components=comps, tokens_decoded=50,
                           rtf_floor=floor)


def test_rtf_and_bottleneck():
    r = _report()
    assert r.rtf == 0.01
    assert r.tokens_per_second == 500.0
    assert r.bottleneck() == "decode"


def test_json_includes_floor_ratio():
    d = json.loads(_report(floor=0.005).to_json())
    assert d["rtf_floor"] == 0.005
    assert d["vs_floor"] == 2.0


def test_json_floor_absent_when_unknown():
    d = json.loads(_report(floor=0.0).to_json())
    assert d["vs_floor"] is None


def test_text_mentions_roofline():
    txt = _report(floor=0.005).to_text()
    assert "speed-of-light" in txt and "2.00x" in txt
    assert "bottleneck: decode" in txt


def test_csv_rows():
    csv = _report().to_csv()
    assert csv.splitlines()[0] == "component,seconds,fraction"
    assert csv.splitlines()[-1].startswith("total,")


def test_run_pipeline_benchmark_emits_floor():
    out = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                 emit="json")
    d = json.loads(out)
    assert d["rtf_floor"] > 0
    assert set(c["name"] for c in d["components"]) == {"mel", "encode",
                                                       "decode"}


def test_run_pipeline_benchmark_timings_are_durations():
    """The stage timings must be perf_counter DIFFERENCES. A sign flip
    (t_end + t_start) yields a huge positive number, so positivity checks
    alone miss it — pin the stage/total decomposition instead: stages sum
    to the measured total (they are contiguous) and every value is a sane
    wall-clock duration for a 1-second clip on this machine."""
    out = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                 emit="json")
    d = json.loads(out)
    total = d["total_seconds"]
    assert 0 < total < 600  # an epoch-scale sum (~3.5e9) is not a duration
    stage_sum = sum(c["seconds"] for c in d["components"])
    assert abs(stage_sum - total) / total < 0.05  # contiguous stages
    for c in d["components"]:
        assert 0 < c["seconds"] <= total
        # json emitter rounds fraction to 3 decimals
        assert abs(c["fraction"] - c["seconds"] / total) < 5e-4


def test_run_pipeline_benchmark_emit_dispatch():
    """emit='json' must return JSON (not the text report), and 'csv'/text
    must not: pins the equality dispatch at the tail of the function."""
    js = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                emit="json")
    json.loads(js)  # raises if the text report came back
    txt = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                 emit="text")
    assert "bottleneck" in txt
    try:
        json.loads(txt)
        assert False, "emit='text' returned JSON"
    except json.JSONDecodeError:
        pass
