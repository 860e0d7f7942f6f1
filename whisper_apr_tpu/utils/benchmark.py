"""Benchmark infrastructure: component breakdown, RTF, JSON/CSV emitters.

(reference: src/benchmark.rs — ComponentBreakdown/DecoderComponent :706/:808,
RTF calc :274, JSON/CSV emitters :421/:441.)
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class ComponentTiming:
    """One pipeline component's timing (reference: benchmark.rs:706)."""

    name: str
    seconds: float
    fraction: float = 0.0


@dataclasses.dataclass
class BenchmarkReport:
    """Pipeline benchmark result (reference: benchmark.rs RtfBenchmark)."""

    audio_seconds: float
    total_seconds: float
    components: List[ComponentTiming]
    tokens_decoded: int
    # analytic speed-of-light bound for the same workload (utils/roofline;
    # the reference's SimulationModel analog, benchmark.rs:283) — 0 when
    # no model config was available to derive it
    rtf_floor: float = 0.0

    @property
    def rtf(self) -> float:
        return self.total_seconds / max(self.audio_seconds, 1e-9)

    @property
    def tokens_per_second(self) -> float:
        return self.tokens_decoded / max(self.total_seconds, 1e-9)

    def bottleneck(self) -> str:
        """(reference: benchmark.rs bottleneck())"""
        return max(self.components, key=lambda c: c.seconds).name

    def to_json(self) -> str:
        return json.dumps({
            "audio_seconds": self.audio_seconds,
            "total_seconds": round(self.total_seconds, 6),
            "rtf": round(self.rtf, 6),
            "tokens_per_second": round(self.tokens_per_second, 2),
            "bottleneck": self.bottleneck(),
            "rtf_floor": round(self.rtf_floor, 6),
            "vs_floor": round(self.rtf / self.rtf_floor, 2)
            if self.rtf_floor else None,
            "components": [{
                "name": c.name, "seconds": round(c.seconds, 6),
                "fraction": round(c.fraction, 4)} for c in self.components],
        })

    def to_csv(self) -> str:
        lines = ["component,seconds,fraction"]
        for c in self.components:
            lines.append(f"{c.name},{c.seconds:.6f},{c.fraction:.4f}")
        lines.append(f"total,{self.total_seconds:.6f},1.0")
        return "\n".join(lines)

    def to_text(self) -> str:
        lines = [f"RTF {self.rtf:.4f}  ({self.total_seconds:.3f}s for "
                 f"{self.audio_seconds:.1f}s audio, "
                 f"{self.tokens_per_second:.1f} tok/s)"]
        for c in self.components:
            lines.append(f"  {c.name:<12} {c.seconds * 1e3:9.2f} ms "
                         f"{100 * c.fraction:5.1f}%")
        lines.append(f"  bottleneck: {self.bottleneck()}")
        if self.rtf_floor:
            lines.append(f"  roofline: rtf floor {self.rtf_floor:.4f} "
                         f"({self.rtf / self.rtf_floor:.2f}x above "
                         f"speed-of-light)")
        return "\n".join(lines)


def run_pipeline_benchmark(model_path: Optional[str] = None,
                           audio_seconds: float = 30.0,
                           decode_tokens: int = 224,
                           emit: str = "text") -> str:
    """Timed pipeline run with per-component breakdown.

    Uses the model at ``model_path`` or random tiny-shaped weights.
    The component split mirrors the reference's step labels
    (docs benchmark-whisper-steps-a-z: mel / encode / decode).
    """
    import jax
    import jax.numpy as jnp

    from ..audio.mel import MelFilterbank
    from ..config import ModelConfig
    from ..model.decoder import greedy_generate
    from ..model.encoder import encode_jit
    from ..model.params import init_params

    if model_path:
        from ..engine import WhisperApr
        eng = WhisperApr.load_from_apr(model_path)
        cfg, params = eng.config, eng.params
        fb = eng.mel_filters
        compute_dtype = eng._compute_dtype
    else:
        cfg = ModelConfig.tiny()
        params = init_params(cfg, seed=0)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
        fb = MelFilterbank.create(cfg.n_mels)
        compute_dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, int(16_000 * audio_seconds)).astype(np.float32)

    from ..tokenizer.special_tokens import SpecialTokens
    specials = SpecialTokens.for_vocab_size(cfg.n_vocab)
    prompt_len = 4
    prompt = jnp.asarray(np.full((1, prompt_len), specials.sot,
                                 dtype=np.int32))
    bias = np.zeros(cfg.n_vocab, dtype=np.float32)
    eot = specials.eot
    bias[eot] = np.finfo(np.float32).min  # fixed-length decode
    bias = jnp.asarray(bias)
    max_len = prompt_len + decode_tokens

    def stage_mel():
        return fb.compute_30s(audio)

    def stage_encode(mel):
        out = encode_jit(params, jnp.asarray(mel)[None], cfg,
                         compute_dtype=compute_dtype)
        jax.block_until_ready(out)
        # a remote-TPU tunnel may not honor block_until_ready; fetch one
        # element as a true barrier
        np.asarray(out[0, 0, 0])
        return out

    def stage_decode(enc):
        tokens, _, _, _ = greedy_generate(
            params, enc, prompt, bias, eot=eot, config=cfg,
            max_len=max_len, prompt_len=prompt_len,
            compute_dtype=compute_dtype)
        return np.asarray(tokens)

    # warmup / compile
    mel = stage_mel()
    enc = stage_encode(mel)
    stage_decode(enc)

    timings: Dict[str, float] = {}
    t0 = time.perf_counter()
    t = time.perf_counter()
    mel = stage_mel()
    timings["mel"] = time.perf_counter() - t
    t = time.perf_counter()
    enc = stage_encode(mel)
    timings["encode"] = time.perf_counter() - t
    t = time.perf_counter()
    stage_decode(enc)
    timings["decode"] = time.perf_counter() - t
    total = time.perf_counter() - t0

    components = [ComponentTiming(k, v, v / total) for k, v in timings.items()]
    from .roofline import rtf_floor
    quant = "bf16"
    if model_path:
        quant = {0: "f32", 2: "int8", 4: "q4k", 5: "q5k",
                 6: "q6k"}.get(eng.quantization_code, "bf16") \
            if hasattr(eng, "quantization_code") else "bf16"
    floor = rtf_floor(cfg, decode_tokens=decode_tokens, quant=quant,
                      audio_s=audio_seconds)
    report = BenchmarkReport(audio_seconds, total, components, decode_tokens,
                             rtf_floor=floor)

    if emit == "json":
        return report.to_json()
    if emit == "csv":
        return report.to_csv()
    return report.to_text()
