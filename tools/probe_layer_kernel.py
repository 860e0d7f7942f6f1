"""TPU slope-timed decode-step measurements (large-v3 by default).

--large: per-block fused int8 step variants (qf / qf_defer / qf_trans /
qf_trans_defer — BENCH_NOTES round-3/4 baselines: qf 1.855, qf_defer
1.800 ms/step; HBM floor 1.322).

--q4k/--q5k/--q6k: k-quant steps — scan path (decode_step_q) plus the
standalone fused matvec, or with --fused the round-4 per-block kq
megakernel step (decode_step_qf via ops/decode_blocks_kq).

--batched --b N: B-slot serving tick. --int8dot/--tricks: Mosaic
lowering probes. (The whole-layer kernel this tool originally probed was
a measured loss and was removed in round 4 — BENCH_NOTES "whole-layer
kernel verdict".)

Usage: python -u tools/probe_layer_kernel.py [--large] [--q4k [--fused]] [--lo N] [--hi N]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.profile_decode import P, timeit  # noqa: E402


def large_measure(lo, hi, which=("qf",)):
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model import qdecode
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg = ModelConfig.from_name("large-v3")
    params = quantize_params(init_params(cfg, seed=0), "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = qdecode.prepare_qdecode(params, cfg)
    D = cfg.n_text_state
    enc = jnp.zeros((1, cfg.n_audio_ctx, D), jnp.bfloat16)
    cache = init_cache(params, enc, cfg, max_len=448,
                       compute_dtype=jnp.bfloat16)
    qc = qdecode.quantize_cache(cache, kv_int8=False)
    tok0 = jnp.zeros((1,), jnp.int32)
    p = P(lo, hi)

    results = {}
    for name in which:
        step_fn = qdecode.decode_step_qf
        # "qf_defer": one batched KV scatter after the layer loop instead
        # of 2L mid-loop row writes (qdecode.DEFER_KV_WRITES — trace-time
        # flag, so it must be set across compile)
        # "qf_trans" / "qf_trans_defer": transposed-score softmax tiles
        # (decode_blocks.TRANSPOSED — full-lane VPU, round-4 VERDICT #3)
        # "qf_cross8": int8 CROSS cache only (-123 MB/step of the static
        # per-utterance traffic) on top of deferred writes; self rows stay
        # in the best-measured bf16 form
        # "qf_novocab"/"qf_noscatter"/"qf_noglue": fixed-overhead anatomy
        # ablations (session-5 finding: layers run at 1.03x their HBM
        # floor; the whole 0.48 ms gap is the 0.555 ms FIXED part) —
        # each removes one fixed component on top of qf_defer
        from whisper_apr_tpu.ops import decode_blocks
        qdecode.DEFER_KV_WRITES = name != "qf" and name != "qf_trans"
        decode_blocks.TRANSPOSED = name in ("qf_trans", "qf_trans_defer")
        qdecode.ABLATE = frozenset(
            {"vocab"} if name == "qf_novocab"
            else {"scatter"} if name == "qf_noscatter" else ())
        qc_v = (qdecode.quantize_cache(cache, mode="crossf8")
                if "crossf8" in name else
                qdecode.quantize_cache(cache, mode="cross8")
                if "cross8" in name else qc)

        if name.startswith("qf_prodhead"):
            # PRODUCTION-shaped fused-head body: the while_loop glue the
            # engine really runs (done-mask add + chosen logprob from
            # max - logsumexp). Compare against qf_prod, not qf — the
            # plain probe bodies omit the engine's full log_softmax.
            vp = qd["vocab_qT"].shape[2]
            gb = jnp.zeros((1, vp), jnp.float32)

            def body(i, env, carry, _fn=step_fn, _gb=gb):
                prm, q_d, const = env
                tok, c = carry
                (t, mx, lz), c = _fn(prm, q_d, tok, i, c, cfg,
                                     greedy_bias=_gb)
                lp = mx - lz
                return (t + (lp < -1e30).astype(jnp.int32), c)
        elif name.startswith("qf_prod"):
            # production-shaped logits body: bias-less argmax + the
            # engine's _chosen_logprob (full log_softmax over 52k)
            def body(i, env, carry, _fn=step_fn):
                prm, q_d, const = env
                tok, c = carry
                logits, c = _fn(prm, q_d, tok, i, c, cfg)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                lp = jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
                return (nxt + (lp < -1e30).astype(jnp.int32), c)
        elif name == "qf_fusedhead":
            # fused greedy head: in-kernel bias+argmax+logsumexp, no
            # [1, 52k] logits round-trip and no XLA greedy glue
            vp = qd["vocab_qT"].shape[2]
            gb = jnp.zeros((1, vp), jnp.float32)

            def body(i, env, carry, _fn=step_fn, _gb=gb):
                prm, q_d, const = env
                tok, c = carry
                (t, mx, lz), c = _fn(prm, q_d, tok, i, c, cfg,
                                     greedy_bias=_gb)
                return (t, c)
        elif name == "qf_loop0":
            # empty body: pure while_loop iteration overhead on this
            # backend (carry threads the caches untouched)
            def body(i, env, carry):
                tok, c = carry
                return (tok + 1, c)
        elif name == "qf_noglue":
            # keep the vocab head live but skip bias/argmax greedy glue
            def body(i, env, carry, _fn=step_fn):
                prm, q_d, const = env
                tok, c = carry
                logits, c = _fn(prm, q_d, tok, i, c, cfg)
                return (logits[:, 0].astype(jnp.int32), c)
        else:
            def body(i, env, carry, _fn=step_fn):
                prm, q_d, const = env
                tok, c = carry
                logits, c = _fn(prm, q_d, tok, i, c, cfg)
                return (jnp.argmax(logits, -1).astype(jnp.int32), c)

        t0 = time.time()
        try:
            s = p.per_step(body, (params, qd, 0), (tok0, qc_v))
        finally:
            qdecode.DEFER_KV_WRITES = True
            decode_blocks.TRANSPOSED = False
            qdecode.ABLATE = frozenset()
        print(f"{name:<12}: {s*1e3:8.4f} ms/step  "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
        results[name] = s
    return results


def anatomy_measure(lo, hi, layers=(8, 32), b=1):
    """Fixed-vs-per-layer split of the fused B=1 step (round-4 gap hunt:
    qf_defer 1.800 ms vs the 1.322 HBM floor — where do the 0.48 ms
    live?). Times decode_step_qf on large-v3 params layer-sliced to each
    count; the slope across layer counts is the true per-layer cost and
    the residue is the step's fixed overhead (embed, vocab matvec,
    while_loop glue, KV scatters)."""
    import dataclasses

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model import qdecode
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg_full = ModelConfig.from_name("large-v3")
    params_full = quantize_params(init_params(cfg_full, seed=0), "int8")
    params_full = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params_full)
    p = P(lo, hi)
    results = {}
    for nl in layers:
        cfg = dataclasses.replace(cfg_full, n_text_layer=nl)
        params = dict(params_full)
        params["decoder"] = dict(params_full["decoder"])
        params["decoder"]["blocks"] = jax.tree_util.tree_map(
            lambda a: a[:nl], params_full["decoder"]["blocks"])
        qd = qdecode.prepare_qdecode(params, cfg)
        D = cfg.n_text_state
        enc = jnp.zeros((b, cfg.n_audio_ctx, D), jnp.bfloat16)
        cache = init_cache(params, enc, cfg, max_len=448,
                           compute_dtype=jnp.bfloat16)
        qc = qdecode.quantize_cache(cache, kv_int8=False)
        tok0 = jnp.zeros((b,), jnp.int32)
        pos0 = jnp.asarray(np.arange(b, dtype=np.int32) * 16)

        def body(i, env, carry, _cfg=cfg):
            prm, q_d = env
            if b == 1:
                tok, c = carry
                logits, c = qdecode.decode_step_qf(prm, q_d, tok, i, c,
                                                   _cfg)
                return (jnp.argmax(logits, -1).astype(jnp.int32), c)
            tok, pos, c = carry
            logits, c = qdecode.decode_step_qf(prm, q_d, tok, pos, c, _cfg)
            return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, c)

        t0 = time.time()
        carry0 = (tok0, qc) if b == 1 else (tok0, pos0, qc)
        s = p.per_step(body, (params, qd), carry0)
        print(f"qf_defer B={b} L={nl:<3}: {s*1e3:8.4f} ms/step  "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
        results[nl] = s
    ls = sorted(results)
    if len(ls) >= 2:
        per_layer = (results[ls[-1]] - results[ls[0]]) / (ls[-1] - ls[0])
        fixed = results[ls[-1]] - ls[-1] * per_layer
        print(f"per-layer: {per_layer*1e3:.4f} ms   "
              f"fixed overhead: {fixed*1e3:.4f} ms "
              f"(embed + vocab + loop glue + scatters)", flush=True)
    if len(ls) > 2:
        # least-squares over all points + residuals: is the 'fixed pool'
        # a real intercept or a nonlinearity artifact of a 2-point fit?
        xs = np.asarray(ls, np.float64)
        ys = np.asarray([results[n] for n in ls], np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        print(f"lsq: per-layer {slope*1e3:.4f} ms  intercept "
              f"{intercept*1e3:.4f} ms  residuals "
              + " ".join(f"L{n}:{(results[n]-(slope*n+intercept))*1e3:+.3f}"
                         for n in ls), flush=True)
    return results


def q4k_measure(lo, hi, qmode="q4k", fused=False):
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model import qdecode
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg = ModelConfig.from_name("large-v3")
    params = quantize_params(init_params(cfg, seed=0), qmode)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    if qmode == "q4k":
        qd = qdecode.prepare_q4k_decode(params, cfg)
    else:
        qd = qdecode.prepare_kq_decode(params, cfg)
    assert qd is not None and qd["mode"] == qmode
    D = cfg.n_text_state
    enc = jnp.zeros((1, cfg.n_audio_ctx, D), jnp.bfloat16)
    cache = init_cache(params, enc, cfg, max_len=448,
                       compute_dtype=jnp.bfloat16)
    tok0 = jnp.zeros((1,), jnp.int32)
    p = P(lo, hi)

    # qd["mode"] is a qdecode.StaticStr since round 4: rides the jit env
    # as static metadata, so no pop-workaround is needed
    if fused:
        # round-4 fused per-block k-quant path (ops/decode_blocks_kq):
        # expected to BEAT int8 qf (q4k reads 0.75x the weight bytes).
        # Q4K_UNPACK=i32|algebra A/Bs the in-kernel nibble-unpack strategy
        # (session-5 finding: the i32 unpack is VPU-bound at 2.23 ms/step)
        import os as _os
        from whisper_apr_tpu.ops import decode_blocks_kq as _kq
        unpack = _os.environ.get("Q4K_UNPACK")
        if unpack:
            _kq.Q4K_UNPACK = unpack
            print(f"Q4K_UNPACK={unpack}")
        qc = qdecode.quantize_cache(cache, kv_int8=False)

        def body(i, env, carry):
            prm, q_d = env
            tok, c = carry
            logits, c = qdecode.decode_step_qf(prm, q_d, tok, i, c, cfg)
            return (jnp.argmax(logits, -1).astype(jnp.int32), c)

        t0 = time.time()
        s = p.per_step(body, (params, qd), (tok0, qc))
        print(f"{qmode} FUSED step: {s*1e3:8.4f} ms/step "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
        return

    def body(i, env, carry):
        prm, q_d = env
        tok, c = carry
        logits, c = qdecode.decode_step_q(prm, q_d, tok, i, c, cfg)
        return (jnp.argmax(logits, -1).astype(jnp.int32), c)

    t0 = time.time()
    s = p.per_step(body, (params, qd), (tok0, cache))
    print(f"{qmode} scan step: {s*1e3:8.4f} ms/step "
          f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
    # per-op: the fused matvec on the qkv shape
    wq, sc, zr = qd["lin"]["qkv"]
    x = jnp.zeros((1, D), jnp.bfloat16)
    if qmode == "q4k":
        from whisper_apr_tpu.ops.q4k import q4k_matvec_stacked

        def mv_body(i, env, carry):
            w, s_, z_ = env
            y = q4k_matvec_stacked(carry, w, s_, z_, i % cfg.n_text_layer)
            return y[:, :D].astype(carry.dtype)
    else:
        from whisper_apr_tpu.ops.kquants import kq_matvec_stacked

        def mv_body(i, env, carry):
            w, s_, z_ = env
            y = kq_matvec_stacked(carry, w, s_, z_, i % cfg.n_text_layer)
            return y[:, :D].astype(carry.dtype)

    s_mv = p.per_step(mv_body, (wq, sc, zr), x)
    nbytes = (wq.shape[1] * wq.shape[2]
              + sc.size // cfg.n_text_layer * (8 if zr is not None else 4))
    print(f"{qmode} qkv matvec: {s_mv*1e3:8.4f} ms/step "
          f"({nbytes/s_mv/2**30:5.0f} GiB/s eff)", flush=True)


def batched_measure(lo, hi, b=8, which=("qf",), quant="int8"):
    """B-slot serving tick: batched per-block kernels.

    Round-2d baseline: fused bf16 BATCHED 5.30 ms/step at B=8 large-v3
    (0.663 ms/slot-token); scan 7.59. Round-4 session 4: per-stream flat
    at 1.77x the roofline floor B=8..32 — these variants hunt that gap:

      qf          bf16-KV baseline (the serving default)
      qf_i8kv     int8 per-row KV (round-3: 0.847 ms/slot at bt=64)
      qf_cross8   int8 CROSS cache only (B=1 winner; at B=8 the cross
                  reads are ~60 MB/layer/tick — the dominant traffic)
      qf_crossf8  fp8 CROSS cache only (same byte cut, scale-free cast)
      qf_fp8      fp8 self+cross (half KV memory, cheapest casts)
      qf_prod     production-shaped glue (argmax + full log_softmax)
      qf_prodhead fused greedy head at M=B (one kernel, no [B,52k] tail)
      bt16/bt32/bt64/bt128  tile sweep (qdecode.BATCHED_TILE_T override)
      --quant q4k transcoded-int8 weights (the B>1 k-quant serving path)
    """
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model import qdecode
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg = ModelConfig.from_name("large-v3")
    params = quantize_params(init_params(cfg, seed=0), quant)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    if quant == "int8":
        qd = qdecode.prepare_qdecode(params, cfg)
    else:
        # the engine's B>1 k-quant route: one-time int8 transcode
        qd = qdecode.transcode_kq_to_int8(params, cfg)
        print(f"quant={quant} via transcode_kq_to_int8")
    D = cfg.n_text_state
    enc = jnp.zeros((b, cfg.n_audio_ctx, D), jnp.bfloat16)
    cache = init_cache(params, enc, cfg, max_len=448,
                       compute_dtype=jnp.bfloat16)
    tok0 = jnp.zeros((b,), jnp.int32)
    # mixed per-slot positions (the serving reality)
    pos0 = jnp.asarray(np.arange(b, dtype=np.int32) * 16)
    p = P(lo, hi)

    for name in which:
        step = qdecode.decode_step_qf
        # composable names: "bt32", "bt32_i8kv", "qf_prodhead_i8kv", ...
        if name.startswith("bt"):
            qdecode.BATCHED_TILE_T = int(name[2:].split("_")[0])
        kvm = ("int8" if name.endswith("i8kv") else
               "crossf8" if "crossf8" in name else
               "cross8" if "cross8" in name else
               "fp8" if name.endswith("fp8") else "bf16")
        qc = qdecode.quantize_cache(cache, mode=kvm)

        if name.startswith("qf_prodhead"):
            vp = qd["vocab_qT"].shape[2]
            gb = jnp.zeros((1, vp), jnp.float32)

            def body(i, env, carry, _step=step, _gb=gb):
                prm, q_d = env
                tok, pos, c = carry
                (t, mx, lz), c = _step(prm, q_d, tok, pos, c, cfg,
                                       greedy_bias=_gb)
                lp = mx - lz
                return (t + (lp < -1e30).astype(jnp.int32), pos + 1, c)
        elif name.startswith("qf_prod"):
            def body(i, env, carry, _step=step):
                prm, q_d = env
                tok, pos, c = carry
                logits, c = _step(prm, q_d, tok, pos, c, cfg)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                lp = jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
                return (nxt + (lp < -1e30).astype(jnp.int32), pos + 1, c)
        else:
            def body(i, env, carry, _step=step):
                prm, q_d = env
                tok, pos, c = carry
                logits, c = _step(prm, q_d, tok, pos, c, cfg)
                return (jnp.argmax(logits, -1).astype(jnp.int32),
                        pos + 1, c)

        t0 = time.time()
        try:
            s = p.per_step(body, (params, qd), (tok0, pos0, qc))
        finally:
            qdecode.BATCHED_TILE_T = None
        print(f"B={b} {name:<12} [{quant}]: {s*1e3:8.4f} ms/step  "
              f"{s*1e3/b:6.4f} ms/slot-token  "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)


def int8dot_probe():
    """Does Mosaic lower int8 x int8 MXU dots? (the VERDICT-6 lever: B=8
    int8-KV serving pays 1.47 ms/step of VPU casts; native int8 dots with
    row/column scale commutation would remove them — the reference's
    quantized-domain accumulate, quantized.rs:2501.)"""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 256, 256, 256
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    b = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.int32)

    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)
        got = np.asarray(out)
        want = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
        print(f"int8xint8 dot: OK ({time.time()-t0:.1f}s) exact="
              f"{np.array_equal(got, want)}")
    except Exception as e:  # noqa: BLE001
        print(f"int8xint8 dot: FAILED {type(e).__name__}: {str(e)[:300]}")

    # mixed int8 x bf16 (would avoid quantizing the q/p side)
    bb = jnp.asarray(rng.normal(0, 1, (K, N)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def kern2(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    try:
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(a, bb)
        got = np.asarray(out)
        want = np.asarray(a, np.float32) @ np.asarray(bb, np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        print(f"int8xbf16 dot: OK relerr {rel:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"int8xbf16 dot: FAILED {type(e).__name__}: {str(e)[:300]}")


def tricks_probe():
    """Mosaic lowering checks for the int8-KV MXU restructure (VERDICT-6).

    The plan replaces the per-tile int8->bf16 VPU casts with MXU dots:
      scores:  s = dot(k8 [bt,D], qe [D,H]) * ks   (k never cast)
      values:  out = dot_general(p_s [bt,H], v8 [bt,D], contract dim0)
               contrib = ones_h @ (out * et)       (v never cast)
    Both need (a) a transposed-LHS dot_general and/or (b) a small 2-D
    transpose to build qe = q_col * e. This probes what lowers.
    """
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    bt, D, H = 128, 1280, 32
    p_f = jnp.asarray(rng.normal(0, 1, (bt, H)).astype(np.float32))
    v8 = jnp.asarray(rng.integers(-127, 128, (bt, D), dtype=np.int8))

    def try_kernel(name, kern, out_shape, *args):
        try:
            t0 = time.time()
            out = pl.pallas_call(kern, out_shape=out_shape)(*args)
            got = np.asarray(out)
            print(f"{name}: OK ({time.time()-t0:.1f}s)", flush=True)
            return got
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None

    # (a) transposed-LHS dot_general, f32 x f32
    dn0 = (((0,), (0,)), ((), ()))
    v_f = v8.astype(jnp.float32)

    def k_tf(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dn0,
            preferred_element_type=jnp.float32)

    got = try_kernel("dotT f32xf32", k_tf,
                     jax.ShapeDtypeStruct((H, D), jnp.float32), p_f, v_f)
    if got is not None:
        want = np.asarray(p_f).T @ np.asarray(v_f)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (b) transposed-LHS dot_general, bf16 lhs x int8 rhs
    p_b = p_f.astype(jnp.bfloat16)

    def k_tb(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dn0,
            preferred_element_type=jnp.float32)

    got = try_kernel("dotT bf16xint8", k_tb,
                     jax.ShapeDtypeStruct((H, D), jnp.float32), p_b, v8)
    if got is not None:
        want = np.asarray(p_b, np.float32).T @ np.asarray(v8, np.float32)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (c) int8 lhs x f32 rhs plain dot (qe could stay f32)
    qe = jnp.asarray(rng.normal(0, 1, (D, H)).astype(np.float32))

    def k_if(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    got = try_kernel("dot int8xf32", k_if,
                     jax.ShapeDtypeStruct((bt, H), jnp.float32), v8[:, :D],
                     qe)
    if got is not None:
        want = np.asarray(v8, np.float32) @ np.asarray(qe)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (d) small 2-D transposes ([1,D]->[D,1] builds qe = q_col * e)
    q_row = jnp.asarray(rng.normal(0, 1, (8, D)).astype(np.float32))

    def k_tr(a_ref, o_ref):
        o_ref[...] = jnp.transpose(a_ref[...])

    try_kernel("transpose [8,D]->[D,8] f32", k_tr,
               jax.ShapeDtypeStruct((D, 8), jnp.float32), q_row)

    def k_tr2(a_ref, o_ref):
        o_ref[...] = jnp.transpose(a_ref[...])

    try_kernel("transpose [bt,H]->[H,bt] f32", k_tr2,
               jax.ShapeDtypeStruct((H, bt), jnp.float32), p_f)

    # (e) transposed-LHS dot_general, f32 lhs x int8 rhs (values, 1-stream)
    def k_tf8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dn0,
            preferred_element_type=jnp.float32)

    got = try_kernel("dotT f32xint8", k_tf8,
                     jax.ShapeDtypeStruct((H, D), jnp.float32), p_f, v8)
    if got is not None:
        want = np.asarray(p_f).T @ np.asarray(v8, np.float32)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (f) plain dot, f32 lhs x int8 rhs
    def k_f8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    pT = jnp.transpose(p_f)                              # [H, bt]
    got = try_kernel("dot f32xint8", k_f8,
                     jax.ShapeDtypeStruct((H, D), jnp.float32), pT, v8)
    if got is not None:
        want = np.asarray(pT) @ np.asarray(v8, np.float32)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (g) batched dot_general [B,bt,D] int8 x [B,D,H] f32 (batched scores)
    B = 8
    k8b = jnp.asarray(rng.integers(-127, 128, (B, bt, D), dtype=np.int8))
    qeb = jnp.asarray(rng.normal(0, 1, (B, D, H)).astype(np.float32))
    dnb = (((2,), (1,)), ((0,), (0,)))

    def k_bg(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dnb,
            preferred_element_type=jnp.float32)

    got = try_kernel("bdot int8xf32 [B,bt,D]x[B,D,H]", k_bg,
                     jax.ShapeDtypeStruct((B, bt, H), jnp.float32), k8b, qeb)
    if got is not None:
        want = np.einsum("btd,bdh->bth", np.asarray(k8b, np.float32),
                         np.asarray(qeb))
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (h) batched transposed dot_general [B,bt,H] f32 x [B,bt,D] int8,
    #     contract bt (batched values)
    pb = jnp.asarray(rng.normal(0, 1, (B, bt, H)).astype(np.float32))
    v8b = jnp.asarray(rng.integers(-127, 128, (B, bt, D), dtype=np.int8))
    dnt = (((1,), (1,)), ((0,), (0,)))

    def k_bt(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dnt,
            preferred_element_type=jnp.float32)

    got = try_kernel("bdotT f32xint8 [B,bt,H]x[B,bt,D]", k_bt,
                     jax.ShapeDtypeStruct((B, H, D), jnp.float32), pb, v8b)
    if got is not None:
        want = np.einsum("bth,btd->bhd", np.asarray(pb),
                         np.asarray(v8b, np.float32))
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (i) same two, int8 promoted to bf16 IN-KERNEL on the small operand
    #     side only if mixed fails: f32 lhs cast to bf16, int8 rhs
    p_bb = p_f.astype(jnp.bfloat16)

    def k_b8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(
            a_ref[...].astype(jnp.bfloat16), b_ref[...],
            preferred_element_type=jnp.float32)

    got = try_kernel("dot bf16(cast)xint8", k_b8,
                     jax.ShapeDtypeStruct((H, D), jnp.float32), pT, v8)
    if got is not None:
        want = np.asarray(pT, np.float32) @ np.asarray(v8, np.float32)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")

    # (j) transposed-LHS dot_general, int8 lhs x f32 rhs -> O^T [D, H]
    def k_t8f(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], dn0,
            preferred_element_type=jnp.float32)

    got = try_kernel("dotT int8xf32", k_t8f,
                     jax.ShapeDtypeStruct((D, H), jnp.float32), v8, p_f)
    if got is not None:
        want = np.asarray(v8, np.float32).T @ np.asarray(p_f)
        print(f"  relerr {np.abs(got-want).max()/np.abs(want).max():.2e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true")
    ap.add_argument("--q4k", action="store_true")
    ap.add_argument("--q5k", action="store_true")
    ap.add_argument("--q6k", action="store_true")
    ap.add_argument("--int8dot", action="store_true")
    ap.add_argument("--tricks", action="store_true")
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--anatomy", action="store_true",
                    help="fixed-vs-per-layer split of the fused B=1 step")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--anatomy-b", type=int, default=1,
                    help="batch size for --anatomy (8 = serving split)")
    ap.add_argument("--anatomy-layers", default="8,32",
                    help="comma layer counts for --anatomy (3+ points "
                         "check the linear fit behind the 'fixed pool')")
    ap.add_argument("--quant", default="int8",
                    help="--batched weights: int8 | q4k/q5k/q6k "
                         "(transcoded, the B>1 serving path)")
    ap.add_argument("--fused", action="store_true",
                    help="time decode_step_qf (per-block kq kernels) "
                         "instead of the scan step for --q4k/--q5k/--q6k")
    ap.add_argument("--which", default="qf",
                    help="comma list: qf,qf_defer,qf_trans,qf_trans_defer")
    ap.add_argument("--lo", type=int, default=16)
    ap.add_argument("--hi", type=int, default=144)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if not (args.large or args.q4k or args.q5k or args.q6k or args.anatomy
            or args.int8dot or args.tricks or args.batched):
        ap.error("pick a stage: --large / --q4k / --q5k / --q6k / "
                 "--anatomy / --int8dot / --tricks / --batched")
    if args.int8dot:
        int8dot_probe()
    if args.tricks:
        tricks_probe()
    if args.batched:
        batched_measure(args.lo, args.hi, b=args.b,
                        which=args.which.split(","), quant=args.quant)
    if args.large:
        large_measure(args.lo, args.hi, args.which.split(","))
    if args.anatomy:
        anatomy_measure(args.lo, args.hi,
                        layers=tuple(int(x) for x in
                                     args.anatomy_layers.split(",")),
                        b=args.anatomy_b)
    if args.q4k:
        q4k_measure(args.lo, args.hi, fused=args.fused)
    if args.q5k:
        q4k_measure(args.lo, args.hi, qmode="q5k", fused=args.fused)
    if args.q6k:
        q4k_measure(args.lo, args.hi, qmode="q6k", fused=args.fused)
