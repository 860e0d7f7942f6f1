"""Decode-step profiler: where does the per-token time go?

Runs on the real TPU. Times, for a given model size at B=1:
  1. the full production decode step (decode_step_q)
  2. each kernel family in isolation, looped over layers x steps
  3. the XLA glue (attention over the KV caches + layernorms)

Protocol notes (axon tunnel):
  - each dispatched program pays a fixed ~20-25 ms host->device cost, so
    every measurement is the SLOPE between a low and a high step count —
    the fixed cost cancels;
  - the step count is a runtime argument to a lax.while_loop (ONE compile
    per program, both step counts share it);
  - timing fetches a value (block_until_ready does not synchronize here).

Usage: python -u tools/profile_decode.py [model] [lo] [hi]
"""

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


def _sync(out):
    """True tunnel barrier: fetch ONE element, sliced on device first.

    np.asarray(full_leaf) would pull the whole array host-side — for
    multi-MB outputs the transfer dwarfs the compute being timed.
    """
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def stepped(body):
    """jit(fn)(steps, env, state): while_loop with runtime trip count.

    ``env`` carries the big arrays (params/qd/caches) as ARGUMENTS — a
    closed-over multi-GB array would be embedded in the HLO as a constant
    and stall compilation for tens of minutes.
    """
    @jax.jit
    def run(steps, env, state):
        def cond(c):
            return c[0] < steps
        def b(c):
            i, s = c
            return (i + 1, body(i, env, s))
        return jax.lax.while_loop(cond, b, (jnp.int32(0), state))[1]
    return run


class P:
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi

    def per_step(self, body, env, init):
        fn = stepped(body)
        t_lo = timeit(fn, jnp.int32(self.lo), env, init)
        t_hi = timeit(fn, jnp.int32(self.hi), env, init)
        return (t_hi - t_lo) / (self.hi - self.lo)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 144
    p = P(lo, hi)

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import decode_step_q, prepare_qdecode
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.ops.qmatvec import qmatvec_stacked, ffn_fused

    cfg = ModelConfig.from_name(model)
    params = init_params(cfg, seed=0)
    params = quantize_params(params, "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = prepare_qdecode(params, cfg)
    assert qd is not None

    B, D, L = 1, cfg.n_text_state, cfg.n_text_layer
    H = qd["ffn"]["w1"].shape[2]
    T_max = 224
    enc = jnp.zeros((B, cfg.n_audio_ctx, D), jnp.bfloat16)
    cache = init_cache(params, enc, cfg, max_len=T_max,
                       compute_dtype=jnp.bfloat16)
    tok0 = jnp.zeros((B,), jnp.int32)
    x0 = jnp.zeros((B, D), jnp.bfloat16)

    rows = []

    def report(name, s, nbytes=None, part=True):
        gbs = f" ({nbytes/s/2**30:6.0f} GiB/s, {nbytes/2**20:5.1f} MiB/step)" \
            if nbytes else ""
        print(f"{name:<26}: {s*1e3:8.4f} ms/step{gbs}", flush=True)
        if part:
            rows.append((name, s))

    # --- 1. full production step ---
    def full_body(i, env, carry):
        prm, q_d = env
        tok, c = carry
        logits, c = decode_step_q(prm, q_d, tok, i, c, cfg)
        return (jnp.argmax(logits, -1).astype(jnp.int32), c)

    s_full = p.per_step(full_body, (params, qd), (tok0, cache))
    report("full decode_step_q", s_full, part=False)

    # --- 1b. fused-attention steps (decode_step_qf) ---
    from whisper_apr_tpu.model.qdecode import decode_step_qf, quantize_cache

    def qf_body(i, env, carry):
        prm, q_d = env
        tok, c = carry
        logits, c = decode_step_qf(prm, q_d, tok, i, c, cfg)
        return (jnp.argmax(logits, -1).astype(jnp.int32), c)

    for mode in ("bf16", "int8", "fp8"):
        if mode not in os.environ.get("MODES", "bf16,int8,fp8").split(","):
            continue
        qc = quantize_cache(cache, mode=mode)
        s = p.per_step(qf_body, (params, qd), (tok0, qc))
        report(f"fused step ({mode} KV)", s, part=False)

    if "steps-only" in sys.argv:
        return

    # --- 2. kernel families (looped over L layers per step) ---
    def layers(fn):
        def body(i, env, x):
            return jax.lax.fori_loop(
                0, L, lambda l, x: fn(env, x, l), x)
        return body

    qkv_q, qkv_s = qd["lin"]["qkv"]
    s = p.per_step(layers(
        lambda e, x, l: qmatvec_stacked(x, e[0], e[1], l)[:, :D]),
        (qkv_q, qkv_s), x0)
    report("qkv kernel", s, qkv_q.nbytes)

    so_q, so_s = qd["lin"]["self_o"]
    s = p.per_step(layers(
        lambda e, x, l: qmatvec_stacked(x, e[0], e[1], l)),
        (so_q, so_s), x0)
    report("self_o kernel", s, so_q.nbytes)

    cq_q, cq_s = qd["lin"]["cross_q"]
    co_q, co_s = qd["lin"]["cross_o"]
    s = p.per_step(layers(
        lambda e, x, l: qmatvec_stacked(
            qmatvec_stacked(x, e[0], e[1], l), e[2], e[3], l)),
        (cq_q, cq_s, co_q, co_s), x0)
    report("cross_q+cross_o kernels", s, cq_q.nbytes + co_q.nbytes)

    ffn = qd["ffn"]
    block_h = max(bh for bh in range(128, min(H, 512) + 1, 128)
                  if H % bh == 0)
    fbytes = ffn["w1"].nbytes + ffn["w2"].nbytes
    s = p.per_step(layers(
        lambda e, x, l: ffn_fused(x, e["w1"], e["s1"], e["b1"],
                                  e["w2"], l, block_h=block_h)), ffn, x0)
    report("ffn fused kernel", s, fbytes)

    def vocab_body(i, env, x):
        logits = qmatvec_stacked(x, env["vocab_qT"], env["vocab_ones"], 0,
                                 out_dtype=jnp.float32)
        return logits[:, :D].astype(jnp.bfloat16)
    s = p.per_step(vocab_body, qd, x0)
    report("vocab projection", s, qd["vocab_qT"].nbytes)

    # --- 3. attention + LN (XLA glue) ---
    from whisper_apr_tpu.ops.basic import mha, layer_norm

    kv_bytes = (cache.self_k.nbytes + cache.self_v.nbytes
                + cache.cross_k.nbytes + cache.cross_v.nbytes)

    def attn_body(i, env, carry):
        rest, c = env
        x = carry
        valid = (jnp.arange(T_max) <= i)[None, None, None, :]
        def layer(xx, ln_cache):
            r, k_c, v_c, c_k, c_v = ln_cache
            q = xx[:, None, :]
            a1 = mha(q, k_c, v_c, cfg.n_text_head, mask=valid)
            a2 = mha(q, c_k, c_v, cfg.n_text_head)
            xx = layer_norm(xx[:, None], r["ln1"]["w"], r["ln1"]["b"])[:, 0]
            return xx + a1[:, 0] + a2[:, 0], None
        x, _ = jax.lax.scan(layer, x, (rest, c.self_k, c.self_v,
                                       c.cross_k, c.cross_v))
        return x
    s = p.per_step(attn_body, (qd["rest"], cache), x0)
    report("attention+LN (XLA)", s, kv_bytes)

    # --- summary ---
    wbytes = (qkv_q.nbytes + so_q.nbytes + cq_q.nbytes + co_q.nbytes
              + fbytes + qd["vocab_qT"].nbytes)
    total = wbytes + kv_bytes
    parts = sum(s for _, s in rows)
    print(f"\nfull step: {s_full*1e3:.4f} ms/step; sum of parts "
          f"{parts*1e3:.4f} ms/step", flush=True)
    print(f"per-step HBM traffic: weights {wbytes/2**20:.0f} MiB + "
          f"KV {kv_bytes/2**20:.0f} MiB = {total/2**20:.0f} MiB")
    floor = total / (819e9)
    print(f"floor @ 819 GB/s: {floor*1e3:.4f} ms/step; measured "
          f"{s_full*1e3:.4f} ({s_full/floor:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
