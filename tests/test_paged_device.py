"""Device paged decoding: Pallas paged-attention kernel + scheduler pool.

Kernel runs in interpret mode on CPU; on TPU the same code path compiles
to Mosaic (verified on hardware in BENCH_NOTES).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_hf_twin, small_config, small_specials
from whisper_apr_tpu import WhisperApr
from whisper_apr_tpu.model import paged_decode
from whisper_apr_tpu.model.decoder import init_cache, prefill
from whisper_apr_tpu.model.kv_variants import (PAGE_SIZE, PagedKVCache,
                                               decode_step_multi)
from whisper_apr_tpu.ops.paged_attention import paged_attention


@pytest.fixture(scope="module")
def cfg():
    # lane-aligned d_model for the kernel path
    from whisper_apr_tpu.config import ModelConfig
    return ModelConfig(
        model_type="tiny", n_vocab=700, n_audio_ctx=32, n_audio_state=128,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=48, n_text_state=128,
        n_text_head=4, n_text_layer=2, n_mels=80)


@pytest.fixture(scope="module")
def setup(cfg):
    from whisper_apr_tpu.model.params import init_params
    params = init_params(cfg, seed=7)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(0, 0.5, (2, cfg.n_audio_ctx,
                                          cfg.n_text_state)).astype(np.float32))
    return params, enc


class TestPagedAttentionKernel:
    def test_matches_dense_softmax(self):
        rng = np.random.default_rng(0)
        B, D, H, NP, PMAX = 2, 128, 4, 10, 3
        hd = D // H
        k_pool = rng.normal(0, 0.5, (NP, PAGE_SIZE, D)).astype(np.float32)
        v_pool = rng.normal(0, 0.5, (NP, PAGE_SIZE, D)).astype(np.float32)
        tables = np.zeros((B, PMAX), np.int32)
        tables[0, :2] = [3, 7]
        tables[1, :3] = [1, 4, 9]
        lengths = np.array([20, 41], np.int32)
        q = rng.normal(0, 0.5, (B, D)).astype(np.float32)
        got = np.asarray(paged_attention(
            jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(tables), jnp.asarray(lengths), H, interpret=True))
        for b in range(B):
            n = int(lengths[b])
            pages = tables[b][: -(-n // PAGE_SIZE)]
            k = k_pool[pages].reshape(-1, D)[:n]
            v = v_pool[pages].reshape(-1, D)[:n]
            for h in range(H):
                lo = h * hd
                s = (q[b, lo:lo + hd] * hd ** -0.5) @ k[:, lo:lo + hd].T
                w = np.exp(s - s.max())
                w /= w.sum()
                want = w @ v[:, lo:lo + hd]
                np.testing.assert_allclose(got[b, lo:lo + hd], want,
                                           rtol=1e-4, atol=1e-5)


class TestPagedDecodeStep:
    def test_matches_dense_decode_token_exact(self, cfg, setup):
        """The paged device step must produce the same logits as the dense
        per-slot cache step at every position (the paged-vs-dense oracle)."""
        params, enc = setup
        B = enc.shape[0]
        L, D = cfg.n_text_layer, cfg.n_text_state
        max_len = 40
        prompt = jnp.asarray(np.full((B, 3), 5, np.int32))

        dense = init_cache(params, enc, cfg, max_len=max_len)
        _, dense = prefill(params, prompt, enc, dense, cfg)

        pk = PagedKVCache(cfg, n_pages=2 * B * (max_len // PAGE_SIZE + 1))
        for b in range(B):
            pk.alloc(b, 3)
        tables = np.zeros((B, -(-max_len // PAGE_SIZE)), np.int32)
        for b in range(B):
            pk.k_pool, pk.v_pool = paged_decode.write_prefill_to_pool(
                pk.k_pool, pk.v_pool, dense.self_k[:, b:b + 1],
                dense.self_v[:, b:b + 1], np.asarray(pk._tables[b]), 3)

        toks = np.array([7, 11], np.int32)
        pos = 3
        for step in range(6):
            for b in range(B):
                pk.extend(b, 1)
                t = pk._tables[b]
                tables[b, : len(t)] = t
            lg_dense, dense = decode_step_multi(
                params, jnp.asarray(toks), jnp.full(B, pos, jnp.int32),
                dense, cfg)
            lg_paged, pk.k_pool, pk.v_pool = paged_decode.paged_decode_step(
                params, jnp.asarray(toks), jnp.full(B, pos, jnp.int32),
                jnp.asarray(tables), pk.k_pool, pk.v_pool,
                dense.cross_k, dense.cross_v, cfg, interpret=True)
            np.testing.assert_allclose(np.asarray(lg_dense),
                                       np.asarray(lg_paged),
                                       rtol=2e-4, atol=2e-4)
            toks = np.asarray(jnp.argmax(lg_paged, axis=-1), np.int32)
            assert np.array_equal(
                toks, np.asarray(jnp.argmax(lg_dense, axis=-1)))
            pos += 1


class TestPagedScheduler:
    def test_paged_scheduler_matches_dense(self, cfg, setup):
        """Scheduler over the shared page pool must produce token-identical
        completions to the dense-slot scheduler."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        specials = small_specials(cfg)
        eng = WhisperApr(cfg, params, specials=specials)

        rng = np.random.default_rng(3)
        audios = [rng.normal(0, 0.1, 3200).astype(np.float32)
                  for _ in range(3)]

        paged_decode.INTERPRET = True
        try:
            results = {}
            for mode in ("dense", "paged", "paged-staged"):
                sched = BatchScheduler(
                    eng, n_slots=2, max_len=32,
                    paged=mode.startswith("paged"),
                    batched_admission=(mode != "paged-staged"))
                ids = [sched.submit(a, max_tokens=8) for a in audios]
                sched.run_until_drained(max_steps=500)
                results[mode] = [sched.result(i).tokens for i in ids]
        finally:
            paged_decode.INTERPRET = False
        assert results["dense"] == results["paged"]
        assert results["paged"] == results["paged-staged"]

    def test_paged_bucket_padding_duplicates_last_slot(self, cfg, setup):
        """A 3-request burst into 4 slots pads up to the 4-bucket by
        repeating the last real slot's prefill (idempotent duplicate pool
        writes); tokens must still match the dense scheduler."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        rng = np.random.default_rng(8)
        audios = [rng.normal(0, 0.1, 3000 + 300 * i).astype(np.float32)
                  for i in range(3)]
        paged_decode.INTERPRET = True
        try:
            results = {}
            for mode in ("dense", "paged"):
                sched = BatchScheduler(eng, n_slots=4, max_len=32,
                                       paged=(mode == "paged"))
                assert 4 in sched.admit_buckets
                ids = [sched.submit(a, max_tokens=6) for a in audios]
                sched.run_until_drained(max_steps=500)
                results[mode] = [sched.result(i).tokens for i in ids]
        finally:
            paged_decode.INTERPRET = False
        assert results["dense"] == results["paged"]

    def test_pool_reserves_full_occupancy_plus_sentinel(self, cfg, setup):
        """Default pool sizing must let EVERY slot reach its full max_len
        reservation at once, plus the garbage sentinel page — a one-page
        shortfall only surfaces as alloc failures under full occupancy."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        sched = BatchScheduler(eng, n_slots=2, max_len=32, paged=True)
        pk = sched._paged_kv
        assert pk.n_pages == 2 * sched._p_max + 1
        # sentinel holds one page; everything else must be free
        assert pk.free_pages == pk.n_pages - 1

    def test_batched_prefill_scatter_places_rows(self, cfg, setup):
        """write_prefills_to_pool: row t of sequence b must land exactly at
        pool[:, pages[b, t], offs[b, t]] (a flipped mod/div in the offset
        arithmetic stacks rows on top of each other)."""
        from whisper_apr_tpu.model.kv_variants import PAGE_SIZE, PagedKVCache
        from whisper_apr_tpu.model.paged_decode import write_prefills_to_pool
        L, D, P = cfg.n_text_layer, cfg.n_text_state, PAGE_SIZE + 3
        pk = PagedKVCache(cfg, 8, compute_dtype=jnp.float32)
        pk.alloc(0, P)
        table = np.asarray(pk._tables[0], np.int32)
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.normal(size=(L, 1, P, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(L, 1, P, D)).astype(np.float32))
        positions = np.arange(P)
        pages = table[positions // PAGE_SIZE][None]        # [1, P]
        offs = (positions % PAGE_SIZE)[None]               # [1, P]
        pk.k_pool, pk.v_pool = write_prefills_to_pool(
            pk.k_pool, pk.v_pool, k, v,
            jnp.asarray(pages, jnp.int32), jnp.asarray(offs, jnp.int32))
        got_k = np.asarray(pk.k_pool)
        for t in range(P):
            np.testing.assert_array_equal(
                got_k[:, table[t // PAGE_SIZE], t % PAGE_SIZE],
                np.asarray(k)[:, 0, t])

    def test_staged_paged_long_prompt_spans_pages(self, cfg, setup):
        """Staged paged admission with a prompt longer than one page
        (17 tokens > PAGE_SIZE=16): the prompt+1 reservation must cover the
        second page or the prefill scatter runs off the table."""
        params, _ = setup
        from whisper_apr_tpu.model.kv_variants import PAGE_SIZE
        from whisper_apr_tpu.parallel.serving import BatchScheduler, Request
        assert PAGE_SIZE == 16
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        rng = np.random.default_rng(9)
        audio = rng.normal(0, 0.1, 3200).astype(np.float32)
        prompt = [5] * (PAGE_SIZE + 1)  # 17 tokens -> 2 pages (+1 for gen)
        paged_decode.INTERPRET = True
        try:
            results = {}
            for mode in ("dense", "paged"):
                sched = BatchScheduler(eng, n_slots=1, max_len=48,
                                       paged=(mode == "paged"),
                                       batched_admission=False)
                sched._queue.put(Request(77, audio, list(prompt), 6))
                sched.run_until_drained(max_steps=200)
                results[mode] = sched.result(77).tokens
        finally:
            paged_decode.INTERPRET = False
        assert results["dense"] == results["paged"]
        assert len(results["paged"]) > len(prompt)

    def test_pool_pages_are_recycled(self, cfg, setup):
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        paged_decode.INTERPRET = True
        try:
            sched = BatchScheduler(eng, n_slots=2, max_len=32, paged=True)
            free0 = sched._paged_kv.free_pages
            rng = np.random.default_rng(4)
            for _ in range(2):
                ids = [sched.submit(rng.normal(0, 0.1, 3200).astype(np.float32),
                                    max_tokens=6) for _ in range(2)]
                sched.run_until_drained(max_steps=200)
                for i in ids:
                    assert sched.result(i) is not None
            assert sched._paged_kv.free_pages == free0  # all pages returned
        finally:
            paged_decode.INTERPRET = False

    def test_default_pool_holds_every_slot_at_max_len(self, cfg, setup):
        """The default page pool must fit ALL slots at max_len
        SIMULTANEOUSLY plus the reserved scratch page (serving.py
        pool_pages = B * p_max + 1). An off-by-two (B*p_max - 1) only
        surfaces when the LAST slot fills — so fill every slot to
        max_len and require the allocator to succeed."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        sched = BatchScheduler(eng, n_slots=2, max_len=32, paged=True)
        pk = sched._paged_kv
        assert pk.free_pages == 2 * sched._p_max  # sentinel took exactly 1
        for slot in range(2):
            pk.alloc(slot, sched.max_len)  # raises "out of KV pages" if short
        assert pk.free_pages == 0

    def test_staged_admission_reserves_first_token_page(self, cfg, setup):
        """Staged paged admission allocs prompt + ONE generated token
        (serving.py alloc(slot, P + 1)). With P == PAGE_SIZE exactly, the
        +1 is what reserves the second page AT ADMISSION — the fail-fast
        contract (reject while nothing is half-written; reference:
        decoder.rs:880-961 alloc-with-rollback) — instead of leaving the
        first decode tick to discover the pool is short."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler, Request
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        rng = np.random.default_rng(13)
        audio = rng.normal(0, 0.1, 3200).astype(np.float32)
        prompt = [5] * PAGE_SIZE  # exactly one full page of prompt
        paged_decode.INTERPRET = True
        try:
            sched = BatchScheduler(eng, n_slots=1, max_len=48, paged=True,
                                   batched_admission=False)
            sched._admit_one(0, Request(5, audio, list(prompt), 4))
        finally:
            paged_decode.INTERPRET = False
        pk = sched._paged_kv
        # P+1 = 17 tokens -> 2 pages reserved at admission time
        assert len(pk._tables[0]) == 2

    def test_batched_admission_offsets_place_rows(self, cfg, setup):
        """Batched paged admission must land prompt row t of each slot at
        pool[:, table[t // PAGE_SIZE], t % PAGE_SIZE]. The prefill K/V are
        computed by the SAME fused_admit_step as the dense path, so the
        gathered paged rows must equal the dense cache rows exactly — a
        flipped mod/div in the serving-side offset arithmetic
        (serving.py offs = positions % PAGE_SIZE) stacks every row at
        offset 0 and breaks this for any prompt longer than one token."""
        params, _ = setup
        from whisper_apr_tpu.parallel.serving import BatchScheduler
        eng = WhisperApr(cfg, params, specials=small_specials(cfg))
        rng = np.random.default_rng(11)
        audios = [rng.normal(0, 0.1, 3000 + 500 * i).astype(np.float32)
                  for i in range(2)]
        paged_decode.INTERPRET = True
        try:
            caches = {}
            for mode in ("dense", "paged"):
                sched = BatchScheduler(eng, n_slots=2, max_len=32,
                                       paged=(mode == "paged"))
                for a in audios:
                    sched.submit(a, "en", max_tokens=4)
                sched._fill_slots()  # one batched admission, no decode yet
                caches[mode] = sched
        finally:
            paged_decode.INTERPRET = False
        dense, paged = caches["dense"], caches["paged"]
        pk = paged._paged_kv
        dense_k = np.asarray(dense._cache.self_k)
        dense_v = np.asarray(dense._cache.self_v)
        pool_k = np.asarray(pk.k_pool)
        pool_v = np.asarray(pk.v_pool)
        for slot in (0, 1):
            P = int(paged._pos[slot])
            assert P >= 2, "prompt must span several offsets"
            assert P == int(dense._pos[slot])
            table = np.asarray(pk._tables[slot], np.int32)
            for t in range(P):
                page, off = table[t // PAGE_SIZE], t % PAGE_SIZE
                np.testing.assert_array_equal(
                    pool_k[:, page, off], dense_k[:, slot, t],
                    err_msg=f"K slot {slot} row {t}")
                np.testing.assert_array_equal(
                    pool_v[:, page, off], dense_v[:, slot, t],
                    err_msg=f"V slot {slot} row {t}")
