"""Multi-stream batched serving with continuous batching.

The TPU-native answer to the reference's Web-Worker concurrency model
(SURVEY.md §2.12/§5.8 — src/wasm/worker.rs message protocol +
SharedArrayBuffer threading become a host-side session scheduler feeding a
batched device step).

Design: a fixed number of SLOTS share one compiled decode step
(``decode_step_multi`` — per-slot positions). Each slot holds one request's
encoder output, token buffer, and position. Every scheduler tick advances
ALL active slots by one token in a single fused device step; finished slots
are refilled from the queue immediately (continuous batching — no
head-of-line blocking on long utterances).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..model.decoder import KVCache, init_cache, prefill
from ..model.kv_variants import (PAGE_SIZE, PagedKVCache, decode_step_multi,
                                 decode_steps_multi_jit)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_dense_slots(cache: KVCache, slots: jnp.ndarray,
                         new: KVCache) -> KVCache:
    """Write a batch of freshly-admitted sequences into their slots in ONE
    dispatch (donated in-place update). ``new`` holds prompt-width self K/V
    [L, n, P, D] and full cross K/V [L, n, S, D]; ``slots`` [n] int32."""
    P = new.self_k.shape[2]
    return KVCache(
        cache.self_k.at[:, slots, :P].set(new.self_k.astype(cache.self_k.dtype)),
        cache.self_v.at[:, slots, :P].set(new.self_v.astype(cache.self_v.dtype)),
        cache.cross_k.at[:, slots].set(new.cross_k.astype(cache.cross_k.dtype)),
        cache.cross_v.at[:, slots].set(new.cross_v.astype(cache.cross_v.dtype)))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("int8",))
def _scatter_qf_slots(cache, slots: jnp.ndarray, new: KVCache, int8: bool):
    """Slot scatter for the fused-megakernel cache (QKVCache): bf16 rows or
    per-row int8 quantization (ops/decode_attention.quantize_rows) fused
    into the same program."""
    from ..ops.decode_attention import quantize_rows

    P = new.self_k.shape[2]
    S = new.cross_k.shape[2]
    if int8:
        sk, sks = quantize_rows(new.self_k)
        sv, svs = quantize_rows(new.self_v)
        ck, cks = quantize_rows(new.cross_k)
        cv, cvs = quantize_rows(new.cross_v)
        cache = cache._replace(
            self_ks=cache.self_ks.at[:, slots, :P].set(sks),
            self_vs=cache.self_vs.at[:, slots, :P].set(svs),
            cross_ks=cache.cross_ks.at[:, slots, :S].set(cks),
            cross_vs=cache.cross_vs.at[:, slots, :S].set(cvs))
    else:
        dt = cache.self_kq.dtype
        sk, sv = new.self_k.astype(dt), new.self_v.astype(dt)
        ck, cv = new.cross_k.astype(dt), new.cross_v.astype(dt)
    return cache._replace(
        self_kq=cache.self_kq.at[:, slots, :P].set(sk),
        self_vq=cache.self_vq.at[:, slots, :P].set(sv),
        cross_kq=cache.cross_kq.at[:, slots, :S].set(ck),
        cross_vq=cache.cross_vq.at[:, slots, :S].set(cv))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_cross_slots(cache: KVCache, slots: jnp.ndarray,
                         new: KVCache) -> KVCache:
    """Cross-K/V-only slot scatter (paged serving: self K/V live in the
    page pool, only the cross cache is dense per-slot)."""
    return KVCache(
        cache.self_k, cache.self_v,
        cache.cross_k.at[:, slots].set(new.cross_k.astype(cache.cross_k.dtype)),
        cache.cross_v.at[:, slots].set(new.cross_v.astype(cache.cross_v.dtype)))


@dataclasses.dataclass
class Request:
    """One transcription request submitted to the scheduler."""

    request_id: int
    audio: np.ndarray
    prompt: Optional[List[int]]  # None -> language auto-detect at admission
    max_tokens: int = 224
    submitted_at: float = dataclasses.field(default_factory=time.time)
    deadline: Optional[float] = None  # absolute wall clock; None = no limit
    task: str = "transcribe"  # used to build the prompt when auto-detecting


@dataclasses.dataclass
class Completion:
    request_id: int
    tokens: List[int]
    queue_seconds: float
    decode_seconds: float
    # "ok" | "cancelled" | "timeout" — cancelled/timed-out requests still
    # carry whatever tokens were decoded before the stop (partial result)
    status: str = "ok"
    prompt_len: int = 0  # tokens[:prompt_len] is the forced prompt


class BatchScheduler:
    """Continuous-batching scheduler over a fixed slot array.

    Synchronous core (``submit`` + ``run_until_drained``) with an optional
    background thread (``start``/``stop``) for async serving.
    """

    def __init__(self, engine, n_slots: int = 8,
                 max_len: Optional[int] = None,
                 steps_per_tick: int = 1,
                 paged: bool = False,
                 n_pages: Optional[int] = None,
                 mesh=None,
                 batched_admission: bool = True,
                 admit_buckets: Optional[Sequence[int]] = None) -> None:
        """``mesh``: a jax.sharding.Mesh with a ``dp`` axis — the slot
        batch (and every KV cache) shards over it, params/bias replicate,
        and GSPMD partitions the fused tick so one scheduler serves
        dp x the streams of a single chip (SURVEY §5.8: the Worker
        protocol becomes a slice-wide batched session dispatcher).
        n_slots must divide evenly over dp. Dense scan path only (the
        Pallas megakernel tick is per-device; see sharded_tick notes).
        """
        self.engine = engine
        self.config: ModelConfig = engine.config
        self.n_slots = n_slots
        self.steps_per_tick = max(1, steps_per_tick)
        self.max_len = max_len or self.config.n_text_ctx
        self.paged = paged
        self.mesh = mesh
        # Batched admission: bursts of queued requests admit through ONE
        # fused mel->encode->prefill program (pipeline.fused_admit_step)
        # plus one donated slot-scatter, instead of ~3 dispatches per
        # request. Buckets bound the number of compiled batch sizes; a
        # burst pads up to the next bucket using spare free slots as
        # harmless write targets (paged slots instead repeat the last real
        # slot — identical values, idempotent writes). Paged self K/V
        # route into the page pool via one batched scatter.
        self.batched_admission = batched_admission
        if admit_buckets is None:
            admit_buckets = sorted({1, n_slots} | {
                b for b in (2, 4, 8, 16) if b < n_slots})
        self.admit_buckets = tuple(sorted(admit_buckets))
        if mesh is not None:
            if paged:
                raise ValueError("paged serving is per-device; use dense "
                                 "slots with a mesh")
            if n_slots % mesh.shape["dp"]:
                raise ValueError(
                    f"n_slots={n_slots} not divisible by dp="
                    f"{mesh.shape['dp']}")
        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._completions: Dict[int, Completion] = {}
        self._next_id = 0
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        # ids cancelled via cancel(); honored at the next tick (all slot
        # mutation stays on the scheduler thread). Reference parity: the
        # Worker protocol's Abort message (src/wasm/worker.rs:38).
        self._cancelled: set = set()
        self._counters = {
            "completed_ok": 0, "cancelled": 0, "timeout": 0,
            "tokens_generated": 0, "queue_seconds_sum": 0.0,
            "decode_seconds_sum": 0.0, "admitted": 0, "ticks": 0}

        # slot state (host mirrors; device arrays built lazily)
        D = self.config.n_text_state
        S = self.config.n_audio_ctx
        L = self.config.n_text_layer
        dt = engine._compute_dtype
        B = n_slots
        if paged:
            # slots SHARE a page pool instead of dense [B, max_len] caches
            # (reference: decoder.rs:835 PagedDecoderKVCache); page 0 is a
            # reserved scratch page that idle slots write into harmlessly
            self._p_max = -(-self.max_len // PAGE_SIZE)
            pool_pages = n_pages or (B * self._p_max + 1)
            self._paged_kv = PagedKVCache(self.config, pool_pages,
                                          compute_dtype=dt)
            self._paged_kv.alloc(-1, 1)  # sentinel: reserve page 0 slack
            self._garbage_page = self._paged_kv._tables[-1][0]
            self._cache = KVCache(
                self_k=jnp.zeros((L, 1, 1, D), dtype=dt),   # unused (paged)
                self_v=jnp.zeros((L, 1, 1, D), dtype=dt),
                cross_k=jnp.zeros((L, B, S, D), dtype=dt),
                cross_v=jnp.zeros((L, B, S, D), dtype=dt))
        else:
            # serving slots ride the BATCHED megakernel step (round-2c:
            # all B sequences per kernel tile — B=8 large-v3 0.66 vs the
            # scan step's 0.95 ms/slot-token). kv_mode "int8" halves the
            # per-slot cache HBM (0.85 ms/slot-token — capacity option);
            # "scan" opts out entirely. On a mesh the tick is GSPMD-
            # partitioned pure XLA, so the scan step serves all shards.
            self._qf = None if mesh is not None else engine._qf_mode
            if self._qf == "cross8":
                # cross8 is the B=1 transcribe default; at B>1 slots the
                # measured-best cache form is FULL int8 (session-7 B=8
                # KV-mode lineup: i8kv 0.778 vs bf16 0.913 / cross8 0.904
                # ms/slot-token — at batch the per-slot KV bytes dominate
                # the tick, so halving them beats the VPU cast tax; fp8
                # forms are a Mosaic lowering pathology at B=8, 2.7x)
                self._qf = "int8"
            # k-quant models at B>1: the engine transcodes the decoder
            # block linears to per-channel int8 once (qdecode.
            # transcode_kq_to_int8), so slots ride the batched int8
            # megakernels at the int8 model's per-stream cost instead of
            # the scan-step fallback (1.5-2.7x slower, BENCH_NOTES r4).
            # kv_mode="scan" (self._qf None) keeps the exact k-quant qd.
            if mesh is not None:
                self._qd = None
            elif self._qf:
                self._qd = engine._qd_for(self.n_slots)
            else:
                self._qd = engine._qdecode
            if self._qf is not None:
                from ..model.qdecode import qf_supported
                if self._qd is None or not qf_supported(self._qd,
                                                        self.n_slots):
                    self._qf = None   # transcode unavailable -> scan step
                    self._qd = engine._qdecode
            if self._qf:
                # fused megakernel slots (model/qdecode.decode_step_qf):
                # T padded to the kernel blocks; int8 mode halves slot HBM
                from ..model.qdecode import (CROSS_BLOCK_T, SELF_BLOCK_T,
                                             QKVCache)
                Tp = -(-self.max_len // SELF_BLOCK_T) * SELF_BLOCK_T
                Sp = -(-S // CROSS_BLOCK_T) * CROSS_BLOCK_T
                kv8 = self._qf == "int8"
                rdt = jnp.int8 if kv8 else dt
                def z(shape, d):
                    return jnp.zeros(shape, dtype=d)
                self._cache = QKVCache(
                    z((L, B, Tp, D), rdt),
                    z((L, B, Tp, 1), jnp.float32) if kv8 else None,
                    z((L, B, Tp, D), rdt),
                    z((L, B, Tp, 1), jnp.float32) if kv8 else None,
                    z((L, B, Sp, D), rdt),
                    z((L, B, Sp, 1), jnp.float32) if kv8 else None,
                    z((L, B, Sp, D), rdt),
                    z((L, B, Sp, 1), jnp.float32) if kv8 else None)
            else:
                self._cache = KVCache(
                    self_k=jnp.zeros((L, B, self.max_len, D), dtype=dt),
                    self_v=jnp.zeros((L, B, self.max_len, D), dtype=dt),
                    cross_k=jnp.zeros((L, B, S, D), dtype=dt),
                    cross_v=jnp.zeros((L, B, S, D), dtype=dt))
        self._tokens = np.full((B, self.max_len),
                               engine.specials.eot, dtype=np.int32)
        self._pos = np.zeros(B, dtype=np.int32)
        self._active = np.zeros(B, dtype=bool)
        self._req: List[Optional[Request]] = [None] * B
        self._decode_start = np.zeros(B, dtype=np.float64)
        # variant-aware suppressor: derive the id set from the ENGINE's
        # SpecialTokens, not the vocab-size default — English-only models
        # (and test rigs) have shifted special ids
        from ..inference.processors import WhisperTokenSuppressor
        self._bias = jnp.asarray(WhisperTokenSuppressor(
            n_vocab=self.config.n_vocab,
            tokens=engine.specials).bias())

        self._params = engine.params
        if mesh is not None:
            # slot axis over dp, params/bias replicated: GSPMD partitions
            # the fused decode tick across the slice with no step changes
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            self._rep = rep
            self._slot_ax1 = NamedSharding(mesh, P(None, "dp"))
            self._slot_ax0 = NamedSharding(mesh, P("dp"))
            self._params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), engine.params)
            self._bias = jax.device_put(self._bias, rep)
            self._cache = KVCache(*[
                jax.device_put(c, self._slot_ax1) for c in self._cache])

    # -- public API -----------------------------------------------------------
    def submit(self, audio: np.ndarray, language: str = "en",
               task: str = "transcribe",
               max_tokens: int = 224,
               timeout_s: Optional[float] = None) -> int:
        """Enqueue a request; returns its id. ``timeout_s`` sets a wall-clock
        deadline — a request still queued/decoding past it completes with
        status "timeout" and whatever tokens it has. ``language`` None or
        "auto" detects the language at admission (on the scheduler thread —
        one extra mel+encode dispatch for that request)."""
        with self._lock:
            rid = self._next_id
            self._next_id += 1
        prompt = (None if language in (None, "auto")
                  else self.engine.get_initial_tokens(language, task))
        deadline = None if timeout_s is None else time.time() + timeout_s
        self._queue.put(Request(rid, np.asarray(audio, np.float32),
                                prompt, max_tokens, deadline=deadline,
                                task=task))
        return rid

    def cancel(self, request_id: int) -> bool:
        """Abort a queued or in-flight request (reference parity: the Worker
        protocol's Abort message, src/wasm/worker.rs:38). Honored at the next
        scheduler tick; the completion carries status "cancelled" plus any
        tokens decoded so far. Returns False if the request already
        completed (nothing to cancel)."""
        with self._lock:
            if request_id in self._completions:
                return False
            self._cancelled.add(request_id)
            return True

    def result(self, request_id: int) -> Optional[Completion]:
        return self._completions.get(request_id)

    def pending(self) -> int:
        return self._queue.qsize() + int(self._active.sum())

    def stats(self) -> Dict[str, float]:
        """Cumulative serving counters + instantaneous gauges (the
        observability surface behind ``GET /metrics``; SURVEY §5.5)."""
        with self._lock:
            out = dict(self._counters)
        out["queue_depth"] = self._queue.qsize()
        out["active_slots"] = int(self._active.sum())
        out["n_slots"] = self.n_slots
        done = out["completed_ok"] + out["cancelled"] + out["timeout"]
        out["completed_total"] = done
        out["tokens_per_decode_second"] = (
            out["tokens_generated"] / out["decode_seconds_sum"]
            if out["decode_seconds_sum"] > 0 else 0.0)
        return out

    # -- scheduling core --------------------------------------------------------
    def _fill_slots(self) -> None:
        """Admit queued requests into free slots (prefill their caches)."""
        free = [s for s in range(self.n_slots) if not self._active[s]]
        if not free:
            return
        reqs: List[Request] = []
        now = time.time()
        while len(reqs) < len(free):
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            # cancelled / deadline-expired while queued: complete without
            # ever touching a slot
            if req.request_id in self._cancelled:
                self._complete_unadmitted(req, "cancelled", now)
            elif req.deadline is not None and now > req.deadline:
                self._complete_unadmitted(req, "timeout", now)
            else:
                if req.prompt is None:  # language="auto" (reference
                    # parity: lib.rs transcribe's detect-then-decode path)
                    lang = self.engine.detect_language(req.audio).best[0]
                    req.prompt = self.engine.get_initial_tokens(
                        lang, req.task)
                reqs.append(req)
        if not reqs:
            return
        if not self.batched_admission:
            for slot, req in zip(free, reqs):
                self._admit_one(slot, req)
            return
        # one fused admission per prompt length (prompts in a batch must
        # stack rectangularly); slots assigned in order, leftovers spare
        by_len: Dict[int, List[Tuple[Request, int]]] = {}
        it = iter(free)
        for req in reqs:
            by_len.setdefault(len(req.prompt), []).append((req, next(it)))
        spare = list(it)
        for group in by_len.values():
            self._admit_batch([r for r, _ in group], [s for _, s in group],
                              spare)

    def _admit_batch(self, reqs: List[Request], slots: List[int],
                     spare: List[int]) -> None:
        """Admit ``reqs`` into ``slots`` via fused_admit_step + one donated
        slot scatter; pads the batch up to the smallest admissible bucket
        using ``spare`` free slots as garbage write targets (inactive slots
        — the next occupant's prefill overwrites them)."""
        from ..pipeline import fused_admit_step, pad_audio_batch

        n = len(reqs)
        b = n
        for cand in self.admit_buckets:
            if cand >= n and (self.paged or (cand - n) <= len(spare)):
                b = cand
                break
        pad = b - n
        # paged pads repeat the last real slot (idempotent duplicate
        # writes of identical values — spare slots own no pages)
        targets = (slots + [slots[-1]] * pad if self.paged
                   else slots + spare[:pad])
        eng = self.engine
        n_samples = 2 * self.config.n_audio_ctx * 160
        audio = pad_audio_batch(
            [r.audio for r in reqs] + [reqs[-1].audio] * pad, n_samples)
        prompt = np.asarray([list(r.prompt) for r in reqs]
                            + [list(reqs[-1].prompt)] * pad, np.int32)
        mf = eng.mel_filters
        first, new = fused_admit_step(
            self._params, jnp.asarray(audio), mf._window, mf._basis,
            mf._filters_t, jnp.asarray(prompt), self._bias, self.config,
            compute_dtype=eng._compute_dtype, fidelity=eng._fidelity,
            use_flash=eng._use_flash)
        slots_arr = jnp.asarray(np.asarray(targets, np.int32))
        if self.mesh is not None:
            new = KVCache(*[jax.device_put(c, self._rep) for c in new])
            slots_arr = jax.device_put(slots_arr, self._rep)
        if self.paged:
            from ..model.paged_decode import write_prefills_to_pool
            pk = self._paged_kv
            Pn = prompt.shape[1]
            for slot in slots:
                pk.free(slot)  # clear any previous occupant
                pk.alloc(slot, Pn + 1)  # prompt + first generated token
                pk._lengths[slot] = Pn
            positions = np.arange(Pn)
            pages = np.stack([
                np.asarray(pk._tables[s], np.int32)[positions // PAGE_SIZE]
                for s in targets])  # [b, Pn]
            offs = np.broadcast_to(positions % PAGE_SIZE, (b, Pn))
            pk.k_pool, pk.v_pool = write_prefills_to_pool(
                pk.k_pool, pk.v_pool, new.self_k, new.self_v,
                jnp.asarray(pages), jnp.asarray(offs, jnp.int32))
            self._cache = _scatter_cross_slots(self._cache, slots_arr, new)
        elif getattr(self, "_qf", None):
            self._cache = _scatter_qf_slots(self._cache, slots_arr, new,
                                            int8=self._qf == "int8")
        else:
            self._cache = _scatter_dense_slots(self._cache, slots_arr, new)
        first = np.asarray(first)
        now = time.time()
        eot = eng.specials.eot
        self._counters["admitted"] += len(reqs)
        for i, (req, slot) in enumerate(zip(reqs, slots)):
            P = len(req.prompt)
            self._tokens[slot] = eot
            self._tokens[slot, :P] = req.prompt
            self._tokens[slot, P] = first[i]
            self._pos[slot] = P
            self._active[slot] = True
            self._req[slot] = req
            self._decode_start[slot] = now
            if first[i] == eot:
                self._finish(slot)

    def _admit_one(self, slot: int, req: Request) -> None:
        """Staged per-slot admission (batched_admission off): mel ->
        encode -> prefill as separate dispatches."""
        mel = self.engine.compute_mel(req.audio)
        enc = self.engine.encode(mel)  # [1, S, D]
        # per-slot cross K/V + prompt prefill into the shared cache
        one = init_cache(self.engine.params, enc, self.config,
                         max_len=self.max_len,
                         compute_dtype=self.engine._compute_dtype)
        prompt = jnp.asarray(np.asarray(req.prompt, np.int32)[None])
        logits, one = prefill(self.engine.params, prompt, enc, one,
                              self.config,
                              compute_dtype=self.engine._compute_dtype)
        first = int(np.asarray(
            jnp.argmax(logits[0] + self._bias)))
        P = len(req.prompt)
        if self.paged:
            from ..model.paged_decode import write_prefill_to_pool
            pk = self._paged_kv
            pk.free(slot)  # clear any previous occupant
            pk.alloc(slot, P + 1)  # prompt + the first generated token
            table = np.asarray(pk._tables[slot], np.int32)
            pk.k_pool, pk.v_pool = write_prefill_to_pool(
                pk.k_pool, pk.v_pool, one.self_k, one.self_v, table, P)
            pk._lengths[slot] = P
            self._cache = KVCache(
                self._cache.self_k, self._cache.self_v,
                self._cache.cross_k.at[:, slot].set(one.cross_k[:, 0]),
                self._cache.cross_v.at[:, slot].set(one.cross_v[:, 0]))
        elif getattr(self, "_qf", None):
            from ..ops.decode_attention import quantize_rows
            c = self._cache
            T0 = one.self_k.shape[2]
            S0 = one.cross_k.shape[2]
            if self._qf == "int8":
                sk, sks = quantize_rows(one.self_k)
                sv, svs = quantize_rows(one.self_v)
                ck, cks = quantize_rows(one.cross_k)
                cv, cvs = quantize_rows(one.cross_v)
                c = c._replace(
                    self_ks=c.self_ks.at[:, slot, :T0].set(sks[:, 0]),
                    self_vs=c.self_vs.at[:, slot, :T0].set(svs[:, 0]),
                    cross_ks=c.cross_ks.at[:, slot, :S0].set(cks[:, 0]),
                    cross_vs=c.cross_vs.at[:, slot, :S0].set(cvs[:, 0]))
            else:
                sk, sv = one.self_k, one.self_v
                ck, cv = one.cross_k, one.cross_v
            self._cache = c._replace(
                self_kq=c.self_kq.at[:, slot, :T0].set(sk[:, 0]),
                self_vq=c.self_vq.at[:, slot, :T0].set(sv[:, 0]),
                cross_kq=c.cross_kq.at[:, slot, :S0].set(ck[:, 0]),
                cross_vq=c.cross_vq.at[:, slot, :S0].set(cv[:, 0]))
        else:
            if self.mesh is not None:
                one = KVCache(*[jax.device_put(c, self._rep)
                                for c in one])
            self._cache = KVCache(
                self._cache.self_k.at[:, slot].set(one.self_k[:, 0]),
                self._cache.self_v.at[:, slot].set(one.self_v[:, 0]),
                self._cache.cross_k.at[:, slot].set(one.cross_k[:, 0]),
                self._cache.cross_v.at[:, slot].set(one.cross_v[:, 0]))
        self._tokens[slot] = self.engine.specials.eot
        self._tokens[slot, :P] = req.prompt
        self._tokens[slot, P] = first
        self._pos[slot] = P
        self._active[slot] = True
        self._req[slot] = req
        self._decode_start[slot] = time.time()
        self._counters["admitted"] += 1
        if first == self.engine.specials.eot:
            self._finish(slot)

    def _complete_unadmitted(self, req: Request, status: str,
                             now: float) -> None:
        """Finish a request that never reached a slot (cancelled/expired in
        the queue): no tokens, queue time only."""
        with self._lock:
            self._completions[req.request_id] = Completion(
                request_id=req.request_id, tokens=[],
                queue_seconds=now - req.submitted_at,
                decode_seconds=0.0, status=status)
            self._cancelled.discard(req.request_id)
            self._counters[status] += 1
            self._counters["queue_seconds_sum"] += now - req.submitted_at

    def _finish(self, slot: int, status: str = "ok") -> None:
        req = self._req[slot]
        if req is None:
            return
        P = len(req.prompt)
        toks = self._tokens[slot]
        # length: prompt + generated up to (and incl.) EOT
        end = self._pos[slot] + 1
        seq = toks[:end].tolist()
        now = time.time()
        queue_s = self._decode_start[slot] - req.submitted_at
        decode_s = now - self._decode_start[slot]
        with self._lock:
            self._completions[req.request_id] = Completion(
                request_id=req.request_id,
                tokens=[int(t) for t in seq],
                queue_seconds=queue_s,
                decode_seconds=decode_s, status=status, prompt_len=P)
            self._cancelled.discard(req.request_id)
            c = self._counters
            c["completed_ok" if status == "ok" else status] += 1
            c["tokens_generated"] += max(0, int(end) - P)
            c["queue_seconds_sum"] += queue_s
            c["decode_seconds_sum"] += decode_s
        self._active[slot] = False
        self._req[slot] = None
        if self.paged:
            self._paged_kv.free(slot)

    def step(self) -> int:
        """One scheduler tick: admit, then advance every active slot by one
        token in a single fused device step. Returns number of active slots.
        """
        # honor aborts/deadlines on in-flight slots before spending a
        # device dispatch on them
        if self._cancelled or any(
                r is not None and r.deadline is not None for r in self._req):
            now = time.time()
            for slot in range(self.n_slots):
                req = self._req[slot]
                if req is None or not self._active[slot]:
                    continue
                if req.request_id in self._cancelled:
                    self._finish(slot, status="cancelled")
                elif req.deadline is not None and now > req.deadline:
                    self._finish(slot, status="timeout")
        self._fill_slots()
        if not self._active.any():
            return 0
        self._counters["ticks"] += 1

        token = jnp.asarray(self._tokens[np.arange(self.n_slots),
                                         self._pos])
        pos = jnp.asarray(self._pos)
        if self.mesh is not None:
            token = jax.device_put(token, self._slot_ax0)
            pos = jax.device_put(pos, self._slot_ax0)
        K = self.steps_per_tick
        if self.paged:
            toks = self._paged_tick(token, pos, K)
        else:
            # one fused dispatch advancing all slots by K tokens; on a
            # mesh GSPMD splits the slot batch over dp automatically
            toks, self._cache = decode_steps_multi_jit(
                self._params, token, pos, self._bias, self._cache,
                self.config, n_steps=K,
                compute_dtype=self.engine._compute_dtype,
                qd=getattr(self, "_qd", None))
            toks = np.asarray(toks)  # [B, K]

        eot = self.engine.specials.eot
        for slot in range(self.n_slots):
            if not self._active[slot]:
                continue
            req = self._req[slot]
            limit = min(len(req.prompt) + req.max_tokens, self.max_len)
            for k in range(K):
                self._pos[slot] += 1
                p = self._pos[slot]
                if p >= self.max_len:
                    self._pos[slot] = self.max_len - 1
                    self._finish(slot)
                    break
                self._tokens[slot, p] = toks[slot, k]
                if toks[slot, k] == eot or p + 1 >= limit:
                    self._finish(slot)
                    break
        return int(self._active.sum())

    def _paged_tick(self, token, pos, n_steps: int) -> np.ndarray:
        """Advance all slots by ``n_steps`` over the shared page pool."""
        from ..model.paged_decode import paged_decode_steps_jit
        pk = self._paged_kv
        # host: pre-extend each active slot's table to cover the new tokens
        tables = np.full((self.n_slots, self._p_max), self._garbage_page,
                         dtype=np.int32)
        used = 1
        for slot in range(self.n_slots):
            if not self._active[slot]:
                continue
            pk.extend(slot, n_steps)
            t = pk._tables[slot]
            tables[slot, : len(t)] = t[: self._p_max]
            used = max(used, min(len(t), self._p_max))
        # bucket the table width to the next power of two: the kernel grid
        # covers exactly the pages in use (a max_len-wide grid would DMA
        # every slot's full table even for 1-page sequences), while the
        # bucketing keeps the number of compiled variants logarithmic
        width = 1
        while width < used:
            width *= 2
        width = min(width, self._p_max)
        toks, pk.k_pool, pk.v_pool = paged_decode_steps_jit(
            self.engine.params, token, pos, self._bias,
            jnp.asarray(tables[:, :width]), pk.k_pool, pk.v_pool,
            self._cache.cross_k, self._cache.cross_v, self.config,
            n_steps=n_steps, compute_dtype=self.engine._compute_dtype)
        return np.asarray(toks)

    def run_until_drained(self, max_steps: int = 100_000) -> None:
        for _ in range(max_steps):
            if self.step() == 0 and self._queue.empty():
                return

    # -- background serving thread ------------------------------------------------
    # NOTE: verified working on standard backends (CPU/TPU). Remotely
    # tunneled devices (axon relay) may not support device dispatch from a
    # secondary thread — use the synchronous step()/run_until_drained() loop
    # (or drive step() from your own event loop) in that environment.
    def start(self) -> None:
        self._running = True

        def loop():
            while self._running:
                try:
                    if self.step() == 0 and self._queue.empty():
                        time.sleep(0.001)
                except Exception:  # noqa: BLE001 — interpreter teardown races
                    if self._running:
                        raise
                    return

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def decode_text(self, completion: Completion,
                    prompt_len: Optional[int] = None) -> str:
        if prompt_len is None:
            prompt_len = completion.prompt_len
        gen = completion.tokens[prompt_len:]
        return self.engine.tokenizer.decode_with_options(gen, skip_special=True)
