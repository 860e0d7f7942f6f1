"""Multi-host (DCN) dispatch: a REAL 2-process jax.distributed run on CPU.

Two worker processes join a coordination service, build a global
(dp=4, tp=2) mesh over 2x4 virtual devices, shard params with the same
Megatron specs as single-host, assemble a global batch from per-process
rows, and run the full sharded pipeline step. The test asserts both
processes complete and that their outputs equal a single-process reference
on the identical global batch (SURVEY.md §5.8 / §7 phase 8).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env() -> dict:
    env = dict(os.environ)
    # each worker forces its own CPU platform + device count; strip any
    # inherited single-process forcing from conftest
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), _ROOT) if p)
    return env


@pytest.mark.timeout(300)
def test_two_process_dcn_pipeline_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    n_proc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(n_proc), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=_clean_env())
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT pid="):
                head, vals = line.split(" local=")
                pid = int(head.split("pid=")[1])
                results[pid] = [int(v) for v in vals.split(",")]
    assert set(results) == {0, 1}
    # each process got its own 4 rows back
    assert len(results[0]) == 4 and len(results[1]) == 4

    # single-process reference over the SAME global batch
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model.decoder import decoder_forward
    from whisper_apr_tpu.model.encoder import encode
    from whisper_apr_tpu.model.params import init_params

    cfg = ModelConfig(
        model_type="tiny", n_vocab=512, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2, n_mels=80)
    params = init_params(cfg, seed=0)

    mels, toks = [], []
    for pid in range(n_proc):
        rng = np.random.default_rng(100 + pid)
        mels.append(rng.normal(
            size=(4, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
        toks.append(rng.integers(0, cfg.n_vocab, size=(4, 8)).astype(np.int32))
    mel = jnp.asarray(np.concatenate(mels))
    tokens = jnp.asarray(np.concatenate(toks))
    enc_out = encode(params, mel, cfg)
    logits = decoder_forward(params, tokens, enc_out, cfg)
    want = np.asarray(jnp.argmax(logits[:, -1], axis=-1))

    got = np.asarray(results[0] + results[1])
    assert np.array_equal(got, want), (got, want)
