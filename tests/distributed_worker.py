"""Worker process for the 2-process DCN test (launched by
tests/test_distributed.py). Runs the full sharded pipeline step on a global
mesh spanning both processes and prints its local next-token slice."""

import os
import sys


def main() -> None:
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    # record package-line coverage for the parent harness (tools/coverage)
    from tools.subproc_coverage import maybe_enable
    maybe_enable()
    from whisper_apr_tpu.parallel.distributed import (
        host_local_batch_to_global, init_distributed, make_multihost_mesh,
        process_slice, shard_params)

    init_distributed(coord, n_proc, pid, local_device_count=4)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model.decoder import decoder_forward
    from whisper_apr_tpu.model.encoder import encode
    from whisper_apr_tpu.model.params import init_params

    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 4 * n_proc

    cfg = ModelConfig(
        model_type="tiny", n_vocab=512, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2, n_mels=80)
    params = init_params(cfg, seed=0)

    mesh = make_multihost_mesh(tp=2)
    assert mesh.shape["dp"] == 2 * n_proc and mesh.shape["tp"] == 2
    params = shard_params(params, mesh, shard_tp=True)

    # every process contributes its own rows (deterministic by pid)
    rows_per_proc = 4
    rng = np.random.default_rng(100 + pid)
    mel_local = rng.normal(
        size=(rows_per_proc, 2 * cfg.n_audio_ctx, cfg.n_mels)
    ).astype(np.float32)
    tok_local = rng.integers(
        0, cfg.n_vocab, size=(rows_per_proc, 8)).astype(np.int32)

    mel = host_local_batch_to_global(mel_local, mesh)
    tokens = host_local_batch_to_global(tok_local, mesh)

    @jax.jit
    def sharded_step(params, mel, tokens):
        enc = encode(params, mel, cfg)
        logits = decoder_forward(params, tokens, enc, cfg)
        return jnp.argmax(logits[:, -1], axis=-1)

    with mesh:
        out = sharded_step(params, mel, tokens)
        out.block_until_ready()

    local = process_slice(out)
    print(f"RESULT pid={pid} local={','.join(str(int(t)) for t in local)}",
          flush=True)


if __name__ == "__main__":
    main()
