"""Mesh/sharding tests on the 8-virtual-device CPU mesh.

(SURVEY.md §4 test-strategy translation (d): device_count-agnostic tests via
xla_force_host_platform_device_count.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from helpers import make_hf_twin, random_mel, small_config
from whisper_apr_tpu.model.decoder import decoder_forward, greedy_generate
from whisper_apr_tpu.model.encoder import encode
from whisper_apr_tpu.model.params import params_from_hf_model
from whisper_apr_tpu.parallel.mesh import (
    make_mesh,
    param_specs,
    replicate,
    shard_batch,
    shard_params,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cfg():
    return small_config()


@pytest.fixture(scope="module")
def setup(cfg):
    hf = make_hf_twin(cfg)
    params = params_from_hf_model(hf, cfg)
    mel = random_mel(cfg, batch=8)
    return params, mel


class TestMesh:
    @needs_8
    def test_make_mesh_shapes(self):
        m = make_mesh(8, tp=2)
        assert m.shape == {"dp": 4, "tp": 2}
        m = make_mesh(8, tp=1)
        assert m.shape == {"dp": 8, "tp": 1}
        with pytest.raises(ValueError):
            make_mesh(8, dp=3, tp=2)

    @needs_8
    def test_make_mesh_subset_of_visible_devices(self):
        """n_devices SMALLER than the visible pool must slice, not grab
        all devices (mutation survivor: `n_devices or len(devices)`
        flipped to `and` silently used every visible device)."""
        m = make_mesh(4, tp=2)
        assert m.shape == {"dp": 2, "tp": 2}
        assert m.devices.size == 4
        # and with no count at all: every visible device
        m = make_mesh(tp=2)
        assert m.devices.size == len(jax.devices())

    @needs_8
    def test_param_specs_match_tree(self, setup, cfg):
        params, _ = setup
        specs = param_specs(params)
        # same tree structure
        jax.tree_util.tree_map(lambda a, b: None, params, specs)
        assert specs["decoder"]["blocks"]["fc1"]["w"] == P(None, None, "tp")
        assert specs["decoder"]["blocks"]["fc2"]["w"] == P(None, "tp", None)
        assert specs["decoder"]["token_emb"] == P("tp", None)

    @needs_8
    def test_sharded_forward_matches_single(self, setup, cfg):
        """dp=4 x tp=2 sharded encoder+decoder == unsharded, bit-close."""
        params, mel = setup
        tokens = np.random.default_rng(0).integers(
            0, cfg.n_vocab, size=(8, 5)).astype(np.int32)

        ref_enc = encode(params, jnp.asarray(mel), cfg)
        ref_logits = decoder_forward(params, jnp.asarray(tokens),
                                     ref_enc, cfg)

        mesh = make_mesh(8, tp=2)
        sp = shard_params(params, mesh)
        smel = shard_batch(jnp.asarray(mel), mesh)
        stok = shard_batch(jnp.asarray(tokens), mesh)

        @jax.jit
        def fwd(p, m, t):
            e = encode(p, m, cfg)
            return decoder_forward(p, t, e, cfg)

        with mesh:
            out = fwd(sp, smel, stok)
        assert np.abs(np.asarray(out) - np.asarray(ref_logits)).max() < 1e-3

    @needs_8
    def test_sharded_greedy_matches_single(self, setup, cfg):
        """The full on-device greedy loop under dp x tp sharding."""
        params, mel = setup
        eot = cfg.n_vocab - 1
        prompt = jnp.asarray(np.full((8, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)

        enc = encode(params, jnp.asarray(mel), cfg)
        ref, ref_len, _, _ = greedy_generate(params, enc, prompt, bias, eot=eot,
                                       config=cfg, max_len=12, prompt_len=3)

        mesh = make_mesh(8, tp=2)
        sp = shard_params(params, mesh)
        smel = shard_batch(jnp.asarray(mel), mesh)
        with mesh:
            enc_s = encode(sp, smel, cfg)
            out, out_len, _, _ = greedy_generate(
                sp, enc_s, shard_batch(prompt, mesh),
                replicate(bias, mesh), eot=eot, config=cfg,
                max_len=12, prompt_len=3)
        assert np.array_equal(np.asarray(ref), np.asarray(out))
        assert np.array_equal(np.asarray(ref_len), np.asarray(out_len))

    @needs_8
    def test_dp_only_mesh(self, setup, cfg):
        """Pure data parallelism (tp=1) replicates weights."""
        params, mel = setup
        mesh = make_mesh(8, tp=1)
        sp = shard_params(params, mesh, shard_tp=False)
        smel = shard_batch(jnp.asarray(mel), mesh)
        with mesh:
            out = encode(sp, smel, cfg)
        ref = encode(params, jnp.asarray(mel), cfg)
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-3
