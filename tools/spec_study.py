"""Speculative-decode value study: measure acceptance, model the win.

Speculative decode is token-exact by construction (tests pin that); the
open question from round 2 was whether it ever WINS — with random-init
weights the early-exit draft's acceptance rate is meaningless. This study
measures acceptance on weight ensembles with controlled depth structure
and converts it to a net ms/token using the measured large-v3 step costs.

Depth structure: after the first ``draft_layers`` layers, every residual
contribution (attention o-proj, fc2) is scaled by ``gamma``. gamma=1 is
the unstructured random ensemble; gamma->0 approximates a network whose
late layers refine rather than rewrite the residual stream — the regime
trained Whisper sits in when the draft depth captures most of the
decision (the premise behind early-exit speculation).

Cost model (measured on large-v3 int8, BENCH_NOTES round-2c):
  c_full  = 1.85 ms   full decode step
  c_draft ~ c_full * (draft_layers/L) + c_vocab (0.09 ms)
  verify pass over k+1 positions ~ c_full (one weight read, GEMM-shaped)
  ms/token = (k * c_draft + c_full) / E,  E = accepted + 1 per round
Break-even: E > 1 + k * c_draft/c_full.

Usage: python tools/spec_study.py   (CPU fine — acceptance is a numeric
property of the weights, not the device)
"""

import sys

import numpy as np

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def structured_params(cfg, gamma: float, draft_layers: int, seed: int = 0):
    """init_params with depth-damped late-layer residual contributions."""
    from whisper_apr_tpu.model.params import init_params
    p = init_params(cfg, seed=seed)
    blocks = p["decoder"]["blocks"]
    L = cfg.n_text_layer

    def damp(a):
        a = np.asarray(a)
        out = a.copy()
        out[draft_layers:] = out[draft_layers:] * gamma
        return jnp.asarray(out)

    for grp in ("self_attn", "cross_attn"):
        blocks[grp]["o_w"] = damp(blocks[grp]["o_w"])
        blocks[grp]["o_b"] = damp(blocks[grp]["o_b"])
    blocks["fc2"]["w"] = damp(blocks["fc2"]["w"])
    blocks["fc2"]["b"] = damp(blocks["fc2"]["b"])
    return p


def measure_acceptance(cfg, params, draft_tokens: int, draft_layers: int,
                       n_clips: int = 4, max_len: int = 48):
    """Mean accepted-per-round E and per-round acceptance distribution."""
    from whisper_apr_tpu.inference.speculative import (
        speculative_greedy_generate)
    rng = np.random.default_rng(0)
    eot = cfg.n_vocab - 1
    rounds = 0
    accepted = 0
    emitted = 0
    for i in range(n_clips):
        enc = jnp.asarray(rng.normal(
            0, 0.5, (1, cfg.n_audio_ctx, cfg.n_text_state)
        ).astype(np.float32))
        prompt = jnp.asarray(np.full((1, 3), 5, np.int32))
        bias = jnp.zeros(cfg.n_vocab, jnp.float32)
        res = speculative_greedy_generate(
            params, enc, prompt, bias, eot, cfg, max_len=max_len,
            prompt_len=3, draft_tokens=draft_tokens,
            draft_layers=draft_layers)
        rounds += int(np.asarray(res.n_verify_passes))
        accepted += int(np.asarray(res.n_accepted))
        emitted += int(np.asarray(res.lengths)[0]) - 3
    E = (accepted + rounds) / max(rounds, 1)   # accepted + 1 per round
    return E, accepted / max(emitted, 1)


def net_ms_per_token(E: float, k: int, L: int, draft_layers: int,
                     c_full: float = 1.85, c_vocab: float = 0.09):
    c_draft = c_full * draft_layers / L + c_vocab
    return (k * c_draft + c_full) / E, c_draft


def main():
    from whisper_apr_tpu.config import ModelConfig
    cfg = ModelConfig(
        model_type="tiny", n_vocab=512, n_audio_ctx=32, n_audio_state=128,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=64, n_text_state=128,
        n_text_head=4, n_text_layer=8, n_mels=80)
    L = cfg.n_text_layer
    Ld = L // 4
    k = 4
    print(f"L={L} draft_layers={Ld} draft_tokens={k} "
          f"(break-even E > {1 + k * (Ld / L + 0.05):.2f})")
    print(f"{'gamma':>6} {'E/round':>8} {'acc%':>6} {'ms/tok':>8} "
          f"{'vs 1.85':>8}")
    for gamma in (1.0, 0.5, 0.2, 0.1, 0.05):
        params = structured_params(cfg, gamma, Ld)
        E, acc = measure_acceptance(cfg, params, k, Ld)
        ms, c_d = net_ms_per_token(E, k, L, Ld)
        print(f"{gamma:6.2f} {E:8.2f} {100*acc:6.1f} {ms:8.2f} "
              f"{'WIN' if ms < 1.85 else 'lose':>8}")


if __name__ == "__main__":
    main()
