"""Whisper timestamp decoding grammar, applied inside the jitted decode loop.

OpenAI's ApplyTimestampRules (the behavior whisper.cpp replicates and the
reference's timestamp extraction assumes, src/timestamps/):

  1. the FIRST sampled token must be a timestamp, capped at
     ``max_initial_timestamp`` (1.0 s);
  2. timestamps come in pairs: after a lone timestamp the next token must be
     a timestamp or EOT; after a timestamp pair the next must be text;
  3. timestamps never decrease;
  4. when the total probability mass on timestamp tokens exceeds the best
     text token's, a timestamp must be sampled.

Everything is expressed as [B, V] masks built from a small per-sequence
state, so the rules run inside ``lax.while_loop`` with no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG = jnp.float32(jnp.finfo(jnp.float32).min)
MAX_INITIAL_TIMESTAMP_STEPS = 50  # 1.0 s at 20 ms per step


class TimestampState(NamedTuple):
    """Per-sequence grammar state."""

    last_was_ts: jnp.ndarray      # [B] bool — previous token was a timestamp
    penult_was_ts: jnp.ndarray    # [B] bool — the one before was too
    max_ts: jnp.ndarray           # [B] int32 — highest timestamp id emitted
    n_sampled: jnp.ndarray        # [B] int32 — tokens sampled so far


def init_state(batch: int) -> TimestampState:
    return TimestampState(
        last_was_ts=jnp.zeros(batch, bool),
        penult_was_ts=jnp.zeros(batch, bool),
        max_ts=jnp.zeros(batch, jnp.int32),
        n_sampled=jnp.zeros(batch, jnp.int32))


def apply_rules(logits: jnp.ndarray, state: TimestampState,
                timestamp_base: int, eot: int,
                is_first: jnp.ndarray) -> jnp.ndarray:
    """Mask [B, V] logits per the grammar. ``is_first`` [B] marks the first
    sampled position of each sequence."""
    B, V = logits.shape
    ids = jnp.arange(V)
    is_ts = ids >= timestamp_base          # [V]
    is_text = jnp.logical_and(ids < timestamp_base, ids != eot)

    mask = jnp.zeros((B, V), jnp.float32)

    # rule 1: first token must be a timestamp within the initial cap
    cap = timestamp_base + MAX_INITIAL_TIMESTAMP_STEPS
    first_block = jnp.where(is_text[None, :] | (ids[None, :] == eot)
                            | (ids[None, :] > cap), NEG, 0.0)
    mask = mask + jnp.where(is_first[:, None], first_block, 0.0)

    # OpenAI convention: with fewer than 2 sampled tokens the penultimate
    # counts as a timestamp, so the opening <|t0|> is followed by TEXT
    penult_eff = jnp.logical_or(state.penult_was_ts, state.n_sampled < 2)
    # rule 2a: segment-closing lone timestamp (text <|t1|>) -> next must be
    # a timestamp or EOT (forces the <|t1|><|t2|> boundary pair)
    lone = jnp.logical_and(state.last_was_ts, ~penult_eff)
    mask = mask + jnp.where(
        lone[:, None] & is_text[None, :], NEG, 0.0)
    # rule 2b: after a boundary pair (or the opening timestamp) -> text
    pair = jnp.logical_and(state.last_was_ts, penult_eff)
    mask = mask + jnp.where(
        pair[:, None] & is_ts[None, :], NEG, 0.0)

    # rule 3: monotonic + nonzero-length segments (OpenAI's
    # ``timestamps[-1] + 1`` branch): immediately after a lone closing
    # timestamp the pair partner may REPEAT it (mask ids < last); everywhere
    # else the next timestamp must strictly increase (mask ids <= last).
    # max_ts == 0 means no timestamp sampled yet -> no constraint.
    has_ts = state.max_ts > 0
    min_allowed = state.max_ts + jnp.where(lone, 0, 1).astype(jnp.int32)
    below = ids[None, :] < jnp.where(has_ts, min_allowed, 0)[:, None]
    mask = mask + jnp.where(below & is_ts[None, :], NEG, 0.0)

    masked = logits + mask

    # rule 4: if P(any timestamp) > max P(any non-timestamp incl. EOT),
    # force a timestamp by masking ALL ids below timestamp_base (OpenAI:
    # ``logits[k, : timestamp_begin] = -inf``).
    below_ts = ids < timestamp_base                          # [V], incl. EOT
    logp = jax.nn.log_softmax(masked, axis=-1)
    ts_lse = jax.nn.logsumexp(
        jnp.where(is_ts[None, :], logp, NEG), axis=-1)       # [B]
    text_max = jnp.max(jnp.where(below_ts[None, :], logp, NEG), axis=-1)
    force_ts = ts_lse > text_max
    mask4 = jnp.where(force_ts[:, None] & below_ts[None, :], NEG, 0.0)
    return masked + mask4


def update_state(state: TimestampState, token: jnp.ndarray,
                 timestamp_base: int) -> TimestampState:
    """Advance the grammar state after sampling ``token`` [B]."""
    tok_is_ts = token >= timestamp_base
    return TimestampState(
        last_was_ts=tok_is_ts,
        penult_was_ts=state.last_was_ts,
        max_ts=jnp.where(tok_is_ts,
                         jnp.maximum(state.max_ts, token.astype(jnp.int32)),
                         state.max_ts),
        n_sampled=state.n_sampled + 1)
