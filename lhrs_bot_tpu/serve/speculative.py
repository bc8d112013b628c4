"""Device-side prompt-lookup speculation for the batched scheduler.

The single-sequence engine already does draft-free speculative decoding
(`GenerationEngine.stream(speculative=N)`): propose the tokens that
followed the most recent occurrence of the last n-gram, verify the whole
window in one continuation-prefill dispatch, keep the agreeing prefix.
There the proposal runs on the host between dispatches.

For the continuous-batching scheduler the host round-trip per round would
defeat the multi-token tick (ticks exist to amortize the ~20-40 ms remote
dispatch latency), so here the ENTIRE speculative loop is on-device: the
proposal is a vectorized n-gram match over a per-slot token-history
buffer, the verify is `llama_prefill_continue(return_all_logits=True)`,
and acceptance/EOS/budget freezing happen inside one `lax.scan` over
rounds — a whole k-round speculative tick is ONE dispatch, like the plain
k-step tick, but each round can advance a slot by up to width+1 tokens
for a single weight read. Greedy output is token-for-token identical to
the plain tick (speculation only ever accepts tokens the model would have
produced); the host remains canonical for the history (re-uploaded per
tick — (B, S) int32 is ~70 KB, noise next to a 7B weight read).

Replaces nothing in the reference (it serves one user on one HF generate
thread, /root/reference/lhrs_webui.py:233-239); this is TPU-serving
capability beyond reference surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def propose_from_history(hist: jnp.ndarray, hist_len: jnp.ndarray, *,
                         ngram: int, width: int, min_token: int = 3):
    """Vectorized prompt-lookup proposal.

    For each row: find the most recent position where the last `ngram`
    tokens of `hist[:hist_len]` occurred earlier (the occurrence must end
    strictly before the history end), and propose the tokens that
    followed it, truncated at the first special token (< `min_token`,
    i.e. pad/BOS/EOS must never be proposed — the engine's host-side
    `_propose` enforces the same invariant by rejecting such windows).

    hist: (B, S) int32 token history, rows valid up to hist_len.
    Returns (proposals (B, width) int32, n_prop (B,) int32); rows with no
    usable match get n_prop = 0. Unlike the host version (which falls
    back to older occurrences when the newest one's continuation contains
    a special token) this truncates the newest occurrence's continuation
    — a proposal-quality difference only; verification makes any proposal
    safe.
    """
    b, s = hist.shape
    pos_pat = hist_len[:, None] - ngram + jnp.arange(ngram)[None, :]
    pat = jnp.take_along_axis(hist, jnp.maximum(pos_pat, 0), axis=1)
    p = s - ngram + 1
    match = jnp.ones((b, p), bool)
    for j in range(ngram):
        match = match & (
            jax.lax.dynamic_slice_in_dim(hist, j, p, axis=1)
            == pat[:, j:j + 1])
    pos = jnp.arange(p)[None, :]
    valid = (match
             & (pos + ngram <= hist_len[:, None] - 1)
             & (hist_len[:, None] >= ngram + 1))
    best = jnp.max(jnp.where(valid, pos, -1), axis=1)           # (B,)
    has = best >= 0
    histp = jnp.pad(hist, ((0, 0), (0, width)))
    follow = jax.vmap(
        lambda h, st: jax.lax.dynamic_slice_in_dim(h, st, width)
    )(histp, jnp.maximum(best, 0) + ngram)                      # (B, W)
    avail = jnp.clip(hist_len - (best + ngram), 0, width)
    iota = jnp.arange(width)[None, :]
    bad = (follow < min_token) & (iota < avail[:, None])
    first_bad = jnp.min(jnp.where(bad, iota, width), axis=1)
    n = jnp.where(has, jnp.minimum(avail, first_bad), 0)
    return follow.astype(jnp.int32), n.astype(jnp.int32)


def accept_window(prop: jnp.ndarray, n_prop: jnp.ndarray,
                  preds: jnp.ndarray):
    """Greedy acceptance: longest prefix of `prop` agreeing with the
    verify logits' argmaxes, plus the correction token.

    prop (B, W), n_prop (B,), preds (B, W+1) — preds[:, i] is the model's
    next token after window position i (position 0 is the slot's last
    real token). Returns (p (B,) accepted proposal count, corr (B,) the
    token after the accepted prefix)."""
    width = prop.shape[1]
    iota = jnp.arange(width)[None, :]
    agree = (prop == preds[:, :width]) & (iota < n_prop[:, None])
    p = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
    corr = jnp.take_along_axis(preds, p[:, None], axis=1)[:, 0]
    return p.astype(jnp.int32), corr.astype(jnp.int32)
