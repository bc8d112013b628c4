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


def _warp_logits(logits: jnp.ndarray, temps: jnp.ndarray,
                 top_ps: jnp.ndarray) -> jnp.ndarray:
    """Temperature + top-p warp of (B, W1, V) verify logits, the same
    warp the plain tick's `_sample_token_per_slot` applies — speculative
    sampling must target the identical warped distribution to be exact."""
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None, None]
    sl = jnp.sort(scaled, axis=-1)[..., ::-1]
    sp = jax.nn.softmax(sl, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    k = jnp.sum(cum < top_ps[:, None, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sl, k, axis=-1)
    return jnp.where(scaled < cutoff, -1e30, scaled)


def accept_window_sampled(prop: jnp.ndarray, n_prop: jnp.ndarray,
                          logits_all: jnp.ndarray, rng: jax.Array,
                          temps: jnp.ndarray, top_ps: jnp.ndarray):
    """Exact speculative SAMPLING for a deterministic (prompt-lookup)
    draft; greedy rows (temp <= 0) reduce to `accept_window`'s argmax
    rule bit-for-bit.

    The draft distribution is a point mass q = δ(x_i), so the classic
    rejection rule (Leviathan et al. '23 §3.1 / Chen et al. '23)
    specializes to: accept x_i with probability p_i(x_i) under the
    warped verify distribution p_i; at the first rejection, draw the
    correction from norm(max(p − q, 0)) — p with x_i's mass removed. If
    every proposal is accepted (or none was made), the correction is a
    fresh sample from p at the next position. The marginal distribution
    of emitted tokens equals plain autoregressive sampling from the
    warped p exactly (tests/test_scheduler.py Monte-Carlo check).

    prop (B, W) int32, n_prop (B,), logits_all (B, W+1, V) f32.
    Returns (p (B,) accepted count, corr (B,) correction token)."""
    b, width = prop.shape
    iota = jnp.arange(width)[None, :]
    in_window = iota < n_prop[:, None]

    greedy_preds = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
    ok_greedy = (prop == greedy_preds[:, :width]) & in_window

    warped = _warp_logits(logits_all, temps, top_ps)
    probs = jax.nn.softmax(warped, axis=-1)                    # (B, W1, V)
    p_tok = jnp.take_along_axis(
        probs[:, :width, :], jnp.maximum(prop, 0)[..., None],
        axis=-1)[..., 0]                                       # (B, W)
    r_acc, r_corr = jax.random.split(rng)
    u = jax.random.uniform(r_acc, (b, width))
    ok_sample = (u < p_tok) & in_window

    sampling = temps > 0
    ok = jnp.where(sampling[:, None], ok_sample, ok_greedy)
    p = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)

    # correction distribution: position p, minus the rejected token's
    # mass when a rejection happened (rejection implies p(x) <= u < 1, so
    # leftover mass is strictly positive; the epsilon only guards fp)
    probs_p = jnp.take_along_axis(
        probs, p[:, None, None], axis=1)[:, 0]                 # (B, V)
    rejected = p < n_prop
    rej_tok = jnp.take_along_axis(
        prop, jnp.minimum(p, width - 1)[:, None], axis=1)[:, 0]
    keep = jnp.arange(probs.shape[-1])[None, :] != rej_tok[:, None]
    dist = jnp.where(rejected[:, None] & ~keep, 0.0, probs_p)
    corr_sampled = jax.random.categorical(
        r_corr, jnp.log(dist + 1e-30), axis=-1).astype(jnp.int32)
    corr_greedy = jnp.take_along_axis(
        greedy_preds, p[:, None], axis=1)[:, 0]
    corr = jnp.where(sampling, corr_sampled, corr_greedy)
    return p.astype(jnp.int32), corr.astype(jnp.int32)


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
