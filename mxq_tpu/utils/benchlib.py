"""Reliable on-TPU timing over the tunneled runtime.

The device tunnel has ~20-30ms request RTT, async acks that make
block_until_ready unreliable, and apparent caching of repeated identical
executions. Protocol that measures true device time:

  * iterate the op inside ONE compiled fori_loop (dynamic trip count),
  * vary the input between calls so nothing is served from cache,
  * force materialization by fetching a small output slice,
  * difference two trip counts to cancel the fixed RTT.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_op(step, x0, iters_lo=None, iters_hi=None, reps=3,
            target_s=0.05, const=None):
    """Median seconds per execution of ``step`` (a pure array->array fn).

    ``const``: a pytree of large arrays (e.g. model params) passed through as
    a jit ARGUMENT, never perturbed or copied. Do NOT close big arrays over
    ``step`` — jit would embed them as compile-time constants (catastrophic
    compile times). If const is not None, step is called as step(const, x).
    """

    @jax.jit
    def many(c, x, n):
        body = (lambda i, x: step(c, x)) if c is not None else (
            lambda i, x: step(x))
        return jax.lax.fori_loop(0, n, body, x)

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.ravel()[:8])

    if iters_hi is None:
        # calibrate so the hi run spends ~target_s of device time
        fetch(many(const, x0, 3))
        t0 = time.perf_counter(); fetch(many(const, x0, 64)); t64 = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(many(const, x0, 3)); t3 = time.perf_counter() - t0
        est = max((t64 - t3) / 61, 1e-7)
        iters_hi = max(16, min(4096, int(target_s / est)))
        iters_lo = max(2, iters_hi // 8)

    fetch(many(const, x0, iters_lo))
    fetch(many(const, x0, iters_hi))
    def perturb(x0, eps):
        # vary float leaves so the relay can't serve cached results;
        # leave integer leaves (token ids, positions) untouched
        return jax.tree.map(
            lambda a: a * (1.0 + eps) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, x0)

    def one_rep(r):
        x = perturb(x0, 0.01 * (r + 1))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        fetch(many(const, x, iters_lo))
        t_lo = time.perf_counter() - t0
        x = perturb(x0, 0.01 * (r + 11))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        fetch(many(const, x, iters_hi))
        t_hi = time.perf_counter() - t0
        return (t_hi - t_lo) / (iters_hi - iters_lo)

    ts = [one_rep(r) for r in range(reps)]
    # an RTT spike on the LO run makes the difference negative (observed
    # -165 us "kernel times" through the relay) — those samples carry no
    # information; drop them and re-measure rather than let them poison
    # the median
    good = [t for t in ts if t > 0]
    extra = 0
    while not good and extra < 2 * reps:
        extra += 1
        t = one_rep(reps + extra)
        if t > 0:
            good.append(t)
    return float(np.median(good)) if good else float("inf")


def fold_to_input(y, k: int, dtype=None):
    """Fold a [B, O] matmul output back to an x-shaped [B, k] carry for
    time_op's step contract, CONSUMING every output column — a plain slice
    lets XLA dead-code-eliminate the unused part of the benched matmul
    (observed as an impossible "2 TB/s" bf16 baseline in round 1)."""
    import jax.numpy as jnp
    o = y.shape[1]
    pad_to = -(-o // k) * k
    folded = jnp.pad(y, ((0, 0), (0, pad_to - o))).reshape(
        y.shape[0], pad_to // k, k).sum(axis=1)
    return (folded * 1e-6).astype(dtype or y.dtype)
