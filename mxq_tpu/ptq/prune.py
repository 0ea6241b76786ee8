"""Pruning baselines — the Wanda-heritage side of the reference
(mxq_quant/lib/prune.py:17-324, layerwrapper.py, weight_permutation.py).

* magnitude pruning (prune.py:111-131)
* Wanda: metric |W| * ||x||_2 per input column (prune.py:133-221, metric at
  :177), with unstructured or n:m structured masks
* SparseGPT (OBS): Hessian-based prune with Cholesky inverse and error
  propagation (lib/sparsegpt.py:44-123, the faithful SparseGPT0)
* check_sparsity (prune.py:38-62)
* activation-order permutation by diag(H) (weight_permutation.py:41)

All vectorized/jittable; the layer-sequential schedule reuses
ptq.calibrate's input-capture machinery.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.ptq import calibrate


def magnitude_mask(w_io: jax.Array, sparsity: float = 0.5,
                   n: int = 0, m: int = 0) -> jax.Array:
    """Keep-mask by |W| (prune.py:111-131). ``w_io``: [in, out]."""
    return _mask_from_metric(jnp.abs(w_io), sparsity, n, m)


def wanda_mask(w_io: jax.Array, col_sq: jax.Array, sparsity: float = 0.5,
               n: int = 0, m: int = 0) -> jax.Array:
    """Wanda keep-mask: metric = |W| * ||x_col||_2 (prune.py:177; the running
    per-column norm is layerwrapper.py:5-35's scaler_row)."""
    metric = jnp.abs(w_io) * jnp.sqrt(col_sq)[:, None]
    return _mask_from_metric(metric, sparsity, n, m)


def wanda_mask_alpha(w_io: jax.Array, col_sq: jax.Array,
                     sparsity: float = 0.5, tol: float = 1e-3
                     ) -> jax.Array:
    """Wanda "variant" (alpha-search) keep-mask (prune.py:103-110,194-215).

    Instead of a fixed per-row count, prune the smallest-metric entries of
    each row until the pruned mass reaches ``alpha`` of the row's total
    metric, binary-searching alpha in [0, 0.8] until the global sparsity is
    within ``tol`` of the target. Per-row sparsity then adapts to the metric
    distribution. Returns keep-mask [in, out]."""
    metric = jnp.abs(w_io) * jnp.sqrt(col_sq)[:, None]
    mt = metric.T                                     # [out, in] like reference
    sort_res = jnp.sort(mt, axis=1)                   # ascending, per row
    tmp_metric = jnp.cumsum(sort_res, axis=1)
    sum_before = mt.sum(axis=1)

    def given_alpha(alpha):
        # prune everything below the per-row value whose prefix mass is
        # alpha * row_sum (return_given_alpha, prune.py:103-110)
        thres_cumsum = sum_before * alpha
        cnt = jnp.sum(tmp_metric <= thres_cumsum[:, None], axis=1)
        idx = jnp.clip(cnt - 1, 0, mt.shape[1] - 1)
        thres = jnp.take_along_axis(sort_res, idx[:, None], axis=1)
        thres = jnp.where((cnt == 0)[:, None], -jnp.inf, thres)
        prune = mt <= thres
        return prune, float(prune.mean())

    alpha, hist = 0.4, [0.0, 0.8]
    prune, cur = given_alpha(alpha)
    while abs(cur - sparsity) > tol and hist[1] - hist[0] >= tol:
        if cur > sparsity:
            alpha_new = (alpha + hist[0]) / 2.0
            hist[1] = alpha
        else:
            alpha_new = (alpha + hist[1]) / 2.0
            hist[0] = alpha
        alpha = alpha_new
        prune, cur = given_alpha(alpha)
    return ~prune.T


def _mask_from_metric(metric: jax.Array, sparsity: float, n: int,
                      m: int) -> jax.Array:
    """Per-output-channel mask. n:m structured when n>0: keep the n largest
    of every m consecutive input positions (prune.py:160-171)."""
    if n > 0:
        k, o = metric.shape
        g = metric.reshape(k // m, m, o)
        # rank within each m-group (descending)
        order = jnp.argsort(-g, axis=1)
        rank = jnp.argsort(order, axis=1)
        return (rank < n).reshape(k, o)
    k = metric.shape[0]
    cut = jnp.quantile(metric, sparsity, axis=0, keepdims=True)
    return metric >= cut


def check_sparsity(params: dict) -> float:
    """Fraction of zeros over the projection weights (prune.py:38-62)."""
    zeros = total = 0
    for name in llama.LAYER_LINEARS:
        w = params["layers"].get(name)
        if w is None:
            continue
        zeros += float(jnp.sum(w == 0))
        total += w.size
    return zeros / max(total, 1)


def act_order_permutation(diag_h: jax.Array) -> jax.Array:
    """Descending diag(H) column order (weight_permutation.py:41)."""
    return jnp.argsort(-diag_h)


def sparse_act_order_permutation(w_io: jax.Array, h: jax.Array,
                                 percdamp: float = 1.0) -> jax.Array:
    """2:4-aware activation ordering (weight_permutation.py:42-71).

    Saliency per column = sum_rows W^2 / diag(cholesky(inv(H_damped)))^2,
    sorted descending, then positions i in the first half with i%4 in {2,3}
    are swapped with position i + n/2 - 2 — interleaving strong and weak
    columns so every 4-wide group keeps 2 strong candidates under 2:4
    structured pruning."""
    k = w_io.shape[0]
    w = w_io.T.astype(jnp.float32)                    # [out, in]
    dead = jnp.diag(h) == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(k, dtype=h.dtype)
    hinv_chol = jnp.linalg.cholesky(jnp.linalg.inv(h), upper=True)
    diag = jnp.diag(hinv_chol)
    tmp = ((w ** 2) / (diag[None, :] ** 2)).sum(axis=0)
    perm = np.asarray(jnp.argsort(-tmp))

    out = perm.copy()
    half = k // 2
    for i in range(half):
        if i % 4 in (2, 3):
            out[i] = perm[i + half - 2]
            out[i + half - 2] = perm[i]
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# SparseGPT (OBS with error propagation) — lib/sparsegpt.py:44-123
# ---------------------------------------------------------------------------


def sparsegpt_prune(w_io: jax.Array, h: jax.Array, sparsity: float = 0.5,
                    blocksize: int = 128, percdamp: float = 0.01,
                    n: int = 0, m: int = 0) -> jax.Array:
    """OBS pruning of [in, out] weight with Hessian ``h`` [in, in].

    Follows the SparseGPT recipe (sparsegpt.py:54-117): dampen H, Cholesky ->
    inverse Cholesky (upper), per column block select prune mask by
    w^2 / diag(Hinv)^2, zero and propagate error into later columns.
    """
    k = w_io.shape[0]
    w = w_io.T.astype(jnp.float32)            # [out, in] like the reference
    dead = jnp.diag(h) == 0
    h = h.at[jnp.diag_indices(k)].add(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)

    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(k, dtype=h.dtype)
    # Hinv via Cholesky of H^-1 (upper), as sparsegpt.py:97-101
    hinv = jnp.linalg.inv(h)
    hinv_chol = jnp.linalg.cholesky(hinv, upper=True)

    # Build prune mask globally by the OBS saliency, then zero with
    # propagation column-by-column for the pruned set.
    diag = jnp.diag(hinv_chol)
    metric = (w ** 2) / (diag[None, :] ** 2)
    if n > 0:
        g = metric.reshape(w.shape[0], k // m, m)
        order = jnp.argsort(-g, axis=2)
        rank = jnp.argsort(order, axis=2)
        keep = (rank < n).reshape(w.shape[0], k)
    else:
        cut = jnp.quantile(metric, sparsity, axis=1, keepdims=True)
        keep = metric >= cut

    def col_body(idx, w):
        d = hinv_chol[idx, idx]
        wcol = w[:, idx]
        prune_col = ~keep[:, idx]
        err = jnp.where(prune_col, wcol, 0.0) / d
        row = hinv_chol[idx]
        cols = jnp.arange(k)
        live = cols > idx
        w = w - jnp.where(live[None, :], err[:, None] * row[None, :], 0.0)
        w = w.at[:, idx].set(jnp.where(prune_col, 0.0, wcol))
        return w

    w = jax.lax.fori_loop(0, k, col_body, w)
    return w.T.astype(w_io.dtype)


def gptq_quantize_1b4b(w_io: jax.Array, h: jax.Array, sparsity: float = 0.5,
                       blocksize: int = 128, percdamp: float = 0.01,
                       n: int = 0, m: int = 0,
                       split_sign: bool = False) -> jax.Array:
    """GPTQ-style error-compensating mixed 1-bit/4-bit quantization — the
    reference museum's quant-after-prune variants (sparsegpt.py:560-640 and
    :720-800): per 128-column block, the LOW-saliency weights (OBS metric
    w^2/diag(Hinv)^2, fraction ``sparsity`` or n-of-m) collapse to 1 bit
    (sign * per-row mean |w|; ``split_sign`` uses separate positive/negative
    means, the :761 variant), the rest quantize to 4-bit per-channel asym,
    and every column's quantization error propagates into later columns
    through the inverse-Cholesky rows (the part the active RTN path lacks).

    ``w_io`` [in, out]; ``h`` [in, in] = X^T X from calibration. Returns the
    quant-dequantized weight, same shape/dtype.
    """
    k = w_io.shape[0]
    w = w_io.T.astype(jnp.float32)             # [out, in] like the reference
    dead = jnp.diag(h) == 0
    h = h.at[jnp.diag_indices(k)].add(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(k, dtype=h.dtype)
    hinv = jnp.linalg.inv(h)
    hc = jnp.linalg.cholesky(hinv, upper=True)  # sparsegpt.py:97-101

    @jax.jit
    def do_block(w1, hinv1):
        cnt = w1.shape[1]
        diag1 = jnp.diag(hinv1)
        metric = w1 ** 2 / diag1[None, :] ** 2
        if n > 0:
            g = metric.reshape(w1.shape[0], cnt // m, m)
            order = jnp.argsort(g, axis=2)
            rank = jnp.argsort(order, axis=2)
            mask1 = (rank < n).reshape(w1.shape[0], cnt)   # lowest n of m
        else:
            thresh = jnp.quantile(metric, sparsity)
            mask1 = metric <= thresh
        pos = mask1 & (w1 >= 0)
        neg = mask1 & (w1 < 0)
        if split_sign:                          # sparsegpt.py:748-758
            avg_p = (jnp.sum(jnp.abs(w1) * pos, 1)
                     / (jnp.sum(pos, 1) + 1e-9))
            avg_n = (jnp.sum(jnp.abs(w1) * neg, 1)
                     / (jnp.sum(neg, 1) + 1e-9))
        else:                                   # sparsegpt.py:608-611
            tot = jnp.sum(jnp.abs(w1) * mask1, 1)
            avg_p = avg_n = tot / (jnp.sum(mask1, 1) + 1e-9)
        # 4-bit per-channel asym params from the 1b-masked-out weights
        # (zeros included, find_params on W1 * mask4b — sparsegpt.py:615-619)
        w4 = w1 * (~mask1)
        xmax = jnp.maximum(jnp.max(w4, axis=1), 0.0)
        xmin = jnp.minimum(jnp.min(w4, axis=1), 0.0)
        both_zero = (xmax == 0) & (xmin == 0)
        xmax = jnp.where(both_zero, 1.0, xmax)
        scale = (xmax - xmin) / 15.0
        zero = jnp.round(-xmin / scale)

        def q4(col):
            q = jnp.clip(jnp.round(col / scale) + zero, 0.0, 15.0)
            return scale * (q - zero)

        def body(i, carry):
            w1, q1 = carry
            col = w1[:, i]
            d = hinv1[i, i]
            q = jnp.where(pos[:, i], avg_p,
                          jnp.where(neg[:, i], -avg_n, q4(col)))
            err = (col - q) / d
            cols = jnp.arange(cnt)
            upd = jnp.where((cols > i)[None, :],
                            err[:, None] * hinv1[i][None, :], 0.0)
            w1 = w1 - upd
            q1 = q1.at[:, i].set(q)
            return w1, q1

        w1, q1 = jax.lax.fori_loop(0, cnt, body, (w1, jnp.zeros_like(w1)))
        # total propagated error for the trailing columns: (W_in - Q) since
        # Err1[:, i] = err_i and W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:] with
        # err reconstructed per column
        return w1, q1

    for i1 in range(0, k, blocksize):
        i2 = min(i1 + blocksize, k)
        w1_in = w[:, i1:i2]
        hinv1 = hc[i1:i2, i1:i2]
        w1_out, q1 = do_block(w1_in, hinv1)
        # per-column err_i = (w1_during_sweep - q)/d; recover via the sweep's
        # own final state: rerun is avoided by recomputing errs from q1 and
        # the sweep's running weights — do_block returns w1 AFTER in-block
        # propagation, so reconstruct errs column-by-column is unnecessary:
        # Err1 = (W1_sweep - Q1)/diag, where W1_sweep[:, i] is w1 at step i.
        # Equivalent closed form (sparsegpt.py:640): propagate with
        # Err1 = solve from q1: W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:].
        # We recover Err1 by replaying the triangular relation:
        #   W1_sweep = W1_in - Err1 @ triu(Hinv1, 1)  and
        #   Err1[:, i] = (W1_sweep[:, i] - Q1[:, i]) / d_i
        # which is a lower-triangular solve:
        #   Err1 @ (diag + triu(Hinv1,1)) = W1_in - Q1   =>
        #   Err1 = (W1_in - Q1) @ inv(Hinv1 upper-triangular)
        err1 = jax.scipy.linalg.solve_triangular(
            hinv1.T, (w1_in - q1).T, lower=True).T
        w = w.at[:, i1:i2].set(q1)
        if i2 < k:
            w = w.at[:, i2:].add(-err1 @ hc[i1:i2, i2:])
    return w.T.astype(w_io.dtype)


# ---------------------------------------------------------------------------
# Layer-sequential prune driver (reuses calibrate's capture machinery)
# ---------------------------------------------------------------------------


def prune_model(params: dict, cfg: llama.LlamaConfig, input_ids: jax.Array,
                method: str = "wanda", sparsity: float = 0.5,
                n: int = 0, m: int = 0) -> dict:
    """Layer-sequential pruning (prune.py:133-221 schedule): capture each
    linear's inputs, mask its weight, re-forward with the pruned layer."""
    s, t = input_ids.shape
    x = params["embed_tokens"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(t)[None], (s, t))
    cos, sin = llama.rope_tables(cfg, positions)
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    mask = llama.causal_mask(t, dtype=jnp.float32)

    import dataclasses
    fp_cfg = dataclasses.replace(cfg, w_bits=32, a_bits=32, kv_bits=32)

    @partial(jax.jit, static_argnames=())
    def prune_layer(x, layer):
        inputs = calibrate._layer_linear_inputs(x, layer, cfg, cos, sin, mask)
        new_layer = dict(layer)
        for name in llama.LAYER_LINEARS:
            w = layer[name]
            col_sq = calibrate._col_sq(inputs[name])
            if method == "magnitude":
                keep = magnitude_mask(w, sparsity, n, m)
                new_layer[name] = w * keep
            elif method == "wanda":
                keep = wanda_mask(w, col_sq, sparsity, n, m)
                new_layer[name] = w * keep
            else:  # sparsegpt
                flat = inputs[name].reshape(-1, w.shape[0]).astype(jnp.float32)
                h = (2.0 / flat.shape[0]) * (flat.T @ flat)
                new_layer[name] = sparsegpt_prune(w, h, sparsity,
                                                 n=n, m=m)
        out, _ = llama.decoder_layer(x, new_layer, fp_cfg, cos, sin, mask)
        return new_layer, out

    stacked = params["layers"]
    new_stacks = {k_: [] for k_ in stacked}
    for i in range(cfg.num_hidden_layers):
        layer = {k_: v[i] for k_, v in stacked.items()}
        new_layer, x = prune_layer(x, layer)
        for k_ in stacked:
            new_stacks[k_].append(new_layer[k_])

    out = dict(params)
    out["layers"] = {k_: jnp.stack(v) for k_, v in new_stacks.items()}
    return out


def greedy_nearest_permutation(w_io: jax.Array, use_abs: bool = False
                               ) -> jax.Array:
    """Greedy nearest-neighbor column ordering
    (weight_permutation.py:4-24): normalize columns, then repeatedly place
    the most-correlated remaining column next. Host-side numpy (one-time,
    data-layout decision, not a hot path)."""
    import numpy as np
    wt = np.asarray(w_io, np.float64).T.copy()        # columns as rows
    wt /= np.linalg.norm(wt, axis=-1, keepdims=True) + 1e-12
    dist = wt @ wt.T
    if use_abs:
        dist = np.abs(dist)
    n = len(wt)
    perm = np.arange(n)
    for i in range(n - 2):
        nearest = (i + 1) + int(np.argmax(dist[i, i + 1:]))
        j = i + 1
        dist[[j, nearest]] = dist[[nearest, j]]
        dist[:, [j, nearest]] = dist[:, [nearest, j]]
        perm[[j, nearest]] = perm[[nearest, j]]
    return jnp.asarray(perm)


def spearman_permutation(w_io: jax.Array, use_abs: bool = False) -> jax.Array:
    """Spearman rank-correlation ordering (weight_permutation.py:36-39):
    greedy-nearest over per-column rank vectors."""
    import numpy as np
    w = np.asarray(w_io.T)                            # [out, in] like reference
    rank = np.argsort(np.argsort(w, axis=0), axis=0).astype(np.float64)
    rank = rank - rank.mean(axis=0, keepdims=True)
    return greedy_nearest_permutation(jnp.asarray(rank.T), use_abs)
