"""Pruning tests: mask semantics, n:m structure, sparsity accounting,
SparseGPT error propagation beats magnitude, full-model driver."""

import numpy as np
import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from mxq_tpu.ptq import prune, data as ptq_data

CFG = llama.LlamaConfig.tiny()


def test_magnitude_mask_sparsity():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    m = prune.magnitude_mask(w, sparsity=0.5)
    frac = float(jnp.mean(~m))
    assert abs(frac - 0.5) < 0.05


def test_nm_structured():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    m = prune.magnitude_mask(w, n=2, m=4)
    mv = np.asarray(m).reshape(16, 4, 32)
    assert (mv.sum(1) == 2).all()  # exactly 2 of every 4 kept


def test_wanda_uses_activation_norms():
    w = jnp.ones((8, 4))
    col_sq = jnp.asarray([100.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.01])
    m = prune.wanda_mask(w, col_sq, sparsity=0.25)
    mv = np.asarray(m)
    assert mv[0].all()        # high-norm column kept
    assert not mv[-1].any()   # low-norm column pruned


def test_sparsegpt_better_than_magnitude():
    """OBS error propagation should give lower output error than plain
    magnitude pruning at the same sparsity (on correlated inputs)."""
    rng = jax.random.PRNGKey(2)
    k, o, nsmp = 64, 32, 256
    w = jax.random.normal(rng, (k, o))
    base = jax.random.normal(jax.random.PRNGKey(3), (nsmp, k // 2))
    x = jnp.concatenate([base, base * 0.5 + 0.1], axis=1)  # correlated cols
    h = (2.0 / nsmp) * (x.T @ x)
    w_sg = prune.sparsegpt_prune(w, h, sparsity=0.5)
    w_mag = w * prune.magnitude_mask(w, sparsity=0.5)
    err_sg = float(jnp.mean((x @ w_sg - x @ w) ** 2))
    err_mag = float(jnp.mean((x @ w_mag - x @ w) ** 2))
    assert float(jnp.mean(w_sg == 0)) > 0.4
    assert err_sg < err_mag, (err_sg, err_mag)


def test_act_order():
    d = jnp.asarray([1.0, 5.0, 3.0])
    np.testing.assert_array_equal(np.asarray(prune.act_order_permutation(d)),
                                  [1, 2, 0])


def test_prune_model_wanda():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jnp.asarray(ptq_data.get_calibration_batch(2, 32,
                                                     vocab_size=CFG.vocab_size))
    pruned = prune.prune_model(params, CFG, ids, method="wanda", sparsity=0.5)
    s = prune.check_sparsity(pruned)
    assert abs(s - 0.5) < 0.05, s


def test_permutations_are_valid_and_group_correlated():
    import numpy as np
    rng = np.random.RandomState(0)
    base = rng.randn(16, 4)
    # columns 2i and 2i+1 highly correlated
    w = np.empty((16, 8))
    w[:, 0::2] = base
    w[:, 1::2] = base + 0.01 * rng.randn(16, 4)
    perm = np.asarray(prune.greedy_nearest_permutation(jnp.asarray(w)))
    assert sorted(perm.tolist()) == list(range(8))
    # correlated pairs should end up adjacent for most positions
    pairs = sum(1 for i in range(7) if abs(perm[i] - perm[i + 1]) == 1
                and min(perm[i], perm[i + 1]) % 2 == 0)
    assert pairs >= 3
    sp = np.asarray(prune.spearman_permutation(jnp.asarray(w)))
    assert sorted(sp.tolist()) == list(range(8))


def test_wanda_alpha_search_hits_target_sparsity():
    w = jax.random.normal(jax.random.PRNGKey(5), (128, 64))
    col_sq = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (128,))) + 0.1
    keep = prune.wanda_mask_alpha(w, col_sq, sparsity=0.5)
    frac = float(jnp.mean(~keep))
    assert abs(frac - 0.5) < 0.01
    # per-row sparsity ADAPTS (unlike the fixed-count variant)
    row_frac = np.asarray((~keep).mean(axis=0))
    assert row_frac.std() > 0.0


def test_wanda_alpha_search_matches_reference_protocol():
    """Cross-check the alpha-search mask against the reference's
    return_given_alpha bisection (prune.py:103-110,194-215) run in torch."""
    import torch

    rng = np.random.RandomState(11)
    w = rng.randn(96, 48).astype(np.float32)
    col_sq = (np.abs(rng.randn(96)) + 0.1).astype(np.float32)
    target = 0.5

    wm = torch.abs(torch.from_numpy(w.T)) * torch.sqrt(
        torch.from_numpy(col_sq).reshape(1, -1))
    sort_res = torch.sort(wm, dim=-1, stable=True)
    tmp_metric = torch.cumsum(sort_res[0], dim=1)
    sum_before = wm.sum(dim=1)

    def given_alpha(alpha):
        thres_cumsum = sum_before * alpha
        sort_mask = tmp_metric <= thres_cumsum.reshape((-1, 1))
        thres = torch.gather(sort_res[0], dim=1,
                             index=sort_mask.sum(dim=1, keepdims=True) - 1)
        mask = (wm <= thres)
        return mask, float(mask.sum()) / mask.numel()

    alpha, hist = 0.4, [0.0, 0.8]
    mask, cur = given_alpha(alpha)
    while abs(cur - target) > 1e-3 and hist[1] - hist[0] >= 1e-3:
        if cur > target:
            alpha_new = (alpha + hist[0]) / 2.0
            hist[1] = alpha
        else:
            alpha_new = (alpha + hist[1]) / 2.0
            hist[0] = alpha
        alpha = alpha_new
        mask, cur = given_alpha(alpha)

    keep = prune.wanda_mask_alpha(jnp.asarray(w), jnp.asarray(col_sq),
                                  sparsity=target)
    ours = ~np.asarray(keep).T
    ref = mask.numpy()
    agreement = (ours == ref).mean()
    assert agreement > 0.995, agreement


def test_sparse_act_order_is_24_aware_permutation():
    rng = jax.random.PRNGKey(8)
    w = jax.random.normal(rng, (32, 64))
    x = jax.random.normal(jax.random.PRNGKey(9), (128, 32))
    h = (2.0 / 128) * (x.T @ x)
    perm = prune.sparse_act_order_permutation(w, h)
    pv = np.asarray(perm)
    k = 32
    assert sorted(pv.tolist()) == list(range(k))
    # undo the 2:4-aware swap (weight_permutation.py:60-68); the result must
    # be the plain saliency-descending order, i.e. monotone in saliency
    half = k // 2
    undone = pv.copy()
    for i in range(half):
        if i % 4 in (2, 3):
            undone[i], undone[i + half - 2] = pv[i + half - 2], pv[i]
    damp = 1.0 * float(jnp.mean(jnp.diag(h)))
    hd = np.asarray(h) + damp * np.eye(k)
    hinv_chol = np.linalg.cholesky(np.linalg.inv(hd)).T
    sal = (np.asarray(w).T.astype(np.float64) ** 2
           / np.diag(hinv_chol)[None, :] ** 2).sum(axis=0)
    assert (np.diff(sal[undone]) <= 1e-6).all()


class TestGPTQQuantize:
    def _wh(self, seed=0, k=256, o=128, nsamp=512):
        rng = np.random.RandomState(seed)
        # correlated inputs -> off-diagonal H, where compensation matters
        base = rng.randn(nsamp, k // 4)
        x = np.repeat(base, 4, axis=1) + 0.3 * rng.randn(nsamp, k)
        w = rng.randn(k, o).astype(np.float32)
        h = jnp.asarray((x.T @ x).astype(np.float32))
        return jnp.asarray(w), h, jnp.asarray(x.astype(np.float32))

    def test_compensation_beats_no_compensation(self):
        w, h, x = self._wh()
        q_comp = prune.gptq_quantize_1b4b(w, h, sparsity=0.5)

        # same quantization grid per column, but no error propagation:
        # emulate by zero Hessian coupling (identity H)
        q_rtn = prune.gptq_quantize_1b4b(
            w, jnp.eye(w.shape[0]) * jnp.mean(jnp.diag(h)), sparsity=0.5)

        def layer_err(q):
            d = np.asarray(x @ (w - q))
            return float((d ** 2).mean())

        assert layer_err(q_comp) < layer_err(q_rtn) * 0.9, \
            (layer_err(q_comp), layer_err(q_rtn))

    def test_nm_onebit_structure(self):
        w, h, _ = self._wh(seed=1)
        q = prune.gptq_quantize_1b4b(w, h, n=2, m=4)
        assert q.shape == w.shape
        assert np.all(np.isfinite(np.asarray(q)))
        # 1-bit values per row collapse to few distinct magnitudes: each
        # row's value set is far smaller than k
        row = np.asarray(q).T[0]
        assert len(np.unique(np.round(row, 5))) < w.shape[0] // 2

    def test_split_sign_variant_runs(self):
        w, h, x = self._wh(seed=2)
        q1 = prune.gptq_quantize_1b4b(w, h, sparsity=0.5, split_sign=False)
        q2 = prune.gptq_quantize_1b4b(w, h, sparsity=0.5, split_sign=True)
        assert np.any(np.asarray(q1) != np.asarray(q2))
        for q in (q1, q2):
            assert np.all(np.isfinite(np.asarray(q)))
