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
