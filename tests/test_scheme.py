"""Bit-exactness tests: mxq_tpu.scheme vs golden outputs captured from the
reference torch implementation (tools/make_goldens.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CFG = MXQConfig()


def load(name):
    return np.load(os.path.join(GOLDEN, name + ".npz"))


class TestQATFakeQuant:
    def test_mxasym_forward_matches_reference(self):
        g = load("qat_mxasym")
        out = scheme.mxq_fake_quant_qat(jnp.asarray(g["w"]), CFG)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-6)

    def test_ste_backward_clip_mask(self):
        g = load("qat_mxasym")
        w = jnp.asarray(g["w_big"])
        coeff = jnp.asarray(g["coeff"])

        def loss(w):
            return jnp.sum(scheme.mxq_fake_quant_ste(w, CFG) * coeff)

        grad = jax.grad(loss)(w)
        np.testing.assert_allclose(np.asarray(grad), g["grad_big"],
                                   rtol=0, atol=1e-6)

    def test_sym_act_quant(self):
        g = load("qat_sym_a8")
        out = scheme.sym_fake_quant(jnp.asarray(g["x"]), bits=8, groupsize=128)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-6)
        out_lw = scheme.sym_fake_quant(jnp.asarray(g["x"]), bits=8,
                                       layerwise=True)
        np.testing.assert_allclose(np.asarray(out_lw), g["out_lw"],
                                   rtol=0, atol=1e-6)

    def test_sym3d_reference_bug_golden(self):
        """The compatibility shim reproduces the reference's buggy 3-D
        SymQuantizer branch bit-for-bit (utils_quant.py:56-66: sequence-axis
        slicing, per-token maxima, zero-max tail)."""
        g = load("qat_sym3d")
        out = scheme.sym_fake_quant_ref3d(jnp.asarray(g["x"]), bits=8)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0,
                                   atol=1e-6)

    def test_sym3d_deviation_quantified(self):
        """Quantifies the documented numerical deviation: the FIXED
        groupwise semantics (sym_fake_quant) vs the reference's buggy 3-D
        branch on the same [B, T, H] tensor. A reference-trained
        a_bits/kv_bits checkpoint evaluated with the fixed semantics sees
        per-value deltas of this order (compat note in
        docs/ARCHITECTURE.md)."""
        g = load("qat_sym3d")
        x = jnp.asarray(g["x"])
        fixed = np.asarray(scheme.sym_fake_quant(x, bits=8, groupsize=128))
        buggy = np.asarray(g["out"])
        delta = np.abs(fixed - buggy)
        rel = delta.max() / np.abs(x).max()
        mean_rel = delta.mean() / np.abs(np.asarray(x)).mean()
        # the deviation is real (per-token vs per-group scale + identity
        # tail) but bounded by one quant step of the coarser grid
        assert delta.max() > 0
        step = np.abs(np.asarray(x)).max(axis=-1).max() / 127
        assert delta.max() <= step * 1.01, (delta.max(), step)
        # recorded magnitudes (guarded loosely so the note stays true)
        assert 1e-4 < rel < 2e-2, rel
        assert mean_rel < 1e-2, mean_rel

    def test_asym_act_quant(self):
        g = load("qat_asym_a4")
        out = scheme.asym_fake_quant(jnp.asarray(g["x"]), bits=4, groupsize=8)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-6)
        out_lw = scheme.asym_fake_quant(jnp.asarray(g["x"]), bits=4,
                                        layerwise=True)
        np.testing.assert_allclose(np.asarray(out_lw), g["out_lw"],
                                   rtol=0, atol=1e-6)


class TestPTQQuantizer:
    def test_2b_group_with_double_quant(self):
        """One 16-column group, 2-bit, qq_scale_bits=4 — the building block of
        fasterquant's inner loop (mxqgpt.py:420-428)."""
        g = load("ptq_quantizer_2b")
        w = jnp.asarray(g["w"])  # [32, 16] — one group per row
        scale, zero = scheme.asym_find_params(w, CFG.maxq_lo)
        np.testing.assert_allclose(np.asarray(zero), g["zero"][:, 0],
                                   rtol=0, atol=1e-6)
        dq = scheme.double_quant_scales(scale, CFG.qq_scale_bits, CFG.qq_group)
        np.testing.assert_allclose(np.asarray(dq.scale_dq), g["scale"][:, 0],
                                   rtol=0, atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(dq.codes).reshape(-1, 16), g["scale_codes"])
        out = scheme.asym_qdq(w, dq.scale_dq[:, None], zero[:, None],
                              CFG.maxq_lo, CFG.ptq_eps)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-6)

    def test_4b_rowwise_with_double_quant(self):
        g = load("ptq_quantizer_4b")
        w = jnp.asarray(g["w"])
        scale, zero = scheme.asym_find_params(w, CFG.maxq_hi)
        dq = scheme.double_quant_scales(scale, CFG.qq_scale_bits, CFG.qq_group)
        out = scheme.asym_qdq(w, dq.scale_dq[:, None], zero[:, None],
                              CFG.maxq_hi, CFG.ptq_eps)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-6)

    def test_fasterquant_full_layer(self):
        """Whole-layer PTQ quant-dequant incl. dead-column zeroing matches
        MXQGPT.fasterquant (mxqgpt.py:387-448)."""
        g = load("ptq_fasterquant")
        w = jnp.asarray(g["w"])
        dead = (g["inp"] ** 2).sum(0) == 0
        w = w.at[:, jnp.asarray(dead)].set(0.0)
        out = scheme.mxq_fake_quant_ptq(w, CFG)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0, atol=1e-5)
        # dead columns are zeroed BEFORE quantization; after asym quant-dequant
        # they come back as the small dequant-of-zero value, same as reference.
        assert np.abs(np.asarray(out)[:, dead]).max() < 1.0


class TestRoundTripAndProperties:
    def test_ptq_quantize_dequantize_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
        qw = scheme.mxq_quantize_ptq(w, CFG)
        wdq = scheme.mxq_dequantize(qw, CFG)
        np.testing.assert_allclose(np.asarray(wdq),
                                   np.asarray(scheme.mxq_fake_quant_ptq(w, CFG)),
                                   rtol=0, atol=0)

    def test_round_zero_codes_are_integral(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 128))
        qw = scheme.mxq_quantize_ptq(w, CFG, round_zero=True)
        for arr, hi in [(qw.lo_codes, CFG.maxq_lo), (qw.hi_codes, CFG.maxq_hi),
                        (qw.lo_zero, CFG.maxq_lo), (qw.hi_zero, CFG.maxq_hi),
                        (qw.lo_scale_codes, CFG.maxq_qq),
                        (qw.lo_qq_zero, CFG.maxq_qq), (qw.hi_qq_zero, CFG.maxq_qq)]:
            a = np.asarray(arr)
            assert a.dtype == np.int8
            assert a.min() >= 0 and a.max() <= hi

    def test_fake_quant_is_idempotent(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (16, 64))
        once = scheme.mxq_fake_quant_qat(w, CFG)
        twice = scheme.mxq_fake_quant_qat(once, CFG)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice),
                                   rtol=0, atol=1e-6)

    def test_split_merge_blocks_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(3), (8, 192))
        lo, hi = scheme.split_blocks(w, CFG)
        assert lo.shape == (8, 144) and hi.shape == (8, 48)
        np.testing.assert_array_equal(np.asarray(scheme.merge_blocks(lo, hi, CFG)),
                                      np.asarray(w))

    def test_quantization_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(4), (64, 256))
        err_qat = jnp.abs(scheme.mxq_fake_quant_qat(w, CFG) - w).max()
        err_ptq = jnp.abs(scheme.mxq_fake_quant_ptq(w, CFG) - w).max()
        # 2-bit groups of 16 gaussians: range < ~9 sigma, step = range/3
        assert float(err_qat) < 1.5
        assert float(err_ptq) < 1.5

    def test_effective_bits(self):
        assert 2.7 < CFG.effective_bits(4096, 4096) < 3.0


class TestVariants:
    def test_mx1_matches_reference(self):
        g = load("qat_mx1")
        out = scheme.mx1_fake_quant_qat(jnp.asarray(g["w"]), ratio_2b=0.6)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0,
                                   atol=1e-6)

    def test_ratio_variant_runs(self):
        w = jax.random.normal(jax.random.PRNGKey(7), (32, 128))
        out = scheme.mxq_fake_quant_ptq_ratio(w, 6, 10, blocksize=32)
        assert out.shape == w.shape
        err = float(jnp.abs(out - w).max())
        assert 0 < err < 1.5
        # ratio 6/8 with blocksize 16 reduces to the standard scheme
        std = scheme.mxq_fake_quant_ptq(w, CFG)
        r68 = scheme.mxq_fake_quant_ptq_ratio(w, 6, 8, blocksize=16)
        np.testing.assert_allclose(np.asarray(r68), np.asarray(std),
                                   rtol=1e-5, atol=1e-6)

    def test_binary_weight_quant_matches_reference(self):
        g = load("qat_w1")
        out = scheme.binary_fake_quant(jnp.asarray(g["w"]), groupsize=8)
        np.testing.assert_allclose(np.asarray(out), g["wq"], rtol=0, atol=1e-5)

    def test_sub2bit_levels(self):
        w = jax.random.normal(jax.random.PRNGKey(9), (8, 64))
        # w_bits interpreted below 2: levels = 2^(bits-1)
        out = scheme.sub2bit_fake_quant(w, w_bits=1)
        s = 2 * jnp.mean(jnp.abs(w), axis=1, keepdims=True)
        lv = np.unique(np.round(np.asarray(out / s) * 2) / 2)
        assert set(np.abs(lv).round(4)).issubset({0.5})


class TestOutlierQuant:
    """MXQGPT1 outlier-aware quantization vs reference goldens
    (mxqgpt.py:95-254, get_leave_one_out_error :454-491)."""

    def test_1bit_outlier_matches_reference(self):
        g = load("ptq_outlier_1b")
        out, mask = scheme.mxq_outlier_quantize(jnp.asarray(g["w"]), bits=1,
                                                blocksize=16)
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=0,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mask), g["mask"] != 0)

    def test_leave_one_out_error_matches_reference(self):
        g = load("ptq_loo_2b")
        red = scheme.leave_one_out_error(jnp.asarray(g["w"]),
                                         jnp.asarray(g["hdiag"])[None, :],
                                         bits=2)
        np.testing.assert_allclose(np.asarray(red), g["red"], rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.slow
    def test_2bit_outlier_path_runs(self):
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (16, 64))
        w = w.at[3, 17].set(8.0)  # a clear outlier
        x = jax.random.normal(jax.random.PRNGKey(4), (32, 64))
        h = (2.0 / 32) * (x.T @ x)
        out, mask = scheme.mxq_outlier_quantize(w, h, bits=2, blocksize=16)
        assert bool(mask[3, 17])
        # outliers kept exactly; non-outliers quantized
        np.testing.assert_allclose(float(out[3, 17]), 8.0, rtol=1e-6)
        frac = float(jnp.mean(mask))
        assert frac < 0.5
