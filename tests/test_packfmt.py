"""Packed-format tests: round-trips, closed-form bit patterns, and matmul parity.

The bit-pattern test mirrors the reference's kernel correctness strategy
(cuda_kernel/test_correct_gemv.py:19-53): build packed tensors from hand
constants and check the dequant output in closed form."""

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import packfmt, scheme
from mxq_tpu.config import MXQConfig

CFG = MXQConfig()


def rand_w(key, o, k):
    return jax.random.normal(jax.random.PRNGKey(key), (o, k), jnp.float32)


class TestPackUnpack:
    def test_roundtrip_shapes(self):
        w = rand_w(0, 256, 1024)
        p = packfmt.quantize_pack(w, CFG)
        n = packfmt.N_LANE  # O=256 pads to one lane tile
        assert p.w2.shape == (1024 * 48 // 64 // 16, n)
        assert p.w4.shape == (1024 * 16 // 64 // 8, n)
        assert p.meta2.shape == (16, n)
        assert p.qscale.shape == (16, n) and p.qmin.shape == (16, n)
        assert p.smeta4.shape == (8, n)
        wdq = packfmt.unpack_dequant(p, CFG)
        assert wdq.shape == (1024, 256)

    def test_padding_roundtrip(self):
        # K=2112 -> 33 blocks -> padded to 48; O=100 -> padded to N_LANE.
        w = rand_w(1, 100, 2112)
        p = packfmt.quantize_pack(w, CFG)
        assert p.nbp == 48 and p.n_padded == packfmt.N_LANE
        wdq = packfmt.unpack_dequant(p, CFG)
        assert wdq.shape == (2112, 100)
        err = np.abs(np.asarray(wdq.T) - np.asarray(w))
        assert err.max() < 1.5

    def test_quant_error_close_to_ptq_reference_path(self):
        """Packed-format error (integer zeros, 8b scale codes, K-direction qq)
        should be comparable to the reference PTQ semantics (fp zeros, 4b
        codes, row-direction qq)."""
        w = rand_w(2, 128, 512)
        err_packed = float(jnp.mean((packfmt.fake_quant_packed(w, CFG) - w) ** 2))
        err_ref = float(jnp.mean((scheme.mxq_fake_quant_ptq(w, CFG) - w) ** 2))
        assert err_packed < err_ref * 1.35, (err_packed, err_ref)

    def test_pack_unpack_sublanes(self):
        codes = jnp.asarray(np.random.RandomState(0).randint(0, 4, (64, 8)))
        words = packfmt._pack_along_sublanes(codes, 2)
        back = packfmt._unpack_along_sublanes(words, 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    def test_matmul_parity(self):
        w = rand_w(3, 256, 1024)
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 1024), jnp.float32)
        p = packfmt.quantize_pack(w, CFG)
        wdq = packfmt.unpack_dequant(p, CFG)        # [K, O]
        y = x @ wdq
        y_ref = x @ packfmt.fake_quant_packed(w, CFG).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pad_inputs_split(self):
        w = rand_w(4, 128, 1024)
        p = packfmt.quantize_pack(w, CFG)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 1024), jnp.float32)
        x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
        assert x2.shape == (2, 768) and x4.shape == (2, 256)
        # de-interleave must be consistent with split_blocks on a weight
        wl, wh = scheme.split_blocks(x, CFG)
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(wl))
        np.testing.assert_array_equal(np.asarray(x4), np.asarray(wh))


class TestClosedFormBitPatterns:
    """Hand-constructed packed constants -> exact expected dequant values."""

    def _blank(self, nbp=16, n=256):
        k = nbp * 64
        z = jnp.zeros
        p = packfmt.PackedMXQLinear(
            w2=z((nbp * 48 // 16, n), jnp.int32),
            w4=z((nbp * 16 // 8, n), jnp.int32),
            meta2=z((nbp, n), jnp.int32),
            qscale=z((nbp, n), jnp.bfloat16),
            qmin=z((nbp, n), jnp.bfloat16),
            smeta4=z((8, n), jnp.float32),
            in_features=k, out_features=n)
        return p

    def test_all_patterns(self):
        p = self._blank()
        nbp, n = 16, 256
        # 2b plane: codes = 0b10 everywhere -> 0xAAAAAAAA words (the reference's
        # test constant, test_correct_gemv.py:27); zeros = 1, scale codes = 2;
        # qq_scale = 0.5, qq_min = 1 -> s_eff = 2, w2 = 2*(2-1) = 2.
        p = packfmt.PackedMXQLinear(
            w2=jnp.full_like(p.w2, np.int32(np.uint32(0xAAAAAAAA).astype(np.int32))),
            w4=jnp.full_like(p.w4, 0x99999999 - (1 << 32)),  # codes 0b1001 = 9
            meta2=jnp.full_like(p.meta2,
                                (1 << 0) | (1 << 2) | (1 << 4)      # zeros 1,1,1
                                | (2 << 6) | (2 << 14) | (2 << 22)),  # scales 2,2,2
            qscale=jnp.full((nbp, n), 0.5, jnp.bfloat16),
            qmin=jnp.full((nbp, n), 1.0, jnp.bfloat16),
            smeta4=p.smeta4.at[0].set(2.0).at[1].set(5.0),  # s4=2, z4=5 -> w4=2*(9-5)=8
            in_features=nbp * 64, out_features=n)
        wdq = np.asarray(packfmt.unpack_dequant(p, CFG))    # [K, N]
        wk = wdq.T.reshape(n, nbp, 64)
        np.testing.assert_array_equal(wk[:, :, :48], 2.0)
        np.testing.assert_array_equal(wk[:, :, 48:], 8.0)
        # ones-vector GEMV: every output = 48*2 + 16*8 = 224 per block x 16 blocks
        y = jnp.ones((1, nbp * 64)) @ jnp.asarray(wdq)
        np.testing.assert_array_equal(np.asarray(y), 224.0 * nbp)
