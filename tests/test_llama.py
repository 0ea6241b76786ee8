"""Model tests: forward shapes, KV-cache decode parity, quant modes, loss."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama

CFG = llama.LlamaConfig.tiny()


def setup_params(cfg=CFG, seed=0):
    return llama.init_params(cfg, jax.random.PRNGKey(seed))


class TestForward:
    def test_shapes(self):
        params = setup_params()
        ids = jnp.arange(12).reshape(2, 6) % CFG.vocab_size
        logits, _ = llama.forward(params, ids, CFG)
        assert logits.shape == (2, 6, CFG.vocab_size)
        assert logits.dtype == jnp.float32

    def test_causal(self):
        """Changing a future token must not change past logits."""
        params = setup_params()
        ids = jnp.arange(8).reshape(1, 8)
        l1, _ = llama.forward(params, ids, CFG)
        ids2 = ids.at[0, 7].set(3)
        l2, _ = llama.forward(params, ids2, CFG)
        np.testing.assert_allclose(np.asarray(l1[0, :7]), np.asarray(l2[0, :7]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(l1[0, 7]), np.asarray(l2[0, 7]))

    def test_decode_matches_prefill(self):
        """Token-by-token decode with KV cache == full-sequence forward."""
        params = setup_params()
        t = 6
        ids = (jax.random.randint(jax.random.PRNGKey(1), (1, t), 0,
                                  CFG.vocab_size))
        full, _ = llama.forward(params, ids, CFG)

        caches = llama.init_cache(CFG, 1, 16, dtype=jnp.float32)
        outs = []
        for i in range(t):
            logits, caches = llama.forward(params, ids[:, i:i + 1], CFG,
                                           caches=caches, cache_pos=i)
            outs.append(logits[:, 0])
        dec = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                                   rtol=2e-4, atol=2e-4)

    def test_prefill_then_decode(self):
        params = setup_params()
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, CFG.vocab_size)
        full, _ = llama.forward(params, ids, CFG)
        caches = llama.init_cache(CFG, 2, 16, dtype=jnp.float32)
        _, caches = llama.forward(params, ids[:, :5], CFG, caches=caches,
                                  cache_pos=0)
        logits = None
        for i in range(5, 8):
            logits, caches = llama.forward(params, ids[:, i:i + 1], CFG,
                                           caches=caches, cache_pos=i)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, 7]), rtol=2e-4, atol=2e-4)

    def test_gqa(self):
        cfg = llama.LlamaConfig.tiny(num_key_value_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.arange(6).reshape(1, 6)
        logits, _ = llama.forward(params, ids, cfg)
        assert logits.shape == (1, 6, cfg.vocab_size)


class TestQuantModes:
    def test_w2_changes_output(self):
        cfg2 = llama.LlamaConfig.tiny(w_bits=2)
        params = setup_params()
        ids = jnp.arange(6).reshape(1, 6)
        fp, _ = llama.forward(params, ids, CFG)
        q, _ = llama.forward(params, ids, cfg2)
        assert not np.allclose(np.asarray(fp), np.asarray(q), atol=1e-3)

    def test_kv_quant(self):
        cfgkv = llama.LlamaConfig.tiny(kv_bits=4)
        params = setup_params()
        ids = jnp.arange(6).reshape(1, 6)
        fp, _ = llama.forward(params, ids, CFG)
        q, _ = llama.forward(params, ids, cfgkv)
        assert q.shape == fp.shape
        assert not np.allclose(np.asarray(fp), np.asarray(q), atol=1e-4)

    def test_a_quant(self):
        cfga = llama.LlamaConfig.tiny(a_bits=8)
        params = setup_params()
        ids = jnp.arange(6).reshape(1, 6)
        q, _ = llama.forward(params, ids, cfga)
        assert np.all(np.isfinite(np.asarray(q)))

    def test_grad_flows_through_ste(self):
        cfg2 = llama.LlamaConfig.tiny(w_bits=2)
        params = setup_params()
        ids = jnp.arange(6).reshape(1, 6)

        def loss(p):
            logits, _ = llama.forward(p, ids, cfg2, train=True)
            return llama.cross_entropy_loss(logits, ids)

        g = jax.grad(loss)(params)
        gq = np.asarray(g["layers"]["q_proj"])
        assert np.any(gq != 0) and np.all(np.isfinite(gq))


class TestLoss:
    def test_ce_ignore_index(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.array([[1, 2, -100, 3]])
        l = llama.cross_entropy_loss(logits, labels)
        np.testing.assert_allclose(float(l), np.log(8), rtol=1e-5)


class TestPackedModel:
    @pytest.mark.slow
    def test_packed_forward_matches_fake_quant(self):
        """Packed serving path ~= packed fake-quant dense path (bf16 tolerance)."""
        from mxq_tpu import packfmt
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=1)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.arange(6).reshape(1, 6)
        packed = llama.quantize_params_packed(params, cfg)
        lp, _ = llama.forward(packed, ids, cfg)
        # dense reference: replace each weight by its packed-dequant value
        dense = jax.tree_util.tree_map(lambda x: x, params)
        for name in llama.LAYER_LINEARS:
            w = params["layers"][name]
            wdq = jax.vmap(lambda wi: packfmt.fake_quant_packed(wi.T, cfg.scheme).T)(w)
            dense["layers"][name] = wdq
        ld, _ = llama.forward(dense, ids, cfg)
        pl_ = np.asarray(lp)
        dl = np.asarray(ld)
        assert np.max(np.abs(pl_ - dl)) / (np.abs(dl).max() + 1e-9) < 0.03

    def test_packed_forward_a8_prefill(self):
        """prefill_act_bits=8 routes >=512-token matmuls through the int8 MXU
        path; logits stay close to the f32 packed path."""
        import dataclasses
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=1,
                                     max_position_embeddings=640)
        cfg8 = dataclasses.replace(cfg, prefill_act_bits=8)
        params = llama.init_params(cfg, jax.random.PRNGKey(5))
        packed = llama.quantize_params_packed(params, cfg)
        ids = jax.random.randint(jax.random.PRNGKey(6), (1, 544), 0,
                                 cfg.vocab_size)
        lref, _ = llama.forward(packed, ids, cfg)
        l8, _ = llama.forward(packed, ids, cfg8)
        rel = np.abs(np.asarray(l8) - np.asarray(lref)).max() / (
            np.abs(np.asarray(lref)).max() + 1e-9)
        assert rel < 0.05, rel

    def test_fused_packed_matches_unfused(self):
        cfg = llama.LlamaConfig.tiny(num_hidden_layers=1)
        params = llama.init_params(cfg, jax.random.PRNGKey(3))
        ids = jnp.arange(6).reshape(1, 6)
        pf = llama.quantize_params_packed(params, cfg, fuse=True)
        pu = llama.quantize_params_packed(params, cfg, fuse=False)
        lf, _ = llama.forward(pf, ids, cfg)
        lu, _ = llama.forward(pu, ids, cfg)
        rel = np.abs(np.asarray(lf) - np.asarray(lu)).max() / (
            np.abs(np.asarray(lu)).max() + 1e-9)
        assert rel < 2e-2, rel


class TestSeqClassification:
    def test_head_uses_last_nonpad_token(self):
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        params["score"] = jax.random.normal(jax.random.PRNGKey(1),
                                            (cfg.hidden_size, 3)) * 0.02
        ids = jnp.asarray([[5, 6, 7, 0, 0], [1, 2, 3, 4, 5]])
        out = llama.sequence_classification_forward(params, ids, cfg, 3)
        assert out.shape == (2, 3)
        # padding after the last real token must not affect the score
        ids2 = jnp.asarray([[5, 6, 7, 0, 0, 0]])
        out2 = llama.sequence_classification_forward(
            params, ids2, cfg, 3)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                                   rtol=2e-3, atol=2e-3)
