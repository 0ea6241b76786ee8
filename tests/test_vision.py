"""Vision side project tests: ViT forward, Wanda pruning, MXQ quantization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mxq_tpu.vision import vit, prune_vision

CFG = vit.ViTConfig.tiny()


def test_vit_forward():
    params = vit.init_params(CFG, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = vit.forward(params, imgs, CFG)
    assert logits.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_prune_vit_wanda():
    params = vit.init_params(CFG, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    pruned = prune_vision.prune_vit(params, CFG, imgs, sparsity=0.5)
    s = prune_vision.check_sparsity(pruned)
    assert abs(s - 0.5) < 0.05
    logits = vit.forward(pruned, imgs, CFG)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_prune_vit_nm():
    params = vit.init_params(CFG, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    pruned = prune_vision.prune_vit(params, CFG, imgs, method="magnitude",
                                    n=2, m=4)
    w = np.asarray(pruned["blocks"]["qkv"][0])
    nz = (w.reshape(-1, 4, w.shape[-1]) != 0).sum(1)
    assert (nz <= 2).all()


@pytest.mark.slow
def test_quantize_vit():
    params = vit.init_params(CFG, jax.random.PRNGKey(0))
    q = prune_vision.quantize_vit(params, CFG)
    w0 = np.asarray(params["blocks"]["fc1"])
    wq = np.asarray(q["blocks"]["fc1"])
    assert not np.allclose(w0, wq)
    assert np.abs(w0 - wq).max() < 0.5


class TestConvNeXt:
    def _setup(self, **kw):
        from mxq_tpu.vision import convnext
        cfg = convnext.ConvNeXtConfig.tiny(**kw)
        params = convnext.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        return convnext, cfg, params, imgs

    @pytest.mark.slow
    def test_forward(self):
        convnext, cfg, params, imgs = self._setup()
        logits = convnext.forward(params, imgs, cfg)
        assert logits.shape == (2, 10)
        assert np.all(np.isfinite(np.asarray(logits)))

    @pytest.mark.slow
    def test_prune_wanda_sparsity(self):
        convnext, cfg, params, imgs = self._setup()
        pruned = prune_vision.prune_convnext(params, cfg, imgs, sparsity=0.5)
        s = prune_vision.check_sparsity_convnext(pruned)
        assert abs(s - 0.5) < 0.05, s
        logits = convnext.forward(pruned, imgs, cfg)
        assert np.all(np.isfinite(np.asarray(logits)))

    @pytest.mark.slow
    def test_prune_wanda_differs_from_magnitude(self):
        convnext, cfg, params, imgs = self._setup()
        pw = prune_vision.prune_convnext(params, cfg, imgs, sparsity=0.5)
        pm = prune_vision.prune_convnext(params, cfg, imgs,
                                         method="magnitude", sparsity=0.5)
        w1 = np.asarray(pw["stages"][0]["blocks"]["pwconv1"])
        w2 = np.asarray(pm["stages"][0]["blocks"]["pwconv1"])
        assert ((w1 == 0) != (w2 == 0)).mean() > 0.01

    def test_prune_nm_structured(self):
        convnext, cfg, params, imgs = self._setup()
        pruned = prune_vision.prune_convnext(params, cfg, imgs,
                                             method="magnitude", n=2, m=4)
        w = np.asarray(pruned["stages"][1]["blocks"]["pwconv2"][0])
        nz = (w.reshape(-1, 4, w.shape[-1]) != 0).sum(1)
        assert (nz <= 2).all()

    @pytest.mark.slow
    def test_quantize(self):
        convnext, cfg, params, imgs = self._setup()
        q = prune_vision.quantize_convnext(params, cfg)
        ref = convnext.forward(params, imgs, cfg)
        out = convnext.forward(q, imgs, cfg)
        corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
        assert corr > 0.95, corr


class TestDeiTAndMixer:
    def test_deit_forward_and_prune(self):
        cfg = vit.ViTConfig.tiny(distilled=True)
        params = vit.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        logits = vit.forward(params, imgs, cfg)
        assert logits.shape == (2, 10)
        pruned = prune_vision.prune_vit(params, cfg, imgs, sparsity=0.5)
        s = prune_vision.check_sparsity(pruned)
        assert abs(s - 0.5) < 0.05, s
        out = vit.forward(pruned, imgs, cfg)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_deit_heads_both_contribute(self):
        cfg = vit.ViTConfig.tiny(distilled=True)
        params = vit.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        ref = vit.forward(params, imgs, cfg)
        p2 = dict(params)
        p2["head_dist"] = params["head_dist"] * 0.0
        out = vit.forward(p2, imgs, cfg)
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() > 1e-6

    def test_mixer_forward(self):
        from mxq_tpu.vision import mixer
        cfg = mixer.MixerConfig.tiny()
        params = mixer.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        logits = mixer.forward(params, imgs, cfg)
        assert logits.shape == (2, 10)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_mixer_quantized_close(self):
        from mxq_tpu.vision import mixer
        cfg = mixer.MixerConfig.tiny()
        qcfg = mixer.MixerConfig.tiny(w_bits=2)
        params = mixer.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        ref = mixer.forward(params, imgs, cfg)
        out = mixer.forward(params, imgs, qcfg)
        corr = np.corrcoef(np.asarray(ref).ravel(),
                           np.asarray(out).ravel())[0, 1]
        assert corr > 0.8, corr
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() > 1e-6


class TestSwin:
    @pytest.mark.slow
    def test_forward(self):
        from mxq_tpu.vision import swin
        cfg = swin.SwinConfig.tiny()
        params = swin.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        logits = swin.forward(params, imgs, cfg)
        assert logits.shape == (2, 10)
        assert np.all(np.isfinite(np.asarray(logits)))

    @pytest.mark.slow
    def test_shifted_windows_change_output(self):
        """SW-MSA must couple neighboring windows: zeroing the shift path
        (making all blocks W-MSA) changes the logits."""
        from mxq_tpu.vision import swin
        cfg = swin.SwinConfig.tiny(depths=(2,), num_heads=(2,), image_size=32,
                                   window_size=4)
        params = swin.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        ref = swin.forward(params, imgs, cfg)
        # monkeypatched forward with shift forced to 0
        import mxq_tpu.vision.swin as sw
        orig = sw.block
        try:
            sw.block = lambda x, p, c, res, nh, shift, ri, mask: orig(
                x, p, c, res, nh, 0, ri, None)
            out = sw.forward(params, imgs, cfg)
        finally:
            sw.block = orig
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() > 1e-6

    def test_window_partition_roundtrip(self):
        from mxq_tpu.vision import swin
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        w = swin.window_partition(x, 4)
        back = swin.window_reverse(w, 4, 8, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    @pytest.mark.slow
    def test_quantized_close(self):
        from mxq_tpu.vision import swin
        cfg = swin.SwinConfig.tiny(embed_dim=64)
        qcfg = swin.SwinConfig.tiny(embed_dim=64, w_bits=2)
        params = swin.init_params(cfg, jax.random.PRNGKey(0))
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        ref = swin.forward(params, imgs, cfg)
        out = swin.forward(params, imgs, qcfg)
        corr = np.corrcoef(np.asarray(ref).ravel(),
                           np.asarray(out).ravel())[0, 1]
        assert corr > 0.8, corr
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() > 1e-6


def test_vision_eval_topk():
    from mxq_tpu.vision import eval as veval
    cfg = vit.ViTConfig.tiny()
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    batches = list(veval.synthetic_batches(cfg.num_classes, 32, n=32))
    stats = veval.evaluate(vit.forward, params, cfg, batches)
    assert stats["n"] == 32
    assert 0.0 <= stats["acc1"] <= stats["acc5"] <= 1.0
