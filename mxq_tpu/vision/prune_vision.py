"""Calibration-based pruning/quantization of vision transformers — the
counterpart of image_classifiers/main.py + prune_utils.py (prune_convnext/vit,
image_classifiers/main.py:327-332): one calibration batch, per-block Wanda or
magnitude masks over the 4 linears, sequential re-forward."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mxq_tpu.ptq import prune as prune_lib
from mxq_tpu.vision import vit
from mxq_tpu import scheme


def _block_inputs(x, p, cfg: vit.ViTConfig):
    """Activations feeding each linear of one encoder block."""
    import numpy as np
    b, t, h = x.shape
    nh = cfg.num_heads
    d = h // nh
    y1 = vit.layer_norm(x, p["ln1"], p["ln1_b"])
    qkv = (y1 @ p["qkv"]).reshape(b, t, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jax.nn.softmax(jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d), -1)
    ctx = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, h)
    x2 = x + ctx @ p["proj"]
    y2 = vit.layer_norm(x2, p["ln2"], p["ln2_b"])
    f1 = jax.nn.gelu(y2 @ p["fc1"])
    return {"qkv": y1, "proj": ctx, "fc1": y2, "fc2": f1}


def prune_vit(params: dict, cfg: vit.ViTConfig, images: jax.Array,
              method: str = "wanda", sparsity: float = 0.5,
              n: int = 0, m: int = 0) -> dict:
    """Sequential block-by-block pruning with one calibration batch (also
    covers DeiT: cfg.distilled adds the dist token, prune flow identical —
    the reference routes deit through prune_vit too, main.py:330-332)."""
    x = vit.embed(params, images, cfg)

    @jax.jit
    def prune_block(x, p):
        inputs = _block_inputs(x, p, cfg)
        new_p = dict(p)
        for name in vit.BLOCK_LINEARS:
            w = p[name]
            col_sq = jnp.sum(
                inputs[name].reshape(-1, w.shape[0]).astype(jnp.float32) ** 2,
                axis=0)
            if method == "magnitude":
                keep = prune_lib.magnitude_mask(w, sparsity, n, m)
            else:
                keep = prune_lib.wanda_mask(w, col_sq, sparsity, n, m)
            new_p[name] = w * keep
        return new_p, vit.block(x, new_p, cfg)

    stacked = params["blocks"]
    new_stacks = {k: [] for k in stacked}
    for i in range(cfg.num_layers):
        p = {k: v[i] for k, v in stacked.items()}
        new_p, x = prune_block(x, p)
        for k in stacked:
            new_stacks[k].append(new_p[k])

    out = dict(params)
    out["blocks"] = {k: jnp.stack(v) for k, v in new_stacks.items()}
    return out


def prune_convnext(params: dict, cfg, images: jax.Array,
                   method: str = "wanda", sparsity: float = 0.5,
                   n: int = 0, m: int = 0) -> dict:
    """Stage-by-stage ConvNeXt pruning of the pointwise-conv linears —
    prune_utils.prune_convnext (image_classifiers/prune_utils.py:164-230):
    per stage, forward the UNPRUNED blocks once to collect each linear's
    input activation stats (WrappedLayer scaler_row), then apply
    Wanda/magnitude masks; the next stage calibrates on the unpruned
    stage's outputs, exactly like the reference (it prunes after the hooked
    forward and never re-forwards)."""
    from mxq_tpu.vision import convnext

    x = images
    new_stages = []
    for i, st in enumerate(params["stages"]):
        x = convnext.downsample(x, st, cfg, i, params)
        blocks = st["blocks"]
        depth = blocks["pwconv1"].shape[0]
        newb = {k: [] for k in blocks}
        for j in range(depth):
            p = {k: v[j] for k, v in blocks.items()}
            # inputs feeding each prunable linear (unpruned weights)
            h = convnext._dwconv(x, p["dwconv"], p["dwconv_b"])
            a1 = convnext.layer_norm(h, p["ln"], p["ln_b"], cfg.eps)
            a2 = jax.nn.gelu(a1 @ p["pwconv1"] + p["pwconv1_b"])
            ins = {"pwconv1": a1, "pwconv2": a2}
            x = convnext.block(x, p, cfg)          # unpruned propagation
            for name in convnext.BLOCK_LINEARS:
                w = p[name]
                if method == "magnitude":
                    keep = prune_lib.magnitude_mask(w, sparsity, n, m)
                else:
                    col_sq = jnp.sum(
                        ins[name].reshape(-1, w.shape[0]).astype(jnp.float32)
                        ** 2, axis=0)
                    keep = prune_lib.wanda_mask(w, col_sq, sparsity, n, m)
                p[name] = w * keep
            for k in blocks:
                newb[k].append(p[k])
        new_stages.append({**st, "blocks": {k: jnp.stack(v)
                                            for k, v in newb.items()}})
    out = dict(params)
    out["stages"] = new_stages
    return out


def check_sparsity_convnext(params: dict) -> float:
    from mxq_tpu.vision import convnext
    zeros = total = 0
    for st in params["stages"]:
        for name in convnext.BLOCK_LINEARS:
            w = st["blocks"][name]
            zeros += float(jnp.sum(w == 0))
            total += w.size
    return zeros / max(total, 1)


def quantize_convnext(params: dict, cfg) -> dict:
    """MXQ quant-dequant of the pointwise-conv linears (beyond-reference:
    the reference's vision project only prunes)."""
    from mxq_tpu.vision import convnext
    out = dict(params)
    out["stages"] = [
        {**st, "blocks": {
            **st["blocks"],
            **{name: jax.vmap(
                lambda w: scheme.mxq_fake_quant_ptq(w.T, cfg.scheme).T)(
                    st["blocks"][name])
               for name in convnext.BLOCK_LINEARS
               if st["blocks"][name].shape[1] % 64 == 0}}}
        for st in params["stages"]]
    return out


def quantize_vit(params: dict, cfg: vit.ViTConfig) -> dict:
    """MXQ quant-dequant of all block linears (beyond-reference: the
    reference's vision project only prunes)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in vit.BLOCK_LINEARS:
        blocks[name] = jax.vmap(
            lambda w: scheme.mxq_fake_quant_ptq(w.T, cfg.scheme).T)(
                blocks[name])
    out["blocks"] = blocks
    return out


def check_sparsity(params: dict) -> float:
    zeros = total = 0
    for name in vit.BLOCK_LINEARS:
        w = params["blocks"][name]
        zeros += float(jnp.sum(w == 0))
        total += w.size
    return zeros / max(total, 1)
