"""Vision Transformer in functional JAX — the counterpart of the reference's
vision side project (mxq_quant/image_classifiers/, Wanda-heritage pruning of
ViT/DeiT/ConvNeXt on ImageNet; models at image_classifiers/models/vit.py).

Same design as models/llama.py: params pytree, scan-stacked encoder blocks,
quantizable/prunable linears (the MXQ scheme applies to any [in, out] weight
whose in_features divides 64)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    w_bits: int = 32
    distilled: bool = False     # DeiT (models/deit.py:20-56): dist token +
                                # second head, eval = mean of both heads
    scheme: MXQConfig = dataclasses.field(default_factory=MXQConfig)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        d = dict(image_size=32, patch_size=8, hidden_size=128, num_layers=2,
                 num_heads=4, mlp_dim=256, num_classes=10)
        d.update(kw)
        return cls(**d)


BLOCK_LINEARS = ("qkv", "proj", "fc1", "fc2")


def init_params(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    h, l = cfg.hidden_size, cfg.num_layers
    patch_dim = 3 * cfg.patch_size ** 2

    def lin(k, i, o):
        return (jax.random.normal(k, (l, i, o)) / np.sqrt(i)).astype(dtype)

    blocks = {
        "qkv": lin(ks[0], h, 3 * h),
        "proj": lin(ks[1], h, h),
        "fc1": lin(ks[2], h, cfg.mlp_dim),
        "fc2": lin(ks[3], cfg.mlp_dim, h),
        "ln1": jnp.ones((l, h), dtype), "ln1_b": jnp.zeros((l, h), dtype),
        "ln2": jnp.ones((l, h), dtype), "ln2_b": jnp.zeros((l, h), dtype),
    }
    n_tok = cfg.num_patches + 1 + int(cfg.distilled)
    params = {
        "patch_embed": (jax.random.normal(ks[4], (patch_dim, h))
                        / np.sqrt(patch_dim)).astype(dtype),
        "pos_embed": (jax.random.normal(ks[5], (1, n_tok, h))
                      * 0.02).astype(dtype),
        "cls_token": jnp.zeros((1, 1, h), dtype),
        "blocks": blocks,
        "ln_f": jnp.ones((h,), dtype), "ln_f_b": jnp.zeros((h,), dtype),
        "head": (jax.random.normal(ks[6], (h, cfg.num_classes)) * 0.02
                 ).astype(dtype),
    }
    if cfg.distilled:
        params["dist_token"] = jnp.zeros((1, 1, h), dtype)
        params["head_dist"] = (jax.random.normal(ks[7], (h, cfg.num_classes))
                               * 0.02).astype(dtype)
    return params


def layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, w, cfg: ViTConfig):
    if 2 <= cfg.w_bits < 32:
        w = scheme.mxq_fake_quant_qat(w.T, cfg.scheme).T
    return x @ w


def block(x, p, cfg: ViTConfig):
    b, t, h = x.shape
    nh = cfg.num_heads
    d = h // nh
    y = layer_norm(x, p["ln1"], p["ln1_b"])
    qkv = _linear(y, p["qkv"], cfg).reshape(b, t, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    att = jax.nn.softmax(att, axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, h)
    x = x + _linear(ctx, p["proj"], cfg)
    y = layer_norm(x, p["ln2"], p["ln2_b"])
    x = x + _linear(jax.nn.gelu(_linear(y, p["fc1"], cfg)), p["fc2"], cfg)
    return x


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, patch*patch*3]."""
    b, hh, ww, c = images.shape
    x = images.reshape(b, hh // patch, patch, ww // patch, patch, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (hh // patch) * (ww // patch), patch * patch * c)


def embed(params, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Patch embedding + special tokens + positions: the encoder input."""
    x = patchify(images, cfg.patch_size) @ params["patch_embed"]
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, x.shape[-1]))
    toks = [cls]
    if cfg.distilled:
        toks.append(jnp.broadcast_to(params["dist_token"],
                                     (b, 1, x.shape[-1])))
    return jnp.concatenate(toks + [x], axis=1) + params["pos_embed"]


def forward(params, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """[B, H, W, 3] -> logits [B, num_classes]. DeiT mode (distilled):
    cls + dist tokens prepended, eval output = mean of the two heads
    (deit.py:51-56 inference branch)."""
    x = embed(params, images, cfg)

    def body(x, p):
        return block(x, p, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln_f"], params["ln_f_b"])
    if cfg.distilled:
        return (x[:, 0] @ params["head"] + x[:, 1] @ params["head_dist"]) / 2
    return x[:, 0] @ params["head"]
