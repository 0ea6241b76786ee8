"""MLP-Mixer in functional JAX — parity with the reference vision project's
mixer family (image_classifiers/models/mlp_mixer.py: MixerBlock :106-125,
MlpMixer :127-190, size presets :271-315).

Same design as vit.py: params pytree, scan-stacked blocks, quantizable
linears. Every block is two MLPs — token-mixing across the patch axis
(applied to x^T) and channel-mixing across features — both pure matmuls on
the MXU; the transpose is a relayout XLA handles for free inside the fused
block."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig


@dataclasses.dataclass(frozen=True)
class MixerConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    tokens_mlp_dim: int = 384
    channels_mlp_dim: int = 3072
    num_classes: int = 1000
    w_bits: int = 32
    scheme: MXQConfig = dataclasses.field(default_factory=MXQConfig)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def tiny(cls, **kw) -> "MixerConfig":
        d = dict(image_size=32, patch_size=8, hidden_size=128, num_layers=2,
                 tokens_mlp_dim=64, channels_mlp_dim=256, num_classes=10)
        d.update(kw)
        return cls(**d)


BLOCK_LINEARS = ("tok_fc1", "tok_fc2", "ch_fc1", "ch_fc2")


def init_params(cfg: MixerConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 7)
    h, l, p = cfg.hidden_size, cfg.num_layers, cfg.num_patches
    patch_dim = 3 * cfg.patch_size ** 2

    def lin(k, i, o):
        return (jax.random.normal(k, (l, i, o)) / np.sqrt(i)).astype(dtype)

    blocks = {
        "tok_fc1": lin(ks[0], p, cfg.tokens_mlp_dim),
        "tok_fc2": lin(ks[1], cfg.tokens_mlp_dim, p),
        "ch_fc1": lin(ks[2], h, cfg.channels_mlp_dim),
        "ch_fc2": lin(ks[3], cfg.channels_mlp_dim, h),
        "ln1": jnp.ones((l, h), dtype), "ln1_b": jnp.zeros((l, h), dtype),
        "ln2": jnp.ones((l, h), dtype), "ln2_b": jnp.zeros((l, h), dtype),
    }
    return {
        "patch_embed": (jax.random.normal(ks[4], (patch_dim, h))
                        / np.sqrt(patch_dim)).astype(dtype),
        "blocks": blocks,
        "ln_f": jnp.ones((h,), dtype), "ln_f_b": jnp.zeros((h,), dtype),
        "head": (jax.random.normal(ks[5], (h, cfg.num_classes)) * 0.02
                 ).astype(dtype),
    }


def _linear(x, w, cfg: MixerConfig):
    if 2 <= cfg.w_bits < 32 and w.shape[0] % 64 == 0:
        w = scheme.mxq_fake_quant_qat(w.T, cfg.scheme).T
    return x @ w


def block(x, p, cfg: MixerConfig):
    """MixerBlock (mlp_mixer.py:106-125): token-mix on x^T, channel-mix."""
    from mxq_tpu.vision.vit import layer_norm
    y = layer_norm(x, p["ln1"], p["ln1_b"]).swapaxes(1, 2)   # [B, C, P]
    y = _linear(jax.nn.gelu(_linear(y, p["tok_fc1"], cfg)),
                p["tok_fc2"], cfg).swapaxes(1, 2)
    x = x + y
    y = layer_norm(x, p["ln2"], p["ln2_b"])
    y = _linear(jax.nn.gelu(_linear(y, p["ch_fc1"], cfg)), p["ch_fc2"], cfg)
    return x + y


def forward(params, images: jax.Array, cfg: MixerConfig) -> jax.Array:
    """[B, H, W, 3] -> logits [B, num_classes] (mlp_mixer.py:180-190:
    blocks, final LN, global average pool over tokens, head)."""
    from mxq_tpu.vision.vit import layer_norm, patchify
    x = patchify(images, cfg.patch_size) @ params["patch_embed"]

    def body(x, p):
        return block(x, p, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln_f"], params["ln_f_b"])
    return jnp.mean(x, axis=1) @ params["head"]
