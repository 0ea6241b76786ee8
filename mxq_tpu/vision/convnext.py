"""ConvNeXt in functional JAX — the reference vision project's headline
pruning case (image_classifiers/models/convnext.py, pruned by
prune_utils.prune_convnext via main.py:327-332).

TPU-first design notes:

* NHWC (channels-last) layout end to end — the TPU conv layout — so the
  reference's permute-to-channels-last trick inside every block
  (convnext.py:40-52) disappears: LayerNorm and the pointwise linears act
  on the trailing axis natively, and the 1x1 convs ARE matmuls feeding the
  MXU directly.
* Blocks within a stage share shapes and are scan-stacked like the Llama
  decoder layers (one compiled block body per stage, weights [depth, ...]).
* The depthwise 7x7 conv uses lax.conv_general_dilated with
  feature_group_count=C (XLA lowers it to the VPU; the FLOPs live in the
  pointwise convs on the MXU).
* The pointwise convs (pwconv1/pwconv2 — nn.Linear in the reference and
  the layers its pruner targets, prune_utils.py:172) are quantizable with
  the MXQ scheme, same as the ViT block linears.

Inference/eval semantics only (stochastic depth and dropout are identity at
eval, convnext.py:35-36 — the reference vision flow is eval-only pruning,
main.py:338-341).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (96, 192, 384, 768)
    num_classes: int = 1000
    layer_scale_init: float = 1e-6
    eps: float = 1e-6
    w_bits: int = 32
    scheme: MXQConfig = dataclasses.field(default_factory=MXQConfig)

    @classmethod
    def tiny(cls, **kw) -> "ConvNeXtConfig":
        d = dict(depths=(2, 2), dims=(64, 128), num_classes=10)
        d.update(kw)
        return cls(**d)


BLOCK_LINEARS = ("pwconv1", "pwconv2")     # what the reference pruner targets


def init_params(cfg: ConvNeXtConfig, key: jax.Array,
                dtype=jnp.float32) -> dict:
    n_stage = len(cfg.depths)
    ks = iter(jax.random.split(key, 4 * n_stage + 4))

    def trunc(k, shape, fan_in):
        return (jax.random.truncated_normal(k, -2, 2, shape) * 0.02
                ).astype(dtype)

    stem_dim = cfg.dims[0]
    params = {
        # stem: 4x4/4 conv [kh, kw, cin, cout] + channels-last LN
        "stem_conv": trunc(next(ks), (4, 4, 3, stem_dim), 48),
        "stem_conv_b": jnp.zeros((stem_dim,), dtype),
        "stem_ln": jnp.ones((stem_dim,), dtype),
        "stem_ln_b": jnp.zeros((stem_dim,), dtype),
        "stages": [],
    }
    stages = []
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        st = {}
        if i > 0:
            prev = cfg.dims[i - 1]
            st["ds_ln"] = jnp.ones((prev,), dtype)
            st["ds_ln_b"] = jnp.zeros((prev,), dtype)
            st["ds_conv"] = trunc(next(ks), (2, 2, prev, dim), 4 * prev)
            st["ds_conv_b"] = jnp.zeros((dim,), dtype)
        bk = jax.random.split(next(ks), 3)
        st["blocks"] = {
            "dwconv": (jax.random.truncated_normal(
                bk[0], -2, 2, (depth, 7, 7, dim)) * 0.02).astype(dtype),
            "dwconv_b": jnp.zeros((depth, dim), dtype),
            "ln": jnp.ones((depth, dim), dtype),
            "ln_b": jnp.zeros((depth, dim), dtype),
            "pwconv1": (jax.random.truncated_normal(
                bk[1], -2, 2, (depth, dim, 4 * dim)) * 0.02).astype(dtype),
            "pwconv1_b": jnp.zeros((depth, 4 * dim), dtype),
            "pwconv2": (jax.random.truncated_normal(
                bk[2], -2, 2, (depth, 4 * dim, dim)) * 0.02).astype(dtype),
            "pwconv2_b": jnp.zeros((depth, dim), dtype),
            "gamma": jnp.full((depth, dim), cfg.layer_scale_init, dtype),
        }
        stages.append(st)
    params["stages"] = stages
    hd = cfg.dims[-1]
    params["norm"] = jnp.ones((hd,), dtype)
    params["norm_b"] = jnp.zeros((hd,), dtype)
    params["head"] = trunc(next(ks), (hd, cfg.num_classes), hd)
    params["head_b"] = jnp.zeros((cfg.num_classes,), dtype)
    return params


def layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, w, cfg: ConvNeXtConfig):
    if 2 <= cfg.w_bits < 32:
        w = scheme.mxq_fake_quant_qat(w.T, cfg.scheme).T
    return x @ w


def _dwconv(x, w, b):
    """Depthwise 7x7, NHWC: w [7, 7, C] -> grouped conv."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[..., None, :],                # [7, 7, 1, C] HWIO with groups=C
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c) + b


def block(x, p, cfg: ConvNeXtConfig):
    """One ConvNeXt block (convnext.py:38-54), channels-last throughout."""
    inp = x
    x = _dwconv(x, p["dwconv"], p["dwconv_b"])
    x = layer_norm(x, p["ln"], p["ln_b"], cfg.eps)
    x = _linear(x, p["pwconv1"], cfg) + p["pwconv1_b"]
    x = jax.nn.gelu(x)
    x = _linear(x, p["pwconv2"], cfg) + p["pwconv2_b"]
    x = p["gamma"] * x
    return inp + x


def downsample(x, st, cfg: ConvNeXtConfig, stage_idx: int, params):
    if stage_idx == 0:
        x = jax.lax.conv_general_dilated(
            x, params["stem_conv"], window_strides=(4, 4), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["stem_conv_b"]
        return layer_norm(x, params["stem_ln"], params["stem_ln_b"], cfg.eps)
    x = layer_norm(x, st["ds_ln"], st["ds_ln_b"], cfg.eps)
    return jax.lax.conv_general_dilated(
        x, st["ds_conv"], window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + st["ds_conv_b"]


def run_stage(x, st, cfg: ConvNeXtConfig):
    def body(x, p):
        return block(x, p, cfg), None

    x, _ = jax.lax.scan(body, x, st["blocks"])
    return x


def forward_features(params, images, cfg: ConvNeXtConfig):
    """[B, H, W, 3] NHWC -> pooled features [B, dims[-1]]
    (convnext.py:117-121: stages then global average pool then LN)."""
    x = images
    for i, st in enumerate(params["stages"]):
        x = downsample(x, st, cfg, i, params)
        x = run_stage(x, st, cfg)
    x = jnp.mean(x, axis=(1, 2))
    return layer_norm(x, params["norm"], params["norm_b"], cfg.eps)


def forward(params, images, cfg: ConvNeXtConfig):
    """[B, H, W, 3] -> logits [B, num_classes]."""
    x = forward_features(params, images, cfg)
    return x @ params["head"] + params["head_b"]
