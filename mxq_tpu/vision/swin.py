"""Swin Transformer in functional JAX — parity with the reference vision
family (image_classifiers/models/swin_transformer.py: WindowAttention
:132-205, SwinTransformerBlock :207-315, PatchMerging :317-355,
SwinTransformer :408-575).

TPU-first notes: windows are carved with reshapes/transposes (free relayouts
under XLA), cyclic shifts are jnp.roll, and all attention runs as one batched
einsum over [B * num_windows, win*win, C] — every matmul lands on the MXU at
window granularity. Relative-position-bias indices and the shifted-window
attention masks are precomputed host-side per stage (they're static for a
given resolution, exactly like the reference's registered buffers).
Eval semantics (dropout/drop-path identity). The four per-block linears
(qkv/proj/fc1/fc2) are quantizable with the MXQ scheme like the ViT's.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig
from mxq_tpu.vision.vit import layer_norm


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: int = 4
    num_classes: int = 1000
    w_bits: int = 32
    scheme: MXQConfig = dataclasses.field(default_factory=MXQConfig)

    @classmethod
    def tiny(cls, **kw) -> "SwinConfig":
        d = dict(image_size=32, patch_size=4, embed_dim=32, depths=(2, 2),
                 num_heads=(2, 4), window_size=4, num_classes=10)
        d.update(kw)
        return cls(**d)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)

    def stage_res(self, i: int) -> int:
        return self.image_size // self.patch_size // (2 ** i)


BLOCK_LINEARS = ("qkv", "proj", "fc1", "fc2")


def rel_pos_index(ws: int) -> np.ndarray:
    """Pairwise relative-position index inside one window
    (swin_transformer.py get_relative_position_index)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(res: int, ws: int, shift: int) -> np.ndarray:
    """0/-100 mask [num_win, N, N] for shifted windows
    (swin_transformer.py:258-273)."""
    img = np.zeros((res, res))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wslice] = cnt
            cnt += 1
    win = img.reshape(res // ws, ws, res // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def init_params(cfg: SwinConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    n_stage = len(cfg.depths)
    ks = iter(jax.random.split(key, 8 * sum(cfg.depths) + 4 * n_stage + 4))

    def lin(i, o):
        return (jax.random.normal(next(ks), (i, o)) / np.sqrt(i)).astype(dtype)

    patch_dim = 3 * cfg.patch_size ** 2
    params = {
        "patch_embed": lin(patch_dim, cfg.embed_dim),
        "patch_ln": jnp.ones((cfg.embed_dim,), dtype),
        "patch_ln_b": jnp.zeros((cfg.embed_dim,), dtype),
        "stages": [],
    }
    ws = cfg.window_size
    for i in range(n_stage):
        dim = cfg.stage_dim(i)
        nh = cfg.num_heads[i]
        st = {"blocks": []}
        if i > 0:
            prev = cfg.stage_dim(i - 1)
            st["merge_ln"] = jnp.ones((4 * prev,), dtype)
            st["merge_ln_b"] = jnp.zeros((4 * prev,), dtype)
            st["merge"] = lin(4 * prev, dim)
        for _ in range(cfg.depths[i]):
            st["blocks"].append({
                "ln1": jnp.ones((dim,), dtype),
                "ln1_b": jnp.zeros((dim,), dtype),
                "qkv": lin(dim, 3 * dim),
                "qkv_b": jnp.zeros((3 * dim,), dtype),
                "proj": lin(dim, dim),
                "proj_b": jnp.zeros((dim,), dtype),
                "rel_bias": (jax.random.normal(
                    next(ks), ((2 * ws - 1) ** 2, nh)) * 0.02).astype(dtype),
                "ln2": jnp.ones((dim,), dtype),
                "ln2_b": jnp.zeros((dim,), dtype),
                "fc1": lin(dim, cfg.mlp_ratio * dim),
                "fc1_b": jnp.zeros((cfg.mlp_ratio * dim,), dtype),
                "fc2": lin(cfg.mlp_ratio * dim, dim),
                "fc2_b": jnp.zeros((dim,), dtype),
            })
        params["stages"].append(st)
    hd = cfg.stage_dim(n_stage - 1)
    params["norm"] = jnp.ones((hd,), dtype)
    params["norm_b"] = jnp.zeros((hd,), dtype)
    params["head"] = lin(hd, cfg.num_classes)
    return params


def _linear(x, w, cfg: SwinConfig):
    if 2 <= cfg.w_bits < 32 and w.shape[0] % 64 == 0:
        w = scheme.mxq_fake_quant_qat(w.T, cfg.scheme).T
    return x @ w


def window_partition(x, ws):
    """[B, H, W, C] -> [B * nWin, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x, ws, h, w):
    c = x.shape[-1]
    x = x.reshape(-1, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def window_attention(xw, p, nh, rel_idx, mask, cfg: SwinConfig):
    """[BW, N, C] windowed MHA with relative position bias
    (swin_transformer.py:177-205)."""
    bw, n, c = xw.shape
    d = c // nh
    qkv = (_linear(xw, p["qkv"], cfg) + p["qkv_b"]).reshape(bw, n, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    bias = p["rel_bias"][rel_idx.reshape(-1)].reshape(n, n, nh)
    att = att + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        att = att.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None]
        att = att.reshape(bw, nh, n, n)
    att = jax.nn.softmax(att, axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", att, v).reshape(bw, n, c)
    return _linear(ctx, p["proj"], cfg) + p["proj_b"]


def block(x, p, cfg: SwinConfig, res, nh, shift, rel_idx, mask):
    """One (S)W-MSA block (swin_transformer.py:277-315). x [B, H*W, C]."""
    b, l, c = x.shape
    ws = min(cfg.window_size, res)
    shortcut = x
    x = layer_norm(x, p["ln1"], p["ln1_b"]).reshape(b, res, res, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = window_partition(x, ws)
    xw = window_attention(xw, p, nh, rel_idx, mask, cfg)
    x = window_reverse(xw, ws, res, res)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, l, c)
    y = layer_norm(x, p["ln2"], p["ln2_b"])
    y = _linear(jax.nn.gelu(_linear(y, p["fc1"], cfg) + p["fc1_b"]),
                p["fc2"], cfg) + p["fc2_b"]
    return x + y


def patch_merge(x, st, res):
    """[B, H*W, C] -> [B, H/2*W/2, 2C] (swin_transformer.py:333-345)."""
    b, l, c = x.shape
    x = x.reshape(b, res // 2, 2, res // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, (res // 2) ** 2, 4 * c)
    x = layer_norm(x, st["merge_ln"], st["merge_ln_b"])
    return x @ st["merge"]


def forward(params, images, cfg: SwinConfig):
    """[B, H, W, 3] -> logits [B, num_classes]."""
    from mxq_tpu.vision.vit import patchify
    x = patchify(images, cfg.patch_size) @ params["patch_embed"]
    x = layer_norm(x, params["patch_ln"], params["patch_ln_b"])

    for i, st in enumerate(params["stages"]):
        res = cfg.stage_res(i)
        if i > 0:
            x = patch_merge(x, st, cfg.stage_res(i - 1))
        ws = min(cfg.window_size, res)
        rel_idx = jnp.asarray(rel_pos_index(ws))
        for j, bp in enumerate(st["blocks"]):
            # blocks alternate W-MSA / SW-MSA (shift = ws // 2)
            shift = 0 if (j % 2 == 0 or ws >= res) else ws // 2
            mask = (jnp.asarray(shift_attn_mask(res, ws, shift))
                    if shift > 0 else None)
            x = block(x, bp, cfg, res, cfg.num_heads[i], shift, rel_idx, mask)

    x = layer_norm(x, params["norm"], params["norm_b"])
    return jnp.mean(x, axis=1) @ params["head"]
