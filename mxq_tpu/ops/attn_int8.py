"""Fused int8-KV decode attention (pallas).

The serving engine stores the KV cache as int8 codes + per-(head, token)
bf16 scales (serving/kvcache.py). Round 1 dequantized the ENTIRE cache to
bf16 every decode step (kvcache.cache_read_layer) — paying the full bf16
read AND the dequant, which made int8 KV a regression (docs/RESULTS.md r1).
This kernel consumes the codes directly:

  per (batch, kv-head):   s   = (q @ K_codes^T) * k_scale      [G, S]
                          p   = softmax(s / sqrt(d) + mask)
                          ctx = (p * v_scale) @ V_codes         [G, D]

so HBM traffic is the int8 codes (half of bf16) and the dequant multiplies
collapse to one vector op per row — the scale is per-token (group =
head_dim), so it factors out of both dots (the same algebra the reference's
CUDA GEMV uses for its per-group scales, gemv_mxq_cuda.cu:135-136).

Cache layout contract (quantized serving cache only): codes
[B, H_kv, S, D] int8, scales [B, H_kv, S] bf16 — per-head-contiguous so
each grid step DMAs one dense [S, D] block. Requires group == head_dim.

GQA: the G = H_q // H_kv query heads of a kv head are processed together
(padded to >= 8 sublanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.finfo(np.float32).min)

# t==1 decode cache-write strategy (env MXQ_WRITE_PATH; bench.py times
# all three and the fastest wins the headline):
#   "fused"    — folded-stack read + in-kernel ALIASED row writes
#   "folded"   — folded-stack read, ctx-only output, post-scan commits
#                (keeps Mosaic's cross-grid-step DMA prefetch)
#   "deferred" — r3 path: layer-view copy + post-scan commits
import os as _os

WRITE_PATH = _os.environ.get("MXQ_WRITE_PATH", "fused")
assert WRITE_PATH in ("fused", "folded", "deferred"), WRITE_PATH


def _attend(q, kc, ks, vc, vs, pos, scale, cur=None):
    """Batched-by-head attention math on VALUES:
    q [HB, G8, D] bf16, kc/vc [HB, S, D] int8, ks/vs [HB, 1, S] bf16.

    ``cur``: optional (kcur [HB, 1, D] int8, kscur [HB, 1, 1] bf16, vcur,
    vscur) — the CURRENT token's quantized K/V handled out-of-cache. With
    cur, cache rows are masked STRICTLY below ``pos`` and the current
    token's logit/value enter the softmax separately, so the caller can
    defer the cache write to after the layer scan (the per-layer
    dynamic_update_slice chain cost ~1.05 ms of the 8.9 ms 7B decode step,
    docs/RESULTS.md r3 trace)."""
    st = jax.lax.dot_general(
        q, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [HB, G8, S]
    st = st * (ks.astype(jnp.float32) * scale)

    kpos = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
    if cur is None:
        st = jnp.where(kpos <= pos, st, NEG)
        m = jnp.max(st, axis=2, keepdims=True)
    else:
        kcur, kscur, vcur, vscur = cur
        st = jnp.where(kpos < pos, st, NEG)
        stc = jax.lax.dot_general(
            q, kcur, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [HB, G8, 1]
        stc = stc * (kscur.astype(jnp.float32) * scale)
        m = jnp.maximum(jnp.max(st, axis=2, keepdims=True), stc)
    p = jnp.exp(st - m)
    denom = jnp.sum(p, axis=2, keepdims=True)

    pv = (p * vs.astype(jnp.float32)).astype(jnp.bfloat16)
    ctx = jax.lax.dot_general(
        pv, vc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [HB, G8, D]
    if cur is not None:
        pc = jnp.exp(stc - m)                          # [HB, G8, 1]
        denom = denom + pc
        # round (p * v_scale) to bf16 exactly as the in-cache rows do in
        # ``pv`` above, so deferred-write results are bit-compatible with
        # write-then-attend (int8 codes are exact in bf16)
        pcb = (pc * vscur.astype(jnp.float32)).astype(jnp.bfloat16)
        ctx = ctx + (pcb.astype(jnp.float32)
                     * vcur.astype(jnp.float32))       # bcast [HB, G8, D]
    return ctx / denom


def _kernel(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref, o_ref, *,
            scale):
    """One (batch, head-block) step: HB heads attend via batched MXU dots
    (batch dim = heads), so the grid has B * H/HB fat steps instead of
    B * H tiny ones."""
    b = pl.program_id(0)
    pos = pos_ref[b]
    ctx = _attend(q_ref[0], kc_ref[0], ks_ref[0], vc_ref[0], vs_ref[0],
                  pos, scale)
    o_ref[0] = ctx.astype(o_ref.dtype)


def _pick_head_block(hkv: int, s: int, d: int) -> int:
    """Largest head count per grid step keeping the int8 K+V blocks under
    ~4 MB of VMEM."""
    budget = 4 * 1024 * 1024
    hb = max(1, min(hkv, budget // max(2 * s * d, 1)))
    while hkv % hb:
        hb -= 1
    return hb


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def _attn_call(q, kc, ks, vc, vs, positions, *, interpret):
    b, hkv, g8, d = q.shape
    s = kc.shape[2]
    hb = _pick_head_block(hkv, s, d)
    grid = (b, hkv // hb)
    scale = 1.0 / float(np.sqrt(d))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, g8, d), lambda bi, hi, p: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, s, d), lambda bi, hi, p: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, s), lambda bi, hi, p: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, s, d), lambda bi, hi, p: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, s), lambda bi, hi, p: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, g8, d), lambda bi, hi, p: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(positions.astype(jnp.int32), q, kc, ks[:, :, None, :], vc,
      vs[:, :, None, :])


def _kernel_cur(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                kcur_ref, kscur_ref, vcur_ref, vscur_ref, o_ref, *, scale):
    b = pl.program_id(0)
    pos = pos_ref[b]
    cur = (kcur_ref[0], kscur_ref[0], vcur_ref[0], vscur_ref[0])
    ctx = _attend(q_ref[0], kc_ref[0], ks_ref[0], vc_ref[0], vs_ref[0],
                  pos, scale, cur=cur)
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_call_cur(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur, positions,
                   *, interpret):
    b, hkv, g8, d = q.shape
    s = kc.shape[2]
    hb = _pick_head_block(hkv, s, d)
    grid = (b, hkv // hb)
    scale = 1.0 / float(np.sqrt(d))
    hspec = lambda shp: pl.BlockSpec(  # noqa: E731 — per-(batch, head) block
        (1, hb) + shp, lambda bi, hi, p: (bi, hi) + (0,) * len(shp),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            hspec((g8, d)),                 # q
            hspec((s, d)),                  # k codes
            hspec((1, s)),                  # k scale
            hspec((s, d)),                  # v codes
            hspec((1, s)),                  # v scale
            hspec((1, d)),                  # current k codes
            hspec((1, 1)),                  # current k scale
            hspec((1, d)),                  # current v codes
            hspec((1, 1)),                  # current v scale
        ],
        out_specs=hspec((g8, d)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_cur, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(positions.astype(jnp.int32), q, kc, ks[:, :, None, :], vc,
      vs[:, :, None, :], kcur, kscur[:, :, :, None], vcur,
      vscur[:, :, :, None])


def int8_decode_attention_cur(q, k_codes, k_scale, v_codes, v_scale,
                              kcur, kscur, vcur, vscur, positions,
                              interpret: bool | None = None) -> jax.Array:
    """One-token attention with the CURRENT token's quantized K/V passed
    out-of-cache (deferred-write decode).

    q:          [B, H_q, D]
    k/v_codes:  [B, H_kv, S, D] int8 — history only; rows >= positions[b]
                are ignored (strict mask)
    k/v_scale:  [B, H_kv, S] bf16
    kcur/vcur:  [B, H_kv, 1, D] int8 — this step's quantized K/V
    kscur/vscur:[B, H_kv, 1] bf16
    positions:  [B] int32 — the current token's position
    Returns [B, H_q, D] f32 — identical math to writing the current row at
    ``positions`` and attending with the mask at <= positions.
    """
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_codes.shape[1]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    out = _attn_call_cur(qg, k_codes, k_scale, v_codes, v_scale,
                         kcur, kscur, vcur, vscur, positions,
                         interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


def _stacked_kernel(pos_ref, idx_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                    o_ref, *, scale):
    del idx_ref   # consumed by the BlockSpec index maps
    b = pl.program_id(0)
    pos = pos_ref[b]
    ctx = _attend(q_ref[0], kc_ref[0, 0], ks_ref[0, 0], vc_ref[0, 0],
                  vs_ref[0, 0], pos, scale)
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_call_stacked(q, kc, ks, vc, vs, positions, idx, *, interpret):
    """Like _attn_call but the cache leaves keep their stacked [L, ...]
    layout and the traced layer index rides scalar prefetch — the kernel
    DMAs the layer's blocks straight out of the stack, so no [B, H, S, D]
    layer view ever materializes (device-trace r3: that copy cost ~0.85
    ms/step of the 7B decode, 2.6x the attention math itself)."""
    b, hkv, g8, d = q.shape
    s = kc.shape[3]
    hb = _pick_head_block(hkv, s, d)
    grid = (b, hkv // hb)
    scale = 1.0 / float(np.sqrt(d))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, g8, d), lambda bi, hi, p, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, s, d),
                         lambda bi, hi, p, i: (i[0], bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, 1, s),
                         lambda bi, hi, p, i: (i[0], bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, s, d),
                         lambda bi, hi, p, i: (i[0], bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, 1, s),
                         lambda bi, hi, p, i: (i[0], bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, g8, d),
                               lambda bi, hi, p, i: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_stacked_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(positions.astype(jnp.int32),
      jnp.asarray(idx, jnp.int32).reshape(1),
      q, kc, ks[:, :, :, None, :], vc, vs[:, :, :, None, :])


def int8_decode_attention_stacked(q, k_codes, k_scale, v_codes, v_scale,
                                  layer_idx, positions,
                                  interpret: bool | None = None
                                  ) -> jax.Array:
    """One-token attention over ONE layer of the stacked quantized cache.

    q:         [B, H_q, D]
    k/v_codes: [L, B, H_kv, S, D] int8 (the full stack, NOT a layer view)
    k/v_scale: [L, B, H_kv, S]    bf16
    layer_idx: traced scalar — which layer to attend
    positions: [B] int32
    Returns [B, H_q, D] f32.
    """
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_codes.shape[2]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    out = _attn_call_stacked(qg, k_codes, k_scale, v_codes, v_scale,
                             positions, layer_idx, interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _kernel_cur_write(pos_ref, idx_ref, q_ref, kc_ref, ks_ref, vc_ref,
                      vs_ref, kcur_ref, kscur_ref, vcur_ref, vscur_ref,
                      o_ref, kcw_ref, vcw_ref, *, scale):
    del idx_ref   # consumed by the BlockSpec index maps
    b = pl.program_id(0)
    pos = pos_ref[b]
    cur = (kcur_ref[0], kscur_ref[0], vcur_ref[0], vscur_ref[0])
    # scale blocks are 3-D (1, hb, s) when S is lane-aligned (avoids the
    # full-stack copy a 4-D view costs per scan iteration — r4 trace
    # copy.138/139); 4-D otherwise (Mosaic cannot lower the expand)
    ks = ks_ref[0][:, None, :] if ks_ref.ndim == 3 else ks_ref[0]
    vs = vs_ref[0][:, None, :] if vs_ref.ndim == 3 else vs_ref[0]
    ctx = _attend(q_ref[0], kc_ref[0], ks, vc_ref[0], vs, pos, scale,
                  cur=cur)
    o_ref[0] = ctx.astype(o_ref.dtype)
    # commit the current token's code rows for this (batch, head-block):
    # the output blocks are (1, hb, 8, d) windows of the ALIASED cache
    # buffers positioned at row-octet ``positions[b] // 8`` by their index
    # maps (Mosaic requires the last-two block dims be multiples of
    # (8, 128) — a single row is not expressible), so 8 rows travel back
    # to HBM instead of the full [S, D] block. The 7 sibling rows are
    # copied through unchanged from the input block (history below pos,
    # never-written garbage above — both must round-trip verbatim).
    base = (pos // 8) * 8
    r = pos - base
    hb8d = kcw_ref.shape[1:]
    rowi = jax.lax.broadcasted_iota(jnp.int32, hb8d, 1)
    wink = kc_ref[0, :, pl.ds(base, 8), :]
    winv = vc_ref[0, :, pl.ds(base, 8), :]
    kcw_ref[0] = jnp.where(rowi == r, kcur_ref[0], wink)
    vcw_ref[0] = jnp.where(rowi == r, vcur_ref[0], winv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_call_cur_write(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                         positions, idx, *, interpret):
    """Deferred-write decode attention over the FOLDED stacked cache.

    ``kc``/``vc`` arrive as [L*B, H, S, D] (the stacked [L, B, ...] cache
    with its two leading dims collapsed — a free bitcast), ``ks``/``vs`` as
    [L*B, H, 1, S]. The traced layer index rides scalar prefetch and the
    index maps address row ``idx*B + bi``, so blocks stay 4-D — the r3
    5-D-block variant paid a Mosaic DMA penalty that swamped the copy it
    avoided (59.3 vs 38.6 us/layer, docs/RESULTS.md); 4-D blocks over the
    folded stack are shaped exactly like the layer-view kernel's.

    The current token's code rows are written IN-KERNEL through outputs
    aliased to the cache inputs, with (1, hb, 8, d) blocks index-mapped to
    the row-octet holding ``positions[b]`` — replacing both the per-layer
    layer-view copies
    (~0.79 ms/step on 7B) and the post-scan dynamic_update_slice commits of
    the codes (~0.24 ms/step); only the (tiny) scale rows still commit
    after the scan. Requires S > max(positions): the engine retires a slot
    at max_len - 1, so the write row never aliases the causal read window.
    """
    b, hkv, g8, d = q.shape
    lb, _, s, _ = kc.shape
    hb = _pick_head_block(hkv, s, d)
    grid = (b, hkv // hb)
    scale = 1.0 / float(np.sqrt(d))
    nb = b
    # ks/vs arrive [L*B, H, S]. The 3-D block + in-kernel [:, None, :]
    # expand avoids the full-stack copy a [L*B, H, 1, S] view costs per
    # scan iteration (r4 trace) — but Mosaic can only lower that expand
    # when S is a lane multiple; other shapes keep the 4-D view (the copy
    # is the price of an unaligned cache length).
    scale3d = s % 128 == 0

    def cache_spec(shp3):
        return pl.BlockSpec(
            (1, hb) + shp3,
            lambda bi, hi, p, i: (i[0] * nb + bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    def scale_spec():
        if scale3d:
            return pl.BlockSpec(
                (1, hb, s), lambda bi, hi, p, i: (i[0] * nb + bi, hi, 0),
                memory_space=pltpu.VMEM)
        return cache_spec((1, s))

    def cur_spec(shp3):
        return pl.BlockSpec(
            (1, hb) + shp3, lambda bi, hi, p, i: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            cur_spec((g8, d)),              # q
            cache_spec((s, d)),             # k codes (folded stack)
            scale_spec(),                   # k scale
            cache_spec((s, d)),             # v codes
            scale_spec(),                   # v scale
            cur_spec((1, d)),               # current k codes
            cur_spec((1, 1)),               # current k scale
            cur_spec((1, d)),               # current v codes
            cur_spec((1, 1)),               # current v scale
        ],
        out_specs=[
            cur_spec((g8, d)),              # ctx
            # 8-row write windows into the aliased cache buffers (row-octet
            # containing positions[b]; Mosaic's minimum S-axis block is 8)
            pl.BlockSpec((1, hb, 8, d),
                         lambda bi, hi, p, i: (i[0] * nb + bi, hi,
                                               p[bi] // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 8, d),
                         lambda bi, hi, p, i: (i[0] * nb + bi, hi,
                                               p[bi] // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_cur_write, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        # input indices INCLUDE the scalar-prefetch args: 0 = positions,
        # 1 = idx, 2 = q, 3 = k codes, 5 = v codes
        input_output_aliases={3: 1, 5: 2},
        interpret=interpret,
    )(positions.astype(jnp.int32), jnp.asarray(idx, jnp.int32).reshape(1),
      q, kc, ks, vc, vs, kcur, kscur[:, :, :, None], vcur,
      vscur[:, :, :, None])  # ks/vs: [L*B, H, S]


def int8_decode_attention_fused_write(q, k_codes, k_scale, v_codes, v_scale,
                                      kcur, kscur, vcur, vscur, layer_idx,
                                      positions,
                                      interpret: bool | None = None):
    """Deferred-write decode attention reading layer ``layer_idx`` straight
    out of the STACKED cache and committing the current token's code rows
    in-kernel (aliased outputs).

    q:          [B, H_q, D]
    k/v_codes:  [L, B, H_kv, S, D] int8 — the full stack
    k/v_scale:  [L, B, H_kv, S] bf16
    kcur/vcur:  [B, H_kv, 1, D] int8 — this step's quantized K/V
    kscur/vscur:[B, H_kv, 1] bf16
    layer_idx:  traced scalar
    positions:  [B] int32
    Returns (ctx [B, H_q, D] f32, new_k_codes, new_v_codes) — the code
    stacks with row ``positions[b]`` of layer ``layer_idx`` updated; the
    SCALE rows are NOT written (the caller commits them, they are ~1000x
    smaller). Math identical to int8_decode_attention_cur.
    """
    if interpret is None:
        interpret = _on_cpu()
    l, b, hkv, s, d = k_codes.shape
    hq = q.shape[1]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    fold = lambda c: c.reshape(l * b, hkv, s, d)        # noqa: E731
    # 3-D scale fold when S is lane-aligned: merging leading dims is a
    # pure bitcast; inserting a size-1 dim is not (r4 trace). Unaligned S
    # keeps the 4-D view (Mosaic limitation; costs the copy).
    folds = (lambda c: c.reshape(l * b, hkv, s)) if s % 128 == 0 \
        else (lambda c: c.reshape(l * b, hkv, 1, s))     # noqa: E731
    out, kc2, vc2 = _attn_call_cur_write(
        qg, fold(k_codes), folds(k_scale), fold(v_codes), folds(v_scale),
        kcur, kscur, vcur, vscur, positions, layer_idx, interpret=interpret)
    return (out[:, :, :g, :].reshape(b, hq, d),
            kc2.reshape(l, b, hkv, s, d), vc2.reshape(l, b, hkv, s, d))


def int8_decode_attention(q, k_codes, k_scale, v_codes, v_scale, positions,
                          interpret: bool | None = None) -> jax.Array:
    """One-token attention over the quantized cache.

    q:         [B, H_q, D]   (T=1 squeezed)
    k/v_codes: [B, H_kv, S, D] int8
    k/v_scale: [B, H_kv, S]    bf16 (group == head_dim)
    positions: [B] int32 — index of the CURRENT token (mask keys > pos)
    Returns [B, H_q, D] f32.
    """
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_codes.shape[1]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    out = _attn_call(qg, k_codes, k_scale, v_codes, v_scale, positions,
                     interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


def int8_decode_attention_reference(q, k_codes, k_scale, v_codes, v_scale,
                                    positions) -> jax.Array:
    """jnp oracle: dequantize-then-attend (the round-1 path, kept as the
    correctness reference and CPU fallback)."""
    b, hq, d = q.shape
    hkv = k_codes.shape[1]
    k = k_codes.astype(jnp.float32) * k_scale.astype(jnp.float32)[..., None]
    v = v_codes.astype(jnp.float32) * v_scale.astype(jnp.float32)[..., None]
    if hkv != hq:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    qf = q.astype(jnp.float32)
    st = jnp.einsum("bhd,bhsd->bhs", qf, k) / np.sqrt(d)
    s = k.shape[2]
    mask = jnp.arange(s)[None, None, :] <= positions[:, None, None]
    st = jnp.where(mask, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, v)


# ---------------------------------------------------------------------------
# Paged int8 KV decode attention
# ---------------------------------------------------------------------------
#
# The paged pool stores quantized pages:
#   k/v pages : [KVH, P, PAGE, D] int8     (PAGE = 128, see below)
#   scales    : [KVH, P, 1, PAGE] bf16     (per-(head, token) like the dense
#                                           int8 cache; group == head_dim)
# One grid step attends one (batch, kv-head, page); pages arrive via
# scalar-prefetched page-table index maps (the same addressing idea as the
# upstream bf16 paged_attention kernel) and a flash-style running
# (max, sum, acc) in VMEM scratch folds pages together — so HBM reads stay
# int8 and nothing materializes a gathered [S, D] cache.
#
# PAGE is pinned to 128: the scale block's trailing dims must be Mosaic
# tiles or full dims ((1, PAGE) works only at PAGE=128), and 128-row int8
# code blocks are (32, 128)-tile aligned.

PAGE_INT8 = 128
# kv-heads per paged-attention grid step (tunable; see _paged_attn_call)
PAGED_HEAD_BLOCK = int(_os.environ.get("MXQ_PAGED_HEAD_BLOCK", "32"))


def _kernel_paged(len_ref, tbl_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref, *, scale, npages):
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = len_ref[b]
    base = p * PAGE_INT8
    q = q_ref[0]                                       # [HB, G8, D] bf16
    kc = kc_ref[:, 0]                                  # [HB, PAGE, D] int8
    ks = ks_ref[:, 0]                                  # [HB, 1, PAGE] bf16
    st = jax.lax.dot_general(
        q, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [HB, G8, PAGE]
    st = st * (ks.astype(jnp.float32) * scale)
    rows = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
    valid = (base + rows) < length
    st = jnp.where(valid, st, NEG)

    m_old = m_ref[...]                                 # [HB, G8, 1]
    m_new = jnp.maximum(m_old, jnp.max(st, axis=2, keepdims=True))
    # exp(st - m_new) would be exp(0)=1 for fully-masked rows when m_new
    # is still NEG — gate on the mask instead of the logit value
    pexp = jnp.where(valid, jnp.exp(st - m_new), 0.0)  # [HB, G8, PAGE]
    alpha = jnp.exp(m_old - m_new)                     # [HB, G8, 1]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=2, keepdims=True)
    pv = (pexp * vs_ref[:, 0].astype(jnp.float32)).astype(jnp.bfloat16)
    pvv = jax.lax.dot_general(
        pv, vc_ref[:, 0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [HB, G8, D]
    acc_ref[...] = acc_ref[...] * alpha + pvv
    m_ref[...] = m_new

    @pl.when(p == npages - 1)
    def _():
        o_ref[0] = (acc_ref[...] /
                    jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_attn_call(q, kc, ks, vc, vs, lengths, tables, *, interpret):
    b, hkv, g8, d = q.shape
    _, _, page, _ = kc.shape
    npages = tables.shape[1]
    # head-block like the dense kernel: HB heads share one grid step's
    # page DMA + batched MXU dots (one head/step measured 6.5x slower
    # than the upstream bf16 kernel; grid-step count dominates). r5: the
    # kernel is grid-STEP-bound, not DMA-bound (r4's 100.6 us/layer ~=
    # 64 steps x ~1.5 us at 5x the 20.5 us byte floor), so the block
    # takes ALL kv heads when VMEM allows — each block costs
    # hb*(2*page*d + 2*page*2B + g8*d*...) ~ hb*33 KB at page=d=128,
    # well under scope even at hb=32 with double buffering.
    hb = min(hkv, PAGED_HEAD_BLOCK)
    while hkv % hb:
        hb -= 1
    grid = (b, hkv // hb, npages)
    scale = 1.0 / float(np.sqrt(d))

    def page_spec(shp2):
        return pl.BlockSpec(
            (hb, 1) + shp2,
            lambda bi, hi, p, lens, tbl: (hi, tbl[bi, p], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # lengths, tables
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, g8, d),
                         lambda bi, hi, p, lens, tbl: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),     # q
            page_spec((page, d)),                      # k codes
            page_spec((1, page)),                      # k scales
            page_spec((page, d)),                      # v codes
            page_spec((1, page)),                      # v scales
        ],
        out_specs=pl.BlockSpec(
            (1, hb, g8, d), lambda bi, hi, p, lens, tbl: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hb, g8, 1), jnp.float32),      # running max
            pltpu.VMEM((hb, g8, 1), jnp.float32),      # running denom
            pltpu.VMEM((hb, g8, d), jnp.float32),      # running ctx
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_paged, scale=scale, npages=npages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), tables.astype(jnp.int32),
      q, kc, ks, vc, vs)


def _kernel_paged_cur(len_ref, tbl_ref, q_ref, kc_ref, ks_ref, vc_ref,
                      vs_ref, kcur_ref, kscur_ref, vcur_ref, vscur_ref,
                      o_ref, m_ref, l_ref, acc_ref, *, scale, npages):
    """_kernel_paged with the CURRENT token handled OUT-OF-CACHE: cache
    rows mask strictly below ``len_ref`` (= the write position) and the
    current token's quantized K/V fold into the flash accumulation at the
    last page — so the caller can defer the pool write to one post-scan
    commit (the per-layer scatter chain copied the pool per layer per
    step: depth-8 A/B measured 6.5 vs 2.25 ms/step before this)."""
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = len_ref[b]                                # rows < length valid
    base = p * PAGE_INT8
    q = q_ref[0]                                       # [HB, G8, D] bf16
    kc = kc_ref[:, 0]                                  # [HB, PAGE, D] int8
    ks = ks_ref[:, 0]                                  # [HB, 1, PAGE] bf16
    st = jax.lax.dot_general(
        q, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [HB, G8, PAGE]
    st = st * (ks.astype(jnp.float32) * scale)
    rows = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
    valid = (base + rows) < length
    st = jnp.where(valid, st, NEG)

    m_old = m_ref[...]                                 # [HB, G8, 1]
    m_new = jnp.maximum(m_old, jnp.max(st, axis=2, keepdims=True))
    pexp = jnp.where(valid, jnp.exp(st - m_new), 0.0)
    alpha = jnp.exp(m_old - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=2, keepdims=True)
    pv = (pexp * vs_ref[:, 0].astype(jnp.float32)).astype(jnp.bfloat16)
    pvv = jax.lax.dot_general(
        pv, vc_ref[:, 0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pvv
    m_ref[...] = m_new

    @pl.when(p == npages - 1)
    def _():
        # fold the current token in (same bf16 rounding as the dense
        # deferred path, _attend cur branch, for bit-compatibility)
        stc = jax.lax.dot_general(
            q, kcur_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [HB, G8, 1]
        stc = stc * (kscur_ref[0].astype(jnp.float32) * scale)
        m_fin = jnp.maximum(m_ref[...], stc)
        alpha2 = jnp.exp(m_ref[...] - m_fin)
        pc = jnp.exp(stc - m_fin)
        l_fin = l_ref[...] * alpha2 + pc
        pcb = (pc * vscur_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
        acc_fin = acc_ref[...] * alpha2 + (
            pcb.astype(jnp.float32)
            * vcur_ref[0].astype(jnp.float32))         # bcast [HB, G8, D]
        o_ref[0] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_attn_call_cur(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                         positions, tables, *, interpret):
    b, hkv, g8, d = q.shape
    _, _, page, _ = kc.shape
    npages = tables.shape[1]
    hb = min(hkv, PAGED_HEAD_BLOCK)
    while hkv % hb:
        hb -= 1
    grid = (b, hkv // hb, npages)
    scale = 1.0 / float(np.sqrt(d))

    def page_spec(shp2):
        return pl.BlockSpec(
            (hb, 1) + shp2,
            lambda bi, hi, p, lens, tbl: (hi, tbl[bi, p], 0, 0),
            memory_space=pltpu.VMEM)

    def cur_spec(shp2):
        return pl.BlockSpec(
            (1, hb) + shp2, lambda bi, hi, p, lens, tbl: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # positions, tables
        grid=grid,
        in_specs=[
            cur_spec((g8, d)),                         # q
            page_spec((page, d)),                      # k codes
            page_spec((1, page)),                      # k scales
            page_spec((page, d)),                      # v codes
            page_spec((1, page)),                      # v scales
            cur_spec((1, d)),                          # current k codes
            cur_spec((1, 1)),                          # current k scale
            cur_spec((1, d)),                          # current v codes
            cur_spec((1, 1)),                          # current v scale
        ],
        out_specs=cur_spec((g8, d)),
        scratch_shapes=[
            pltpu.VMEM((hb, g8, 1), jnp.float32),
            pltpu.VMEM((hb, g8, 1), jnp.float32),
            pltpu.VMEM((hb, g8, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_paged_cur, scale=scale, npages=npages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(positions.astype(jnp.int32), tables.astype(jnp.int32),
      q, kc, ks, vc, vs, kcur, kscur, vcur, vscur)


def _kernel_paged_cur_write(len_ref, tbl_ref, null_ref, q_ref, kc_ref,
                            ks_ref, vc_ref, vs_ref, kcur_ref, kscur_ref,
                            vcur_ref, vscur_ref, o_ref, okoct_ref,
                            oksoct_ref, ovoct_ref, ovsoct_ref, m_ref,
                            l_ref, acc_ref, *, scale, npages):
    """_kernel_paged_cur + IN-KERNEL ALIASED POOL WRITES: the current
    token's code row and scale lane commit through aliased 8-row-octet /
    scale-row output windows (the dense fused kernel's pattern,
    _attn_call_cur_write) — replacing the post-scan jnp scatters, which
    forced XLA to relayout the whole pool (two 75 MB copies per codes
    buffer per step at depth 8, AOT HLO copy.106/111).

    The octet's sibling rows come from the ATTENTION page block — resident
    exactly at the grid step whose page is the write page; other steps'
    output windows are index-mapped to the layer's NULL page (a second
    input reading the pool would break the aliasing: XLA protects the
    duplicate use with a defensive whole-pool copy, measured 8.1 ms/step
    at depth 8)."""
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pos = len_ref[b]
    base = p * PAGE_INT8
    q = q_ref[0]                                       # [HB, G8, D] bf16
    kc = kc_ref[:, 0]                                  # [HB, PAGE, D] int8
    ks = ks_ref[:, 0]                                  # [HB, 1, PAGE] bf16
    st = jax.lax.dot_general(
        q, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    st = st * (ks.astype(jnp.float32) * scale)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
    valid = (base + rows3) < pos
    st = jnp.where(valid, st, NEG)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(st, axis=2, keepdims=True))
    pexp = jnp.where(valid, jnp.exp(st - m_new), 0.0)
    alpha = jnp.exp(m_old - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=2, keepdims=True)
    pv = (pexp * vs_ref[:, 0].astype(jnp.float32)).astype(jnp.bfloat16)
    pvv = jax.lax.dot_general(
        pv, vc_ref[:, 0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pvv
    m_ref[...] = m_new

    del null_ref         # consumed by the output index maps
    kcur = kcur_ref[0]                                 # [HB, 1, D] int8
    vcur = vcur_ref[0]
    kscur = kscur_ref[0]                               # [HB, 1, 1] bf16
    vscur = vscur_ref[0]

    @pl.when(p == npages - 1)
    def _():
        stc = jax.lax.dot_general(
            q, kcur, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [HB, G8, 1]
        stc = stc * (kscur.astype(jnp.float32) * scale)
        m_fin = jnp.maximum(m_ref[...], stc)
        alpha2 = jnp.exp(m_ref[...] - m_fin)
        pc = jnp.exp(stc - m_fin)
        l_fin = l_ref[...] * alpha2 + pc
        pcb = (pc * vscur.astype(jnp.float32)).astype(jnp.bfloat16)
        acc_fin = acc_ref[...] * alpha2 + (
            pcb.astype(jnp.float32) * vcur.astype(jnp.float32))
        o_ref[0] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)

    # ---- aliased pool writes ----
    # sibling rows come from the resident attention blocks; at p != the
    # write-page step the output windows land on the null page (index
    # maps), so the garbage composed there is never read
    off = pos % PAGE_INT8
    base = (off // 8) * 8
    r = off - base
    wink = kc_ref[:, 0, pl.ds(base, 8), :]             # [HB, 8, D]
    winv = vc_ref[:, 0, pl.ds(base, 8), :]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, wink.shape, 1)
    okoct_ref[:, 0] = jnp.where(rows8 == r, kcur, wink)
    ovoct_ref[:, 0] = jnp.where(rows8 == r, vcur, winv)
    wins_k = ks_ref[:, 0]                              # [HB, 1, PAGE]
    wins_v = vs_ref[:, 0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, wins_k.shape, 2)
    oksoct_ref[:, 0] = jnp.where(lanes == off, kscur, wins_k)
    ovsoct_ref[:, 0] = jnp.where(lanes == off, vscur, wins_v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_attn_call_cur_write(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                               positions, tables, nulls, *, interpret):
    b, hkv, g8, d = q.shape
    _, _, page, _ = kc.shape
    npages = tables.shape[1]
    hb = min(hkv, PAGED_HEAD_BLOCK)
    while hkv % hb:
        hb -= 1
    grid = (b, hkv // hb, npages)
    scale = 1.0 / float(np.sqrt(d))

    def page_spec(shp2):
        return pl.BlockSpec(
            (hb, 1) + shp2,
            lambda bi, hi, p, lens, tbl, nul: (hi, tbl[bi, p], 0, 0),
            memory_space=pltpu.VMEM)

    def cur_spec(shp2):
        return pl.BlockSpec(
            (1, hb) + shp2,
            lambda bi, hi, p, lens, tbl, nul: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    # write windows: ON the step whose page is the write page they map to
    # the octet / scale row holding ``positions[b]``; on every other step
    # they land on the layer's NULL page (never read), so each step can
    # write unconditionally and only the resident-sibling composition
    # sticks
    def oct_spec():
        def imap(bi, hi, p, lens, tbl, nul):
            on = p == lens[bi] // page
            return (hi, jnp.where(on, tbl[bi, p], nul[bi]),
                    jnp.where(on, (lens[bi] % page) // 8, 0), 0)
        return pl.BlockSpec((hb, 1, 8, d), imap, memory_space=pltpu.VMEM)

    def srow_spec():
        def imap(bi, hi, p, lens, tbl, nul):
            on = p == lens[bi] // page
            return (hi, jnp.where(on, tbl[bi, p], nul[bi]), 0, 0)
        return pl.BlockSpec((hb, 1, 1, page), imap,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,       # positions, tables, nulls
        grid=grid,
        in_specs=[
            cur_spec((g8, d)),                         # q
            page_spec((page, d)),                      # k codes (pool)
            page_spec((1, page)),                      # k scales (pool)
            page_spec((page, d)),                      # v codes (pool)
            page_spec((1, page)),                      # v scales (pool)
            cur_spec((1, d)),                          # current k codes
            cur_spec((1, 1)),                          # current k scale
            cur_spec((1, d)),                          # current v codes
            cur_spec((1, 1)),                          # current v scale
        ],
        out_specs=[
            cur_spec((g8, d)),                         # ctx
            oct_spec(),                                # k octet (aliased)
            srow_spec(),                               # k scales (aliased)
            oct_spec(),                                # v octet (aliased)
            srow_spec(),                               # v scales (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, g8, 1), jnp.float32),
            pltpu.VMEM((hb, g8, 1), jnp.float32),
            pltpu.VMEM((hb, g8, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_paged_cur_write, scale=scale,
                          npages=npages),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # input indices INCLUDE the 3 scalar-prefetch args; q is input 3,
        # the pool arrays are 4..7 — aliased onto outputs 1..4. Each pool
        # array is passed exactly ONCE (a duplicate use would make XLA
        # copy the whole pool defensively: measured 8.1 ms/step, depth 8)
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        interpret=interpret,
    )(positions.astype(jnp.int32), tables.astype(jnp.int32),
      nulls.astype(jnp.int32), q, kc, ks, vc, vs, kcur, kscur, vcur,
      vscur)


def int8_paged_decode_attend_update(q, k_pages, k_scales, v_pages,
                                    v_scales, kcur, kscur, vcur, vscur,
                                    positions, page_tables, null_pages,
                                    interpret: bool | None = None):
    """Fused deferred-write paged decode attention: attends cache rows
    < positions plus the out-of-cache current token AND commits the
    current token's code row + scale lane into the pool through aliased
    in-kernel writes. Returns (ctx [B, H_q, D] f32, k_pages, k_scales,
    v_pages, v_scales). The caller must donate the pool buffers (scan
    carry / jit donation) for the aliasing to be copy-free.

    kcur/vcur: [B, KVH, D] int8; kscur/vscur: [B, KVH] — quantized with
    kvcache.quantize_kv semantics. ``null_pages`` [B]: a physical page
    index per slot that is never read (the layer's null page) — the
    non-write-step output windows land there. Requires positions < pool
    capacity (the engine's near-capacity clamp guarantees it)."""
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_pages.shape[0]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    ctx, kc2, ks2, vc2, vs2 = _paged_attn_call_cur_write(
        qg, k_pages, k_scales, v_pages, v_scales,
        kcur[:, :, None, :], kscur[:, :, None, None].astype(jnp.bfloat16),
        vcur[:, :, None, :], vscur[:, :, None, None].astype(jnp.bfloat16),
        positions, page_tables, null_pages, interpret=interpret)
    return (ctx[:, :, :g, :].reshape(b, hq, d), kc2, ks2, vc2, vs2)


def int8_paged_decode_attention_cur(q, k_pages, k_scales, v_pages,
                                    v_scales, kcur, kscur, vcur, vscur,
                                    positions, page_tables,
                                    interpret: bool | None = None
                                    ) -> jax.Array:
    """Deferred-write paged decode attention: cache rows < positions[b]
    plus the out-of-cache current token (kcur/vcur [B, KVH, D] int8,
    kscur/vscur [B, KVH] bf16). The caller commits the current rows to the
    pool AFTER the layer scan (one scatter per buffer per step)."""
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_pages.shape[0]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    out = _paged_attn_call_cur(
        qg, k_pages, k_scales, v_pages, v_scales,
        kcur[:, :, None, :], kscur[:, :, None, None].astype(jnp.bfloat16),
        vcur[:, :, None, :], vscur[:, :, None, None].astype(jnp.bfloat16),
        positions, page_tables, interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


def int8_paged_decode_attention(q, k_pages, k_scales, v_pages, v_scales,
                                lengths, page_tables,
                                interpret: bool | None = None) -> jax.Array:
    """Decode attention over one layer's QUANTIZED paged pool.

    q:           [B, H_q, D]
    k/v_pages:   [KVH, P, PAGE, D] int8
    k/v_scales:  [KVH, P, 1, PAGE] bf16
    lengths:     [B] int32 — valid tokens per sequence (current row
                 already written)
    page_tables: [B, PPS] int32 — page ids per sequence (null page 0 for
                 slots beyond the sequence; masked by ``lengths``)
    Returns [B, H_q, D] f32.
    """
    if interpret is None:
        interpret = _on_cpu()
    b, hq, d = q.shape
    hkv = k_pages.shape[0]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    out = _paged_attn_call(qg, k_pages, k_scales, v_pages, v_scales,
                           lengths, page_tables, interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_call_cur_folded(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                          positions, idx, *, interpret):
    """Deferred-write decode attention reading layer ``idx`` straight out
    of the FOLDED [L*B, H, S, D] stack — the read side of the fused-write
    kernel WITHOUT the in-kernel aliased row writes (ctx is the only
    output, so Mosaic keeps cross-grid-step DMA prefetch; aliased outputs
    measured ~0.6 ms/step slower on 7B, docs/RESULTS.md r4). The caller
    commits the current rows post-scan like the r3 deferred path."""
    b, hkv, g8, d = q.shape
    lb, _, s, _ = kc.shape
    hb = _pick_head_block(hkv, s, d)
    grid = (b, hkv // hb)
    scale = 1.0 / float(np.sqrt(d))
    nb = b

    def cache_spec(shp3):
        return pl.BlockSpec(
            (1, hb) + shp3,
            lambda bi, hi, lens, i: (i[0] * nb + bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    def cur_spec(shp3):
        return pl.BlockSpec(
            (1, hb) + shp3, lambda bi, hi, lens, i: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)

    scale3d = s % 128 == 0

    def scale_spec():
        # 3-D [L*B, H, S] blocks when lane-aligned (a [.., 1, S] view
        # costs a full-stack copy per scan iteration — r4 trace); 4-D
        # otherwise (see _attn_call_cur_write)
        if scale3d:
            return pl.BlockSpec(
                (1, hb, s),
                lambda bi, hi, lens, i: (i[0] * nb + bi, hi, 0),
                memory_space=pltpu.VMEM)
        return cache_spec((1, s))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # positions, idx
        grid=grid,
        in_specs=[
            cur_spec((g8, d)),              # q
            cache_spec((s, d)),             # k codes (folded stack)
            scale_spec(),                   # k scale
            cache_spec((s, d)),             # v codes
            scale_spec(),                   # v scale
            cur_spec((1, d)),               # current k codes
            cur_spec((1, 1)),               # current k scale
            cur_spec((1, d)),               # current v codes
            cur_spec((1, 1)),               # current v scale
        ],
        out_specs=cur_spec((g8, d)),
    )

    def kernel(pos_ref, idx_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
               kcur_ref, kscur_ref, vcur_ref, vscur_ref, o_ref):
        del idx_ref          # consumed by the BlockSpec index maps
        bq = pl.program_id(0)
        pos = pos_ref[bq]
        cur = (kcur_ref[0], kscur_ref[0], vcur_ref[0], vscur_ref[0])
        ks = ks_ref[0][:, None, :] if ks_ref.ndim == 3 else ks_ref[0]
        vs = vs_ref[0][:, None, :] if vs_ref.ndim == 3 else vs_ref[0]
        ctx = _attend(q_ref[0], kc_ref[0], ks, vc_ref[0], vs, pos, scale,
                      cur=cur)
        o_ref[0] = ctx.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g8, d), jnp.float32),
        interpret=interpret,
    )(positions.astype(jnp.int32), jnp.asarray(idx, jnp.int32).reshape(1),
      q, kc, ks, vc, vs, kcur, kscur[:, :, :, None], vcur,
      vscur[:, :, :, None])


def int8_decode_attention_cur_folded(q, k_codes, k_scale, v_codes, v_scale,
                                     kcur, kscur, vcur, vscur, layer_idx,
                                     positions,
                                     interpret: bool | None = None
                                     ) -> jax.Array:
    """Deferred-write decode attention over the stacked cache, layer
    selected in-kernel via scalar prefetch (no layer-view copy, no
    in-kernel writes). Same math as int8_decode_attention_cur."""
    if interpret is None:
        interpret = _on_cpu()
    l, b, hkv, s, d = k_codes.shape
    hq = q.shape[1]
    g = hq // hkv
    g8 = max(8, g)
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    if g8 != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g8 - g), (0, 0)))
    fold = lambda c: c.reshape(l * b, hkv, s, d)        # noqa: E731
    folds = (lambda c: c.reshape(l * b, hkv, s)) if s % 128 == 0 \
        else (lambda c: c.reshape(l * b, hkv, 1, s))     # noqa: E731
    out = _attn_call_cur_folded(
        qg, fold(k_codes), folds(k_scale), fold(v_codes), folds(v_scale),
        kcur, kscur, vcur, vscur, positions, layer_idx, interpret=interpret)
    return out[:, :, :g, :].reshape(b, hq, d)


def decode_attend_update(cache: dict, q1, kc, ksc, vc, vsc, layer_idx,
                         positions):
    """t==1 int8-KV decode attention with the WRITE_PATH strategy applied —
    the ONE dispatch point shared by llama.attention and the engine's
    multipos forward (keeping four hand-copies of this branch in sync was
    a maintenance hazard).

    cache: the stacked quant cache dict (k/v codes [L,B,H,S,D], scales
    [L,B,H,S]); q1 [B, H_q, D]; kc/ksc/vc/vsc: the current token's
    quantized K/V rows; positions [B].
    Returns (ctx [B, H_q, D] f32, new_cache, pend) where pend is the
    pending tuple the caller commits post-scan: (ks, vs) scale rows for
    the fused path (codes were written in-kernel), (kc, ks, vc, vs) for
    folded/deferred.
    """
    if WRITE_PATH == "fused":
        ctx, kc2, vc2 = int8_decode_attention_fused_write(
            q1, cache["k_codes"], cache["k_scale"],
            cache["v_codes"], cache["v_scale"],
            kc, ksc, vc, vsc, layer_idx, positions)
        return ctx, dict(cache, k_codes=kc2, v_codes=vc2), (ksc, vsc)
    if WRITE_PATH == "folded":
        ctx = int8_decode_attention_cur_folded(
            q1, cache["k_codes"], cache["k_scale"],
            cache["v_codes"], cache["v_scale"],
            kc, ksc, vc, vsc, layer_idx, positions)
    else:       # "deferred" (r3): layer-view copy + post-scan commits
        view = {kk: jax.lax.dynamic_index_in_dim(
            cache[kk], layer_idx, 0, keepdims=False)
            for kk in ("k_codes", "k_scale", "v_codes", "v_scale")}
        ctx = int8_decode_attention_cur(
            q1, view["k_codes"], view["k_scale"], view["v_codes"],
            view["v_scale"], kc, ksc, vc, vsc, positions)
    return ctx, dict(cache), (kc, ksc, vc, vsc)
