"""MXQ numerical core: pure, vectorized JAX functions. No Python loops, no state.

This module is the single source of truth for the MXQ mixed 2/4-bit scheme. It
implements, bit-for-bit, both formulations found in the reference:

* the QAT fake-quant ``MXAsymQuantizer`` (alpha/beta form, eps=1e-8,
  LLM-QAT/models/utils_quant.py:310-475), vectorized by reshape instead of the
  reference's per-64-column Python loop (utils_quant.py:349-385), with a
  straight-through-estimator custom VJP with clip-range gradient masking
  (utils_quant.py:464-475,636);
* the PTQ ``Quantizer`` (scale/zero form, eps=1e-9, mxq_quant/lib/quantizer.py)
  as driven by ``MXQGPT.fasterquant`` (mxq_quant/lib/mxqgpt.py:387-448),
  including 4-bit double quantization of the 2-bit groups' scales over groups
  of 16 consecutive output rows (quantizer.py:114-121, qq_groupsize=16).

Weight orientation throughout this module matches the reference: ``w`` has
shape ``[out_features, in_features]`` = ``[O, K]``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mxq_tpu.config import MXQConfig, DEFAULT_SCHEME


# ---------------------------------------------------------------------------
# Affine (asymmetric min-max) primitives — PTQ formulation
# ---------------------------------------------------------------------------


def asym_find_params(x: jax.Array, maxq: int):
    """Per-row affine params over the last axis (quantizer.py:81-99).

    Returns ``(scale, zero)`` with the trailing axis reduced. Degenerate rows
    (min == max) use the reference's [-1, +1] fallback (quantizer.py:90-92).
    ``zero = -xmin / scale`` is kept in floating point (round_zero=False).
    """
    xmin = jnp.min(x, axis=-1)
    xmax = jnp.max(x, axis=-1)
    deg = xmin == xmax
    xmin = jnp.where(deg, -1.0, xmin)
    xmax = jnp.where(deg, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    zero = -xmin / scale
    return scale, zero


def asym_qdq(x: jax.Array, scale: jax.Array, zero: jax.Array, maxq: int,
             eps: float = 1e-9) -> jax.Array:
    """clamp-round quant-dequant (quantizer.py:5-7): scale clamped only in the
    division, not in the dequant multiply."""
    q = jnp.clip(jnp.round(x / jnp.maximum(scale, eps) + zero), 0, maxq)
    return scale * (q - zero)


def asym_quantize(x: jax.Array, scale: jax.Array, zero: jax.Array, maxq: int,
                  eps: float = 1e-9) -> jax.Array:
    """Integer codes in [0, maxq] (quantizer.py:14-16)."""
    return jnp.clip(jnp.round(x / jnp.maximum(scale, eps) + zero), 0, maxq)


class DoubleQuantResult(NamedTuple):
    scale_dq: jax.Array    # dequantized scales, same shape as input scales
    codes: jax.Array       # per-scale integer codes in [0, maxq_qq]
    qq_scale: jax.Array    # second-order scale, one per qq group
    qq_zero: jax.Array     # second-order zero (fp, or rounded if round_zero)


def double_quant_scales(scale: jax.Array, qq_bits: int, qq_group: int,
                        round_zero: bool = False,
                        eps: float = 1e-9) -> DoubleQuantResult:
    """4-bit double quantization of first-order scales (quantizer.py:114-121).

    Groups are formed over the LAST axis of ``scale`` in chunks of
    ``qq_group``; the reference reshapes the flat per-row scale vector to
    ``(-1, 16)``, i.e. chunks of 16 consecutive output rows. ``round_zero``
    selects the packed-format variant where the second-order zero is rounded
    to an integer code (quantizer.py:64,99 maybe_round_zero) so it can be
    stored in 4 bits — the reference PTQ path leaves it in fp, while the
    reference CUDA kernel assumes integer codes (gemv_mxq_cuda.cu:131-136);
    the rebuild owns both variants.
    """
    maxq = 2**qq_bits - 1
    lead = scale.shape[:-1]
    sg = scale.reshape(lead + (scale.shape[-1] // qq_group, qq_group))
    qq_scale, qq_zero = asym_find_params(sg, maxq)
    if round_zero:
        qq_zero = jnp.clip(jnp.round(qq_zero), 0, maxq)
    qq_scale_e = qq_scale[..., None]
    qq_zero_e = qq_zero[..., None]
    codes = asym_quantize(sg, qq_scale_e, qq_zero_e, maxq, eps)
    scale_dq = (qq_scale_e * (codes - qq_zero_e)).reshape(scale.shape)
    return DoubleQuantResult(scale_dq, codes.reshape(scale.shape),
                             qq_scale, qq_zero)


# ---------------------------------------------------------------------------
# Block topology helpers
# ---------------------------------------------------------------------------


def split_blocks(w: jax.Array, cfg: MXQConfig = DEFAULT_SCHEME):
    """Split ``w [O, K]`` into the de-interleaved 2-bit and 4-bit planes.

    Per 64-column block the first 48 columns go to the 2b plane and the last
    16 to the 4b plane (utils_quant.py:349-366; mxqgpt.py:413-433 gathers the
    4b columns of all blocks into one per-row matrix ``W_4b``).

    Returns ``(w_lo [O, K2], w_hi [O, K4])`` with ``K2 = K * 48/64``.
    """
    o, k = w.shape
    assert k % cfg.block == 0, f"in_features {k} must divide block {cfg.block}"
    wb = w.reshape(o, k // cfg.block, cfg.block)
    w_lo = wb[:, :, : cfg.num_2b].reshape(o, -1)
    w_hi = wb[:, :, cfg.num_2b:].reshape(o, -1)
    return w_lo, w_hi


def merge_blocks(w_lo: jax.Array, w_hi: jax.Array,
                 cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Inverse of :func:`split_blocks` (mxqgpt.py:438-443 scatter-back)."""
    o = w_lo.shape[0]
    nb = w_lo.shape[1] // cfg.num_2b
    lo = w_lo.reshape(o, nb, cfg.num_2b)
    hi = w_hi.reshape(o, nb, cfg.num_4b)
    return jnp.concatenate([lo, hi], axis=-1).reshape(o, nb * cfg.block)


# ---------------------------------------------------------------------------
# QAT fake-quant (MXAsymQuantizer semantics, alpha/beta form)
# ---------------------------------------------------------------------------


def _qat_affine_qdq(x: jax.Array, alpha: jax.Array, beta: jax.Array,
                    levels: int, eps: float) -> jax.Array:
    """q = round((x-beta)/(alpha+eps) * s)/s; out = q*(alpha+eps)+beta
    (utils_quant.py:456-460)."""
    a = alpha + eps
    q = jnp.round((x - beta) / a * levels) / levels
    return q * a + beta


def mxq_fake_quant_qat(w: jax.Array,
                       cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Vectorized MXAsymQuantizer.forward for 2D weights (utils_quant.py:330-461).

    Replaces the reference's per-block Python loop with reshapes: 2b part
    quantized per (row, 16-group) min/max at 2 bits; the gathered 4b columns
    quantized with a single per-row min/max at 4 bits.
    """
    o, k = w.shape
    w_lo, w_hi = split_blocks(w, cfg)

    g = w_lo.reshape(o, -1, cfg.group)
    alpha = jnp.max(g, axis=-1, keepdims=True) - jnp.min(g, axis=-1, keepdims=True)
    beta = jnp.min(g, axis=-1, keepdims=True)
    lo_dq = _qat_affine_qdq(g, alpha, beta, cfg.maxq_lo, cfg.qat_eps)
    lo_dq = lo_dq.reshape(o, -1)

    alpha4 = (jnp.max(w_hi, axis=-1, keepdims=True)
              - jnp.min(w_hi, axis=-1, keepdims=True))
    beta4 = jnp.min(w_hi, axis=-1, keepdims=True)
    hi_dq = _qat_affine_qdq(w_hi, alpha4, beta4, cfg.maxq_hi, cfg.qat_eps)

    return merge_blocks(lo_dq, hi_dq, cfg)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mxq_fake_quant_ste(w: jax.Array,
                       cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """QAT fake-quant with straight-through estimator backward: gradient is
    passed through unchanged except where ``|w| >= ste_clip``, where it is
    zeroed (utils_quant.py:464-475; clip value ±2.0 from utils_quant.py:636)."""
    return mxq_fake_quant_qat(w, cfg)


def _ste_fwd(w, cfg):
    return mxq_fake_quant_qat(w, cfg), w


def _ste_bwd(cfg, w, g):
    mask = (w > -cfg.ste_clip) & (w < cfg.ste_clip)
    return (jnp.where(mask, g, 0.0),)


mxq_fake_quant_ste.defvjp(_ste_fwd, _ste_bwd)


# ---------------------------------------------------------------------------
# PTQ fake-quant (Quantizer + MXQGPT.fasterquant semantics, scale/zero form)
# ---------------------------------------------------------------------------


class MXQQuantized(NamedTuple):
    """Integer codes + quantization parameters for one [O, K] weight.

    This is the *logical* (unpacked) quantized representation produced by the
    PTQ path; ``mxq_tpu.packfmt`` bit-packs it into the storage format. All
    ``*_codes`` arrays hold small non-negative integers.
    """
    lo_codes: jax.Array     # [O, K2]   in [0, maxq_lo]
    hi_codes: jax.Array     # [O, K4]   in [0, maxq_hi]
    lo_zero: jax.Array      # [O, G2]   fp or integer codes (see round_zero)
    lo_scale_codes: jax.Array  # [O, G2] in [0, maxq_qq]
    lo_qq_scale: jax.Array  # [G2, O // qq_group] second-order scales (fp)
    lo_qq_zero: jax.Array   # [G2, O // qq_group]
    hi_zero: jax.Array      # [O]
    hi_scale_codes: jax.Array  # [O]     in [0, maxq_qq]
    hi_qq_scale: jax.Array  # [O // qq_group]
    hi_qq_zero: jax.Array   # [O // qq_group]


def mxq_quantize_ptq(w: jax.Array, cfg: MXQConfig = DEFAULT_SCHEME,
                     round_zero: bool = False) -> MXQQuantized:
    """Quantize a weight to MXQ codes, PTQ semantics (mxqgpt.py:387-448).

    2b part: per (row, 16-col group) affine params with the scales
    double-quantized to 4 bits over groups of 16 consecutive rows
    (mxqgpt.py:420-428 with Quantizer.configure(bits=2, qq_scale_bits=4)).
    4b part: gathered columns, one per-row affine param pair, scales likewise
    double-quantized (mxqgpt.py:431-436).

    ``round_zero=False`` reproduces the reference PTQ bit-for-bit (fp zeros,
    quantizer.py round_zero default False); ``round_zero=True`` produces the
    packable variant where first-order zeros are integer codes — required by
    any real packed kernel, cf. the reference CUDA kernel's 2-bit zero codes
    (gemv_mxq_cuda.cu:139-149) that its own PTQ never produced.
    """
    o, k = w.shape
    w = w.astype(jnp.float32)
    w_lo, w_hi = split_blocks(w, cfg)
    g2 = w_lo.shape[1] // cfg.group

    # ----- 2-bit plane -----
    g = w_lo.reshape(o, g2, cfg.group)
    scale, zero = asym_find_params(g, cfg.maxq_lo)          # [O, G2]
    # Double-quant the scales over groups of 16 consecutive ROWS: put O last.
    dq = double_quant_scales(scale.T.reshape(g2, o), cfg.qq_scale_bits,
                             cfg.qq_group, round_zero, cfg.ptq_eps)
    lo_scale_dq = dq.scale_dq.reshape(g2, o).T              # [O, G2]
    lo_scale_codes = dq.codes.reshape(g2, o).T
    if round_zero:
        zero = jnp.clip(jnp.round(zero), 0, cfg.maxq_lo)
    lo_codes = asym_quantize(g, lo_scale_dq[..., None], zero[..., None],
                             cfg.maxq_lo, cfg.ptq_eps).reshape(o, -1)

    # ----- 4-bit plane -----
    scale4, zero4 = asym_find_params(w_hi, cfg.maxq_hi)     # [O]
    dq4 = double_quant_scales(scale4, cfg.qq_scale_bits, cfg.qq_group,
                              round_zero, cfg.ptq_eps)
    if round_zero:
        zero4 = jnp.clip(jnp.round(zero4), 0, cfg.maxq_hi)
    hi_codes = asym_quantize(w_hi, dq4.scale_dq[:, None], zero4[:, None],
                             cfg.maxq_hi, cfg.ptq_eps)

    return MXQQuantized(
        lo_codes=lo_codes.astype(jnp.int8),
        hi_codes=hi_codes.astype(jnp.int8),
        lo_zero=zero.astype(jnp.int8) if round_zero else zero,
        lo_scale_codes=lo_scale_codes.astype(jnp.int8),
        lo_qq_scale=dq.qq_scale,
        lo_qq_zero=dq.qq_zero.astype(jnp.int8) if round_zero else dq.qq_zero,
        hi_zero=zero4.astype(jnp.int8) if round_zero else zero4,
        hi_scale_codes=dq4.codes.astype(jnp.int8),
        hi_qq_scale=dq4.qq_scale,
        hi_qq_zero=dq4.qq_zero.astype(jnp.int8) if round_zero else dq4.qq_zero,
    )


def mxq_dequantize(qw: MXQQuantized, cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Reconstruct the dequantized [O, K] weight from MXQ codes."""
    o = qw.lo_codes.shape[0]
    g2 = qw.lo_zero.shape[1]

    qq_scale = qw.lo_qq_scale.astype(jnp.float32)           # [G2, O/qq]
    qq_zero = qw.lo_qq_zero.astype(jnp.float32)
    codes_t = qw.lo_scale_codes.astype(jnp.float32).T.reshape(
        g2, o // cfg.qq_group, cfg.qq_group)
    scale = (qq_scale[..., None] * (codes_t - qq_zero[..., None]))
    scale = scale.reshape(g2, o).T                          # [O, G2]
    lo = scale[..., None] * (
        qw.lo_codes.astype(jnp.float32).reshape(o, g2, cfg.group)
        - qw.lo_zero.astype(jnp.float32)[..., None])
    lo = lo.reshape(o, -1)

    qq4 = qw.hi_qq_scale.astype(jnp.float32)
    qq4z = qw.hi_qq_zero.astype(jnp.float32)
    c4 = qw.hi_scale_codes.astype(jnp.float32).reshape(-1, cfg.qq_group)
    scale4 = (qq4[:, None] * (c4 - qq4z[:, None])).reshape(o)
    hi = scale4[:, None] * (qw.hi_codes.astype(jnp.float32)
                            - qw.hi_zero.astype(jnp.float32)[:, None])

    return merge_blocks(lo, hi, cfg)


def mxq_fake_quant_ptq(w: jax.Array, cfg: MXQConfig = DEFAULT_SCHEME,
                       round_zero: bool = False) -> jax.Array:
    """PTQ quant-dequant of a weight — the operation ``fasterquant`` applies
    in place to every linear (mxqgpt.py:387-448). Equals
    ``mxq_dequantize(mxq_quantize_ptq(w))`` by construction."""
    return mxq_dequantize(mxq_quantize_ptq(w, cfg, round_zero), cfg)


# ---------------------------------------------------------------------------
# Activation / KV-cache fake-quant (Sym/Asym quantizers)
# ---------------------------------------------------------------------------


def sym_fake_quant(x: jax.Array, bits: int, groupsize: int = 128,
                   layerwise: bool = False) -> jax.Array:
    """SymQuantizer.forward (utils_quant.py:31-89): groupwise max-abs symmetric
    fake-quant with the reference's asymmetric eps placement
    ``out = round(x*s) / (s + 1e-6)`` where ``s = (2^(b-1)-1)/(max+1e-6)``.

    Groups are over the last (feature) axis. Note: the reference's 3-D branch
    mistakenly slices the sequence axis (utils_quant.py:56-66 applies
    ``input[:, i1:i2]`` to [B, T, H]); this implementation applies the 2-D
    semantics — groups of ``groupsize`` along the trailing feature dim — to
    any rank, which is the evident intent.
    """
    if layerwise:
        m = jnp.max(jnp.abs(x))
    else:
        shape = x.shape
        g = x.reshape(shape[:-1] + (shape[-1] // groupsize, groupsize))
        m = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        m = jnp.broadcast_to(m, g.shape).reshape(shape)
    s = (2 ** (bits - 1) - 1) / (m + 1e-6)
    return jnp.round(x * s) / (s + 1e-6)


def sym_fake_quant_ref3d(x: jax.Array, bits: int,
                         groupsize: int = 128) -> jax.Array:
    """COMPATIBILITY SHIM: the reference SymQuantizer's buggy 3-D branch,
    reproduced exactly (utils_quant.py:56-66). On [B, T, H] the reference
    slices the SEQUENCE axis with a feature-axis group count
    (``input[:, i1:i2]`` for ``dim_group = H // groupsize`` slices), so:

      * tokens t < min(dim_group*groupsize, T) get a PER-TOKEN full-row
        max (coarser than the intended per-128-group max);
      * tokens beyond that keep max_input = 0, making s ~ (2^(b-1)-1)/1e-6
        — near-identity "quantization" of the tail.

    Use this (not ``sym_fake_quant``) when evaluating a REFERENCE-trained
    a_bits/kv_bits checkpoint, whose training saw these semantics. The
    delta vs the fixed groupwise semantics is golden-quantified in
    tests/test_scheme.py::test_sym3d_*; goldens from
    tools/make_goldens.py (qat_sym3d.npz)."""
    assert x.ndim == 3, "the reference branch this reproduces is 3-D only"
    _, t, h = x.shape
    covered = min((h // groupsize) * groupsize, t)
    rowmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)       # [B, T, 1]
    mask = (jnp.arange(t) < covered)[None, :, None]
    m = jnp.where(mask, rowmax, 0.0)
    s = (2 ** (bits - 1) - 1) / (m + 1e-6)
    return jnp.round(x * s) / (s + 1e-6)


def sym_fake_quant_ste(x: jax.Array, bits: int, groupsize: int = 128,
                       layerwise: bool = False, clip: float = 2.0) -> jax.Array:
    """SymQuantizer with STE clip-masked backward (utils_quant.py:92-102)."""
    return _act_ste(x, partial(sym_fake_quant, bits=bits, groupsize=groupsize,
                               layerwise=layerwise), clip)


def asym_fake_quant(x: jax.Array, bits: int, groupsize: int = 8,
                    layerwise: bool = False) -> jax.Array:
    """AsymQuantizer.forward (utils_quant.py:105-187): groupwise min-max
    asymmetric fake-quant, groups of 8 over the feature dim, eps=1e-8."""
    if layerwise:
        alpha = jnp.max(x) - jnp.min(x)
        beta = jnp.min(x)
    else:
        shape = x.shape
        g = x.reshape(shape[:-1] + (shape[-1] // groupsize, groupsize))
        alpha = (jnp.max(g, axis=-1, keepdims=True)
                 - jnp.min(g, axis=-1, keepdims=True))
        beta = jnp.min(g, axis=-1, keepdims=True)
        out = _qat_affine_qdq(g, alpha, beta, 2**bits - 1, 1e-8)
        return out.reshape(shape)
    return _qat_affine_qdq(x, alpha, beta, 2**bits - 1, 1e-8)


def asym_fake_quant_ste(x: jax.Array, bits: int, groupsize: int = 8,
                        layerwise: bool = False, clip: float = 2.0) -> jax.Array:
    return _act_ste(x, partial(asym_fake_quant, bits=bits, groupsize=groupsize,
                               layerwise=layerwise), clip)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _act_ste(x, fq, clip):
    return fq(x)


def _act_ste_fwd(x, fq, clip):
    return fq(x), x


def _act_ste_bwd(fq, clip, x, g):
    mask = (x > -clip) & (x < clip)
    return (jnp.where(mask, g, 0.0),)


_act_ste.defvjp(_act_ste_fwd, _act_ste_bwd)


# ---------------------------------------------------------------------------
# Scheme variants carried by the reference
# ---------------------------------------------------------------------------


def mx1_fake_quant_qat(w: jax.Array, ratio_2b: float = 0.6,
                       group: int = 32, bits_lo: int = 2,
                       bits_hi: int = 4, eps: float = 1e-8) -> jax.Array:
    """MX1AsymQuantizer.forward (utils_quant.py:477-598): FRONT
    ``ratio_2b`` of the columns in 2-bit groups of 32 (utils_quant.py:507),
    the TAIL at per-row
    4-bit — the front/back variant of the scheme (vs the block-interleaved
    MXAsym). The reference's loop runs group-aligned past int(K*ratio)
    (utils_quant.py:516-522: start_4b = last group end), reproduced here.
    """
    o, k = w.shape
    target = int(k * ratio_2b)
    n_groups = -(-target // group) if target % group else target // group
    split = min(n_groups * group, k)

    front = w[:, :split].reshape(o, -1, group)
    alpha = (jnp.max(front, axis=-1, keepdims=True)
             - jnp.min(front, axis=-1, keepdims=True))
    beta = jnp.min(front, axis=-1, keepdims=True)
    lo = _qat_affine_qdq(front, alpha, beta, 2**bits_lo - 1, eps)
    lo = lo.reshape(o, split)

    tail = w[:, split:]
    alpha4 = (jnp.max(tail, axis=-1, keepdims=True)
              - jnp.min(tail, axis=-1, keepdims=True))
    beta4 = jnp.min(tail, axis=-1, keepdims=True)
    hi = _qat_affine_qdq(tail, alpha4, beta4, 2**bits_hi - 1, eps)
    return jnp.concatenate([lo, hi], axis=-1)


def mxq_fake_quant_ptq_ratio(w: jax.Array, ratio_2b_num: int,
                             ratio_2b_den: int, blocksize: int = 16,
                             cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Block-interleaved PTQ quant-dequant at an arbitrary 2b ratio — the
    reference's active ``SparseGPT.fasterprune`` (sparsegpt.py:1993-2110)
    is this scheme at ratio 6/10 with 2b sub-blocks of ``blocksize``
    (called with blocksize=32, prune.py:308). Handles ragged last groups
    (e.g. 38 = 32 + 6 columns per 64-block).
    """
    o, k = w.shape
    w = w.astype(jnp.float32)
    block = cfg.block
    num_2b = int(block * ratio_2b_num / ratio_2b_den)
    nb = k // block
    wb = w.reshape(o, nb, block)
    lo, hi = wb[:, :, :num_2b], wb[:, :, num_2b:]

    # 2b region in sub-blocks of `blocksize` columns (ragged tail allowed)
    pieces = []
    for start in range(0, num_2b, blocksize):
        end = min(start + blocksize, num_2b)
        seg = lo[:, :, start:end]
        s, z = asym_find_params(seg, cfg.maxq_lo)
        sdq = double_quant_scales(
            s.T.reshape(-1, o), cfg.qq_scale_bits, cfg.qq_group,
            eps=cfg.ptq_eps).scale_dq.reshape(s.T.shape).T
        pieces.append(asym_qdq(seg, sdq[..., None], z[..., None],
                               cfg.maxq_lo, cfg.ptq_eps))
    lo_dq = jnp.concatenate(pieces, axis=-1)

    hi_flat = hi.reshape(o, -1)
    s4, z4 = asym_find_params(hi_flat, cfg.maxq_hi)
    s4dq = double_quant_scales(s4, cfg.qq_scale_bits, cfg.qq_group,
                               eps=cfg.ptq_eps).scale_dq
    hi_dq = asym_qdq(hi_flat, s4dq[:, None], z4[:, None], cfg.maxq_hi,
                     cfg.ptq_eps).reshape(hi.shape)

    return jnp.concatenate([lo_dq, hi_dq], axis=-1).reshape(o, k)


def _rowmean_sign_qdq(x: jax.Array) -> jax.Array:
    """The PTQ Quantizer's 1-bit path (quantizer.py:102-105,157-163):
    scale = mean|x| over the last axis, qdq = +scale where x >= 0 else
    -scale."""
    s = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.where(x >= 0, s, -s)


def leave_one_out_error(wb: jax.Array, hdiag: jax.Array,
                        bits: int) -> jax.Array:
    """SpQR-style leave-one-out error reduction
    (mxqgpt.py get_leave_one_out_error :454-491).

    ``wb``: [..., bs] groups; ``hdiag``: [..., bs] matching diag of the
    upper Cholesky of H^-1. For each element, requantize its group WITHOUT
    it and measure how much the Hessian-weighted squared error of the rest
    drops vs quantizing the full group — the element's "usefulness as an
    outlier". Returns [..., bs].
    """
    bs = wb.shape[-1]
    maxq = 2 ** bits - 1
    idx = jnp.arange(bs)
    # loo_indices[j] = all indices except j, in order (:459-461)
    loo = idx[None, 1:] - (idx[:, None] >= idx[None, 1:]).astype(idx.dtype)
    gw = wb[..., loo]                                   # [..., bs, bs-1]
    s, z = asym_find_params(gw, maxq)
    rec = asym_qdq(gw, s[..., None], z[..., None], maxq)
    hd_loo = hdiag[..., loo]
    loo_err = (((rec - gw) / hd_loo) ** 2).sum(-1)      # [..., bs]

    s0, z0 = asym_find_params(wb, maxq)
    rec0 = asym_qdq(wb, s0[..., None], z0[..., None], maxq)
    base_err = (((rec0 - wb) / hdiag) ** 2).sum(-1, keepdims=True)
    return base_err - loo_err


def mxq_outlier_quantize(w: jax.Array, h: jax.Array | None = None,
                         bits: int = 1, blocksize: int = 16,
                         percdamp: float = 0.01,
                         ol_threshold: float = 1.1,
                         count_threshold: int = 4,
                         outlier_rel_threshold: float = 0.6):
    """Outlier-aware quantization — the reference's ``MXQGPT1.fasterquant``
    (mxqgpt.py:155-254): quantize at ``bits`` but keep an unstructured
    outlier mask in full precision.

    ``bits == 1`` (the reference's active branch, mxqgpt.py:170-197):
    per ``blocksize``-column block, elements beyond ``ol_threshold`` times
    the row's mean |w| are likely outliers; rows with more than
    ``count_threshold`` of them keep the WHOLE row-block in fp; the rest is
    1-bit mean-scale sign-quantized.

    ``bits >= 2`` (mxqgpt.py:198-232): leave-one-out error reduction vs
    ``outlier_rel_threshold * mean(var(W,axis=0)/diag(Hinv_chol)^2)``
    (:155-157) picks likely outliers; quantizer params are fit on the block
    with outliers replaced by the non-outlier mean; the final mask re-checks
    the Hessian-weighted residual against the same threshold. Requires ``h``.

    Returns ``(w_qdq [O, K], outlier_mask [O, K] bool)``.
    """
    o, k = w.shape
    w = w.astype(jnp.float32)
    hdiag = None
    if h is not None:
        dead = jnp.diag(h) == 0
        h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
        w = jnp.where(dead[None, :], 0.0, w)
        damp = percdamp * jnp.mean(jnp.diag(h))
        h = h + damp * jnp.eye(k, dtype=h.dtype)
        hinv_chol = jnp.linalg.cholesky(jnp.linalg.inv(h), upper=True)
        hdiag = jnp.diag(hinv_chol)

    nb = k // blocksize
    wb = w.reshape(o, nb, blocksize)

    if bits == 1:
        wmean = jnp.sum(jnp.abs(wb), axis=-1, keepdims=True) / blocksize
        likely = ((wb > ol_threshold * wmean)
                  | (wb < -ol_threshold * wmean))
        block_rows = jnp.sum(likely, axis=-1, keepdims=True) > count_threshold
        mask = jnp.broadcast_to(block_rows, wb.shape)
        qdq = _rowmean_sign_qdq(wb)
        out = jnp.where(mask, wb, qdq)
        return out.reshape(o, k), mask.reshape(o, k)

    if hdiag is None:
        raise ValueError("bits >= 2 outlier quantization needs the Hessian")
    # threshold from the FULL weight (mxqgpt.py:155-157); torch.var is
    # unbiased (ddof=1)
    scale_stat = jnp.mean(jnp.var(w, axis=0, ddof=1) / hdiag ** 2)
    threshold = outlier_rel_threshold * scale_stat

    hd_b = hdiag.reshape(1, nb, blocksize)
    reduction = leave_one_out_error(wb, hd_b, bits)
    likely = reduction > threshold
    non = ~likely
    mean_non = (jnp.sum(wb * non, axis=-1, keepdims=True)
                / jnp.maximum(jnp.sum(non, axis=-1, keepdims=True), 1))
    wb_wo = jnp.where(likely, mean_non, wb)
    maxq = 2 ** bits - 1
    s, z = asym_find_params(wb_wo, maxq)
    wq = asym_qdq(wb, s[..., None], z[..., None], maxq)
    err = (wb - wq) / hd_b
    mask = err ** 2 > threshold
    out = jnp.where(mask, wb, wq)
    return out.reshape(o, k), mask.reshape(o, k)


def binary_fake_quant(w: jax.Array, groupsize: int = 8,
                      layerwise: bool = False) -> jax.Array:
    """1-bit weight fake-quant (QuantizeLinear w_bits==1 path,
    utils_quant.py:649-685): per-group (8 cols) mean-|w| scale times sign,
    with the straight-through trick applied by the caller."""
    if layerwise:
        s = jnp.mean(jnp.abs(w))
        return s * jnp.sign(w / s)
    o, k = w.shape
    g = w.reshape(o, k // groupsize, groupsize)
    s = jnp.mean(jnp.abs(g), axis=-1, keepdims=True)
    return (s * jnp.sign(g / s)).reshape(o, k)


def sub2bit_fake_quant(w: jax.Array, w_bits: int,
                       layerwise: bool = False) -> jax.Array:
    """Sub-2-bit symmetric path (utils_quant.py:689-711): scale = 2*mean|w|
    per row, levels = 2^(bits-1), half-step offset rounding with ±(1-1e-2)
    clip."""
    num_bits = 2 ** (w_bits - 1)
    clip_val = 1 - 1e-2
    if layerwise:
        s = 2 * jnp.mean(jnp.abs(w))
    else:
        s = 2 * jnp.mean(jnp.abs(w), axis=1, keepdims=True)
    q = (jnp.round(jnp.clip(w / s, -clip_val, clip_val) * num_bits - 0.5)
         + 0.5) / num_bits
    return s * q
