"""The MXQ packed storage format for TPU, plus packer and reference dequant.

The reference defines a packed format only implicitly, inside its CUDA GEMV
(mxq_quant/cuda_kernel/csrc/quantization/gemv_mxq_cuda.cu:39-208 and
test_correct_gemv.py:15-37) and never reconciled it with what the PTQ pipeline
produces (2-bit vs 4-bit scale codes, fp vs integer zeros, second-order groups
of 4 rows vs 16 rows — see SURVEY.md §2.3). This module OWNS the format.

Design is TPU-first, not a translation of the CUDA layout:

* Everything is stored transposed, ``[K-ish, N]``: N (out features) rides the
  128-wide lane axis, and every sub-word axis packs along sublanes, because
  Mosaic supports sublane broadcast/reshape but not lane-granular repeats
  (verified on-chip, tools/probe_mosaic.py).
* The 2-bit and 4-bit columns are de-interleaved into two uniform planes
  (the reference's ``weight`` / ``weight_last`` split taken to its
  conclusion), so each plane has a single stride and unpack pattern.
* First-order metadata for one 64-column block fits one int32 per output
  channel: 3 zero codes (2b each) + 3 scale codes at EIGHT bits each — the
  reference wastes 14 bits per block-word on padding (8-bit fields holding
  3x2-bit codes, gemv_mxq_cuda.cu:102-133); we spend those bits on finer
  scale codes instead.
* Second-order scale compression uses the min-offset formulation
  ``scale = qq_scale * code + qq_min`` over the 3 groups of one block along K
  (not 16 output rows as in the reference PTQ, nor 4 rows as
  in the reference kernel): K-direction grouping means the kernel expands it
  with sublane broadcasts only. The min-offset form keeps integer codes in
  range (the reference's ``zero = -min/scale`` becomes negative for
  non-negative scales and cannot be rounded into [0, maxq]).

Layout constants (per linear, logical torch-orientation weight [O, K] stored
as planes over [K, N=O]):

  NB    = K / 64 blocks, padded to NBP (multiple of NB_TILE=16)
  K2P   = NBP * 48, K4P = NBP * 16, G2P = NBP * 3 (2-bit groups)
  w2    : int32 [K2P/16, N]  word r of a k-tile = the 16 codes of 2b-group r
                             (r in [0,48)), code j at bits 2j
  w4    : int32 [K4P/8,  N]  8 x 4b codes per word, code j at bits 4j
  meta2 : int32 [NBP, N]     word r of a k-tile holds, for the three groups
                             g = 16*i + r (i in {0,1,2}) of that tile:
                             zero code of g at bits 2i (2b each) and scale
                             code of g at bits 6+8i (8b each). The i-indexed
                             field layout means the kernel reconstructs all 48
                             group params with three shift/mask ops and one
                             concatenation — no sublane interleaves.
  qscale: bf16 [NBP, N]      second-order scale, one per (k-tile word r,
  qmin  : bf16 [NBP, N]      channel); the qq chunk of word r = the 3 groups
                             {r, 16+r, 32+r} stored in that word, so the
                             kernel applies qq params with zero expansion.
                             (16 rows per k-tile = one bf16 sublane tile)
  smeta4: f32 [8, N]         row 0: per-channel 4b scale (fp), row 1: 4b zero
                             code (as fp), rows 2..7 zero (pad to sublane 8)

The matching activation layout is slab-major per k-tile: the kernel consumes
x2 permuted so row j*48 + r corresponds to original column 16r + j (see
ops.mxq_matmul.permute_x2) — the dequantized weight is then a plain
concatenation of the 16 shift/mask slabs, with per-group scale/zero applied
per slab at [48, N] without any broadcast materialization.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.config import MXQConfig, DEFAULT_SCHEME
from mxq_tpu import scheme

# Tiling constants — shared with ops/mxq_matmul.py.
NB_TILE = 16          # blocks per k-tile  (= 1024 input columns)
KT = NB_TILE * 64     # input columns per k-tile
QQ_GROUPS = 3         # second-order chunk = the 3 groups of one block
N_LANE = 1024         # out-feature padding granularity: every padded N is a
                      # multiple of the largest kernel lane tile (1024-wide
                      # tiles measured ~20% faster than 256; ~2.3% extra
                      # storage on 11008/22016/32000-wide layers)
SCALE_CODE_BITS = 8   # first-order scale codes (reference used 4: mxqgpt.py:425)
SCALE_CODE_MAX = 2**SCALE_CODE_BITS - 1


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedMXQLinear:
    """One packed linear layer: y = x @ dequant(self) (+ no bias)."""

    w2: jax.Array      # int32 [K2P/16, N]
    w4: jax.Array      # int32 [K4P/8, N]
    meta2: jax.Array   # int32 [NBP, N]
    qscale: jax.Array  # bf16  [NBP, N]
    qmin: jax.Array    # bf16  [NBP, N]
    smeta4: jax.Array  # f32   [8, N]
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nbp(self) -> int:
        return self.meta2.shape[0]

    @property
    def n_padded(self) -> int:
        return self.meta2.shape[1]


def _pack_along_sublanes(codes: jnp.ndarray, bits: int) -> jnp.ndarray:
    """[R*per_word, N] int codes -> [R, N] int32, code j of word r at bits j*bits."""
    per_word = 32 // bits
    r = codes.shape[0] // per_word
    c = codes.astype(jnp.int32).reshape(r, per_word, -1)
    shifts = (jnp.arange(per_word, dtype=jnp.int32) * bits)[None, :, None]
    return jnp.sum(c << shifts, axis=1).astype(jnp.int32)


def _unpack_along_sublanes(words: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Inverse of _pack_along_sublanes: [R, N] int32 -> [R*per_word, N]."""
    per_word = 32 // bits
    mask = (1 << bits) - 1
    shifts = (jnp.arange(per_word, dtype=jnp.int32) * bits)[None, :, None]
    c = (jax.lax.shift_right_logical(words[:, None, :], shifts)) & mask
    return c.reshape(words.shape[0] * per_word, words.shape[1])


def quantize_pack(w: jax.Array, cfg: MXQConfig = DEFAULT_SCHEME) -> PackedMXQLinear:
    """Quantize a [O, K] weight straight into the packed format.

    Uses the MXQ block topology (48 cols 2b in groups of 16 + 16 cols rowwise
    4b per 64-col block, scheme.split_blocks) with integer zero codes
    (round_zero) and 8-bit min-offset double-quantized 2b-group scales.
    """
    o, k = w.shape
    w = w.astype(jnp.float32)
    w_lo, w_hi = scheme.split_blocks(w, cfg)         # [O, K2], [O, K4]

    nb = k // cfg.block
    nbp = _cdiv(nb, NB_TILE) * NB_TILE
    n = _cdiv(o, N_LANE) * N_LANE

    # ----- 2-bit plane: per-(row, group-of-16) params -----
    g2 = w_lo.shape[1] // cfg.group
    gv = w_lo.reshape(o, g2, cfg.group)
    s, z = scheme.asym_find_params(gv, cfg.maxq_lo)  # [O, G2]
    zc = jnp.clip(jnp.round(z), 0, cfg.maxq_lo)

    # Second-order: the qq chunk of k-tile word r is the QQ_GROUPS groups
    # {16*i + r} stored in that word — view groups as [n_kt, i, r] and
    # reduce over i.
    g2p = nbp * cfg.groups_per_block
    n_kt = nbp // NB_TILE
    s_pad = jnp.pad(s, ((0, n - o), (0, g2p - g2)))
    zc_pad = jnp.pad(zc, ((0, n - o), (0, g2p - g2)))
    sv = s_pad.reshape(n, n_kt, QQ_GROUPS, NB_TILE)  # [.., i, r] = group 16i+r
    qq_min = jnp.min(sv, axis=2)                     # [N, n_kt, 16]
    qq_rng = jnp.max(sv, axis=2) - qq_min
    qq_scale = jnp.where(qq_rng > 0, qq_rng / SCALE_CODE_MAX, 1.0)
    s_codes = jnp.clip(
        jnp.round((sv - qq_min[:, :, None, :]) / qq_scale[:, :, None, :]),
        0, SCALE_CODE_MAX)                           # [N, n_kt, 3, 16]
    # bf16 storage of second-order params (the precision the kernel sees).
    qq_scale_b = qq_scale.astype(jnp.bfloat16)
    qq_min_b = qq_min.astype(jnp.bfloat16)
    s_eff = (qq_scale_b.astype(jnp.float32)[:, :, None, :] * s_codes
             + qq_min_b.astype(jnp.float32)[:, :, None, :])
    s_eff = s_eff.reshape(n, g2p)

    # 2b codes quantized against the effective (double-quantized) scale,
    # matching the reference's order of operations (quantizer.py:114-121
    # replaces scale before quantize).
    gv_pad = jnp.pad(gv, ((0, n - o), (0, g2p - g2), (0, 0)))
    codes2 = scheme.asym_quantize(gv_pad, s_eff[..., None], zc_pad[..., None],
                                  cfg.maxq_lo, cfg.ptq_eps)
    codes2 = codes2.reshape(n, g2p * cfg.group)      # [N, K2P]

    # ----- 4-bit plane: per-row params over the gathered columns -----
    s4, z4 = scheme.asym_find_params(w_hi, cfg.maxq_hi)   # [O]
    z4c = jnp.clip(jnp.round(z4), 0, cfg.maxq_hi)
    codes4 = scheme.asym_quantize(w_hi, s4[:, None], z4c[:, None],
                                  cfg.maxq_hi, cfg.ptq_eps)
    k4p = nbp * cfg.num_4b
    codes4 = jnp.pad(codes4, ((0, n - o), (0, k4p - codes4.shape[1])))
    s4 = jnp.pad(s4, (0, n - o))
    z4c = jnp.pad(z4c, (0, n - o))

    # ----- bit-pack (transpose to [K-ish, N]) -----
    w2 = _pack_along_sublanes(codes2.T, cfg.bits_lo)
    w4 = _pack_along_sublanes(codes4.T, cfg.bits_hi)

    # meta2 word (tile t, row r): fields i hold codes of group 16i+r.
    zv = zc_pad.reshape(n, n_kt, QQ_GROUPS, NB_TILE).astype(jnp.int32)
    sc_i = s_codes.astype(jnp.int32)
    meta = jnp.zeros((n, n_kt, NB_TILE), jnp.int32)
    for i in range(QQ_GROUPS):
        meta = meta | (zv[:, :, i, :] << (2 * i)) \
                    | (sc_i[:, :, i, :] << (6 + SCALE_CODE_BITS * i))
    meta2 = meta.transpose(1, 2, 0).reshape(nbp, n)

    def rows(a):  # [N, n_kt, 16] -> [NBP, N]
        return a.transpose(1, 2, 0).reshape(nbp, n)

    smeta4 = jnp.zeros((8, n), jnp.float32)
    smeta4 = smeta4.at[0].set(s4).at[1].set(z4c)

    return PackedMXQLinear(w2=w2, w4=w4, meta2=meta2,
                           qscale=rows(qq_scale_b), qmin=rows(qq_min_b),
                           smeta4=smeta4, in_features=k, out_features=o)


def unpack_dequant(p: PackedMXQLinear,
                   cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Pure-jnp reference dequant -> [K, O] f32 (transposed for x @ W).

    This is the normative semantics the Pallas kernel must reproduce; it is
    also the fake-quant used to evaluate packed-path quality.
    """
    nbp, n = p.meta2.shape
    gpb = cfg.groups_per_block
    g2p = nbp * gpb

    codes2 = _unpack_along_sublanes(p.w2, cfg.bits_lo).astype(jnp.float32)
    codes4 = _unpack_along_sublanes(p.w4, cfg.bits_hi).astype(jnp.float32)

    # meta word (t, r), field i -> group 16i + r of tile t
    n_kt = nbp // NB_TILE
    mv = p.meta2.reshape(n_kt, NB_TILE, n)
    fields = jnp.arange(gpb, dtype=jnp.int32)
    zc = (mv[:, None, :, :] >> (fields * 2)[None, :, None, None]) & 0x3
    sc = (mv[:, None, :, :] >> (6 + fields * SCALE_CODE_BITS)[None, :, None,
                                                              None]) \
        & SCALE_CODE_MAX                            # [n_kt, i, r, N]
    zc = zc.reshape(g2p, n).astype(jnp.float32)     # flat g = t*48 + 16i + r
    sc = sc.astype(jnp.float32)

    qq_scale = p.qscale.astype(jnp.float32).reshape(n_kt, NB_TILE, n)
    qq_min = p.qmin.astype(jnp.float32).reshape(n_kt, NB_TILE, n)
    s_eff = (qq_scale[:, None, :, :] * sc + qq_min[:, None, :, :])
    s_eff = s_eff.reshape(g2p, n)

    w2 = (jnp.repeat(s_eff, cfg.group, axis=0)
          * (codes2 - jnp.repeat(zc, cfg.group, axis=0)))

    s4 = p.smeta4[0]
    z4 = p.smeta4[1]
    w4 = s4[None, :] * (codes4 - z4[None, :])

    # Re-interleave planes and strip padding.
    wk = scheme.merge_blocks(w2.T, w4.T, cfg)       # [N, NBP*64]
    return wk[: p.out_features, : p.in_features].T  # [K, O]


def fake_quant_packed(w: jax.Array, cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Packed-format quant-dequant of a [O, K] weight (returns [O, K])."""
    return unpack_dequant(quantize_pack(w, cfg), cfg).T


def pad_inputs_split(x: jax.Array, p: PackedMXQLinear,
                     cfg: MXQConfig = DEFAULT_SCHEME):
    """Split activations [..., K] into the de-interleaved padded planes
    (x2 [..., K2P], x4 [..., K4P]) matching the packed weight layout."""
    k = p.in_features
    nbp = p.nbp
    lead = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, nbp * cfg.block - k)])
    xb = xp.reshape(lead + (nbp, cfg.block))
    x2 = xb[..., : cfg.num_2b].reshape(lead + (nbp * cfg.num_2b,))
    x4 = xb[..., cfg.num_2b:].reshape(lead + (nbp * cfg.num_4b,))
    return x2, x4
