"""Round-2 kernel experiments: cheap sub-byte unpack via int32->int8 bitcast.

The round-1 production kernel (ops/mxq_matmul.py v3) spends ~5 VPU ops per
2-bit weight (shift, mask, convert, scale-mul, zero-sub) and runs at ~291 GB/s
of weight-bytes vs the 819 GB/s HBM roofline. Probes (tools/probe_mosaic2.py)
show Mosaic supports:
  * pltpu.bitcast int32 -> int8 (sublane x4 expansion, free-ish relayout)
  * int8 -> f32/bf16 converts
  * int8 x int8 and bf16 x int8 MXU dots

Variants here exploit that:
  v3z : v3 with the per-slab zero-subtract hoisted into ONE correction dot
        (acc -= group_sums(x) @ (s*z))  -> 4 ops/weight
  v4  : nibble pre-mask on words (7 int-ops per 16 codes), bitcast to int8
        rows, 1 convert + 1 scale-mul per code, pair codes resolved exactly
        by telescoped activations (x1' = x1 - 4*x0)  -> ~2.8 ops/weight
  v4b : v4 with bf16 weight staging for the dots (packed VPU ops + native
        MXU bf16)

All variants compute y = x @ dequant(packed) and are checked against
packfmt.unpack_dequant before timing.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.packfmt import NB_TILE, SCALE_CODE_BITS
from mxq_tpu.utils.benchlib import time_op

CFG = MXQConfig()
W2_ROWS, W4_ROWS = 48, 32
K2T, K4T = W2_ROWS * 16, W4_ROWS * 8   # 768, 256
XS_ROWS = 64                           # correction rows: 48 groups + 1 (4b) + pad


# ---------------------------------------------------------------------------
# activation prep (host side, shared by v4*)
# ---------------------------------------------------------------------------


def prep_x_v4(x2, x4, n_kt):
    """x2 [B, n_kt*768], x4 [B, n_kt*256] ->
    (x2c [n_kt*768, B], x4c [n_kt*256, B], xsum [n_kt*64, B]) f32.

    Per tile, x2c rows are [xa | xo1 | xb | xo2] where
      xa [4r+b]  = u[16r+4b]            (byte-b low-nibble pair base)
      xo1[4r+b]  = u[16r+4b+1] - 4*u[16r+4b]
      xb [4r+b]  = u[16r+4b+2]
      xo2[4r+b]  = u[16r+4b+3] - 4*u[16r+4b+2]
    which makes  x.c == xa.a + xo1.o1 + xb.bb + xo2.o2  exactly, with
      a  = c0+4c1 (low nibble), o1 = c1, bb = c2+4c3 (high nibble), o2 = c3.
    """
    b = x2.shape[0]
    x2 = x2.astype(jnp.float32)
    x4 = x4.astype(jnp.float32)
    v = x2.reshape(b, n_kt, W2_ROWS, 4, 4)
    xa = v[..., 0]
    xo1 = v[..., 1] - 4.0 * v[..., 0]
    xb = v[..., 2]
    xo2 = v[..., 3] - 4.0 * v[..., 2]
    x2c = jnp.stack([xa, xo1, xb, xo2], axis=2)        # [B, nkt, 4, 48, 4]
    x2c = x2c.reshape(b, n_kt * K2T)

    v4 = x4.reshape(b, n_kt, W4_ROWS, 4, 2)
    x4c = jnp.stack([v4[..., 0], v4[..., 1]], axis=2)  # [B, nkt, 2, 32, 4]
    x4c = x4c.reshape(b, n_kt * K4T)

    gsum = x2.reshape(b, n_kt, W2_ROWS, 16).sum(-1)    # [B, nkt, 48]
    s4sum = x4.reshape(b, n_kt, K4T).sum(-1)           # [B, nkt]
    pad = jnp.zeros((b, n_kt, XS_ROWS - W2_ROWS - 1), jnp.float32)
    xsum = jnp.concatenate([gsum, s4sum[..., None], pad], -1)
    xsum = xsum.reshape(b, n_kt * XS_ROWS)
    return x2c.T, x4c.T, xsum.T


def prep_xsum_v3(x2, x4, n_kt):
    b = x2.shape[0]
    gsum = x2.astype(jnp.float32).reshape(b, n_kt, W2_ROWS, 16).sum(-1)
    s4sum = x4.astype(jnp.float32).reshape(b, n_kt, K4T).sum(-1)
    pad = jnp.zeros((b, n_kt, XS_ROWS - W2_ROWS - 1), jnp.float32)
    xsum = jnp.concatenate([gsum, s4sum[..., None], pad], -1)
    return xsum.reshape(b, n_kt * XS_ROWS).T


def _decode_meta(meta_ref, qs_ref, qm_ref):
    return _decode_meta_vals(meta_ref[:], qs_ref[:], qm_ref[:])


def _decode_meta_vals(meta, qs, qm):
    qs = qs.astype(jnp.float32)
    qm = qm.astype(jnp.float32)
    s_parts, z_parts = [], []
    for i in range(3):
        zc_i = jax.lax.shift_right_logical(meta, 2 * i) & 0x3
        sc_i = (jax.lax.shift_right_logical(meta, 6 + SCALE_CODE_BITS * i)
                & ((1 << SCALE_CODE_BITS) - 1))
        s_parts.append(qs * sc_i.astype(jnp.float32) + qm)
        z_parts.append(zc_i)
    s_eff = jnp.concatenate(s_parts, axis=0)
    zc = jnp.concatenate(z_parts, axis=0).astype(jnp.float32)
    return s_eff, zc


DN = (((0,), (0,)), ((), ()))


def _corr(acc_ref, xs_ref, s_eff, zc, s4, z4, nl):
    corr2 = s_eff * zc                                  # [48, NL]
    corr4 = s4 * z4                                     # [1, NL]
    pad = jnp.zeros((XS_ROWS - W2_ROWS - 1, nl), jnp.float32)
    corr = jnp.concatenate([corr2, corr4, pad], axis=0)  # [64, NL]
    acc_ref[:] -= jax.lax.dot_general(
        xs_ref[:], corr, DN, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# v3z: production slab unpack, zero-correction as one dot
# ---------------------------------------------------------------------------


def kernel_v3z(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
               qm_ref, sm_ref, out_ref, acc_ref, *, nl):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    w2 = w2_ref[:]
    for j in range(16):
        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
        w_j = s_eff * c_j.astype(jnp.float32)
        xs = x2_ref[pl.ds(j * W2_ROWS, W2_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs.astype(jnp.float32), w_j, DN,
            preferred_element_type=jnp.float32)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    w4 = w4_ref[:]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        w_j = s4 * c_j.astype(jnp.float32)
        xs = x4_ref[pl.ds(j * W4_ROWS, W4_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs.astype(jnp.float32), w_j, DN,
            preferred_element_type=jnp.float32)

    _corr(acc_ref, xs_ref, s_eff, zc, s4, z4, nl)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# v4: bitcast nibble unpack
# ---------------------------------------------------------------------------


def kernel_v4(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
              qm_ref, sm_ref, out_ref, acc_ref, *, nl, wdtype=jnp.float32):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    s_exp = jnp.repeat(s_eff, 4, axis=0).astype(wdtype)   # [192, NL]

    w = w2_ref[:]
    planes = (
        (w & 0x0F0F0F0F, 0),
        (jax.lax.shift_right_logical(w, 2) & 0x03030303, 192),
        (jax.lax.shift_right_logical(w, 4) & 0x0F0F0F0F, 384),
        (jax.lax.shift_right_logical(w, 6) & 0x03030303, 576),
    )
    for arr, off in planes:
        wf = pltpu.bitcast(arr, jnp.int8).astype(wdtype) * s_exp
        xs = x2_ref[pl.ds(off, 4 * W2_ROWS), :].astype(wdtype)
        acc_ref[:] += jax.lax.dot_general(
            xs, wf, DN, preferred_element_type=jnp.float32)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    w4 = w4_ref[:]
    s4w = s4.astype(wdtype)
    for arr, off in ((w4 & 0x0F0F0F0F, 0),
                     (jax.lax.shift_right_logical(w4, 4) & 0x0F0F0F0F, 128)):
        wf = pltpu.bitcast(arr, jnp.int8).astype(wdtype) * s4w
        xs = x4_ref[pl.ds(off, 4 * W4_ROWS), :].astype(wdtype)
        acc_ref[:] += jax.lax.dot_general(
            xs, wf, DN, preferred_element_type=jnp.float32)

    _corr(acc_ref, xs_ref, s_eff, zc, s4, z4, nl)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# v5: v3 structure, all-bf16 slab path (bf16 FMA + native bf16 MXU dots).
# Rationale from v3z/v4 measurements: the zero-subtract is already a free FMA,
# int8 bitcast staging is a hidden unpack; the remaining wins are (a) native
# bf16 MXU passes instead of f32 (3x fewer), (b) possible packed-rate bf16
# VPU FMAs.
# ---------------------------------------------------------------------------


def kernel_v5(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
              qm_ref, sm_ref, out_ref, acc_ref, *, nl):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    s_b = s_eff.astype(jnp.bfloat16)
    nsz_b = (s_eff * zc).astype(jnp.bfloat16)

    w2 = w2_ref[:]
    for j in range(16):
        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
        w_j = s_b * c_j.astype(jnp.bfloat16) - nsz_b
        xs = x2_ref[pl.ds(j * W2_ROWS, W2_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    s4b = s4.astype(jnp.bfloat16)
    sz4b = (s4 * z4).astype(jnp.bfloat16)
    w4 = w4_ref[:]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        w_j = s4b * c_j.astype(jnp.bfloat16) - sz4b
        xs = x4_ref[pl.ds(j * W4_ROWS, W4_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def kernel_v5_m(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                qm_ref, sm_ref, out_ref, acc_ref, *, nl, m=2):
    """v5 processing m k-tiles per grid step (fewer, fatter pipeline stages)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    s4b = s4.astype(jnp.bfloat16)
    sz4b = (s4 * z4).astype(jnp.bfloat16)

    for t in range(m):
        s_eff, zc = _decode_meta_vals(
            meta_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qs_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qm_ref[pl.ds(t * NB_TILE, NB_TILE), :])
        s_b = s_eff.astype(jnp.bfloat16)
        nsz_b = (s_eff * zc).astype(jnp.bfloat16)
        w2 = w2_ref[pl.ds(t * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_b * c_j.astype(jnp.bfloat16) - nsz_b
            xs = x2_ref[pl.ds(t * K2T + j * W2_ROWS, W2_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs, w_j, DN, preferred_element_type=jnp.float32)
        w4 = w4_ref[pl.ds(t * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            w_j = s4b * c_j.astype(jnp.bfloat16) - sz4b
            xs = x4_ref[pl.ds(t * K4T + j * W4_ROWS, W4_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs, w_j, DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# v6: bf16 exponent-injection pair unpack.
# Per pair of codes (j, j+8) sharing one int32 lane: shift the 2-bit fields of
# BOTH 16-bit halves to mantissa bits 5..6, mask, OR in the bf16 exponent of
# 1.0, bitcast int32 -> bf16 (sublane x2) => rows of exactly 1 + c/4.
# Then one bf16 fused multiply-sub per plane: w = (4s)*(1+c/4) - s*(4+z)
#   = s*(c-z).  3 int ops + 1 bf16 fma per TWO codes ~= 2 VPU ops/code
# (v3: shift+and+convert+mul+sub per code), and 12 native-bf16 MXU dots per
# k-tile instead of 24 f32 ones.
# ---------------------------------------------------------------------------

EXP2, MASK2 = 0x3F803F80, 0x00600060     # field at mantissa bits 5..6 -> c/4
EXP4, MASK4 = 0x3F803F80, 0x00780078     # field at mantissa bits 3..6 -> c/16


def _shift_to(w, amount):
    if amount >= 0:
        return jax.lax.shift_right_logical(w, amount)
    return jax.lax.shift_left(w, -amount)


def kernel_v6(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
              qm_ref, sm_ref, out_ref, acc_ref, *, nl):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)   # [48, NL] f32
    s2x = jnp.repeat((4.0 * s_eff).astype(jnp.bfloat16), 2, axis=0)
    b2x = jnp.repeat((s_eff * (4.0 + zc)).astype(jnp.bfloat16), 2, axis=0)

    w2 = w2_ref[:]
    for j in range(8):
        p = _shift_to(w2, 2 * j - 5) & MASK2 | EXP2
        pb = pltpu.bitcast(p, jnp.bfloat16)              # [96, NL] 1 + c/4
        w_j = s2x * pb - b2x
        xs = x2_ref[pl.ds(j * 2 * W2_ROWS, 2 * W2_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    s4x = (16.0 * s4).astype(jnp.bfloat16)
    b4x = (s4 * (16.0 + z4)).astype(jnp.bfloat16)
    w4 = w4_ref[:]
    for j in range(4):
        p = _shift_to(w4, 4 * j - 3) & MASK4 | EXP4
        pb = pltpu.bitcast(p, jnp.bfloat16)              # [64, NL] 1 + c/16
        w_j = s4x * pb - b4x
        xs = x4_ref[pl.ds(j * 2 * W4_ROWS, 2 * W4_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def kernel_v3_m(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                qm_ref, sm_ref, out_ref, acc_ref, *, nl, m=2):
    """Production v3 structure, m k-tiles per grid step (fatter stages)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    sz4 = s4 * z4

    for t in range(m):
        s_eff, zc = _decode_meta_vals(
            meta_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qs_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qm_ref[pl.ds(t * NB_TILE, NB_TILE), :])
        neg_sz = s_eff * zc
        w2 = w2_ref[pl.ds(t * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
            xs = x2_ref[pl.ds(t * K2T + j * W2_ROWS, W2_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), w_j, DN,
                preferred_element_type=jnp.float32)
        w4 = w4_ref[pl.ds(t * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            w_j = s4 * c_j.astype(jnp.float32) - sz4
            xs = x4_ref[pl.ds(t * K4T + j * W4_ROWS, W4_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), w_j, DN,
                preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def kernel_v6b(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
               qm_ref, sm_ref, out_ref, acc_ref, *, nl):
    """v6 with exact zero handling: w = (4s) * ((1+c/4) - (1+z/4)).

    Both plane terms are exact in bf16 (small dyadics; z is an integer code),
    so the only rounding is the final multiply — v6's fma form
    (4s)(1+c/4) - s(4+z) cancels two ~4s-magnitude bf16 values and loses
    ~2 bits."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)   # [48, NL] f32
    s2x = jnp.repeat((4.0 * s_eff).astype(jnp.bfloat16), 2, axis=0)
    oz2 = jnp.repeat((1.0 + 0.25 * zc).astype(jnp.bfloat16), 2, axis=0)

    w2 = w2_ref[:]
    for j in range(8):
        p = _shift_to(w2, 2 * j - 5) & MASK2 | EXP2
        pb = pltpu.bitcast(p, jnp.bfloat16)              # [96, NL] 1 + c/4
        w_j = s2x * (pb - oz2)
        xs = x2_ref[pl.ds(j * 2 * W2_ROWS, 2 * W2_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    s4x = (16.0 * s4).astype(jnp.bfloat16)
    oz4 = (1.0 + 0.0625 * z4).astype(jnp.bfloat16)
    w4 = w4_ref[:]
    for j in range(4):
        p = _shift_to(w4, 4 * j - 3) & MASK4 | EXP4
        pb = pltpu.bitcast(p, jnp.bfloat16)              # [64, NL] 1 + c/16
        w_j = s4x * (pb - oz4)
        xs = x4_ref[pl.ds(j * 2 * W4_ROWS, 2 * W4_ROWS), :]
        acc_ref[:] += jax.lax.dot_general(
            xs, w_j, DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def permute_x2_v6(x2, n_kt):
    """Pair-plane activation order: row j*96 + 2r + h <- column 16r + j + 8h
    (code j of group r in the low half, code j+8 in the high half)."""
    b = x2.shape[0]
    v = x2.reshape(b, n_kt, W2_ROWS, 2, 8)       # [., kt, r, h, j]
    return v.transpose(0, 1, 4, 2, 3).reshape(b, -1)


def permute_x4_v6(x4, n_kt):
    """Row j*64 + 2r + h <- column 8r + j + 4h."""
    b = x4.shape[0]
    v = x4.reshape(b, n_kt, W4_ROWS, 2, 4)
    return v.transpose(0, 1, 4, 2, 3).reshape(b, -1)


# ---------------------------------------------------------------------------
# vp: prefill (GEMM-regime) kernel. Unpack each (n, k) weight tile ONCE into
# a bf16 VMEM scratch, then TWO full-K MXU dots per k-tile ([B,768]x[768,NL]
# + [B,256]x[256,NL]) instead of 24 skinny K=48 dots — full MXU utilization
# and no HBM dequant roundtrip. Unpack cost amortizes over block_b rows.
# ---------------------------------------------------------------------------


def kernel_vp(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
              qm_ref, sm_ref, out_ref, acc_ref, wd2_ref, wd4_ref, *, nl):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    neg_sz = s_eff * zc
    w2 = w2_ref[:]
    for j in range(16):
        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
        w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
        wd2_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = w_j.astype(jnp.bfloat16)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    sz4 = s4 * z4
    w4 = w4_ref[:]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        w_j = s4 * c_j.astype(jnp.float32) - sz4
        wd4_ref[pl.ds(j * W4_ROWS, W4_ROWS), :] = w_j.astype(jnp.bfloat16)

    acc_ref[:] += jax.lax.dot_general(
        x2_ref[:], wd2_ref[:], DN, preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x4_ref[:], wd4_ref[:], DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def kernel_vp2(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
               qm_ref, sm_ref, out_ref, acc_ref, wd2_ref, wd4_ref, *, nl,
               m=2):
    """vp processing m k-tiles per grid step with unpack(t+1) interleaved
    after dot(t) so the VPU works under the MXU's dots. Double-buffered
    wdeq scratch (dim 0 = t parity)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    sz4 = s4 * z4

    def unpack(t, buf):
        s_eff, zc = _decode_meta_vals(
            meta_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qs_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qm_ref[pl.ds(t * NB_TILE, NB_TILE), :])
        neg_sz = s_eff * zc
        w2 = w2_ref[pl.ds(t * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
            wd2_ref[buf, pl.ds(j * W2_ROWS, W2_ROWS), :] = \
                w_j.astype(jnp.bfloat16)
        w4 = w4_ref[pl.ds(t * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            w_j = s4 * c_j.astype(jnp.float32) - sz4
            wd4_ref[buf, pl.ds(j * W4_ROWS, W4_ROWS), :] = \
                w_j.astype(jnp.bfloat16)

    def dot(t, buf):
        acc_ref[:] += jax.lax.dot_general(
            x2_ref[pl.ds(t * K2T, K2T), :], wd2_ref[buf], DN,
            preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            x4_ref[pl.ds(t * K4T, K4T), :], wd4_ref[buf], DN,
            preferred_element_type=jnp.float32)

    unpack(0, 0)
    for t in range(1, m):
        unpack(t, t % 2)       # scheduler may run this under dot(t-1)
        dot(t - 1, (t - 1) % 2)
    dot(m - 1, (m - 1) % 2)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


DN_NAT = (((1,), (0,)), ((), ()))   # standard [B,K] @ [K,N]


def kernel_vp3(x2_ref, x4_ref, xs_ref, w2_ref, w4_ref, meta_ref, qs_ref,
               qm_ref, sm_ref, out_ref, acc_ref, wd2_ref, wd4_ref, *, nl,
               m=2):
    """vp2 with NATURAL-layout activations [B, K]: standard matmul dimension
    numbers so the MXU consumes x without a relayout (the GEMV kernels use
    transposed [K, B] x for sublane slab slicing — cheap at B=8, a full
    transpose per dot at B=512)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = sm_ref[0:1, :]
    z4 = sm_ref[1:2, :]
    sz4 = s4 * z4

    def unpack(t, buf):
        s_eff, zc = _decode_meta_vals(
            meta_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qs_ref[pl.ds(t * NB_TILE, NB_TILE), :],
            qm_ref[pl.ds(t * NB_TILE, NB_TILE), :])
        neg_sz = s_eff * zc
        w2 = w2_ref[pl.ds(t * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
            wd2_ref[buf, pl.ds(j * W2_ROWS, W2_ROWS), :] = \
                w_j.astype(jnp.bfloat16)
        w4 = w4_ref[pl.ds(t * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            w_j = s4 * c_j.astype(jnp.float32) - sz4
            wd4_ref[buf, pl.ds(j * W4_ROWS, W4_ROWS), :] = \
                w_j.astype(jnp.bfloat16)

    def dot(t, buf):
        acc_ref[:] += jax.lax.dot_general(
            x2_ref[:, pl.ds(t * K2T, K2T)], wd2_ref[buf], DN_NAT,
            preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            x4_ref[:, pl.ds(t * K4T, K4T)], wd4_ref[buf], DN_NAT,
            preferred_element_type=jnp.float32)

    unpack(0, 0)
    for t in range(1, m):
        unpack(t, t % 2)
        dot(t - 1, (t - 1) % 2)
    dot(m - 1, (m - 1) % 2)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def run_prefill(p, x, cfg=CFG, block_b=512, block_n=512, kernel=None,
                kt_mult=1, tag="vp", natural_x=False):
    """Time a prefill kernel on a GEMM-shaped x [B, K] vs bf16 dense + the
    round-1 dequant-to-bf16 path."""
    from mxq_tpu.ops import mxq_matmul as mm

    nbp, n = p.meta2.shape
    n_kt = nbp // NB_TILE
    b, k_in = x.shape
    m = kt_mult
    grid = (b // block_b, n // block_n, n_kt // m)
    if kernel is None:
        kernel = kernel_vp
        scratch = [pltpu.VMEM((block_b, block_n), jnp.float32),
                   pltpu.VMEM((K2T, block_n), jnp.bfloat16),
                   pltpu.VMEM((K4T, block_n), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((block_b, block_n), jnp.float32),
                   pltpu.VMEM((2, K2T, block_n), jnp.bfloat16),
                   pltpu.VMEM((2, K4T, block_n), jnp.bfloat16)]

    call = pl.pallas_call(
        functools.partial(kernel, nl=block_n),
        grid=grid,
        in_specs=([
            pl.BlockSpec((block_b, K2T * m), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K4T * m), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, XS_ROWS * m), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
        ] if natural_x else [
            pl.BlockSpec((K2T * m, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * m, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XS_ROWS * m, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
        ]) + [
            pl.BlockSpec((W2_ROWS * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        scratch_shapes=scratch,
    )

    def prep(xin):
        x2, x4 = packfmt.pad_inputs_split(xin, p, cfg)
        a = mm.permute_x2(x2, n_kt).astype(jnp.bfloat16)
        b_ = mm.permute_x4(x4, n_kt).astype(jnp.bfloat16)
        s = prep_xsum_v3(x2, x4, n_kt)
        if not natural_x:
            a, b_ = a.T, b_.T
        else:
            s = s.T
        return a, b_, s

    a, b_, s = prep(x)
    const = (p.w2, p.w4, p.meta2, p.qscale, p.qmin, p.smeta4)
    y = call(a, b_, s, *const)
    ref = x.astype(jnp.float32) @ packfmt.unpack_dequant(p, cfg)
    ref = jnp.pad(ref, ((0, 0), (0, n - ref.shape[1])))
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"{tag} b{block_b} n{block_n}: rel_err={err:.2e}", flush=True)
    if err > 2e-2:
        print("  !! INCORRECT", flush=True)
        return

    def stepf(c, xin):
        a, b_, s = prep(xin)
        return call(a, b_, s, *c)[:, :k_in]

    t = time_op(stepf, x, const=const)
    print(f"{tag} b{block_b} n{block_n}: {t*1e6:.1f} us "
          f"({2*b*k_in*n/t/1e12:.1f} TFLOP/s eq)", flush=True)

    # baselines
    wd = jnp.asarray(np.asarray(packfmt.unpack_dequant(p, cfg)),
                     jnp.bfloat16)

    def step_dense(c, xin):
        return (xin.astype(jnp.bfloat16) @ c[0]).astype(jnp.float32)

    td = time_op(step_dense, x, const=(wd,))
    print(f"bf16 dense: {td*1e6:.1f} us", flush=True)

    def step_dq(c, xin):
        w = mm.mxq_dequant_weight(p, cfg)
        return (xin.astype(jnp.bfloat16) @ w).astype(jnp.float32)

    tq = time_op(step_dq, x, const=const)
    print(f"dequant->bf16 path: {tq*1e6:.1f} us", flush=True)
    return t, td, tq


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def make_call(kernel, b, nbp, n, block_n, x2_rows, x4_rows, kt_mult=1,
              x_dtype=jnp.float32):
    n_kt = nbp // NB_TILE // kt_mult
    grid = (1, n // block_n, n_kt)
    m = kt_mult
    return pl.pallas_call(
        functools.partial(kernel, nl=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((x2_rows * m, b), lambda bi, ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x4_rows * m, b), lambda bi, ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XS_ROWS * m, b), lambda bi, ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * m, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda bi, ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )


def run_variant(name, kernel, p, x, cfg=CFG, block_n=1024, x_prep="v4",
                check_only=False, kt_mult=1, x_dtype=jnp.float32):
    from mxq_tpu.ops import mxq_matmul as mm

    nbp, n = p.meta2.shape
    n_kt = nbp // NB_TILE
    b = x.shape[0]
    x2, x4 = packfmt.pad_inputs_split(x, p, cfg)

    if x_prep == "v4":
        x2c, x4c, xsum = prep_x_v4(x2, x4, n_kt)
    elif x_prep == "v6":
        x2c = permute_x2_v6(x2, n_kt).T.astype(x_dtype)
        x4c = permute_x4_v6(x4, n_kt).T.astype(x_dtype)
        xsum = prep_xsum_v3(x2, x4, n_kt)
    else:  # v3 slab-major order + xsum
        x2c = mm.permute_x2(x2, n_kt).T.astype(x_dtype)
        x4c = mm.permute_x4(x4, n_kt).T.astype(x_dtype)
        xsum = prep_xsum_v3(x2, x4, n_kt)

    call = make_call(kernel, b, nbp, n, block_n, K2T, K4T, kt_mult=kt_mult,
                     x_dtype=x_dtype)
    args = (x2c, x4c, xsum, p.w2, p.w4, p.meta2, p.qscale, p.qmin, p.smeta4)
    y = call(*args)

    ref = (x.astype(jnp.float32) @ packfmt.unpack_dequant(p, cfg)
           )[:, :n]
    ref = jnp.pad(ref, ((0, 0), (0, n - ref.shape[1])))
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"{name}: rel_err={err:.2e}", flush=True)
    if check_only or err > 2e-2:
        if err > 2e-2:
            print(f"  !! {name} INCORRECT, skipping timing", flush=True)
        return None

    const = args[3:]

    def stepf(c, xin):
        x2i, x4i = packfmt.pad_inputs_split(xin, p, cfg)
        if x_prep == "v4":
            a, b_, s = prep_x_v4(x2i, x4i, n_kt)
        elif x_prep == "v6":
            a = permute_x2_v6(x2i, n_kt).T.astype(x_dtype)
            b_ = permute_x4_v6(x4i, n_kt).T.astype(x_dtype)
            s = prep_xsum_v3(x2i, x4i, n_kt)
        else:
            a = mm.permute_x2(x2i, n_kt).T.astype(x_dtype)
            b_ = mm.permute_x4(x4i, n_kt).T.astype(x_dtype)
            s = prep_xsum_v3(x2i, x4i, n_kt)
        return call(a, b_, s, *c)[:, :k_in]

    k_in = x.shape[1]
    t = time_op(stepf, x, const=const)
    wbytes = (p.w2.size + p.w4.size + p.meta2.size) * 4 \
        + (p.qscale.size + p.qmin.size) * 2
    print(f"{name}: {t*1e6:.1f} us  wt-BW {wbytes/t/1e9:.0f} GB/s", flush=True)
    return t


def main():
    rng = np.random.RandomState(0)
    k = n = 4096
    b = 8
    w = jnp.asarray(rng.randn(n, k).astype(np.float32) * 0.02)
    p = packfmt.quantize_pack(w, CFG)
    p = jax.tree.map(lambda a: jax.device_put(a), p)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))

    # production baseline
    from mxq_tpu.ops import mxq_matmul as mm
    y0 = mm.mxq_matmul(x, p, CFG)

    def step0(c, xin):
        return mm.mxq_matmul(xin, c, CFG)

    t0 = time_op(step0, x, const=p)
    print(f"v3 (production): {t0*1e6:.1f} us", flush=True)

    which = sys.argv[1:] or ["v5", "v5m2", "v5m4"]
    if "v3z" in which:
        run_variant("v3z", kernel_v3z, p, x, x_prep="v3")
    if "v4" in which:
        run_variant("v4", kernel_v4, p, x, x_prep="v4")
    if "v4b" in which:
        run_variant("v4b", functools.partial(kernel_v4, wdtype=jnp.bfloat16),
                    p, x, x_prep="v4")
    if "v5" in which:
        run_variant("v5", kernel_v5, p, x, x_prep="v3",
                    x_dtype=jnp.bfloat16)
    if "v5m2" in which:
        run_variant("v5m2", functools.partial(kernel_v5_m, m=2), p, x,
                    x_prep="v3", kt_mult=2, x_dtype=jnp.bfloat16)
    if "v5m4" in which:
        run_variant("v5m4", functools.partial(kernel_v5_m, m=4), p, x,
                    x_prep="v3", kt_mult=4, x_dtype=jnp.bfloat16)
    if "v6" in which:
        run_variant("v6", kernel_v6, p, x, x_prep="v6",
                    x_dtype=jnp.bfloat16)
    if "v6b" in which:
        run_variant("v6b", kernel_v6b, p, x, x_prep="v6",
                    x_dtype=jnp.bfloat16)
    if "v3m2" in which:
        run_variant("v3m2", functools.partial(kernel_v3_m, m=2), p, x,
                    x_prep="v3", kt_mult=2, x_dtype=jnp.bfloat16)
    if "vp" in which:
        xg = jnp.asarray(rng.randn(2048, k).astype(np.float32))
        run_prefill(p, xg, block_b=512, block_n=512)
        run_prefill(p, xg, block_b=512, block_n=1024)
        run_prefill(p, xg, block_b=1024, block_n=512)
    if "vp2" in which:
        xg = jnp.asarray(rng.randn(2048, k).astype(np.float32))
        run_prefill(p, xg, block_b=512, block_n=512, kernel=kernel_vp2,
                    kt_mult=2, tag="vp2")
        run_prefill(p, xg, block_b=512, block_n=1024, kernel=kernel_vp2,
                    kt_mult=2, tag="vp2")
        run_prefill(p, xg, block_b=1024, block_n=256, kernel=kernel_vp2,
                    kt_mult=2, tag="vp2")
    if "vpd" in which:
        from mxq_tpu.ops import mxq_matmul as mm
        xg = jnp.asarray(rng.randn(2048, k).astype(np.float32))

        def step_pd(c, xin):
            return mm.mxq_matmul_prefill(xin, c, None, CFG)

        y = step_pd(p, xg)
        ref = xg @ packfmt.unpack_dequant(p, CFG)[:, :y.shape[1]]
        err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"vpd: rel_err={err:.2e}", flush=True)
        t = time_op(step_pd, xg, const=p)
        print(f"vpd (pallas dequant + XLA matmul): {t*1e6:.1f} us", flush=True)
        wd = jnp.asarray(np.asarray(packfmt.unpack_dequant(p, CFG)),
                         jnp.bfloat16)

        def step_dense(c, xin):
            return (xin.astype(jnp.bfloat16) @ c[0]).astype(jnp.float32)

        td = time_op(step_dense, xg, const=(wd,))
        print(f"bf16 dense: {td*1e6:.1f} us", flush=True)

        def step_dq(c, xin):
            w = mm.mxq_dequant_weight(c, CFG)
            return (xin.astype(jnp.bfloat16) @ w).astype(jnp.float32)

        tq = time_op(step_dq, xg, const=p)
        print(f"XLA dequant path: {tq*1e6:.1f} us", flush=True)
    if "vp3" in which:
        xg = jnp.asarray(rng.randn(2048, k).astype(np.float32))
        run_prefill(p, xg, block_b=512, block_n=512, kernel=kernel_vp3,
                    kt_mult=2, tag="vp3", natural_x=True)
        run_prefill(p, xg, block_b=512, block_n=1024, kernel=kernel_vp3,
                    kt_mult=2, tag="vp3", natural_x=True)
        run_prefill(p, xg, block_b=256, block_n=1024, kernel=kernel_vp3,
                    kt_mult=2, tag="vp3", natural_x=True)


if __name__ == "__main__":
    main()
