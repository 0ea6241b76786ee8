"""Probe: B=1 "block-diagonal group" (bdg) GEMV kernels for the roofline gap.

The slab body pays ~4 VPU ops per 2-bit weight (shift, and, int->f32
convert, group-scale multiply); the per-(16-group, out-channel) scale
cannot hoist out of the MXU contraction (r3 attribution), pinning B=1 at
~60% of the HBM roofline vs the >=80% BASELINE target.

bdg restructures the B=1 GEMV so the MXU does the group-partial reduction
instead: per k-tile,

    G[g, n] = sum_{k in group g} x_k * c_{k,n}
            = (M . x_row) @ C            # ONE fat [48,768]x[768,N] dot

where M is a constant 0/1 block-diagonal mask ([48, 768], M[g,k'] = 1 iff
code row k' belongs to group g) and C is the stacked raw-code matrix. The
scale then applies at GROUP granularity in a [48, N] epilogue:

    y[n] += sum_g s[g,n] * (G[g,n] - z[g,n] * gxs[g]),  gxs = rowsum(M.x)

The MXU eats a 48x FLOP overhead (dense block-diagonal) — affordable at
B=1 only (2.8 GFLOP ~ 14 us bf16 vs the 24.6 us DMA floor at
4096->11264).

Variants:
  * f32: slab extraction (shift+and+convert) STORED to a [768, N] f32
    scratch, f32 dot. Per-weight store replaces the per-weight multiply.
  * pb: bfexp extraction — ((w >> 2j-5) & 0x0060_0060) | 0x3F80_3F80
    bitcast to bf16 reads PB = 1 + c/4 EXACTLY (two slabs per shift), so
    G = 4*(G' - gxs) with G' = (M.x) @ PB. ~1.5 extraction ops + bf16
    store per weight, no convert, no multiply. Exact (unlike the bfexp
    GEMV body, whose error came from the bf16 multiply-sub, not PB).

Run: python tools/probe_bdg.py [--shapes 11008x4096,4096x11008]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.ops.mxq_matmul import (W2_ROWS, W4_ROWS, K2T, K4T, NB_TILE,
                                    permute_x2, permute_x4, permute_x2_pair)
from mxq_tpu.packfmt import SCALE_CODE_BITS
from mxq_tpu.utils.benchlib import time_op, fold_to_input

CFG = MXQConfig()


def _decode_meta(meta_ref, qs_ref, qm_ref, m):
    meta = meta_ref[pl.ds(m * NB_TILE, NB_TILE), :]
    qs = qs_ref[pl.ds(m * NB_TILE, NB_TILE), :].astype(jnp.float32)
    qm = qm_ref[pl.ds(m * NB_TILE, NB_TILE), :].astype(jnp.float32)
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


def _four_bit(x4_ref, w4_ref, acc4_ref, m):
    """Production 4-bit section: raw-code dots, scale hoisted to XLA."""
    dn = (((0,), (0,)), ((), ()))
    w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        xs = x4_ref[pl.ds((m * 8 + j) * W4_ROWS, W4_ROWS), :]
        acc4_ref[:] += jax.lax.dot_general(
            xs.astype(jnp.float32), c_j.astype(jnp.float32),
            dimension_numbers=dn, preferred_element_type=jnp.float32)


def _bdg_kernel_f32(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                    qs_ref, qm_ref, out_ref, out4_ref, acc_ref, acc4_ref,
                    cs_ref, *, km):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    for m in range(km):
        s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            cs_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = c_j.astype(jnp.float32)
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)].astype(jnp.float32)  # [48,768]
        g = jax.lax.dot_general(xbd, cs_ref[:],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [48,N]
        gxs = jnp.sum(xbd, axis=1, keepdims=True)                    # [48,1]
        contrib = jnp.sum(s_eff * g - (s_eff * zc) * gxs, axis=0,
                          keepdims=True)                             # [1,N]
        acc_ref[0:1, :] += contrib
        _four_bit(x4_ref, w4_ref, acc4_ref, m)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


def _bdg_kernel_pb(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                   qs_ref, qm_ref, out_ref, out4_ref, acc_ref, acc4_ref,
                   cs_ref, *, km):
    """PB = 1 + c/4 exact bf16 extraction; G = 4*(G' - gxs)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    for m in range(km):
        s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(8):
            if 2 * j >= 5:
                t = jax.lax.shift_right_logical(w2, 2 * j - 5)
            else:
                t = jax.lax.shift_left(w2, 5 - 2 * j)
            pb = pltpu.bitcast((t & 0x00600060) | 0x3F803F80, jnp.bfloat16)
            cs_ref[pl.ds(j * 2 * W2_ROWS, 2 * W2_ROWS), :] = pb
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)]                        # bf16
        gp = jax.lax.dot_general(xbd, cs_ref[:],
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        gxs = jnp.sum(xbd.astype(jnp.float32), axis=1, keepdims=True)
        contrib = jnp.sum(4.0 * s_eff * gp - s_eff * (4.0 + zc) * gxs,
                          axis=0, keepdims=True)
        acc_ref[0:1, :] += contrib
        _four_bit(x4_ref, w4_ref, acc4_ref, m)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


def _bdg_kernel_f32b(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                     qs_ref, qm_ref, out_ref, out4_ref, acc_ref, acc4_ref,
                     cs_ref, *, km):
    """Slab extraction with DIRECT int32->bf16 converted stores (half the
    scratch bytes, bf16 MXU dot; no bitcast layout risk)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    for m in range(km):
        s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            cs_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = c_j.astype(jnp.bfloat16)
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)]                        # bf16
        g = jax.lax.dot_general(xbd, cs_ref[:],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        gxs = jnp.sum(xbd.astype(jnp.float32), axis=1, keepdims=True)
        contrib = jnp.sum(s_eff * g - (s_eff * zc) * gxs, axis=0,
                          keepdims=True)
        acc_ref[0:1, :] += contrib
        _four_bit(x4_ref, w4_ref, acc4_ref, m)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


def _bdg_kernel_a8(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                   qs_ref, qm_ref, out_ref, out4_ref, acc_ref, acc4_ref,
                   cs_ref, *, km):
    """Quad int8 extraction (0.5 VPU ops/weight, NO convert: the int32->int8
    bitcast's 4x sublane expansion matches int8's (32,128) tiles) + int8 MXU
    dot at 2x the bf16 rate. x2 arrives PRE-QUANTIZED int8 (per-token
    symmetric, the prefill-A8 protocol); the caller rescales by sx."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    for m in range(km):
        s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(4):
            t = jax.lax.shift_right_logical(w2, 2 * j) & 0x03030303
            cs_ref[pl.ds(j * 4 * W2_ROWS, 4 * W2_ROWS), :] = \
                pltpu.bitcast(t, jnp.int8)
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)]                   # [48,768] i8
        g = jax.lax.dot_general(xbd, cs_ref[:],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        gxs = jnp.sum(xbd.astype(jnp.float32), axis=1, keepdims=True)
        contrib = jnp.sum(s_eff * g.astype(jnp.float32)
                          - (s_eff * zc) * gxs, axis=0, keepdims=True)
        acc_ref[0:1, :] += contrib
        _four_bit(x4_ref, w4_ref, acc4_ref, m)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


def _bdg_kernel_fx(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                   qs_ref, qm_ref, out_ref, out4_ref, acc_ref, acc4_ref,
                   gacc_ref, *, km):
    """STORE-FREE bdg: per-slab diagonal dots with f32 exponent injection.

    pb_j = bitcast(((w2 shifted) & 0x0060_0000) | 0x3F80_0000, f32)
         = 1 + c_j/4 EXACTLY — 3 VPU ops/weight (shift, and, or), no
    int->f32 convert, no scratch store (the bitcast is shape/layout-free,
    unlike the bf16/int8 sublane-expanding ones). Each slab dots
    immediately: G' += Xbd[:, j-block] @ pb_j, where the Xbd slice is the
    diagonal diag(x_j) — same total MXU FLOPs as the fat dot, but VPU and
    MXU alternate per slab so Mosaic can overlap them."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    dn = (((1,), (0,)), ((), ()))
    for m in range(km):
        s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            if 2 * j <= 21:
                t = jax.lax.shift_left(w2, 21 - 2 * j)
            else:
                t = jax.lax.shift_right_logical(w2, 2 * j - 21)
            pb = pltpu.bitcast((t & 0x00600000) | 0x3F800000, jnp.float32)
            xd = xbd_ref[:, pl.ds(m * K2T + j * W2_ROWS, W2_ROWS)].astype(
                jnp.float32)                                  # diag(x_j)
            g = jax.lax.dot_general(xd, pb, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            if j == 0:
                gacc_ref[:] = g
            else:
                gacc_ref[:] += g
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)].astype(jnp.float32)
        gxs = jnp.sum(xbd, axis=1, keepdims=True)
        contrib = jnp.sum(4.0 * s_eff * gacc_ref[:]
                          - s_eff * (4.0 + zc) * gxs, axis=0, keepdims=True)
        acc_ref[0:1, :] += contrib
        _four_bit(x4_ref, w4_ref, acc4_ref, m)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


def _make_bdg_kernel_f32c(chunks):
    def kernel(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
               out_ref, out4_ref, acc_ref, acc4_ref, cs_ref, *, km):
        """f32 scratch variant with the fat dot split into ``chunks`` dots
        issued between extraction chunks, so Mosaic can overlap the MXU
        with the next chunk's VPU extraction."""
        kt = pl.program_id(2)

        @pl.when(kt == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            acc4_ref[:] = jnp.zeros_like(acc4_ref)

        dn = (((1,), (0,)), ((), ()))
        per = 16 // chunks
        for m in range(km):
            s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref, m)
            w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
            g = None
            for cch in range(chunks):
                for jj in range(per):
                    j = cch * per + jj
                    c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
                    cs_ref[pl.ds(jj * W2_ROWS, W2_ROWS), :] = \
                        c_j.astype(jnp.float32)
                xc = xbd_ref[:, pl.ds(m * K2T + cch * per * W2_ROWS,
                                      per * W2_ROWS)].astype(jnp.float32)
                d = jax.lax.dot_general(
                    xc, cs_ref[pl.ds(0, per * W2_ROWS), :],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                g = d if g is None else g + d
            xbd = xbd_ref[:, pl.ds(m * K2T, K2T)].astype(jnp.float32)
            gxs = jnp.sum(xbd, axis=1, keepdims=True)
            contrib = jnp.sum(s_eff * g - (s_eff * zc) * gxs, axis=0,
                              keepdims=True)
            acc_ref[0:1, :] += contrib
            _four_bit(x4_ref, w4_ref, acc4_ref, m)

        @pl.when(kt == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]
            out4_ref[:] = acc4_ref[:]
    return kernel


_KERNELS = {"f32": _bdg_kernel_f32, "pb": _bdg_kernel_pb,
            "f32b": _bdg_kernel_f32b, "a8": _bdg_kernel_a8,
            "fx": _bdg_kernel_fx,
            "f32c2": _make_bdg_kernel_f32c(2),
            "f32c4": _make_bdg_kernel_f32c(4)}


def _mask_for(variant: str) -> np.ndarray:
    """[48, 768] 0/1: group of stacked-code row k'."""
    k = np.arange(K2T)
    if variant in ("f32", "f32b", "fx", "f32c2", "f32c4"):
        grp = k % W2_ROWS                 # slab-major: row j*48 + r -> r
    elif variant == "a8":
        grp = (k % (4 * W2_ROWS)) // 4    # quad order: row j*192+4r+b -> r
    else:
        grp = (k % (2 * W2_ROWS)) // 2    # pair order: row j*96 + 2r + h -> r
    return (grp[None, :] == np.arange(W2_ROWS)[:, None])


@functools.partial(jax.jit, static_argnames=("variant", "block_n", "km",
                                             "interpret"))
def _bdg_padded(xbd, x4, w2, w4, meta2, qscale, qmin, *, variant,
                block_n, km, interpret):
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    grid = (1, n // block_n, n_kt // km)
    kernel = functools.partial(_KERNELS[variant], km=km)
    csdt = {"f32": jnp.float32, "f32c2": jnp.float32,
            "f32c4": jnp.float32, "a8": jnp.int8}.get(variant, jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W2_ROWS, K2T * km), lambda bi, ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * km, 8), lambda bi, ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS * km, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS * km, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * km, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * km, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * km, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, n), jnp.float32),
                   jax.ShapeDtypeStruct((8, n), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, block_n), jnp.float32),
                        pltpu.VMEM((8, block_n), jnp.float32),
                        pltpu.VMEM((W2_ROWS, block_n), jnp.float32)
                        if variant == "fx"
                        else pltpu.VMEM((K2T // 2, block_n), csdt)
                        if variant == "f32c2"
                        else pltpu.VMEM((K2T // 4, block_n), csdt)
                        if variant == "f32c4"
                        else pltpu.VMEM((K2T, block_n), csdt)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xbd, x4, w2, w4, meta2, qscale, qmin)


def bdg_matmul(x, p, variant="pb", block_n=None, km=1, interpret=None):
    """y = x @ dequant(p) for B=1 via the block-diagonal-group kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_n is None:
        block_n = mm._auto_block_n(p.n_padded)
    assert x.shape[0] == 1
    n_kt = p.nbp // NB_TILE
    x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
    px2 = {"f32": permute_x2, "f32b": permute_x2, "fx": permute_x2,
           "f32c2": permute_x2, "f32c4": permute_x2,
           "a8": mm.permute_x2_quad}.get(variant, permute_x2_pair)
    x4u = x4.astype(jnp.bfloat16)
    x2p = px2(x2, n_kt)
    mask = jnp.asarray(_mask_for(variant))
    # Xbd built in XLA: [48, K2P], tiny (1/48 density applied to a vector)
    xbd_tiles = jnp.where(mask[None], x2p.reshape(n_kt, 1, K2T), 0.0)
    xbd = jnp.moveaxis(xbd_tiles, 0, 1).reshape(W2_ROWS, n_kt * K2T)
    if variant == "a8":
        sx = jnp.maximum(jnp.max(jnp.abs(x2p)), 1e-12) / 127.0
        xbd = jnp.clip(jnp.round(xbd / sx), -127, 127).astype(jnp.int8)
    else:
        sx = None
        xbd = xbd.astype(jnp.bfloat16)
    x4t = jnp.pad(permute_x4(x4, n_kt).astype(jnp.bfloat16),
                  ((0, 7), (0, 0))).T
    out, out4 = _bdg_padded(xbd, x4t, p.w2, p.w4, p.meta2, p.qscale,
                            p.qmin, variant=variant, block_n=block_n, km=km,
                            interpret=interpret)
    lo = out[0:1] if sx is None else out[0:1] * sx
    y = mm._epilogue(lo, out4[0:1], x4u, p.smeta4[0:1], p.smeta4[1:2],
                     "slab")
    return y[:, : p.out_features].astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="11008x4096,4096x11008")
    ap.add_argument("--variants", default="f32b,a8")
    ap.add_argument("--kms", default="1,2")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    for sname in args.shapes.split(","):
        o, k = (int(v) for v in sname.split("x"))
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(o, k).astype(np.float32))
        p = packfmt.quantize_pack(w, CFG)
        xb = jnp.asarray(rng.randn(1, k).astype(np.float32))
        ref = (xb.astype(jnp.bfloat16).astype(jnp.float32)
               @ packfmt.unpack_dequant(p, CFG))
        wb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (
            p.qscale.size + p.qmin.size) * 2
        refmax = float(jnp.max(jnp.abs(ref))) + 1e-9

        def run(fn):
            y = fn(xb)
            err = float(jnp.max(jnp.abs(y[:, :o] - ref[:, :o]))) / refmax
            t = time_op(lambda c, x: fold_to_input(fn(x), k), xb, const=0)
            return err, t

        err_s, t_s = run(lambda x: mm.mxq_matmul(x, p, CFG, layout="slab"))
        print(f"{sname}: slab  B=1  {t_s*1e6:7.1f}us "
              f"({wb/t_s/1e9:6.1f} GB/s wt, {wb/t_s/1e9/819*100:4.1f}% "
              f"roofline) rel {err_s:.2e}", flush=True)
        for variant in args.variants.split(","):
            for km in (int(v) for v in args.kms.split(",")):
                if (p.nbp // NB_TILE) % km:
                    continue
                try:
                    err, t = run(lambda x, v=variant, m=km: bdg_matmul(
                        x, p, variant=v, km=m))
                    print(f"{sname}: bdg-{variant} km={km} {t*1e6:7.1f}us "
                          f"({wb/t/1e9:6.1f} GB/s wt, "
                          f"{wb/t/1e9/819*100:4.1f}% roofline) "
                          f"rel {err:.2e}", flush=True)
                except Exception as e:
                    print(f"{sname}: bdg-{variant} km={km} FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
