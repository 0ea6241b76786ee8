"""Round-2b GEMV kernel experiments: ablation of the production v3+factored
body to locate the bottleneck (DMA vs VPU-unpack vs MXU passes), plus
candidate improvements:

* ``bf16dot`` — stage w_j in bf16 so the MXU dot is a single native bf16 pass
  instead of the 3-pass f32x f32 decomposition (costs +1 VPU convert/slab).
* ``shiftchain`` — descending-slab extraction (two shifts, no mask constant).
* ``kt4`` — four k-tiles per grid step.

Ablations (WRONG math, perf only): ``noscale`` (skip s_eff mul),
``nounpack`` (skip shift+and), ``nomxu`` (accumulate w_j, one dot/tile),
``dma`` (touch all inputs, trivial compute).

Run: python tools/kernel_r3.py [mode1,mode2,...]
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.ops.mxq_matmul import W2_ROWS, W4_ROWS, K2T, K4T, NB_TILE
from mxq_tpu.packfmt import SCALE_CODE_BITS
from mxq_tpu.utils.benchlib import time_op

CFG = MXQConfig()
DN = (((0,), (0,)), ((), ()))


def _decode_tile(meta_ref, qs_ref, qm_ref, m):
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


def kernel_mode(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
                s4_ref, z4_ref, out_ref, acc_ref, *, out_dtype, kt_mult,
                mode):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = s4_ref[:]
    z4 = z4_ref[:]
    sz4 = s4 * z4

    if mode == "dma":
        # touch every input once with trivial compute: DMA floor
        acc_ref[:] += jax.lax.dot_general(
            x2_ref[pl.ds(0, W2_ROWS), :].astype(jnp.float32),
            w2_ref[pl.ds(0, W2_ROWS), :].astype(jnp.float32),
            dimension_numbers=DN, preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            x4_ref[pl.ds(0, W4_ROWS), :].astype(jnp.float32),
            w4_ref[pl.ds(0, W4_ROWS), :].astype(jnp.float32),
            dimension_numbers=DN, preferred_element_type=jnp.float32)
        misc = (meta_ref[:].astype(jnp.float32)
                + qs_ref[:].astype(jnp.float32)
                + qm_ref[:].astype(jnp.float32))
        acc_ref[:] += jax.lax.dot_general(
            x2_ref[pl.ds(0, NB_TILE * kt_mult), :].astype(jnp.float32), misc,
            dimension_numbers=DN, preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            x2_ref[pl.ds(0, 1), :].astype(jnp.float32), sz4,
            dimension_numbers=DN, preferred_element_type=jnp.float32)
    else:
        for m in range(kt_mult):
            s_eff, zc = _decode_tile(meta_ref, qs_ref, qm_ref, m)
            neg_sz = s_eff * zc
            w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
            if mode == "bf16dot":
                s_bf = s_eff.astype(jnp.bfloat16)
            if mode == "nounpack":
                w2f = w2.astype(jnp.float32)
            wsum = None
            xsum2 = None
            for j in range(16):
                xs = x2_ref[pl.ds((m * 16 + j) * W2_ROWS, W2_ROWS), :]
                if mode == "bf16dot":
                    c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
                    w_j = s_bf * c_j.astype(jnp.bfloat16)
                    acc_ref[:] += jax.lax.dot_general(
                        xs, w_j, dimension_numbers=DN,
                        preferred_element_type=jnp.float32)
                    xsf = xs.astype(jnp.float32)
                    xsum2 = xsf if xsum2 is None else xsum2 + xsf
                    continue
                xsf = xs.astype(jnp.float32)
                if mode == "noscale":
                    c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
                    w_j = c_j.astype(jnp.float32)
                elif mode == "nounpack":
                    w_j = s_eff * w2f
                else:  # prod / nomxu / kt4 / shiftchain
                    if mode == "shiftchain":
                        # descending chain: top 2 bits, then shift left
                        sh = jax.lax.shift_left(w2, 2 * (15 - j))
                        c_j = jax.lax.shift_right_logical(sh, 30)
                    else:
                        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
                    w_j = s_eff * c_j.astype(jnp.float32)
                if mode == "nomxu":
                    wsum = w_j if wsum is None else wsum + w_j
                else:
                    xsum2 = xsf if xsum2 is None else xsum2 + xsf
                    acc_ref[:] += jax.lax.dot_general(
                        xsf, w_j, dimension_numbers=DN,
                        preferred_element_type=jnp.float32)
            if mode == "nomxu":
                acc_ref[:] += jax.lax.dot_general(
                    x2_ref[pl.ds(m * 16 * W2_ROWS, W2_ROWS), :]
                    .astype(jnp.float32),
                    wsum, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
            elif mode != "noscale":
                acc_ref[:] += jax.lax.dot_general(
                    xsum2, -neg_sz, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)

            w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
            if mode == "nounpack":
                w4f = w4.astype(jnp.float32)
            if mode == "bf16dot":
                s4_bf = s4.astype(jnp.bfloat16)
            wsum = None
            xsum4 = None
            for j in range(8):
                xs = x4_ref[pl.ds((m * 8 + j) * W4_ROWS, W4_ROWS), :]
                if mode == "bf16dot":
                    c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
                    w_j = s4_bf * c_j.astype(jnp.bfloat16)
                    acc_ref[:] += jax.lax.dot_general(
                        xs, w_j, dimension_numbers=DN,
                        preferred_element_type=jnp.float32)
                    xsf = xs.astype(jnp.float32)
                    xsum4 = xsf if xsum4 is None else xsum4 + xsf
                    continue
                xsf = xs.astype(jnp.float32)
                if mode == "noscale":
                    c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
                    w_j = c_j.astype(jnp.float32)
                elif mode == "nounpack":
                    w_j = s4 * w4f
                else:
                    if mode == "shiftchain":
                        sh = jax.lax.shift_left(w4, 4 * (7 - j))
                        c_j = jax.lax.shift_right_logical(sh, 28)
                    else:
                        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
                    w_j = s4 * c_j.astype(jnp.float32)
                if mode == "nomxu":
                    wsum = w_j if wsum is None else wsum + w_j
                else:
                    xsum4 = xsf if xsum4 is None else xsum4 + xsf
                    acc_ref[:] += jax.lax.dot_general(
                        xsf, w_j, dimension_numbers=DN,
                        preferred_element_type=jnp.float32)
            if mode == "nomxu":
                acc_ref[:] += jax.lax.dot_general(
                    x4_ref[pl.ds(m * 8 * W4_ROWS, W4_ROWS), :]
                    .astype(jnp.float32),
                    wsum, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
            elif mode != "noscale":
                acc_ref[:] += jax.lax.dot_general(
                    xsum4,
                    -jnp.broadcast_to(sz4, (W4_ROWS, sz4.shape[1])),
                    dimension_numbers=DN, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Structural variants: halfword/byte multi-slab extraction
# ---------------------------------------------------------------------------


# the layout-defining activation permutations live in the production module
# (single source of truth — the probe must measure the shipped layouts)
from mxq_tpu.ops.mxq_matmul import (permute_x2_pair, permute_x4_pair,  # noqa: E402
                                    permute_x2_quad, permute_x4_quad)


# the quad/bfexp kernel bodies were productionized in
# mxq_tpu/ops/mxq_matmul.py — measure the SHIPPED bodies, not copies.
# Their kernel signatures take (s4, z4) as values, matching the
# probe's pallas_call argument order via the wrappers below.
def kernel_bfexp(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                 qm_ref, s4_ref, z4_ref, out_ref, out4_ref, acc_ref,
                 acc4_ref, *, out_dtype, kt_mult):
    mm._kernel_body_bfexp(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                          qs_ref, qm_ref, s4_ref[:], z4_ref[:],
                          out_ref, out4_ref, acc_ref, acc4_ref,
                          out_dtype=out_dtype, kt_mult=kt_mult)


def kernel_i8quad(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                  qm_ref, s4_ref, z4_ref, out_ref, out4_ref, acc_ref,
                  acc4_ref, *, out_dtype, kt_mult):
    mm._kernel_body_quad(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                         qs_ref, qm_ref, s4_ref[:], z4_ref[:],
                         out_ref, out4_ref, acc_ref, acc4_ref,
                         out_dtype=out_dtype, kt_mult=kt_mult)


STRUCT_KERNELS = {"bfexp": (kernel_bfexp, permute_x2_pair, permute_x4_pair),
                  "i8quad": (kernel_i8quad, permute_x2_quad,
                             permute_x4_quad)}


@functools.partial(jax.jit, static_argnames=("block_b", "block_n",
                                             "kt_mult", "mode", "interpret"))
def run_padded(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row,
               *, block_b, block_n, kt_mult, mode, interpret=False):
    b = x2.shape[1]
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE // kt_mult
    grid = (b // block_b, n // block_n, n_kt)
    struct = mode in STRUCT_KERNELS
    if struct:
        # shipped bodies accumulate the 4-bit plane's raw codes into a
        # second output (s4/z4 applied by an XLA epilogue in production) —
        # the probe times the kernel work and discards out4
        kernel = functools.partial(STRUCT_KERNELS[mode][0],
                                   out_dtype=jnp.float32, kt_mult=kt_mult)
    else:
        kernel = functools.partial(kernel_mode, out_dtype=jnp.float32,
                                   kt_mult=kt_mult, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K2T * kt_mult, block_b),
                         lambda bi, ni, ki: (ki, bi), memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * kt_mult, block_b),
                         lambda bi, ni, ki: (ki, bi), memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS * kt_mult, block_n),
                         lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS * kt_mult, block_n),
                         lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * kt_mult, block_n),
                         lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * kt_mult, block_n),
                         lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE * kt_mult, block_n),
                         lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=([pl.BlockSpec((block_b, block_n),
                                 lambda bi, ni, ki: (bi, ni),
                                 memory_space=pltpu.VMEM)] * 2 if struct
                   else pl.BlockSpec((block_b, block_n),
                                     lambda bi, ni, ki: (bi, ni),
                                     memory_space=pltpu.VMEM)),
        out_shape=([jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2
                   if struct else jax.ShapeDtypeStruct((b, n), jnp.float32)),
        scratch_shapes=([pltpu.VMEM((block_b, block_n), jnp.float32)] * 2
                        if struct
                        else [pltpu.VMEM((block_b, block_n), jnp.float32)]),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row)


def bench_variant(p, xb, mode, block_b=8, block_n=2048, kt_mult=2):
    n_kt = p.nbp // NB_TILE
    if block_n > p.meta2.shape[-1]:
        block_n = mm._auto_block_n(p.meta2.shape[-1])
    wargs = (p.w2, p.w4, p.meta2, p.qscale, p.qmin,
             p.smeta4[0:1], p.smeta4[1:2])

    px2, px4 = STRUCT_KERNELS.get(mode, (None, mm.permute_x2,
                                         mm.permute_x4))[1:]

    def step(c, x):
        x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
        x2 = px2(x2, n_kt).T.astype(jnp.bfloat16)
        x4 = px4(x4, n_kt).T.astype(jnp.bfloat16)
        y = run_padded(x2, x4, *c, block_b=block_b, block_n=block_n,
                       kt_mult=kt_mult, mode=mode)
        if isinstance(y, (tuple, list)):
            y = y[0] + y[1]        # consume both outputs for timing
        return y.astype(x.dtype)

    y = step(wargs, xb)
    ref = (xb.astype(jnp.bfloat16).astype(jnp.float32)
           @ packfmt.unpack_dequant(p, CFG))
    err = float(jnp.max(jnp.abs(y[:, :ref.shape[1]].astype(jnp.float32)
                                - ref))
                / (float(jnp.max(jnp.abs(ref))) + 1e-9))
    t = time_op(step, xb, const=wargs)
    wb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (
        p.qscale.size + p.qmin.size) * 2
    print(f"{mode:>12}: {t*1e6:6.1f} us  ({wb/t/1e9:4.0f} GB/s wt)  "
          f"err={err:.1e}", flush=True)


def main():
    which = (sys.argv[1].split(",") if len(sys.argv) > 1 else
             ["prod", "dma", "noscale", "nounpack", "nomxu", "bf16dot",
              "shiftchain", "kt4"])
    o, k, b = 4096, 4096, 8
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(o, k).astype(np.float32))
    p = packfmt.quantize_pack(w, CFG)
    xb = jnp.asarray(rng.randn(b, k).astype(np.float32))
    print("backend:", jax.default_backend(), flush=True)

    def prodfn(c, x):
        return mm.mxq_matmul(x, c, CFG)
    if "prodref" in which:
        t = time_op(prodfn, xb, const=p)
        print(f"production: {t*1e6:.1f} us", flush=True)
        which.remove("prodref")
    for mode in which:
        km = 4 if mode == "kt4" else 2
        bn = 1024 if mode == "kt4" else 2048
        bench_variant(p, xb, "prod" if mode == "kt4" else mode,
                      block_n=bn, kt_mult=km)


if __name__ == "__main__":
    main()
