"""Round-2 GEMV kernel experiments: pipelining levers on the production v3
structure (dimension_semantics, kt_mult, bf16 out, block_b padding).

Run: python tools/kernel_r2.py [exp1,exp2,...]
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
from mxq_tpu.ops.mxq_matmul import (W2_ROWS, W4_ROWS, K2T, K4T, NB_TILE,
                                    _kernel_body)
from mxq_tpu.packfmt import SCALE_CODE_BITS
from mxq_tpu.utils.benchlib import time_op

CFG = MXQConfig()


def kernel_multi(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
                 s4_ref, z4_ref, out_ref, acc_ref, *, out_dtype, kt_mult):
    """v3 body over kt_mult k-tiles per grid step."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s4 = s4_ref[:]
    z4 = z4_ref[:]
    for m in range(kt_mult):
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
        neg_sz = s_eff * zc
        dn = (((0,), (0,)), ((), ()))
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
            xs = x2_ref[pl.ds((m * 16 + j) * W2_ROWS, W2_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        sz4 = s4 * z4
        w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            w_j = s4 * c_j.astype(jnp.float32) - sz4
            xs = x4_ref[pl.ds((m * 8 + j) * W4_ROWS, W4_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_n", "out_dtype",
                                             "kt_mult", "dimsem"))
def run_padded(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row,
               *, block_b, block_n, out_dtype, kt_mult, dimsem):
    b = x2.shape[1]
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE // kt_mult
    grid = (b // block_b, n // block_n, n_kt)
    kernel = functools.partial(kernel_multi, out_dtype=out_dtype,
                               kt_mult=kt_mult)
    kw = {}
    if dimsem:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
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
        out_specs=pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
        **kw,
    )(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row)


def bench_variant(p, xb, tag, block_b=8, block_n=1024, kt_mult=1,
                  dimsem=False, out_dtype=jnp.float32):
    n_kt = p.nbp // NB_TILE
    wargs = (p.w2, p.w4, p.meta2, p.qscale, p.qmin,
             p.smeta4[0:1], p.smeta4[1:2])

    def step(c, x):
        x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
        x2 = mm.permute_x2(x2, n_kt).T.astype(jnp.bfloat16)
        x4 = mm.permute_x4(x4, n_kt).T.astype(jnp.bfloat16)
        y = run_padded(x2, x4, *c, block_b=block_b, block_n=block_n,
                       out_dtype=out_dtype, kt_mult=kt_mult, dimsem=dimsem)
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
    print(f"{tag}: {t*1e6:.1f} us  ({wb/t/1e9:.0f} GB/s wt)  err={err:.1e}",
          flush=True)


def main():
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["base", "dimsem", "kt2", "kt2d", "kt4d", "bf16out"])
    o, k, b = 4096, 4096, 8
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(o, k).astype(np.float32))
    p = packfmt.quantize_pack(w, CFG)
    xb = jnp.asarray(rng.randn(b, k).astype(np.float32))
    print("backend:", jax.default_backend(), flush=True)

    # production baseline
    def prod(c, x):
        return mm.mxq_matmul(x, c, CFG)
    t = time_op(prod, xb, const=p)
    print(f"production v3: {t*1e6:.1f} us", flush=True)

    if "base" in which:
        bench_variant(p, xb, "r2 base (same as v3)")
    if "dimsem" in which:
        bench_variant(p, xb, "dimsem", dimsem=True)
    if "kt2" in which:
        bench_variant(p, xb, "kt_mult=2", kt_mult=2)
    if "kt2d" in which:
        bench_variant(p, xb, "kt_mult=2 + dimsem", kt_mult=2, dimsem=True)
    if "kt4d" in which:
        bench_variant(p, xb, "kt_mult=4 + dimsem", kt_mult=4, dimsem=True)
    if "bf16out" in which:
        bench_variant(p, xb, "bf16 out + dimsem", dimsem=True,
                      out_dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
