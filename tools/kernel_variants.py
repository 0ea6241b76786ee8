"""Experiment harness: time MXQ dequant-matmul kernel variants on the real TPU
to find the cheapest unpack structure. Informs ops/mxq_matmul.py."""
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
K2T, K4T = 768, 256


def make_call(kernel, b, nbp, n, block_n=256, extra_in_specs=(), extra_inputs=()):
    n_kt = nbp // NB_TILE
    grid = (1, n // block_n, n_kt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, K2T), lambda bi, ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, K4T), lambda bi, ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS, block_n), lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS, block_n), lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni), memory_space=pltpu.VMEM),
        ] + list(extra_in_specs),
        out_specs=pl.BlockSpec((b, block_n), lambda bi, ni, ki: (0, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )


def unpack2(w2, nl):
    shifts = jax.lax.broadcasted_iota(jnp.int32, (W2_ROWS, 16, nl), 1) * 2
    return jax.lax.shift_right_logical(w2[:, None, :], shifts) & 0x3


def meta_fields(meta, nl):
    gsh = jax.lax.broadcasted_iota(jnp.int32, (NB_TILE, 3, nl), 1)
    zc = jax.lax.shift_right_logical(meta[:, None, :], gsh * 2) & 0x3
    sc = (jax.lax.shift_right_logical(meta[:, None, :], 6 + gsh * SCALE_CODE_BITS)
          & 0xFF)
    return zc, sc


# A: current production kernel (baseline copy)
def kernel_a(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    nl = w2r.shape[1]
    c2 = unpack2(w2r[:], nl).reshape(K2T, nl)
    zc, sc = meta_fields(meta[:], nl)
    s_eff = qs[:].astype(jnp.float32)[:, None, :] * sc.astype(jnp.float32) + qm[:].astype(jnp.float32)[:, None, :]
    s_exp = jnp.broadcast_to(s_eff.reshape(W2_ROWS, 1, nl), (W2_ROWS, 16, nl)).reshape(K2T, nl)
    z_exp = jnp.broadcast_to(zc.reshape(W2_ROWS, 1, nl), (W2_ROWS, 16, nl)).reshape(K2T, nl)
    w2dq = (s_exp * (c2 - z_exp).astype(jnp.float32)).astype(jnp.bfloat16)
    acc[:] += jnp.dot(x2[:], w2dq, preferred_element_type=jnp.float32)
    shifts4 = jax.lax.broadcasted_iota(jnp.int32, (W4_ROWS, 8, nl), 1) * 4
    c4 = (jax.lax.shift_right_logical(w4r[:][:, None, :], shifts4) & 0xF).reshape(K4T, nl).astype(jnp.float32)
    w4dq = (s4[:] * (c4 - z4[:])).astype(jnp.bfloat16)
    acc[:] += jnp.dot(x4[:], w4dq, preferred_element_type=jnp.float32)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


# B: 3D broadcast form — never materialize expanded scale/zero planes
def kernel_b(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    nl = w2r.shape[1]
    c2 = unpack2(w2r[:], nl)                       # [48,16,nl] int32
    zc, sc = meta_fields(meta[:], nl)              # [16,3,nl]
    s_eff = (qs[:].astype(jnp.float32)[:, None, :] * sc.astype(jnp.float32)
             + qm[:].astype(jnp.float32)[:, None, :]).reshape(W2_ROWS, 1, nl)
    z3 = zc.reshape(W2_ROWS, 1, nl)
    w2dq = (s_eff * (c2 - z3).astype(jnp.float32)).astype(jnp.bfloat16).reshape(K2T, nl)
    acc[:] += jnp.dot(x2[:], w2dq, preferred_element_type=jnp.float32)
    shifts4 = jax.lax.broadcasted_iota(jnp.int32, (W4_ROWS, 8, nl), 1) * 4
    c4 = (jax.lax.shift_right_logical(w4r[:][:, None, :], shifts4) & 0xF).reshape(K4T, nl).astype(jnp.float32)
    w4dq = (s4[:] * (c4 - z4[:])).astype(jnp.bfloat16)
    acc[:] += jnp.dot(x4[:], w4dq, preferred_element_type=jnp.float32)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


# C: zero-correction via group-sum matmul: y = x2 @ (s*c) - xg @ (s*z)
def kernel_c(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    nl = w2r.shape[1]
    b = x2.shape[0]
    c2 = unpack2(w2r[:], nl)                       # [48,16,nl]
    zc, sc = meta_fields(meta[:], nl)
    s_eff = (qs[:].astype(jnp.float32)[:, None, :] * sc.astype(jnp.float32)
             + qm[:].astype(jnp.float32)[:, None, :]).reshape(W2_ROWS, 1, nl)
    w2u = (s_eff * c2.astype(jnp.float32)).astype(jnp.bfloat16).reshape(K2T, nl)
    acc[:] += jnp.dot(x2[:], w2u, preferred_element_type=jnp.float32)
    sz = (s_eff.reshape(W2_ROWS, nl) * zc.reshape(W2_ROWS, nl).astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.sum(x2[:].reshape(b, W2_ROWS, 16).astype(jnp.float32), axis=2).astype(jnp.bfloat16)
    acc[:] += -jnp.dot(xg, sz, preferred_element_type=jnp.float32)
    shifts4 = jax.lax.broadcasted_iota(jnp.int32, (W4_ROWS, 8, nl), 1) * 4
    c4 = (jax.lax.shift_right_logical(w4r[:][:, None, :], shifts4) & 0xF).reshape(K4T, nl).astype(jnp.float32)
    w4u = (s4[:] * c4).astype(jnp.bfloat16)
    acc[:] += jnp.dot(x4[:], w4u, preferred_element_type=jnp.float32)
    x4s = jnp.sum(x4[:].astype(jnp.float32), axis=1, keepdims=True)
    acc[:] += -(x4s * (s4[:] * z4[:]))
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


# D: dequant only, no dots (upper bound: what does the matmul cost?)
def kernel_d(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    nl = w2r.shape[1]
    c2 = unpack2(w2r[:], nl)
    zc, sc = meta_fields(meta[:], nl)
    s_eff = (qs[:].astype(jnp.float32)[:, None, :] * sc.astype(jnp.float32)
             + qm[:].astype(jnp.float32)[:, None, :]).reshape(W2_ROWS, 1, nl)
    w2dq = (s_eff * (c2 - zc.reshape(W2_ROWS, 1, nl)).astype(jnp.float32)).astype(jnp.bfloat16).reshape(K2T, nl)
    shifts4 = jax.lax.broadcasted_iota(jnp.int32, (W4_ROWS, 8, nl), 1) * 4
    c4 = (jax.lax.shift_right_logical(w4r[:][:, None, :], shifts4) & 0xF).reshape(K4T, nl).astype(jnp.float32)
    w4dq = (s4[:] * (c4 - z4[:])).astype(jnp.bfloat16)
    acc[:] += (jnp.sum(w2dq[:1, :]) + jnp.sum(w4dq[:1, :]))[None, None]
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


# E: DMA only (memory floor)
def kernel_e(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += (w2r[0, 0] + w4r[0, 0] + meta[0, 0]).astype(jnp.float32)[None, None] + qs[0, 0].astype(jnp.float32)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


def main():
    o, k, b = 4096, 4096, 8
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    p = jax.device_put(packfmt.quantize_pack(w, CFG))
    pb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (p.qscale.size + p.qmin.size) * 2
    nbp, n = p.meta2.shape
    x0 = jnp.ones((b, k), jnp.bfloat16)
    wdq = packfmt.unpack_dequant(p, CFG).astype(jnp.bfloat16)
    y_ref = np.asarray(x0 @ wdq, dtype=np.float32)

    for name, kern in [("A_current", kernel_a), ("B_3dbcast", kernel_b),
                       ("C_zerocorr", kernel_c), ("D_nodot", kernel_d),
                       ("E_dmaonly", kernel_e)]:
        call = make_call(kern, b, nbp, n)

        def step(x):
            x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
            y = call(x2, x4, p.w2, p.w4, p.meta2, p.qscale, p.qmin,
                     p.smeta4[0:1], p.smeta4[1:2])
            return (y[:, :k] * 1e-6).astype(jnp.bfloat16)

        try:
            y = jax.jit(lambda x: call(*packfmt.pad_inputs_split(x, p, CFG),
                                       p.w2, p.w4, p.meta2, p.qscale, p.qmin,
                                       p.smeta4[0:1], p.smeta4[1:2]))(x0)
            ok = np.allclose(np.asarray(y), y_ref, rtol=2e-2, atol=2e-1) if name in ("A_current", "B_3dbcast", "C_zerocorr") else True
            t = time_op(step, x0)
            print(f"{name:12s}: {t*1e6:7.1f}us  ({pb/t/1e9:6.1f} GB/s, {100*pb/t/1e9/819:5.1f}% peak)  correct={ok}")
        except Exception as e:
            print(f"{name:12s}: FAIL {str(e).splitlines()[0][:160]}")


if __name__ == "__main__" and "--f-only" not in sys.argv and "--g-only" not in sys.argv:
    main()


# F: slab-major unpack — no interleaved reshapes, no scale expansion.
# Requires x2/x4 permuted outside (slab-major) and meta fields mapped
# group g -> word g%16, field g//16.
def kernel_f(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    nl = w2r.shape[1]
    meta_w = meta[:]
    qsf = qs[:].astype(jnp.float32)
    qmf = qm[:].astype(jnp.float32)
    s_parts, z_parts = [], []
    for i in range(3):
        zc_i = (jax.lax.shift_right_logical(meta_w, 2 * i) & 0x3)
        sc_i = (jax.lax.shift_right_logical(meta_w, 6 + 8 * i) & 0xFF)
        s_parts.append(qsf * sc_i.astype(jnp.float32) + qmf)
        z_parts.append(zc_i)
    s_eff = jnp.concatenate(s_parts, axis=0)            # [48, nl]
    zc = jnp.concatenate(z_parts, axis=0).astype(jnp.float32)
    neg_sz = s_eff * zc
    w2w = w2r[:]
    slabs = []
    for j in range(16):
        c_j = (jax.lax.shift_right_logical(w2w, 2 * j) & 0x3)
        slabs.append((s_eff * c_j.astype(jnp.float32) - neg_sz).astype(jnp.bfloat16))
    w2dq = jnp.concatenate(slabs, axis=0)               # [768, nl]
    acc[:] += jnp.dot(x2[:], w2dq, preferred_element_type=jnp.float32)

    w4w = w4r[:]
    s4f = s4[:]
    sz4 = s4f * z4[:]
    slabs4 = []
    for j in range(8):
        c_j = (jax.lax.shift_right_logical(w4w, 4 * j) & 0xF)
        slabs4.append((s4f * c_j.astype(jnp.float32) - sz4).astype(jnp.bfloat16))
    w4dq = jnp.concatenate(slabs4, axis=0)              # [256, nl]
    acc[:] += jnp.dot(x4[:], w4dq, preferred_element_type=jnp.float32)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


def perm_x2(x2, n_kt):
    b = x2.shape[0]
    return x2.reshape(b, n_kt, 48, 16).swapaxes(-1, -2).reshape(b, -1)


def perm_x4(x4, n_kt):
    b = x4.shape[0]
    return x4.reshape(b, n_kt, 32, 8).swapaxes(-1, -2).reshape(b, -1)


def repack_for_f(p):
    """Re-map meta2 fields: group g -> word g%16, field g//16 (per k-tile)."""
    import numpy as np
    nbp, n = p.meta2.shape
    n_kt = nbp // 16
    meta = np.asarray(p.meta2).reshape(n_kt, 16, n)
    z = [(meta >> (2 * i)) & 0x3 for i in range(3)]       # field i = group 3b+i
    s = [(meta >> (6 + 8 * i)) & 0xFF for i in range(3)]
    # current mapping: word b, field i -> group 3b+i. build group-indexed [48, n]
    zg = np.zeros((n_kt, 48, n), np.int64)
    sg = np.zeros((n_kt, 48, n), np.int64)
    for b in range(16):
        for i in range(3):
            g = 3 * b + i
            zg[:, g] = z[i][:, b]
            sg[:, g] = s[i][:, b]
    # new mapping: word r, field i' -> group 16*i' + r
    new = np.zeros((n_kt, 16, n), np.int64)
    for r in range(16):
        for ip in range(3):
            g = 16 * ip + r
            new[:, r] |= (zg[:, g] << (2 * ip)) | (sg[:, g] << (6 + 8 * ip))
    # qscale/qmin: old per-block b (covers groups 3b..3b+2); new chunk = word r
    # covers groups {r, r+16, r+32}. Recompute from s_eff? For a PERF benchmark
    # only, reuse values at block index r (numerically different but same cost).
    meta_new = jnp.asarray(new.reshape(nbp, n).astype(np.int32))
    import dataclasses as dc
    return dc.replace(p, meta2=meta_new)


def main_f():
    o, k, b = 4096, 4096, 8
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    p = jax.device_put(packfmt.quantize_pack(w, CFG))
    pf = jax.device_put(repack_for_f(p))
    pb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (p.qscale.size + p.qmin.size) * 2
    nbp, n = p.meta2.shape
    n_kt = nbp // 16
    x0 = jnp.ones((b, k), jnp.bfloat16)

    call = make_call(kernel_f, b, nbp, n)

    def stepf(x):
        x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
        y = call(perm_x2(x2, n_kt), perm_x4(x4, n_kt), pf.w2, pf.w4, pf.meta2,
                 pf.qscale, pf.qmin, pf.smeta4[0:1], pf.smeta4[1:2])
        return (y[:, :k] * 1e-6).astype(jnp.bfloat16)

    try:
        t = time_op(stepf, x0)
        print(f"F_slabmajor : {t*1e6:7.1f}us  ({pb/t/1e9:6.1f} GB/s, {100*pb/t/1e9/819:5.1f}% peak)")
    except Exception as e:
        print(f"F_slabmajor : FAIL {str(e).splitlines()[0][:300]}")


if __name__ == "__main__" and "--f-only" in sys.argv and "--g-only" not in sys.argv:
    main_f()


# G: slab-major with bf16 dequant arithmetic (halved vector width if VPU
# packs bf16; otherwise neutral)
def kernel_g(x2, x4, w2r, w4r, meta, qs, qm, s4, z4, out, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    meta_w = meta[:]
    qsf = qs[:].astype(jnp.float32)
    qmf = qm[:].astype(jnp.float32)
    s_parts, z_parts = [], []
    for i in range(3):
        zc_i = (jax.lax.shift_right_logical(meta_w, 2 * i) & 0x3)
        sc_i = (jax.lax.shift_right_logical(meta_w, 6 + 8 * i) & 0xFF)
        s_parts.append(qsf * sc_i.astype(jnp.float32) + qmf)
        z_parts.append(zc_i)
    s_eff = jnp.concatenate(s_parts, axis=0).astype(jnp.bfloat16)
    zc = jnp.concatenate(z_parts, axis=0).astype(jnp.bfloat16)
    neg_sz = s_eff * zc
    w2w = w2r[:]
    slabs = []
    for j in range(16):
        c_j = (jax.lax.shift_right_logical(w2w, 2 * j) & 0x3)
        slabs.append(s_eff * c_j.astype(jnp.bfloat16) - neg_sz)
    w2dq = jnp.concatenate(slabs, axis=0)
    acc[:] += jnp.dot(x2[:], w2dq, preferred_element_type=jnp.float32)
    w4w = w4r[:]
    s4b = s4[:].astype(jnp.bfloat16)
    sz4 = s4b * z4[:].astype(jnp.bfloat16)
    slabs4 = []
    for j in range(8):
        c_j = (jax.lax.shift_right_logical(w4w, 4 * j) & 0xF)
        slabs4.append(s4b * c_j.astype(jnp.bfloat16) - sz4)
    w4dq = jnp.concatenate(slabs4, axis=0)
    acc[:] += jnp.dot(x4[:], w4dq, preferred_element_type=jnp.float32)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _(): out[:] = acc[:]


def main_g():
    o, k, b = 4096, 4096, 8
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    p = jax.device_put(packfmt.quantize_pack(w, CFG))
    pb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (p.qscale.size + p.qmin.size) * 2
    nbp, n = p.meta2.shape
    n_kt = nbp // 16
    x0 = jnp.ones((b, k), jnp.bfloat16)
    from mxq_tpu.ops import mxq_matmul as mmod
    wdq = packfmt.unpack_dequant(p, CFG).astype(jnp.bfloat16)
    y_ref = np.asarray(x0 @ wdq, dtype=np.float32)
    for name, kern in [("F_prod(f32)", None), ("G_bf16", kernel_g)]:
        if kern is None:
            def stepf(c, x):
                return (mmod.mxq_matmul(x, c, CFG, interpret=False)[:, :k] * 1e-6).astype(jnp.bfloat16)
            t = time_op(stepf, x0, const=p)
            y = mmod.mxq_matmul(x0, p, CFG, interpret=False)
            ok = np.allclose(np.asarray(y), y_ref, rtol=3e-2, atol=3e-1)
        else:
            call = make_call(kern, b, nbp, n)
            def stepf(c, x):
                x2, x4 = packfmt.pad_inputs_split(x, p, CFG)
                x2 = mmod.permute_x2(x2, n_kt); x4 = mmod.permute_x4(x4, n_kt)
                y = call(x2, x4, c.w2, c.w4, c.meta2, c.qscale, c.qmin,
                         c.smeta4[0:1], c.smeta4[1:2])
                return (y[:, :k] * 1e-6).astype(jnp.bfloat16)
            try:
                x2, x4 = packfmt.pad_inputs_split(x0, p, CFG)
                y = call(mmod.permute_x2(x2, n_kt), mmod.permute_x4(x4, n_kt),
                         p.w2, p.w4, p.meta2, p.qscale, p.qmin,
                         p.smeta4[0:1], p.smeta4[1:2])
                ok = np.allclose(np.asarray(y), y_ref, rtol=3e-2, atol=3e-1)
                t = time_op(stepf, x0, const=p)
            except Exception as e:
                print(f"{name}: FAIL {str(e).splitlines()[0][:200]}")
                continue
        print(f"{name:12s}: {t*1e6:7.1f}us ({pb/t/1e9:6.1f} GB/s, {100*pb/t/1e9/819:5.1f}% peak) correct={ok}")


if __name__ == "__main__" and "--g-only" in sys.argv:
    main_g()
