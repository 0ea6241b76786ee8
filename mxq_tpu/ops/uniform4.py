"""Uniform 4-bit weight-only dequant-GEMV — the AWQ-style baseline.

The reference's perf claim is a three-way comparison: fp16 matmul vs
"awq_4bit" vs "mxq_2.8bit" (mxq_quant/cuda_kernel/test_mxq_gemv.py:57-80),
where the 4-bit baseline is the AWQ-derived per-group-scale GEMV
(csrc/quantization/gemv_cuda.cu:45-257, group 32/64/128 dispatch at
:371-397). This module reproduces that comparison axis on TPU: a packed
uniform 4-bit format with per-group asymmetric scale + integer zero
(group 128 along K, the AWQ default), its packer, a pure-jnp reference
dequant, and a Pallas dequant-matmul kernel reusing the slab machinery of
ops/mxq_matmul.py.

TPU-first layout (transposed storage, [K-ish, N], N on lanes):

  KP   = K padded to a multiple of KT=1024 (one k-tile = 1024 input cols)
  w    : int32 [KP/8, N]   8 x 4b codes per word, code j at bits 4j.
                           Word r of k-tile t holds the codes of columns
                           {t*1024 + j*128 + r : j in [0,8)} — i.e. unpack
                           slab j IS quant group (t*8 + j), so the
                           per-group scale applies to a whole [128, N]
                           slab with a [1, N] row broadcast, and the
                           activation needs NO permute (column t*1024 +
                           j*128 + r is x row t*1024 + j*128 + r).
  s    : bf16 [KP/128, N]  per-group scale
  z    : bf16 [KP/128, N]  per-group integer zero code (stored as fp)

Effective footprint: 4 + 16/128 + 16/128 = 4.25 bits/weight.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu import scheme
from mxq_tpu.packfmt import _cdiv
from mxq_tpu.ops.mxq_matmul import _round_up

GROUP = 128            # AWQ default group size (gemv_cuda.cu host dispatch)
KT = 1024              # input columns per k-tile
W_ROWS = KT // 8       # 128 int32 rows per k-tile
G_ROWS = KT // GROUP   # 8 groups per k-tile
N_LANE = 1024
MAXQ = 15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedU4Linear:
    """One packed uniform-4b linear: y = x @ dequant(self)."""

    w: jax.Array   # int32 [KP/8, N]
    s: jax.Array   # bf16  [KP/128, N]
    z: jax.Array   # bf16  [KP/128, N]
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))

    @property
    def kp(self) -> int:
        return self.w.shape[0] * 8

    @property
    def n_padded(self) -> int:
        return self.w.shape[1]


def quantize_pack_u4(w: jax.Array) -> PackedU4Linear:
    """Quantize a [O, K] weight into the packed uniform-4b format."""
    o, k = w.shape
    w = w.astype(jnp.float32)
    kp = _cdiv(k, KT) * KT
    n = _cdiv(o, N_LANE) * N_LANE
    wp = jnp.pad(w, ((0, n - o), (0, kp - k)))      # [N, KP]

    gv = wp.reshape(n, kp // GROUP, GROUP)
    s, z = scheme.asym_find_params(gv, MAXQ)        # [N, KP/128]
    zc = jnp.clip(jnp.round(z), 0, MAXQ)
    s_b = s.astype(jnp.bfloat16)
    codes = scheme.asym_quantize(
        gv, s_b.astype(jnp.float32)[..., None], zc[..., None], MAXQ, 1e-9)
    codes = codes.reshape(n, kp)                    # [N, KP]

    # word r of tile t <- columns t*1024 + j*128 + r, code j at bits 4j
    c = codes.T.reshape(kp // KT, 8, W_ROWS, n).astype(jnp.int32)  # [t, j, r, N]
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :, None, None]
    words = jnp.sum(c << shifts, axis=1).reshape(kp // 8, n)

    return PackedU4Linear(
        w=words.astype(jnp.int32),
        s=s_b.T.reshape(kp // GROUP, n),
        z=zc.astype(jnp.bfloat16).T.reshape(kp // GROUP, n),
        in_features=k, out_features=o)


def unpack_dequant_u4(p: PackedU4Linear) -> jax.Array:
    """Pure-jnp reference dequant -> [K, O] f32 (normative semantics)."""
    kp, n = p.kp, p.n_padded
    wv = p.w.reshape(kp // KT, W_ROWS, n)
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :, None, None]
    c = ((wv[:, None, :, :] >> shifts) & 0xF).astype(jnp.float32)  # [t, j, r, N]
    s = p.s.astype(jnp.float32).reshape(kp // KT, G_ROWS, 1, n)
    z = p.z.astype(jnp.float32).reshape(kp // KT, G_ROWS, 1, n)
    wk = (s * (c - z)).reshape(kp, n)               # row t*1024 + j*128 + r
    return wk[: p.in_features, : p.out_features]


def fake_quant_u4(w: jax.Array) -> jax.Array:
    """Uniform-4b quant-dequant of a [O, K] weight (returns [O, K])."""
    return unpack_dequant_u4(quantize_pack_u4(w)).T


def _u4_kernel(x_ref, w_ref, s_ref, z_ref, out_ref, acc_ref, *, out_dtype):
    """One k-tile: 8 shift+and slabs, per-group scale on the [B, N] dot
    result (one [1, N] row broadcast per slab — the group IS the slab), and
    the zero terms batched into a single [8-row] MXU dot."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    w = w_ref[:]                                    # [128, NL] int32
    s = s_ref[:].astype(jnp.float32)                # [8, NL]
    z = z_ref[:].astype(jnp.float32)
    xsums = []
    for j in range(8):
        c_j = (jax.lax.shift_right_logical(w, 4 * j) & 0xF)
        xs = x_ref[pl.ds(j * W_ROWS, W_ROWS), :]    # [128, B] bf16
        xsf = xs.astype(jnp.float32)
        xsums.append(jnp.sum(xsf, axis=0, keepdims=True))   # [1, B]
        acc_ref[:] += s[j : j + 1, :] * jax.lax.dot_general(
            xsf, c_j.astype(jnp.float32), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    # zero correction: sum_j rowsum(x_j) (x) (s_j * z_j), one [8]-contraction
    acc_ref[:] += jax.lax.dot_general(
        jnp.concatenate(xsums, axis=0), -(s * z), dimension_numbers=dn,
        preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_n",
                                             "interpret", "out_dtype"))
def _u4_matmul_padded(x, w, s, z, *, block_b, block_n, interpret, out_dtype):
    b = x.shape[1]
    n = w.shape[1]
    n_kt = w.shape[0] // W_ROWS
    grid = (b // block_b, n // block_n, n_kt)
    kernel = functools.partial(_u4_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((KT, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w, s, z)


def _auto_block_n(n: int) -> int:
    for bn in (2048, 1024, 512, 256):
        if n % bn == 0:
            return bn
    return N_LANE


def u4_matmul(x: jax.Array, p: PackedU4Linear,
              block_b: int = 128, block_n: int | None = None,
              interpret: bool | None = None) -> jax.Array:
    """y = x @ dequant(p): fused uniform-4b dequant-matmul.

    ``x``: [..., K] activations. Returns [..., O] in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_n is None:
        block_n = _auto_block_n(p.n_padded)
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    b = xb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    xb = jnp.pad(xb, ((0, bp - b), (0, p.kp - xb.shape[1])))
    y = _u4_matmul_padded(
        xb.T.astype(jnp.bfloat16), p.w, p.s, p.z,
        block_b=bb, block_n=block_n, interpret=interpret,
        out_dtype=jnp.float32)
    return y[:b, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))


# ---------------------------------------------------------------------------
# Uniform 2-bit baseline (the reference's third kernel: gemv_cuda.cu:259-345,
# 2b weights 16/uint32 + per-group-128 params; compiled there but never
# exposed through the pybind dispatch table — exposed here).
# ---------------------------------------------------------------------------

W2_ROWS = KT // 16     # 64 int32 rows per k-tile (16 x 2b codes per word)
MAXQ2 = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedU2Linear:
    """Packed uniform-2b linear: word r of k-tile t holds the codes of
    columns {t*1024 + j*64 + r : j in [0,16)} at bits 2j — unpack slab j
    covers columns [j*64, (j+1)*64) of the tile, i.e. HALF of quant group
    j//2, so the per-group scale still applies as a [1, N] row per slab.
    2 + 0.25 bits/weight."""

    w: jax.Array   # int32 [KP/16, N]
    s: jax.Array   # bf16  [KP/128, N]
    z: jax.Array   # bf16  [KP/128, N]
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))

    @property
    def kp(self) -> int:
        return self.w.shape[0] * 16

    @property
    def n_padded(self) -> int:
        return self.w.shape[1]


def quantize_pack_u2(w: jax.Array) -> PackedU2Linear:
    """Quantize a [O, K] weight into the packed uniform-2b format."""
    o, k = w.shape
    w = w.astype(jnp.float32)
    kp = _cdiv(k, KT) * KT
    n = _cdiv(o, N_LANE) * N_LANE
    wp = jnp.pad(w, ((0, n - o), (0, kp - k)))

    gv = wp.reshape(n, kp // GROUP, GROUP)
    s, z = scheme.asym_find_params(gv, MAXQ2)
    zc = jnp.clip(jnp.round(z), 0, MAXQ2)
    s_b = s.astype(jnp.bfloat16)
    codes = scheme.asym_quantize(
        gv, s_b.astype(jnp.float32)[..., None], zc[..., None], MAXQ2, 1e-9)
    codes = codes.reshape(n, kp)

    c = codes.T.reshape(kp // KT, 16, W2_ROWS, n).astype(jnp.int32)
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :, None, None]
    words = jnp.sum(c << shifts, axis=1).reshape(kp // 16, n)
    return PackedU2Linear(
        w=words.astype(jnp.int32),
        s=s_b.T.reshape(kp // GROUP, n),
        z=zc.astype(jnp.bfloat16).T.reshape(kp // GROUP, n),
        in_features=k, out_features=o)


def unpack_dequant_u2(p: PackedU2Linear) -> jax.Array:
    """Pure-jnp reference dequant -> [K, O] f32."""
    kp, n = p.kp, p.n_padded
    wv = p.w.reshape(kp // KT, W2_ROWS, n)
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :, None, None]
    c = ((wv[:, None, :, :] >> shifts) & 0x3).astype(jnp.float32)
    # slab j covers half of group j//2
    s = p.s.astype(jnp.float32).reshape(kp // KT, 8, n)
    z = p.z.astype(jnp.float32).reshape(kp // KT, 8, n)
    s16 = jnp.repeat(s, 2, axis=1)[:, :, None, :]
    z16 = jnp.repeat(z, 2, axis=1)[:, :, None, :]
    wk = (s16 * (c - z16)).reshape(kp, n)
    return wk[: p.in_features, : p.out_features]


def fake_quant_u2(w: jax.Array) -> jax.Array:
    return unpack_dequant_u2(quantize_pack_u2(w)).T


def _u2_kernel(x_ref, w_ref, s_ref, z_ref, out_ref, acc_ref, *, out_dtype):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    w = w_ref[:]                                    # [64, NL] int32
    s = s_ref[:].astype(jnp.float32)                # [8, NL]
    z = z_ref[:].astype(jnp.float32)
    xsums = []
    for j in range(16):
        c_j = (jax.lax.shift_right_logical(w, 2 * j) & 0x3)
        xs = x_ref[pl.ds(j * W2_ROWS, W2_ROWS), :]  # [64, B]
        xsf = xs.astype(jnp.float32)
        xsums.append(jnp.sum(xsf, axis=0, keepdims=True))
        acc_ref[:] += s[j // 2: j // 2 + 1, :] * jax.lax.dot_general(
            xsf, c_j.astype(jnp.float32), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    sz = s * z                                      # [8, NL]
    acc_ref[:] += jax.lax.dot_general(
        jnp.concatenate(xsums, axis=0),             # [16, B]
        -jnp.repeat(sz, 2, axis=0), dimension_numbers=dn,
        preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_n",
                                             "interpret", "out_dtype"))
def _u2_matmul_padded(x, w, s, z, *, block_b, block_n, interpret, out_dtype):
    b = x.shape[1]
    n = w.shape[1]
    n_kt = w.shape[0] // W2_ROWS
    grid = (b // block_b, n // block_n, n_kt)
    kernel = functools.partial(_u2_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((KT, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w, s, z)


def u2_matmul(x: jax.Array, p: PackedU2Linear,
              block_b: int = 128, block_n: int | None = None,
              interpret: bool | None = None) -> jax.Array:
    """y = x @ dequant(p): fused uniform-2b dequant-matmul."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_n is None:
        block_n = _auto_block_n(p.n_padded)
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    b = xb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    xb = jnp.pad(xb, ((0, bp - b), (0, p.kp - xb.shape[1])))
    y = _u2_matmul_padded(
        xb.T.astype(jnp.bfloat16), p.w, p.s, p.z,
        block_b=bb, block_n=block_n, interpret=interpret,
        out_dtype=jnp.float32)
    return y[:b, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))
