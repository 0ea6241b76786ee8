"""Fused mixed 2/4-bit dequant-matmul Pallas kernel — the TPU equivalent of the
reference's CUDA ``gemv_mxq_kernel_g16_v0`` (gemv_mxq_cuda.cu:39-208), redesigned
for the MXU/VPU instead of warp shuffles:

* weights stay bit-packed (int32) in HBM; each grid step DMAs one packed tile
  into VMEM, unpacks 2-bit/4-bit lanes with vectorized shifts along sublanes,
  applies group scales/zeros, and feeds an MXU ``jnp.dot`` against the
  activation tile with f32 accumulation;
* unlike the reference kernel, nothing is hardcoded to IC=4096
  (gemv_mxq_cuda.cu:96 hardcodes the iteration count) — the grid covers any
  padded [K, N];
* one kernel serves both GEMV (decode, small batch) and GEMM (prefill): the
  batch dimension is just another grid axis.

Layout contract comes from mxq_tpu.packfmt (NB_TILE=16 blocks per k-tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu.config import MXQConfig, DEFAULT_SCHEME
from mxq_tpu import packfmt
from mxq_tpu.packfmt import PackedMXQLinear, NB_TILE, N_LANE, SCALE_CODE_BITS

# Per-k-tile row counts (NB_TILE = 16 blocks = 1024 input columns).
W2_ROWS = NB_TILE * 3        # 48 int32 rows -> 768 2b codes
W4_ROWS = NB_TILE * 2        # 32 int32 rows -> 256 4b codes
K2T = W2_ROWS * 16
K4T = W4_ROWS * 8


def _kernel(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
            s4_ref, z4_ref, out_ref, acc_ref, *, out_dtype, n_kt):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nl = w2_ref.shape[1]

    # ---- 2-bit plane ----
    w2 = w2_ref[:]                                     # [48, NL] int32
    shifts = jax.lax.broadcasted_iota(jnp.int32, (W2_ROWS, 16, nl), 1) * 2
    c2 = (jax.lax.shift_right_logical(w2[:, None, :], shifts) & 0x3)
    c2 = c2.reshape(K2T, nl)                           # [768, NL] int32

    meta = meta_ref[:]                                 # [16, NL] int32
    gsh = jax.lax.broadcasted_iota(jnp.int32, (NB_TILE, 3, nl), 1)
    zc = (jax.lax.shift_right_logical(meta[:, None, :], gsh * 2) & 0x3)
    sc = (jax.lax.shift_right_logical(meta[:, None, :], 6 + gsh * SCALE_CODE_BITS)
          & ((1 << SCALE_CODE_BITS) - 1))              # [16, 3, NL]

    qs = qs_ref[:].astype(jnp.float32)                 # [16, NL]
    qm = qm_ref[:].astype(jnp.float32)
    s_eff = (qs[:, None, :] * sc.astype(jnp.float32) + qm[:, None, :])
    # Expand group params to per-column: [16, 3, NL] -> [48, 16, NL] -> [768, NL]
    s_exp = jnp.broadcast_to(
        s_eff.reshape(W2_ROWS, 1, nl), (W2_ROWS, 16, nl)).reshape(K2T, nl)
    z_exp = jnp.broadcast_to(
        zc.reshape(W2_ROWS, 1, nl), (W2_ROWS, 16, nl)).reshape(K2T, nl)
    w2dq = (s_exp * (c2 - z_exp).astype(jnp.float32)).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(x2_ref[:], w2dq, preferred_element_type=jnp.float32)

    # ---- 4-bit plane ----
    w4 = w4_ref[:]                                     # [32, NL] int32
    shifts4 = jax.lax.broadcasted_iota(jnp.int32, (W4_ROWS, 8, nl), 1) * 4
    c4 = (jax.lax.shift_right_logical(w4[:, None, :], shifts4) & 0xF)
    c4 = c4.reshape(K4T, nl).astype(jnp.float32)
    w4dq = (s4_ref[:] * (c4 - z4_ref[:])).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(x4_ref[:], w4dq, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_n", "interpret",
                                             "out_dtype"))
def _mxq_matmul_padded(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row,
                       *, block_b, block_n, interpret, out_dtype):
    b = x2.shape[0]
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    grid = (b // block_b, n // block_n, n_kt)

    kernel = functools.partial(_kernel, out_dtype=out_dtype, n_kt=n_kt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, K2T), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K4T), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (x2.shape[1] + x4.shape[1]) * n,
            bytes_accessed=(w2.size + w4.size + meta2.size) * 4
            + (qscale.size + qmin.size) * 2 + x2.size * 2 + b * n * 2,
            transcendentals=0,
        ),
    )(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row)


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def mxq_matmul(x: jax.Array, p: PackedMXQLinear,
               cfg: MXQConfig = DEFAULT_SCHEME,
               block_b: int = 256, block_n: int = N_LANE,
               interpret: bool | None = None) -> jax.Array:
    """y = x @ dequant(p): fused packed dequant-matmul.

    ``x``: [..., K] activations (any float dtype; computed in bf16 on the MXU
    with f32 accumulation). Returns [..., O] in x.dtype.
    """
    if interpret is None:
        interpret = _on_cpu()
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    b = xb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    x2, x4 = packfmt.pad_inputs_split(xb, p, cfg)
    y = _mxq_matmul_padded(
        x2.astype(jnp.bfloat16), x4.astype(jnp.bfloat16),
        p.w2, p.w4, p.meta2, p.qscale, p.qmin,
        p.smeta4[0:1], p.smeta4[1:2],
        block_b=bb, block_n=block_n, interpret=interpret,
        out_dtype=jnp.float32)
    return y[:b, : p.out_features].astype(x.dtype).reshape(lead + (p.out_features,))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def mxq_dequant_weight(p: PackedMXQLinear,
                       cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Dequantize the full weight to bf16 [K, O] (for prefill-by-XLA-matmul or
    debugging). Uses the jnp reference dequant — XLA fuses the unpack."""
    return packfmt.unpack_dequant(p, cfg).astype(jnp.bfloat16)
