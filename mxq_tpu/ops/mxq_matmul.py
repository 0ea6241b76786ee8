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

import os

from mxq_tpu.config import MXQConfig, DEFAULT_SCHEME
from mxq_tpu import packfmt
from mxq_tpu.packfmt import PackedMXQLinear, NB_TILE, N_LANE, SCALE_CODE_BITS

# Per-k-tile row counts (NB_TILE = 16 blocks = 1024 input columns).
W2_ROWS = NB_TILE * 3        # 48 int32 rows -> 768 2b codes
W4_ROWS = NB_TILE * 2        # 32 int32 rows -> 256 4b codes
K2T = W2_ROWS * 16
K4T = W4_ROWS * 8

# GEMV unpack layout: "slab" = one shift+and per 2-bit slab ([48, N] tiles,
# 16 iterations); "quad" = one shift+and per FOUR slabs via
# (w >> 2j) & 0x03030303 and a pltpu.bitcast int32->int8 (byte b of word r
# lands on sublane 4r+b), amortizing the extraction to 0.5 VPU ops/weight.
# Both are bit-exact vs the reference dequant in the unpack/scale math
# (tests/test_mxq_matmul.py); at the MXU dot itself, default matmul
# precision rounds the f32 dequantized weights to bf16, so two layouts
# with differently-structured dot chains legitimately differ by up to
# ~5e-3 max-rel on device while EACH agrees with the f64 reference to
# ~3e-7 under precision=float32 (root-caused in
# tools/probe_quad_parity.py after BENCH_r02 flagged quad at 2.7e-3
# against a 2e-3 slab-relative gate — the gate was wrong, not the
# lowering: pltpu.bitcast byte order is identical on device and in
# interpret mode). The default is whichever measured faster on-device
# (tools/kernel_r3.py, tools/probe_quad_time.py).
GEMV_LAYOUT = os.environ.get("MXQ_GEMV_LAYOUT", "slab")


def _kernel(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
            s4_ref, z4_ref, out_ref, out4_ref, acc_ref, acc4_ref, *,
            out_dtype, n_kt, kt_mult, layout):
    _body_for(layout)(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                      qm_ref, s4_ref[:], z4_ref[:], out_ref, out4_ref,
                      acc_ref, acc4_ref, out_dtype=out_dtype,
                      kt_mult=kt_mult)


def _kernel_body(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
                 s4, z4, out_ref, out4_ref, acc_ref, acc4_ref, *, out_dtype,
                 kt_mult=1):
    """Slab-major dequant-matmul step.

    All sub-word unpacking is constant-shift + mask over full [rows, NL]
    tiles; group params are applied at [48, NL] once, never expanded to
    per-column; each of the 16 slabs feeds its own MXU dot against a
    sublane-sliced activation column block (x arrives TRANSPOSED [K, B] and
    slab-major-permuted) — no concatenation, no bf16 staging of the
    dequantized weights. Measured fastest of all variants
    (tools/kernel_variants.py + /tmp probes: 24 us vs 28 us concat form on a
    4096^2 B=8 GEMV). ``kt_mult`` k-tiles are processed per grid step
    (fewer, fatter pipeline stages: 25.3 -> ~23 us on the same GEMV,
    tools/kernel_r2.py)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    dn = (((0,), (0,)), ((), ()))
    del s4, z4          # applied in the XLA epilogue (see 4-bit plane note)
    for m in range(kt_mult):
        # ---- group params (2-bit plane) ----
        meta = meta_ref[pl.ds(m * NB_TILE, NB_TILE), :]   # [16, NL] int32
        qs = qs_ref[pl.ds(m * NB_TILE, NB_TILE), :].astype(jnp.float32)
        qm = qm_ref[pl.ds(m * NB_TILE, NB_TILE), :].astype(jnp.float32)
        s_parts, z_parts = [], []
        for i in range(3):                             # field i -> group 16i+r
            zc_i = jax.lax.shift_right_logical(meta, 2 * i) & 0x3
            sc_i = (jax.lax.shift_right_logical(meta, 6 + SCALE_CODE_BITS * i)
                    & ((1 << SCALE_CODE_BITS) - 1))
            s_parts.append(qs * sc_i.astype(jnp.float32) + qm)
            z_parts.append(zc_i)
        s_eff = jnp.concatenate(s_parts, axis=0)       # [48, NL], row = group
        zc = jnp.concatenate(z_parts, axis=0).astype(jnp.float32)
        neg_sz = s_eff * zc

        # FACTORED ZERO CORRECTION: w_j = s_eff*c_j - neg_sz with neg_sz
        # slab-independent, so
        #   sum_j dot(x_j, w_j) = sum_j dot(x_j, s_eff*c_j)
        #                         - dot(sum_j x_j, neg_sz)
        # — the per-slab subtract (1 of 5 VPU ops/weight) becomes one
        # cheap [rows, B] running sum + one extra MXU dot per tile
        # (measured 27.0 -> 21.8 us on the 4096^2 B=8 GEMV).
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]    # [48, NL] int32
        xsum2 = None
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            w_j = s_eff * c_j.astype(jnp.float32)      # [48, NL] f32
            xs = x2_ref[pl.ds((m * 16 + j) * W2_ROWS, W2_ROWS), :]  # [48, B]
            xsf = xs.astype(jnp.float32)
            xsum2 = xsf if xsum2 is None else xsum2 + xsf
            # accumulate through the ref: a value chain keeps every slab's
            # [B, NL] f32 product live at once and blows scoped VMEM for
            # prefill-sized B blocks
            acc_ref[:] += jax.lax.dot_general(
                xsf, w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            xsum2, -neg_sz, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

        # ---- 4-bit plane: s4/z4 are PER-CHANNEL, so the whole scale/zero
        # application hoists OUT of the contraction:
        #   sum_j dot(x_j, s4*(c_j - z4)) = s4 (.) sum_j dot(x_j, c_j)
        #                                   - (s4*z4) (.) outer(rowsum(x4), 1)
        # The kernel dots RAW codes (ints, exact in bf16) into acc4; the
        # [B, N] epilogue (one fused multiply-add + the rank-1 zero term
        # from a host-side reduce of x4) runs in XLA outside the kernel —
        # dropping the per-4b-weight scale multiply, the per-tile
        # correction dot, AND the [32, NL] sz4 broadcast from the hot loop
        # (the 2-bit plane's zero term has real [48, NL] structure and
        # keeps its factored in-kernel dot above).
        w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]    # [32, NL] int32
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            xs = x4_ref[pl.ds((m * 8 + j) * W4_ROWS, W4_ROWS), :]  # [32, B]
            acc4_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), c_j.astype(jnp.float32),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)
        out4_ref[:] = acc4_ref[:].astype(out_dtype)


def permute_x2(x2: jax.Array, n_kt: int) -> jax.Array:
    """Per-k-tile slab-major permutation: output row j*48 + r <- input column
    16r + j, matching the kernel's concatenated unpack order."""
    b = x2.shape[0]
    return x2.reshape(b, n_kt, W2_ROWS, 16).swapaxes(-1, -2).reshape(b, -1)


def permute_x4(x4: jax.Array, n_kt: int) -> jax.Array:
    b = x4.shape[0]
    return x4.reshape(b, n_kt, W4_ROWS, 8).swapaxes(-1, -2).reshape(b, -1)


def _kernel_body_quad(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                      qm_ref, s4, z4, out_ref, out4_ref, acc_ref, acc4_ref,
                      *, out_dtype, kt_mult=1):
    """Byte-quad unpack: (w >> 2j) & 0x03030303 extracts FOUR slabs per
    shift+and; pltpu.bitcast int32->int8 lands byte b of word r on sublane
    4r+b (matching permute_x2_quad's activation order), then one
    int8->f32 convert + one f32 scale-mul cover all four slabs — ~2.75 VPU
    ops/weight vs the slab body's 4. Zero correction stays factored."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    dn = (((0,), (0,)), ((), ()))
    del s4, z4          # applied in the XLA epilogue (see slab body note)
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
        s192 = jnp.repeat(s_eff, 4, axis=0)
        n192 = jnp.repeat(s_eff * zc, 4, axis=0)

        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        xsum = None
        for j in range(4):
            t = jax.lax.shift_right_logical(w2, 2 * j) & 0x03030303
            c8 = pltpu.bitcast(t, jnp.int8)            # [192, NL]
            w_j = s192 * c8.astype(jnp.float32)
            xs = x2_ref[pl.ds((m * 4 + j) * 4 * W2_ROWS, 4 * W2_ROWS), :]
            xsf = xs.astype(jnp.float32)
            xsum = xsf if xsum is None else xsum + xsf
            acc_ref[:] += jax.lax.dot_general(
                xsf, w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            xsum, -n192, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

        # 4-bit plane: per-channel scale/zero hoist out of the kernel, as in
        # the slab body — raw code dots into acc4, epilogue in XLA.
        w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
        for j in range(2):
            t = jax.lax.shift_right_logical(w4, 4 * j) & 0x0F0F0F0F
            c8 = pltpu.bitcast(t, jnp.int8)            # [128, NL]
            xs = x4_ref[pl.ds((m * 2 + j) * 4 * W4_ROWS, 4 * W4_ROWS), :]
            acc4_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), c8.astype(jnp.float32),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)
        out4_ref[:] = acc4_ref[:].astype(out_dtype)


def permute_x2_quad(x2: jax.Array, n_kt: int) -> jax.Array:
    """Byte-quad activation order: row j*192 + 4r + b <- column 16r + j + 4b
    (j in [0,4), r in [0,48), b in [0,4)) — matches the int8-bitcast sublane
    expansion (byte b of word r -> row 4r + b)."""
    b = x2.shape[0]
    return (x2.reshape(b, n_kt, W2_ROWS, 4, 4).transpose(0, 1, 4, 2, 3)
            .reshape(b, -1))


def permute_x4_quad(x4: jax.Array, n_kt: int) -> jax.Array:
    """4-bit plane quad order: row j*128 + 4r + b <- column 8r + j + 2b."""
    b = x4.shape[0]
    return (x4.reshape(b, n_kt, W4_ROWS, 4, 2).transpose(0, 1, 4, 2, 3)
            .reshape(b, -1))


def _kernel_body_bfexp(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                       qm_ref, s4, z4, out_ref, out4_ref, acc_ref, acc4_ref,
                       *, out_dtype, kt_mult=1):
    """Exponent-injection unpack: ((w >> (2j-5)) & 0x0060_0060) | 0x3F80_3F80
    bitcast to bf16 reads 1 + c/4 per halfword (two slabs per shift+and+or),
    and w_j = (4s)*pb - (4s + s*z) is one fused multiply-sub — no int->float
    convert, no zero-correction dots, single-pass bf16 MXU dots. ~2.5 VPU
    ops/weight; the bf16 multiply-sub costs ~2.4% max rel err (vs 0.7% for
    the f32 bodies) — quality quantified in tools/quality_packed.py."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
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
        s4x = s_eff * 4.0
        s96 = jnp.repeat(s4x, 2, axis=0).astype(jnp.bfloat16)
        b96 = jnp.repeat(s4x + s_eff * zc, 2, axis=0).astype(jnp.bfloat16)
        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(8):
            if 2 * j >= 5:
                t = jax.lax.shift_right_logical(w2, 2 * j - 5)
            else:
                t = jax.lax.shift_left(w2, 5 - 2 * j)
            pb = pltpu.bitcast((t & 0x00600060) | 0x3F803F80, jnp.bfloat16)
            w_j = s96 * pb - b96                       # [96, NL] bf16
            xs = x2_ref[pl.ds((m * 8 + j) * 2 * W2_ROWS, 2 * W2_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs, w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        s16x = s4 * 16.0
        s16b = jnp.broadcast_to(s16x, (2 * W4_ROWS, s4.shape[1])).astype(
            jnp.bfloat16)
        b4 = jnp.broadcast_to(s16x + s4 * z4,
                              (2 * W4_ROWS, s4.shape[1])).astype(jnp.bfloat16)
        w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
        for j in range(4):
            if 4 * j >= 3:
                t = jax.lax.shift_right_logical(w4, 4 * j - 3)
            else:
                t = jax.lax.shift_left(w4, 3 - 4 * j)
            pb = pltpu.bitcast((t & 0x00780078) | 0x3F803F80, jnp.bfloat16)
            w_j = s16b * pb - b4                       # [64, NL] bf16
            xs = x4_ref[pl.ds((m * 4 + j) * 2 * W4_ROWS, 2 * W4_ROWS), :]
            acc_ref[:] += jax.lax.dot_general(
                xs, w_j, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)
        out4_ref[:] = jnp.zeros_like(out4_ref)  # bfexp applies s4/z4 inside


def permute_x2_pair(x2: jax.Array, n_kt: int) -> jax.Array:
    """Halfword-pair order: row j*96 + 2r + h <- column 16r + j + 8h
    (j in [0,8), h in {0,1}) — matches the int32->bf16 bitcast (halfword h
    of word r -> row 2r + h)."""
    b = x2.shape[0]
    return (x2.reshape(b, n_kt, W2_ROWS, 2, 8).transpose(0, 1, 4, 2, 3)
            .reshape(b, -1))


def permute_x4_pair(x4: jax.Array, n_kt: int) -> jax.Array:
    """4-bit plane pair order: row j*64 + 2r + h <- column 8r + j + 4h."""
    b = x4.shape[0]
    return (x4.reshape(b, n_kt, W4_ROWS, 2, 4).transpose(0, 1, 4, 2, 3)
            .reshape(b, -1))


# ---------------------------------------------------------------------------
# B=1 "block-diagonal group" (bdg) body — MXU group-partial reduction
# ---------------------------------------------------------------------------
#
# The slab body's per-(16-group, channel) scale multiply cannot hoist out of
# the contraction (r3 attribution), pinning B=1 near ~55% of the HBM
# roofline. bdg removes the per-weight scale entirely: raw codes are
# extracted to a [768, N] f32 scratch and ONE fat MXU dot against a
# block-diagonal activation operand (one row per scale group,
# Xbd = mask .* x, built in XLA) produces per-GROUP partial sums
#   G[g, n] = sum_{k in group g} x_k * c_{k,n},
# after which the scale applies at group granularity in a [48, N] epilogue:
#   y[n] += sum_g s[g,n]*G[g,n] - s[g,n]*z[g,n]*gxs[g].
# The MXU pays a 48x dense-block-diagonal FLOP overhead — affordable at
# B=1 only (13.7 us vs the 24.6 us DMA floor at 4096->11264; at B=8 it
# would be 110 us, so larger batches keep the slab body). Measured r5
# (tools/probe_bdg.py): 39.5-42.8 us vs slab's 44.5 at 11008x4096 and
# 40.4-45.5 vs 51.7 at 4096x11008 — the fastest EXACT B=1 kernel, and
# more accurate than the per-slab bodies (3.6e-7 rel vs 3.5e-3: the codes
# and activations are exactly representable, so the bf16 MXU pass is
# error-free; docs/ROOFLINE.md has the full variant shootout and the
# bound argument for why ~60% is the exact-scheme ceiling here).


def _bdg_kernel(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
                out_ref, out4_ref, acc_ref, acc4_ref, cs_ref, *, km):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    dn = (((1,), (0,)), ((), ()))
    dn4 = (((0,), (0,)), ((), ()))
    for m in range(km):
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

        w2 = w2_ref[pl.ds(m * W2_ROWS, W2_ROWS), :]
        for j in range(16):
            c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
            cs_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = c_j.astype(jnp.float32)
        xbd = xbd_ref[:, pl.ds(m * K2T, K2T)].astype(jnp.float32)
        g = jax.lax.dot_general(xbd, cs_ref[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
        gxs = jnp.sum(xbd, axis=1, keepdims=True)
        acc_ref[0:1, :] += jnp.sum(s_eff * g - (s_eff * zc) * gxs, axis=0,
                                   keepdims=True)

        # 4-bit plane: raw-code dots, per-channel scale hoisted to the XLA
        # epilogue — identical to the slab body's treatment
        w4 = w4_ref[pl.ds(m * W4_ROWS, W4_ROWS), :]
        for j in range(8):
            c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
            xs = x4_ref[pl.ds((m * 8 + j) * W4_ROWS, W4_ROWS), :]
            acc4_ref[:] += jax.lax.dot_general(
                xs.astype(jnp.float32), c_j.astype(jnp.float32),
                dimension_numbers=dn4, preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]
        out4_ref[:] = acc4_ref[:]


@functools.lru_cache(maxsize=None)
def _bdg_mask_np():
    """[48, 768] 0/1 bf16 as NUMPY (cached host-side — caching a jnp array
    would capture a tracer when first touched inside a jit/scan trace)."""
    import numpy as _np
    import ml_dtypes as _mld
    grp = _np.arange(K2T) % W2_ROWS
    return (grp[None, :] == _np.arange(W2_ROWS)[:, None]).astype(
        _mld.bfloat16)


def _bdg_mask() -> "jnp.ndarray":
    """[48, 768] 0/1 bf16: stacked-code row j*48 + r belongs to group r."""
    return jnp.asarray(_bdg_mask_np())


@functools.partial(jax.jit, static_argnames=("block_n", "km", "interpret"))
def _mxq_matmul_bdg_padded(xbd, x4, w2, w4, meta2, qscale, qmin, *,
                           block_n, km, interpret):
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    grid = (1, n // block_n, n_kt // km)
    kernel = functools.partial(_bdg_kernel, km=km)
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
                        pltpu.VMEM((K2T, block_n), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * W2_ROWS * K2T * n * (n_kt // km) * km,
            bytes_accessed=(w2.size + w4.size + meta2.size) * 4
            + (qscale.size + qmin.size) * 2 + xbd.size * 2 + 8 * n * 4,
            transcendentals=0,
        ),
    )(xbd, x4, w2, w4, meta2, qscale, qmin)


def _mxq_matmul_bdg(x: jax.Array, p: PackedMXQLinear, cfg: MXQConfig,
                    block_n: int | None, interpret: bool,
                    kt_mult: int | None) -> jax.Array:
    """B=1 GEMV through the bdg kernel (see the section comment)."""
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    n_kt = p.nbp // NB_TILE
    if block_n is None:
        # cs scratch is [768, block_n] f32 — cap tiles at 1024 (3 MB)
        block_n = min(_auto_block_n(p.n_padded), 1024)
    km = kt_mult if kt_mult is not None else (
        2 if n_kt % 2 == 0 and (p.n_padded // block_n) * (n_kt // 2) >= 8
        else 1)
    x2, x4 = packfmt.pad_inputs_split(xb, p, cfg)
    x2p = permute_x2(x2, n_kt).astype(jnp.bfloat16)      # [1, K2P]
    x4u = x4.astype(jnp.bfloat16)
    # Xbd in XLA: tiny ([48, K2P] bf16), fuses with the permute
    xbd = jnp.moveaxis(
        jnp.where(_bdg_mask()[None], x2p.reshape(n_kt, 1, K2T), 0.0),
        0, 1).reshape(W2_ROWS, n_kt * K2T)
    x4t = jnp.pad(permute_x4(x4, n_kt).astype(jnp.bfloat16),
                  ((0, 7), (0, 0))).T
    out, out4 = _mxq_matmul_bdg_padded(
        xbd, x4t, p.w2, p.w4, p.meta2, p.qscale, p.qmin,
        block_n=block_n, km=km, interpret=interpret)
    y = _epilogue(out[0:1], out4[0:1], x4u, p.smeta4[0:1], p.smeta4[1:2],
                  "slab")
    return y[:, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))


_LAYOUTS = {"slab": (permute_x2, permute_x4),
            "quad": (permute_x2_quad, permute_x4_quad),
            "bfexp": (permute_x2_pair, permute_x4_pair)}


def _permutes(layout: str):
    return _LAYOUTS[layout]


def _body_for(layout: str):
    return {"slab": _kernel_body, "quad": _kernel_body_quad,
            "bfexp": _kernel_body_bfexp}[layout]


def _step_vmem_bytes(km: int, block_b: int, block_n: int) -> int:
    """Nominal (single-copy) VMEM footprint of one grid step's inputs +
    accumulators. Mosaic's actual scoped allocation runs ~3.8x this
    (multi-buffering + retiling copies, calibrated against the compiler's
    own numbers: B=8 km=4 bn=1024 -> est 3.8 MB / real 14.3 MB;
    B=128 km=4 -> est 7.5 MB / real 28.7 MB, a compile-time OOM at the
    16 MB scope). The 4 MB cap on THIS estimate ~= 15 MB real."""
    per_kt = (W2_ROWS * 4 + W4_ROWS * 4 + NB_TILE * 4 + 2 * NB_TILE * 2) \
        * block_n + (K2T + K4T) * block_b * 2
    return 2 * (km * per_kt + 2 * block_n * 4) + 4 * block_b * block_n * 4


def _pick_kt_mult(n_kt: int, n_tiles: int = 8, block_b: int = 8,
                  block_n: int = 1024) -> int:
    """k-tiles per grid step. Fatter steps (km>1) cut grid overhead, but the
    Mosaic pipeline needs enough remaining grid steps to double-buffer DMA
    against compute — the on-device sweep (tools/probe_tune_r3.py, v5e B=8)
    shows km=4 wins when n_tiles*n_kt/km stays >= 8 (4096->11264: 45.8us vs
    47.2 at km=2) and loses when it starves the pipeline (4096^2 @ bn=2048:
    km=1 17.9us vs km=2 20.9us). Pick the largest divisor of n_kt that keeps
    >= 8 grid steps AND fits the 16 MB scoped-VMEM budget (B=128 at km=4
    measured 28.7 MB -> compile-time OOM; see _step_vmem_bytes)."""
    for km in (4, 2):
        if n_kt % km == 0 and n_tiles * (n_kt // km) >= 8 \
                and _step_vmem_bytes(km, block_b, block_n) <= 4 * 2**20:
            return km
    return 1


@functools.partial(jax.jit, static_argnames=("block_b", "block_n", "interpret",
                                             "out_dtype", "layout",
                                             "kt_mult"))
def _mxq_matmul_padded(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row,
                       *, block_b, block_n, interpret, out_dtype,
                       layout="slab", kt_mult=None):
    b = x2.shape[1]
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    km = (kt_mult if kt_mult is not None
          else _pick_kt_mult(n_kt, n // block_n, block_b, block_n))
    grid = (b // block_b, n // block_n, n_kt // km)

    kernel = functools.partial(_kernel, out_dtype=out_dtype, n_kt=n_kt,
                               kt_mult=km, layout=layout)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K2T * km, block_b), lambda bi, ni, ki: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * km, block_b), lambda bi, ni, ki: (ki, bi),
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
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_n), lambda bi, ni, ki: (bi, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, n), out_dtype),
                   jax.ShapeDtypeStruct((b, n), out_dtype)],
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32),
                        pltpu.VMEM((block_b, block_n), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (x2.shape[0] + x4.shape[0]) * n,
            bytes_accessed=(w2.size + w4.size + meta2.size) * 4
            + (qscale.size + qmin.size) * 2 + x2.size * 2 + b * n * 2,
            transcendentals=0,
        ),
    )(x2, x4, w2, w4, meta2, qscale, qmin, s4row, z4row)


def _epilogue(out, out4, x4_bf16, s4row, z4row, layout: str):
    """Apply the hoisted 4-bit per-channel scale/zero in XLA:
    y = out + s4*out4 - (s4*z4)*rowsum(x4). ``x4_bf16`` [B, K4P] is the
    (unpermuted) 4-bit-plane activation exactly as the kernel saw it
    (bf16-rounded); the zero term is rank-1 because z4 is per-channel and
    padding rows of x4 are zero. bfexp applies everything in-kernel."""
    if layout == "bfexp":
        return out
    r = jnp.sum(x4_bf16.astype(jnp.float32), axis=1, keepdims=True)  # [B,1]
    return out + s4row * out4 - (s4row * z4row) * r


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _auto_block_n(n: int) -> int:
    """Largest lane tile dividing the padded N — bigger tiles amortize
    per-tile pipeline overhead (measured 36us -> 28us on a 4096^2 GEMV going
    256 -> 1024, and a further ~1.5% at 2048)."""
    for bn in (2048, 1024, 512, 256):
        if n % bn == 0:
            return bn
    return N_LANE


def mxq_matmul(x: jax.Array, p: PackedMXQLinear,
               cfg: MXQConfig = DEFAULT_SCHEME,
               block_b: int = 128, block_n: int | None = None,
               interpret: bool | None = None,
               layout: str | None = None,
               kt_mult: int | None = None) -> jax.Array:
    """y = x @ dequant(p): fused packed dequant-matmul.

    ``x``: [..., K] activations (any float dtype; computed in bf16 on the MXU
    with f32 accumulation). Returns [..., O] in x.dtype.
    """
    if interpret is None:
        interpret = _on_cpu()
    b_actual = 1
    for d in x.shape[:-1]:
        b_actual *= d
    if layout is None:
        # B=1 auto-dispatches to the bdg body (fastest + most accurate
        # exact kernel at batch 1, tools/probe_bdg.py); larger batches
        # keep the env-selected per-slab layout (bdg's dense block-diagonal
        # MXU cost scales with B).
        layout = (os.environ.get("MXQ_GEMV_LAYOUT_B1", "bdg")
                  if b_actual == 1 else GEMV_LAYOUT)
    if layout == "bdg":
        if b_actual != 1:
            layout = GEMV_LAYOUT if GEMV_LAYOUT != "bdg" else "slab"
        else:
            return _mxq_matmul_bdg(x, p, cfg, block_n, interpret, kt_mult)
    if block_n is None:
        block_n = _auto_block_n(p.n_padded)
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    b = xb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    x2, x4 = packfmt.pad_inputs_split(xb, p, cfg)
    n_kt = p.nbp // NB_TILE
    px2, px4 = _permutes(layout)
    x4u = x4.astype(jnp.bfloat16)      # unpermuted copy for the epilogue
    x2 = px2(x2, n_kt).T               # [K2P, B] for sublane slab slices
    x4 = px4(x4, n_kt).T
    out, out4 = _mxq_matmul_padded(
        x2.astype(jnp.bfloat16), x4.astype(jnp.bfloat16),
        p.w2, p.w4, p.meta2, p.qscale, p.qmin,
        p.smeta4[0:1], p.smeta4[1:2],
        block_b=bb, block_n=block_n, interpret=interpret,
        out_dtype=jnp.float32, layout=layout, kt_mult=kt_mult)
    y = _epilogue(out, out4, x4u, p.smeta4[0:1], p.smeta4[1:2], layout)
    return y[:b, : p.out_features].astype(x.dtype).reshape(lead + (p.out_features,))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def mxq_dequant_weight(p: PackedMXQLinear,
                       cfg: MXQConfig = DEFAULT_SCHEME) -> jax.Array:
    """Dequantize the full weight to bf16 [K, O] (for prefill-by-XLA-matmul or
    debugging). Uses the jnp reference dequant — XLA fuses the unpack."""
    return packfmt.unpack_dequant(p, cfg).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Prefill (GEMM regime): pallas dequant kernel + XLA matmul
# ---------------------------------------------------------------------------
#
# At large token counts the matmul is MXU-bound and XLA's tuned GEMM (~97%
# of peak) beats any in-kernel dot structure we measured (fused
# unpack+dot variants: 523-585us vs 360us dense on a 2048x4096x4096,
# tools/kernel_variants2.py). The winning split: a pallas kernel unpacks the
# packed planes to bf16 (slab-order rows, ~25us VPU + one HBM write) and XLA
# multiplies against slab-order-permuted activations. Measured end-to-end
# ~1.5x faster than letting XLA fuse the jnp unpack (657us -> ~430us).


def _dequant_kernel(w2_ref, w4_ref, meta_ref, qs_ref, qm_ref, sm_ref,
                    wd2_ref, wd4_ref):
    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    neg_sz = s_eff * zc
    w2 = w2_ref[:]
    for j in range(16):
        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
        w_j = s_eff * c_j.astype(jnp.float32) - neg_sz
        wd2_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = w_j.astype(jnp.bfloat16)
    sm = sm_ref[:]
    s4 = sm[0:1, :]
    sz4 = s4 * sm[1:2, :]
    w4 = w4_ref[:]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        w_j = s4 * c_j.astype(jnp.float32) - sz4
        wd4_ref[pl.ds(j * W4_ROWS, W4_ROWS), :] = w_j.astype(jnp.bfloat16)


def _decode_meta(meta_ref, qs_ref, qm_ref):
    """Group scales/zeros of one k-tile from the combined meta word + bf16
    qq params (packfmt layout): rows = 48 groups."""
    meta = meta_ref[:]
    qs = qs_ref[:].astype(jnp.float32)
    qm = qm_ref[:].astype(jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _dequant_pallas(w2, w4, meta2, qscale, qmin, smeta4, *, block_n,
                    interpret):
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    grid = (n_kt, n // block_n)
    return pl.pallas_call(
        _dequant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W2_ROWS, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda ki, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K2T, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_kt * K2T, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_kt * K4T, n), jnp.bfloat16),
        ],
        interpret=interpret,
    )(w2, w4, meta2, qscale, qmin, smeta4)


def mxq_matmul_prefill(x: jax.Array, p, layer_idx=None,
                       cfg: MXQConfig = DEFAULT_SCHEME,
                       interpret: bool | None = None) -> jax.Array:
    """y = x @ dequant(p) for the GEMM regime (prefill/training).

    Dequantizes via the pallas kernel into SLAB-ORDER bf16 planes (no row
    interleave — the activations get the matching cheap permutation instead)
    and runs two XLA matmuls. ``p`` may be stacked [L, ...] with
    ``layer_idx`` (traced ok).
    """
    if interpret is None:
        interpret = _on_cpu()
    if layer_idx is not None:
        p = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                                   keepdims=False), p)
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    n_kt = p.nbp // NB_TILE
    x2, x4 = packfmt.pad_inputs_split(xb, p, cfg)
    x2p = permute_x2(x2, n_kt).astype(jnp.bfloat16)
    x4p = permute_x4(x4, n_kt).astype(jnp.bfloat16)
    block_n = _auto_block_n(p.meta2.shape[-1])
    wd2, wd4 = _dequant_pallas(p.w2, p.w4, p.meta2, p.qscale, p.qmin,
                               p.smeta4, block_n=block_n, interpret=interpret)
    y = (x2p @ wd2 + x4p @ wd4)
    return y[:, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))


# ---------------------------------------------------------------------------
# A8 prefill (int8 activations): dequant-to-int8 kernel + int8 MXU GEMM
# ---------------------------------------------------------------------------
#
# At prefill token counts the matmul is MXU-bound, and the bf16 MXU is the
# ceiling the dequant-to-bf16 path cannot beat (docs/RESULTS.md). The v5e MXU
# runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 T-ops), so the
# way to actually WIN the prefill regime is W~4A8: requantize the dequantized
# weight to int8 per out-channel inside the unpack kernel and quantize
# activations per token, then one int8 GEMM + a rank-1 f32 rescale. This is
# in-scheme for MXQ: the reference trains/evaluates 8-bit activation configs
# via SymQuantizer per-token fake-quant (LLM-QAT utils_quant.py:622-626,
# :717-721); here the same A8 choice is applied where it buys MXU throughput.
#
# The per-channel weight scale is a closed-form bound from the metadata alone
# (max over groups of s_eff * max(z, maxc - z)), so no dequantized pass is
# needed to find maxima.


def _int8_weight_scale(meta2, qscale, qmin, smeta4) -> jax.Array:
    """Per-out-channel int8 scale bound [1, N] f32 from packed metadata."""
    qs = qscale.astype(jnp.float32)
    qm = qmin.astype(jnp.float32)
    m = None
    for i in range(3):
        zc = (jax.lax.shift_right_logical(meta2, 2 * i) & 0x3).astype(
            jnp.float32)
        sc = (jax.lax.shift_right_logical(meta2, 6 + SCALE_CODE_BITS * i)
              & ((1 << SCALE_CODE_BITS) - 1)).astype(jnp.float32)
        s = qs * sc + qm
        b = jnp.abs(s) * jnp.maximum(zc, 3.0 - zc)
        m = b if m is None else jnp.maximum(m, b)
    m = jnp.max(m, axis=0)                              # [N]
    s4 = smeta4[0].astype(jnp.float32)
    z4 = smeta4[1].astype(jnp.float32)
    m = jnp.maximum(m, jnp.abs(s4) * jnp.maximum(z4, 15.0 - z4))
    return jnp.maximum(m / 127.0, 1e-12)[None, :]


def _dequant_int8_kernel(w2_ref, w4_ref, meta_ref, qs_ref, qm_ref, sm_ref,
                         inv_ref, q2_ref, q4_ref):
    s_eff, zc = _decode_meta(meta_ref, qs_ref, qm_ref)
    neg_sz = s_eff * zc
    inv = inv_ref[:]
    w2 = w2_ref[:]
    for j in range(16):
        c_j = jax.lax.shift_right_logical(w2, 2 * j) & 0x3
        w_j = (s_eff * c_j.astype(jnp.float32) - neg_sz) * inv
        q2_ref[pl.ds(j * W2_ROWS, W2_ROWS), :] = jnp.round(w_j).astype(
            jnp.int8)
    sm = sm_ref[:]
    s4 = sm[0:1, :]
    sz4 = s4 * sm[1:2, :]
    w4 = w4_ref[:]
    for j in range(8):
        c_j = jax.lax.shift_right_logical(w4, 4 * j) & 0xF
        w_j = (s4 * c_j.astype(jnp.float32) - sz4) * inv
        q4_ref[pl.ds(j * W4_ROWS, W4_ROWS), :] = jnp.round(w_j).astype(
            jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _dequant_int8_pallas(w2, w4, meta2, qscale, qmin, smeta4, inv_sw,
                         *, block_n, interpret):
    nbp, n = meta2.shape
    n_kt = nbp // NB_TILE
    grid = (n_kt, n // block_n)
    return pl.pallas_call(
        _dequant_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W2_ROWS, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W4_ROWS, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB_TILE, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda ki, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda ki, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K2T, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T, block_n), lambda ki, ni: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_kt * K2T, n), jnp.int8),
            jax.ShapeDtypeStruct((n_kt * K4T, n), jnp.int8),
        ],
        interpret=interpret,
    )(w2, w4, meta2, qscale, qmin, smeta4, inv_sw)


def _act_quant_rows(xb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8 scale: xb [T, K] f32 -> (scale [T, 1], inv)."""
    sx = jnp.maximum(jnp.max(jnp.abs(xb), axis=-1, keepdims=True),
                     1e-12) / 127.0
    return sx, 1.0 / sx


def mxq_matmul_prefill_a8(x: jax.Array, p, layer_idx=None,
                          cfg: MXQConfig = DEFAULT_SCHEME,
                          interpret: bool | None = None) -> jax.Array:
    """y = x @ dequant(p) in the GEMM regime via int8 MXU dots (W~4A8).

    Activations are per-token symmetric int8, weights requantized per
    out-channel to int8 inside the unpack kernel; the int32 GEMM result gets
    one rank-1 f32 rescale. Rel err vs the f32 path ~1% (per-token x
    per-channel), tested in tests/test_mxq_matmul.py.
    """
    if interpret is None:
        interpret = _on_cpu()
    if layer_idx is not None:
        p = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                                   keepdims=False), p)
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1])).astype(jnp.float32)
    n_kt = p.nbp // NB_TILE
    sw = _int8_weight_scale(p.meta2, p.qscale, p.qmin, p.smeta4)   # [1, N]
    block_n = _auto_block_n(p.meta2.shape[-1])
    q2, q4 = _dequant_int8_pallas(p.w2, p.w4, p.meta2, p.qscale, p.qmin,
                                  p.smeta4, 1.0 / sw, block_n=block_n,
                                  interpret=interpret)
    sx, inv_sx = _act_quant_rows(xb)
    x2, x4 = packfmt.pad_inputs_split(xb, p, cfg)
    xq2 = jnp.clip(jnp.round(permute_x2(x2, n_kt) * inv_sx), -127, 127
                   ).astype(jnp.int8)
    xq4 = jnp.clip(jnp.round(permute_x4(x4, n_kt) * inv_sx), -127, 127
                   ).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(xq2, q2, dimension_numbers=dn,
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(xq4, q4, dimension_numbers=dn,
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * sw
    return y[:, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))


# ---------------------------------------------------------------------------
# Stacked-layer variant: index layer weights inside the kernel
# ---------------------------------------------------------------------------
#
# Running a scanned decoder over stacked per-layer weights makes XLA
# dynamic-slice each layer's weights into a fresh buffer before the kernel
# reads them — doubling HBM traffic for a bandwidth-bound op. Here the
# packed arrays stay stacked ([L, R, N] viewed as [L*R, N]) and the layer
# index arrives as a scalar-prefetch argument used by the BlockSpec index
# maps, so the kernel DMAs directly from the resident stack.


@functools.partial(jax.jit,
                   static_argnames=("block_b", "block_n", "interpret",
                                    "out_dtype", "n_kt", "layout"))
def _mxq_matmul_stacked_padded(idx, x2, x4, w2, w4, meta2, qscale, qmin,
                               smeta4, *, block_b, block_n, interpret,
                               out_dtype, n_kt, layout="slab"):
    b = x2.shape[1]
    n = meta2.shape[1]
    km = _pick_kt_mult(n_kt, n // block_n, block_b, block_n)
    n_blk = n_kt // km
    grid = (b // block_b, n // block_n, n_blk)
    kernel = functools.partial(_stacked_kernel, out_dtype=out_dtype,
                               n_kt=n_kt, kt_mult=km, layout=layout)

    def wspec(rows):
        # scalar-prefetch refs arrive AFTER the grid indices; block index is
        # in units of (rows * km)-row blocks, n_blk per layer
        return pl.BlockSpec(
            (rows * km, block_n),
            lambda bi, ni, ki, s: (s[0] * n_blk + ki, ni),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K2T * km, block_b), lambda bi, ni, ki, s: (ki, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * km, block_b), lambda bi, ni, ki, s: (ki, bi),
                         memory_space=pltpu.VMEM),
            wspec(W2_ROWS),
            wspec(W4_ROWS),
            wspec(NB_TILE),
            wspec(NB_TILE),
            wspec(NB_TILE),
            pl.BlockSpec((8, block_n), lambda bi, ni, ki, s: (s[0], ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_n), lambda bi, ni, ki, s: (bi, ni)),
            pl.BlockSpec((block_b, block_n), lambda bi, ni, ki, s: (bi, ni)),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32),
                        pltpu.VMEM((block_b, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, n), out_dtype),
                   jax.ShapeDtypeStruct((b, n), out_dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(jnp.asarray([idx], jnp.int32), x2, x4, w2, w4, meta2, qscale, qmin,
      smeta4)


def _stacked_kernel(idx_ref, x2_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                    qs_ref, qm_ref, sm_ref, out_ref, out4_ref, acc_ref,
                    acc4_ref, *, out_dtype, n_kt, kt_mult, layout="slab"):
    del idx_ref  # consumed by the index maps
    sm = sm_ref[:]                  # [8, NL]: row 0 = 4b scale, row 1 = zero
    _body_for(layout)(x2_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref,
                      qm_ref, sm[0:1, :], sm[1:2, :], out_ref, out4_ref,
                      acc_ref, acc4_ref, out_dtype=out_dtype,
                      kt_mult=kt_mult)


@functools.partial(jax.jit, static_argnames=("block_n", "km", "interpret",
                                             "n_kt"))
def _mxq_matmul_stacked_bdg_padded(idx, xbd, x4, w2, w4, meta2, qscale,
                                   qmin, *, block_n, km, interpret, n_kt):
    """Stacked-layer bdg: same body as _bdg_kernel, weights addressed via
    scalar-prefetch layer offsets in the index maps (no per-layer
    dynamic-slice copies of the packed stack — the same trick as
    _mxq_matmul_stacked_padded)."""
    n = meta2.shape[1]
    n_blk = n_kt // km
    grid = (1, n // block_n, n_blk)
    kernel = functools.partial(_stacked_bdg_kernel, km=km)

    def wspec(rows):
        return pl.BlockSpec(
            (rows * km, block_n),
            lambda bi, ni, ki, s: (s[0] * n_blk + ki, ni),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W2_ROWS, K2T * km), lambda bi, ni, ki, s: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K4T * km, 8), lambda bi, ni, ki, s: (ki, 0),
                         memory_space=pltpu.VMEM),
            wspec(W2_ROWS),
            wspec(W4_ROWS),
            wspec(NB_TILE),
            wspec(NB_TILE),
            wspec(NB_TILE),
        ],
        out_specs=[
            pl.BlockSpec((8, block_n), lambda bi, ni, ki, s: (0, ni)),
            pl.BlockSpec((8, block_n), lambda bi, ni, ki, s: (0, ni)),
        ],
        scratch_shapes=[pltpu.VMEM((8, block_n), jnp.float32),
                        pltpu.VMEM((8, block_n), jnp.float32),
                        pltpu.VMEM((K2T, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, n), jnp.float32),
                   jax.ShapeDtypeStruct((8, n), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(jnp.asarray([idx], jnp.int32), xbd, x4, w2, w4, meta2, qscale, qmin)


def _stacked_bdg_kernel(idx_ref, xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref,
                        qs_ref, qm_ref, out_ref, out4_ref, acc_ref,
                        acc4_ref, cs_ref, *, km):
    del idx_ref          # consumed by the index maps
    _bdg_kernel(xbd_ref, x4_ref, w2_ref, w4_ref, meta_ref, qs_ref, qm_ref,
                out_ref, out4_ref, acc_ref, acc4_ref, cs_ref, km=km)


def _mxq_matmul_stacked_bdg(x, p: PackedMXQLinear, layer_idx,
                            cfg: MXQConfig, block_n, interpret):
    """B=1 stacked-layer GEMV through the bdg body (single-stream serving:
    engine decode at num_slots=1 routes here)."""
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    l, nbp, n = p.meta2.shape
    n_kt = nbp // NB_TILE
    if block_n is None:
        block_n = min(_auto_block_n(n), 1024)
    km = 2 if n_kt % 2 == 0 and (n // block_n) * (n_kt // 2) >= 8 else 1
    single = PackedMXQLinear(
        w2=p.w2.reshape(l * p.w2.shape[1], n),
        w4=p.w4.reshape(l * p.w4.shape[1], n),
        meta2=p.meta2.reshape(l * nbp, n),
        qscale=p.qscale.reshape(l * nbp, n),
        qmin=p.qmin.reshape(l * nbp, n),
        smeta4=p.smeta4.reshape(l * 8, n),
        in_features=p.in_features, out_features=p.out_features)
    geom = PackedMXQLinear(
        w2=p.w2[0], w4=p.w4[0], meta2=p.meta2[0], qscale=p.qscale[0],
        qmin=p.qmin[0], smeta4=p.smeta4[0],
        in_features=p.in_features, out_features=p.out_features)
    x2, x4 = packfmt.pad_inputs_split(xb, geom, cfg)
    x2p = permute_x2(x2, n_kt).astype(jnp.bfloat16)
    x4u = x4.astype(jnp.bfloat16)
    xbd = jnp.moveaxis(
        jnp.where(_bdg_mask()[None], x2p.reshape(n_kt, 1, K2T), 0.0),
        0, 1).reshape(W2_ROWS, n_kt * K2T)
    x4t = jnp.pad(permute_x4(x4, n_kt).astype(jnp.bfloat16),
                  ((0, 7), (0, 0))).T
    out, out4 = _mxq_matmul_stacked_bdg_padded(
        layer_idx, xbd, x4t, single.w2, single.w4, single.meta2,
        single.qscale, single.qmin, block_n=block_n, km=km,
        interpret=interpret, n_kt=n_kt)
    sm_l = jax.lax.dynamic_index_in_dim(p.smeta4, layer_idx, 0,
                                        keepdims=False)   # [8, n]
    y = _epilogue(out[0:1], out4[0:1], x4u, sm_l[0:1], sm_l[1:2], "slab")
    return y[:, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))


def mxq_matmul_stacked(x: jax.Array, p: PackedMXQLinear, layer_idx,
                       cfg: MXQConfig = DEFAULT_SCHEME,
                       block_b: int = 128, block_n: int | None = None,
                       interpret: bool | None = None,
                       layout: str | None = None) -> jax.Array:
    """y = x @ dequant(p[layer_idx]) where ``p`` holds stacked [L, ...]
    leaves. ``layer_idx`` may be a traced scalar (scan carry)."""
    if interpret is None:
        interpret = _on_cpu()
    b_actual = 1
    for dd in x.shape[:-1]:
        b_actual *= dd
    if layout is None:
        layout = (os.environ.get("MXQ_GEMV_LAYOUT_B1", "bdg")
                  if b_actual == 1 else GEMV_LAYOUT)
    if layout == "bdg":
        if b_actual == 1:
            return _mxq_matmul_stacked_bdg(x, p, layer_idx, cfg, block_n,
                                           interpret)
        layout = GEMV_LAYOUT if GEMV_LAYOUT != "bdg" else "slab"
    if block_n is None:
        block_n = _auto_block_n(p.meta2.shape[-1])
    lead = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    b = xb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    # pad_inputs_split against the per-layer geometry
    l, nbp, n = p.meta2.shape
    n_kt = nbp // NB_TILE
    single = PackedMXQLinear(
        w2=p.w2.reshape(l * p.w2.shape[1], n),
        w4=p.w4.reshape(l * p.w4.shape[1], n),
        meta2=p.meta2.reshape(l * nbp, n),
        qscale=p.qscale.reshape(l * nbp, n),
        qmin=p.qmin.reshape(l * nbp, n),
        smeta4=p.smeta4.reshape(l * 8, n),
        in_features=p.in_features, out_features=p.out_features)
    geom = PackedMXQLinear(
        w2=p.w2[0], w4=p.w4[0], meta2=p.meta2[0], qscale=p.qscale[0],
        qmin=p.qmin[0], smeta4=p.smeta4[0],
        in_features=p.in_features, out_features=p.out_features)
    x2, x4 = packfmt.pad_inputs_split(xb, geom, cfg)
    px2, px4 = _permutes(layout)
    x4u = x4.astype(jnp.bfloat16)          # unpermuted copy for the epilogue
    x2 = px2(x2, n_kt).T                   # [K2P, B]
    x4 = px4(x4, n_kt).T
    out, out4 = _mxq_matmul_stacked_padded(
        layer_idx, x2.astype(jnp.bfloat16), x4.astype(jnp.bfloat16),
        single.w2, single.w4, single.meta2, single.qscale, single.qmin,
        single.smeta4, block_b=bb, block_n=block_n, interpret=interpret,
        out_dtype=jnp.float32, n_kt=n_kt, layout=layout)
    sm_l = jax.lax.dynamic_index_in_dim(p.smeta4, layer_idx, 0,
                                        keepdims=False)   # [8, n]
    y = _epilogue(out, out4, x4u, sm_l[0:1], sm_l[1:2], layout)
    return y[:b, : p.out_features].astype(x.dtype).reshape(
        lead + (p.out_features,))
