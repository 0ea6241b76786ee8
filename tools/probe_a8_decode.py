"""Feasibility probe for an A8 decode GEMV: does a quad-extracted int8 code
plane dotted AS INT8 on the MXU (s8 x s8 -> s32, no f32 retiling) beat the
slab body's convert+scale path?  Hypothesis from the quad timing anomaly
(~126us vs slab 46us at 4096->11264): int8->f32 conversion forces a 4x
sublane retile; keeping operands int8 end-to-end avoids it."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu.utils.benchlib import time_op

B, K, N = 8, 4096, 11264
NBP = K // 64            # 64 block-rows
N_KT = NBP // 16         # 4 k-tiles
W2_ROWS = 48             # int32 rows per k-tile (2b plane)


def kernel_a8(x_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    w2 = w_ref[:]                                  # [48, NL] int32
    for j in range(4):
        t = jax.lax.shift_right_logical(w2, 2 * j) & 0x03030303
        c8 = pltpu.bitcast(t, jnp.int8)            # [192, NL] int8
        xs = x_ref[pl.ds(j * 192, 192), :]         # [192, B] int8
        acc_ref[:] += jax.lax.dot_general(
            xs, c8, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def kernel_slab_f32(x_ref, w_ref, out_ref, acc_ref):
    """The slab-extraction baseline at the same traffic: 16 shift/and/convert
    iterations, bf16 MXU."""
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    w2 = w_ref[:]
    for j in range(16):
        c = (jax.lax.shift_right_logical(w2, 2 * j) & 0x3).astype(jnp.float32)
        xs = x_ref[pl.ds(j * 48, 48), :].astype(jnp.float32)   # [48, B]
        acc_ref[:] += jax.lax.dot_general(
            xs, c, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("bn", "which"))
def run(x, w, *, bn, which):
    grid = (N // bn, N_KT)
    if which == "a8":
        kern, xdt, odt = kernel_a8, jnp.int8, jnp.int32
    else:
        kern, xdt, odt = kernel_slab_f32, jnp.bfloat16, jnp.float32
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W2_ROWS * 16, B), lambda ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2_ROWS, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((B, N), odt),
        scratch_shapes=[pltpu.VMEM((B, bn), odt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x.astype(xdt), w)


def main():
    key = jax.random.PRNGKey(0)
    maxi = jnp.iinfo(jnp.int32)
    w = jax.random.randint(key, (N_KT * W2_ROWS, N), maxi.min, maxi.max,
                           jnp.int32)
    x8 = jax.random.randint(key, (N_KT * W2_ROWS * 16, B), -127, 127,
                            jnp.int8)
    xb = jax.random.normal(key, (N_KT * W2_ROWS * 16, B), jnp.float32)

    # correctness of the a8 extraction vs a jnp oracle
    y = run(x8, w, bn=1024, which="a8")
    wv = w.reshape(N_KT, W2_ROWS, N)
    cols = []
    for j in range(4):
        t = jax.lax.shift_right_logical(wv, 2 * j) & 0x03030303
        b0 = (t & 0xFF).astype(jnp.int8)
        b1 = (jax.lax.shift_right_logical(t, 8) & 0xFF).astype(jnp.int8)
        b2 = (jax.lax.shift_right_logical(t, 16) & 0xFF).astype(jnp.int8)
        b3 = (jax.lax.shift_right_logical(t, 24) & 0xFF).astype(jnp.int8)
        q = jnp.stack([b0, b1, b2, b3], axis=2)        # [kt, 48, 4, N]
        cols.append(q.reshape(N_KT, W2_ROWS * 4, N))
    cexp = jnp.concatenate(cols, axis=1)               # [kt, 768, N] order j-major
    x_vw = x8.reshape(N_KT, 4, W2_ROWS * 4, B).astype(jnp.int32)
    c_vw = cexp.reshape(N_KT, 4, W2_ROWS * 4, N).astype(jnp.int32)
    y_ref = jnp.einsum("kjrb,kjrn->bn", x_vw, c_vw)
    ok = bool(jnp.all(y == y_ref))
    print("a8 parity vs oracle:", ok)

    # timing: fold output back into a scalar consumed by the next iteration
    for bn in (512, 1024, 2048):
        if N % bn:
            continue
        for which, xin in (("a8", x8), ("slab", xb)):
            def step(c, x, _w=which, _bn=bn, _dt=xin.dtype):
                y = run(x, c, bn=_bn, which=_w)
                # consume y into an x-shaped carry (same dtype as input)
                s = jnp.sum(y, dtype=jnp.float32) * 1e-9
                return (x.astype(jnp.float32) + s).astype(_dt)
            t = time_op(step, xin, const=w)
            gbps = (w.size * 4) / t / 1e9
            print(f"{which} bn={bn}: {t*1e6:.1f}us  ({gbps:.0f} GB/s wt)",
                  flush=True)


if __name__ == "__main__":
    main()
