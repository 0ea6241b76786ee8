"""Where does the a8 2-bit-plane time go?  Variants at [B=8, K=4096,
N=11264], bn=1024: extraction-only, dot-only (pre-extracted int8), fused
with one concatenated dot per tile, and fused 4-dots (probe_a8_decode)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu.utils.benchlib import time_op

B, K, N = 8, 4096, 11264
N_KT = K // 1024
W2_ROWS = 48
BN = 1024


def k_extract_only(x_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w2 = w_ref[:]
    s = None
    for j in range(4):
        t = jax.lax.shift_right_logical(w2, 2 * j) & 0x03030303
        c8 = pltpu.bitcast(t, jnp.int8)
        r = jnp.sum(c8.astype(jnp.int32), axis=0, keepdims=True)  # consume
        s = r if s is None else s + r
    acc_ref[:] += jnp.broadcast_to(s[:, :BN], (B, BN)) * 0 + s[0, 0]

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def k_dot_only(x_ref, c_ref, out_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], c_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.int32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def k_fused_concat(x_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((0,), (0,)), ((), ()))
    w2 = w_ref[:]
    planes = []
    for j in range(4):
        t = jax.lax.shift_right_logical(w2, 2 * j) & 0x03030303
        planes.append(pltpu.bitcast(t, jnp.int8))
    c8 = jnp.concatenate(planes, axis=0)            # [768, BN]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], c8, dimension_numbers=dn,
        preferred_element_type=jnp.int32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("which",))
def run(x, w, *, which):
    grid = (N // BN, N_KT)
    kern = {"extract": k_extract_only, "dot": k_dot_only,
            "fused1": k_fused_concat}[which]
    wrows = 768 if which == "dot" else W2_ROWS
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((768, B), lambda ni, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wrows, BN), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w)


def main():
    key = jax.random.PRNGKey(0)
    maxi = jnp.iinfo(jnp.int32)
    w = jax.random.randint(key, (N_KT * W2_ROWS, N), maxi.min, maxi.max,
                           jnp.int32)
    c_pre = jax.random.randint(key, (N_KT * 768, N), -2, 2, jnp.int8)
    x8 = jax.random.randint(key, (N_KT * 768, B), -127, 127, jnp.int8)

    for which, warr in (("fused1", w), ("dot", c_pre)):
        def step(c, x, _w=which):
            y = run(x, c, which=_w)
            s = jnp.sum(y, dtype=jnp.float32) * 1e-9
            return (x.astype(jnp.float32) + s).astype(jnp.int8)
        t = time_op(step, x8, const=warr)
        nbytes = warr.size * warr.dtype.itemsize
        print(f"{which}: {t*1e6:.1f}us ({nbytes/t/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
