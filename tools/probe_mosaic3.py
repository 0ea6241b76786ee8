"""Probe round 2: int4 dtype support in Mosaic + unpack-cost microbenches.

Questions:
  p1: does a pallas TPU kernel load a jnp.int4 array and convert to f32?
  p2: int4 -> bf16 convert?
  p3: dot(int4->f32 converted, f32) on MXU inside the kernel?
  p4: relative VPU cost: shift+and+convert (current) vs int4-convert,
      at matched code counts.
"""

import sys
import os
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu.utils.benchlib import time_op


def run(tag, fn):
    try:
        out = fn()
        print(f"{tag}: OK {out}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{tag}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def p1_int4_load_convert():
    x = jnp.arange(-8, 8, dtype=jnp.int32).reshape(16, 1).repeat(128, 1)
    x4 = x.astype(jnp.int4)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(x4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x, np.float32))
    return "int4->f32 exact"


def p2_int4_bf16():
    x = jnp.arange(0, 16, dtype=jnp.int32).reshape(16, 1).repeat(128, 1) - 8
    x4 = x.astype(jnp.int4)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.bfloat16)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
    )(x4)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(x, np.float32))
    return "int4->bf16 exact"


def p3_int4_dot():
    k, n, b = 256, 256, 8
    wi = jax.random.randint(jax.random.PRNGKey(0), (k, n), -8, 8, jnp.int32)
    w4 = wi.astype(jnp.int4)
    x = jax.random.normal(jax.random.PRNGKey(1), (k, b), jnp.float32)

    def kern(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
    )(x, w4)
    ref = x.T @ wi.astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-3, err
    return f"dot ok err={err:.1e}"


def _unpack_bench(mode, rows=1024, nl=1024, iters=8):
    """Time an unpack-heavy kernel: produce `iters` [rows, nl] f32 planes."""
    if mode == "shift":
        src = jax.random.randint(jax.random.PRNGKey(0), (rows, nl),
                                 jnp.iinfo(jnp.int32).min,
                                 jnp.iinfo(jnp.int32).max, jnp.int32)

        def kern(s_ref, o_ref):
            s = s_ref[:]
            acc = jnp.zeros(s.shape, jnp.float32)
            for j in range(iters):
                c = (jax.lax.shift_right_logical(s, 2 * j) & 0x3)
                acc += c.astype(jnp.float32)
            o_ref[:] = acc
    else:
        src = jax.random.randint(jax.random.PRNGKey(0), (rows * iters, nl),
                                 -8, 8, jnp.int32).astype(jnp.int4)

        def kern(s_ref, o_ref):
            acc = jnp.zeros((rows, nl), jnp.float32)
            for j in range(iters):
                acc += s_ref[pl.ds(j * rows, rows), :].astype(jnp.float32)
            o_ref[:] = acc

    @jax.jit
    def f(s):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, nl), jnp.float32),
        )(s)

    t = time_op(lambda c, s: f(s), src, const=())
    codes = rows * nl * iters
    print(f"  {mode}: {t*1e6:.1f} us for {codes/1e6:.1f}M codes "
          f"({codes/t/1e12:.2f} Tcodes/s)", flush=True)


def main():
    print("backend:", jax.default_backend(), "jax", jax.__version__,
          flush=True)
    ok1 = run("p1 int4 load+f32", p1_int4_load_convert)
    run("p2 int4->bf16", p2_int4_bf16)
    run("p3 int4 dot", p3_int4_dot)
    if ok1:
        print("p4 unpack rate:", flush=True)
        _unpack_bench("shift")
        _unpack_bench("int4")


if __name__ == "__main__":
    main()
