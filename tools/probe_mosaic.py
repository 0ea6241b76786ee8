"""Probe which vectorization patterns Mosaic supports on this TPU, to ground
the packed-format/kernel layout decisions. Run directly on the real chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out = jax.tree.map(np.asarray, out)
        print(f"PASS {name}: out shape {jax.tree.map(np.shape, out)}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


# 1) sublane unpack: int32 [K/16, N] -> codes [K, N] via shift + reshape
def unpack_kernel(p_ref, o_ref):
    p = p_ref[:]  # [K16, N] int32
    k16, n = p.shape
    shifts = jax.lax.broadcasted_iota(jnp.int32, (k16, 16, n), 1) * 2
    codes = (jax.lax.shift_right_logical(p[:, None, :], shifts)) & 0x3
    o_ref[:] = codes.reshape(k16 * 16, n).astype(jnp.float32)


def probe_unpack():
    k16, n = 48, 256
    p = jnp.arange(k16 * n, dtype=jnp.int32).reshape(k16, n)
    f = pl.pallas_call(
        unpack_kernel,
        out_shape=jax.ShapeDtypeStruct((k16 * 16, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = run("sublane_unpack_reshape", f, p)
    if out is not None:
        ref = (np.asarray(p)[:, None, :] >> (np.arange(16)[None, :, None] * 2) & 3)
        ref = ref.reshape(k16 * 16, n).astype(np.float32)
        print("   correct:", np.array_equal(out, ref))


# 2) lane repeat x16: f32 [G, N/16] -> [G, N]
def lane_repeat_kernel(q_ref, o_ref):
    o_ref[:] = pltpu.repeat(q_ref[:], 16, axis=1)


def lane_repeat_jnp_kernel(q_ref, o_ref):
    o_ref[:] = jnp.repeat(q_ref[:], 16, axis=1)


def lane_bcast_reshape_kernel(q_ref, o_ref):
    q = q_ref[:]
    g, m = q.shape
    o_ref[:] = jnp.broadcast_to(q[:, :, None], (g, m, 16)).reshape(g, m * 16)


def probe_lane_repeat():
    g, m = 48, 16
    q = jnp.arange(g * m, dtype=jnp.float32).reshape(g, m)
    ref = np.repeat(np.asarray(q), 16, axis=1)
    for name, kern in [("pltpu.repeat_lane", lane_repeat_kernel),
                       ("jnp.repeat_lane", lane_repeat_jnp_kernel),
                       ("bcast_reshape_lane", lane_bcast_reshape_kernel)]:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((g, m * 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = run(name, f, q)
        if out is not None:
            print("   correct:", np.array_equal(out, ref))


# 3) sublane repeat x16: f32 [G, N] -> [16G, N] via broadcast+reshape
def sublane_expand_kernel(s_ref, o_ref):
    s = s_ref[:]
    g, n = s.shape
    o_ref[:] = jnp.broadcast_to(s[:, None, :], (g, 16, n)).reshape(g * 16, n)


def probe_sublane_expand():
    g, n = 48, 256
    s = jnp.arange(g * n, dtype=jnp.float32).reshape(g, n)
    f = pl.pallas_call(
        sublane_expand_kernel,
        out_shape=jax.ShapeDtypeStruct((g * 16, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = run("sublane_expand", f, s)
    if out is not None:
        ref = np.repeat(np.asarray(s), 16, axis=0)
        print("   correct:", np.array_equal(out, ref))


# 4) (1, N) row input broadcast against [K, N]
def row_bcast_kernel(r_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:] * r_ref[:]


def probe_row_bcast():
    n, k = 256, 64
    r = jnp.arange(n, dtype=jnp.float32).reshape(1, n)
    x = jnp.ones((k, n), jnp.float32)
    f = pl.pallas_call(
        row_bcast_kernel,
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = run("row_broadcast_1xN", f, r, x)
    if out is not None:
        print("   correct:", np.array_equal(out, np.asarray(x) * np.asarray(r)))


# 5) blocked grid with 16-lane-wide qq blocks (lane offsets in units of 16)
def qq_block_kernel(q_ref, o_ref):
    o_ref[:] = q_ref[:] * 2.0


def probe_lane16_blocks():
    g, m = 48, 64  # N = 1024, Nt = 256 -> qq block lanes 16
    q = jnp.arange(g * m, dtype=jnp.float32).reshape(g, m)
    f = pl.pallas_call(
        qq_block_kernel,
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((g, m), jnp.float32),
        in_specs=[pl.BlockSpec((g, 16), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, 16), lambda j: (0, j), memory_space=pltpu.VMEM),
    )
    out = run("lane16_blockspec", f, q)
    if out is not None:
        print("   correct:", np.array_equal(out, np.asarray(q) * 2))


# 6) int32 bf16 dequant matmul sanity: codes -> bf16 -> dot
def dq_dot_kernel(p_ref, x_ref, o_ref):
    p = p_ref[:]
    k16, n = p.shape
    shifts = jax.lax.broadcasted_iota(jnp.int32, (k16, 16, n), 1) * 2
    codes = (jax.lax.shift_right_logical(p[:, None, :], shifts) & 0x3)
    w = codes.reshape(k16 * 16, n).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def probe_dq_dot():
    k16, n, b = 48, 256, 8
    p = jnp.arange(k16 * n, dtype=jnp.int32).reshape(k16, n)
    x = jnp.ones((b, k16 * 16), jnp.bfloat16)
    f = pl.pallas_call(
        dq_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = run("dequant_dot", f, p, x)
    if out is not None:
        ref = (np.asarray(p)[:, None, :] >> (np.arange(16)[None, :, None] * 2) & 3)
        ref = ref.reshape(k16 * 16, n).astype(np.float32).sum(0, keepdims=True)
        print("   correct:", np.allclose(out, np.broadcast_to(ref, (b, n))))


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_unpack()
    probe_lane_repeat()
    probe_sublane_expand()
    probe_row_bcast()
    probe_lane16_blocks()
    probe_dq_dot()
