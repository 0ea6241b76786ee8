"""Round-2 Mosaic probes: capabilities needed for the cheap-unpack kernel
redesign (bitcast-to-int8 nibble unpack, int8 MXU dots, int4 dtype).

Run on the real chip: python tools/probe_mosaic2.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, check=None):
    try:
        out = jax.jit(fn)(*args)
        out = jax.tree.map(np.asarray, out)
        ok = ""
        if check is not None:
            ok = "  correct=" + str(bool(check(out)))
        print(f"PASS {name}: {jax.tree.map(np.shape, out)}{ok}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


R, N = 48, 256


def _words():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(-2**31, 2**31, size=(R, N), dtype=np.int64)
                       .astype(np.int32))


# 1) bitcast int32 -> int8 (sublane x4) then convert to f32
def bc_conv_kernel(w_ref, o_ref):
    a = w_ref[:] & 0x0F0F0F0F                    # low nibbles, bytes in [0,15]
    b8 = pltpu.bitcast(a, jnp.int8)              # [4R, N]
    o_ref[:] = b8.astype(jnp.float32)


def probe_bitcast_convert():
    w = _words()
    f = pl.pallas_call(
        bc_conv_kernel,
        out_shape=jax.ShapeDtypeStruct((4 * R, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def chk(out):
        wv = np.asarray(w).view(np.uint32)
        bytes_ = ((wv[:, None, :] >> (np.arange(4)[None, :, None] * 8))
                  & 0xF).reshape(4 * R, N)
        return np.array_equal(out, bytes_.astype(np.float32))

    run("bitcast_i32_to_i8_convert_f32", f, w, check=chk)


# 2) int8 -> bf16 convert
def bc_conv_bf16_kernel(w_ref, o_ref):
    a = w_ref[:] & 0x0F0F0F0F
    b8 = pltpu.bitcast(a, jnp.int8)
    o_ref[:] = b8.astype(jnp.bfloat16)


def probe_bitcast_convert_bf16():
    w = _words()
    f = pl.pallas_call(
        bc_conv_bf16_kernel,
        out_shape=jax.ShapeDtypeStruct((4 * R, N), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    run("bitcast_i32_to_i8_convert_bf16", f, w)


# 3) int8 x int8 MXU dot with int32 accumulation
def i8dot_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def probe_int8_dot():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randint(-100, 100, (8, 128)), jnp.int8)
    b = jnp.asarray(rng.randint(-100, 100, (128, 256)), jnp.int8)
    f = pl.pallas_call(
        i8dot_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    ref = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    run("int8xint8_dot_int32", f, a, b,
        check=lambda o: np.array_equal(o, ref))


# 4) bf16 x int8 mixed dot
def mixdot_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def probe_mixed_dot():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(8, 128), jnp.bfloat16)
    b = jnp.asarray(rng.randint(-100, 100, (128, 256)), jnp.int8)
    f = pl.pallas_call(
        mixdot_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    run("bf16xint8_dot_f32", f, a, b)


# 5) int4 dtype: convert int4 -> f32 inside pallas
def i4_kernel(w_ref, o_ref):
    o_ref[:] = w_ref[:].astype(jnp.float32)


def probe_int4():
    rng = np.random.RandomState(2)
    try:
        w = jnp.asarray(rng.randint(-8, 8, (64, N)), jnp.int4)
    except Exception as e:
        print(f"FAIL int4_host_transfer: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        return
    f = pl.pallas_call(
        i4_kernel,
        out_shape=jax.ShapeDtypeStruct((64, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    run("int4_load_convert_f32", f, w)


# 6) int8 bitwise AND (shifts known-bad; is & ok?)
def i8and_kernel(w_ref, o_ref):
    b8 = pltpu.bitcast(w_ref[:], jnp.int8)
    o_ref[:] = (b8 & 0xF).astype(jnp.float32)


def probe_int8_and():
    w = _words()
    f = pl.pallas_call(
        i8and_kernel,
        out_shape=jax.ShapeDtypeStruct((4 * R, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    run("int8_bitwise_and", f, w)


# 7) sublane repeat x4 (expand group scales to bitcast rows)
def srep_kernel(s_ref, o_ref):
    o_ref[:] = jnp.repeat(s_ref[:], 4, axis=0)


def probe_sublane_repeat4():
    s = jnp.asarray(np.random.RandomState(3).randn(R, N), jnp.float32)
    f = pl.pallas_call(
        srep_kernel,
        out_shape=jax.ShapeDtypeStruct((4 * R, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    def chk(o):
        return np.array_equal(o, np.repeat(np.asarray(s), 4, axis=0))
    run("sublane_repeat_x4", f, s, check=chk)


# 8) bitcast int32 -> bf16 (sublane x2) with exponent-injection decode:
#    plane = ((w >> (2j-5)) & 0x0060_0060) | 0x3F80_3F80, bitcast to bf16,
#    halves should read 1 + c/4 exactly (c = 2-bit code).
def bc_bf16_kernel(w_ref, o_ref):
    j = 3
    p = (jax.lax.shift_right_logical(w_ref[:], 2 * j - 5) & 0x00600060) \
        | 0x3F803F80
    o_ref[:] = pltpu.bitcast(p, jnp.bfloat16).astype(jnp.float32)


def probe_bitcast_bf16_exponent():
    w = _words()
    f = pl.pallas_call(
        bc_bf16_kernel,
        out_shape=jax.ShapeDtypeStruct((2 * R, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def chk(out):
        j = 3
        wv = np.asarray(w).view(np.uint32)
        lo = (wv >> (2 * j)) & 0x3          # code j (bits 2j..2j+1)
        hi = (wv >> (16 + 2 * j)) & 0x3     # code j+8
        exp = np.empty((2 * R, N), np.float32)
        exp[0::2] = 1.0 + lo / 4.0          # little-endian: low half first
        exp[1::2] = 1.0 + hi / 4.0
        return np.array_equal(out, exp)

    run("bitcast_i32_to_bf16_exponent", f, w, check=chk)


# 9) same trick, fused multiply-sub in bf16 and a bf16 dot
def bc_bf16_dot_kernel(w_ref, s_ref, x_ref, o_ref):
    j = 3
    p = (jax.lax.shift_right_logical(w_ref[:], 2 * j - 5) & 0x00600060) \
        | 0x3F803F80
    pb = pltpu.bitcast(p, jnp.bfloat16)
    s2 = jnp.repeat(s_ref[:], 2, axis=0).astype(jnp.bfloat16)
    wj = s2 * pb - s2                       # s*(1+c/4) - s = s*c/4
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], wj, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def probe_bf16_fma_dot():
    w = _words()
    s = jnp.asarray(np.random.RandomState(4).rand(R, N) + 0.5, jnp.float32)
    x = jnp.asarray(np.random.RandomState(5).randn(2 * R, 8), jnp.bfloat16)
    f = pl.pallas_call(
        bc_bf16_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def chk(out):
        j = 3
        wv = np.asarray(w).view(np.uint32)
        lo = ((wv >> (2 * j)) & 0x3).astype(np.float32)
        hi = ((wv >> (16 + 2 * j)) & 0x3).astype(np.float32)
        c = np.empty((2 * R, N), np.float32)
        c[0::2], c[1::2] = lo, hi
        sv = np.repeat(np.asarray(s), 2, axis=0)
        ref = np.asarray(x, np.float32) @ (sv * c / 4.0)
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"   bf16_fma_dot rel_err={rel:.2e}")
        return rel < 2e-2


def probe_all():
    print("backend:", jax.default_backend(), jax.devices())
    probe_bitcast_convert()
    probe_bitcast_convert_bf16()
    probe_int8_dot()
    probe_mixed_dot()
    probe_int4()
    probe_int8_and()
    probe_sublane_repeat4()
    probe_bitcast_bf16_exponent()
    probe_bf16_fma_dot()


if __name__ == "__main__":
    probe_all()
