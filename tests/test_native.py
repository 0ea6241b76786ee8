"""Native runtime tests: C++ packers bit-exact vs the jnp packer; scheduler
state machine behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mxq_tpu.runtime import native
from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig

CFG = MXQConfig()


def test_native_lib_builds():
    assert native.get_lib() is not None, native._build_error


def test_pack2b_matches_jnp():
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, (768, 256)).astype(np.int8)
    out = native.pack2b(codes)
    ref = np.asarray(packfmt._pack_along_sublanes(jnp.asarray(codes), 2))
    np.testing.assert_array_equal(out, ref)
    back = native.unpack2b(out)
    np.testing.assert_array_equal(back, codes)


def test_pack4b_matches_jnp():
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 16, (256, 256)).astype(np.int8)
    out = native.pack4b(codes)
    ref = np.asarray(packfmt._pack_along_sublanes(jnp.asarray(codes), 4))
    np.testing.assert_array_equal(out, ref)


def test_pack_meta_matches_packer():
    """Native meta packer reproduces quantize_pack's meta2 exactly."""
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 1024), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    # reconstruct the group-indexed zero/scale codes from meta2, then re-pack
    n = p.n_padded
    zc = np.zeros((48, n), np.int8)
    sc = np.zeros((48, n), np.int8)
    meta = np.asarray(p.meta2)
    for r in range(16):
        for i in range(3):
            zc[16 * i + r] = (meta[r] >> (2 * i)) & 3
            sc[16 * i + r] = (meta[r] >> (6 + 8 * i)) & 255
    out = native.pack_meta(zc, sc)
    np.testing.assert_array_equal(out, meta)


def test_scheduler_lifecycle():
    s = native.NativeScheduler(num_slots=2, max_len=64)
    for uid in range(5):
        s.submit(uid, prompt_len=4, max_new_tokens=3)
    assert s.pending == 5
    admitted = s.admit()
    assert [a[0] for a in admitted] == [0, 1]
    assert s.pending == 3
    # drive each admitted request to completion (3 tokens each)
    done = 0
    for slot, uid, plen in admitted:
        for t in range(3):
            finished = s.on_token(slot, token=7)
            assert finished == (t == 2)
        done += 1
    assert s.completed == 2
    # freed slots admit more
    admitted = s.admit()
    assert len(admitted) == 2 and s.pending == 1


def test_scheduler_eos_stops_early():
    s = native.NativeScheduler(num_slots=1, max_len=64)
    s.submit(0, prompt_len=2, max_new_tokens=10, eos_token=9)
    s.admit()
    assert not s.on_token(0, 5)
    assert s.on_token(0, 9)  # eos
    assert s.completed == 1
