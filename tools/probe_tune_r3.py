"""Sweep slab kernel tuning knobs (block_n, kt_mult) on device at the
decode-critical shapes to pick round-3 defaults."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.utils.benchlib import time_op, fold_to_input
from bench import random_packed_linear

key = jax.random.PRNGKey(0)
for (k, o) in ((4096, 11008), (11008, 4096), (4096, 4096)):
    p = random_packed_linear(key, k, o)
    n = p.meta2.shape[1]
    n_kt = p.meta2.shape[0] // 16
    for b in (8,):
        xb = jnp.ones((b, k), jnp.bfloat16)
        for bn in (128, 256, 512, 1024, 2048):
            if n % bn:
                continue
            for km in (1, 2, 4):
                if n_kt % km:
                    continue
                def stepl(c, x, _bn=bn, _km=km):
                    return fold_to_input(
                        mm.mxq_matmul(x, c, layout="slab", block_n=_bn,
                                      kt_mult=_km), k)
                try:
                    t = time_op(stepl, xb, const=p)
                    print(f"[{k}x{o}] b={b} bn={bn} km={km}: {t*1e6:.1f}us",
                          flush=True)
                except Exception as e:
                    print(f"[{k}x{o}] b={b} bn={bn} km={km}: FAIL {e}",
                          flush=True)
    del p
    jax.clear_caches()
