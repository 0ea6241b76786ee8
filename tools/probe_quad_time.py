"""Time GEMV layouts on-device at the decode-critical shapes, at both default
and float32 matmul precision, to pick the round-3 headline layout."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.utils.benchlib import time_op, fold_to_input
from bench import random_packed_linear

key = jax.random.PRNGKey(0)

for (k, o) in ((4096, 11008), (11008, 4096), (4096, 4096)):
    p = random_packed_linear(key, k, o)
    for b in (8,):
        xb = jnp.ones((b, k), jnp.bfloat16)
        row = []
        for layout in ("slab", "quad", "bfexp"):
            def stepl(c, x, _l=layout):
                return fold_to_input(mm.mxq_matmul(x, c, layout=_l), k)
            t = time_op(stepl, xb, const=p)
            row.append(f"{layout}={t*1e6:.1f}us")
        print(f"[{k}x{o}] b={b}: " + "  ".join(row))
    del p
    jax.clear_caches()

# weight-byte bandwidth of the best quad time at 4096x11008
