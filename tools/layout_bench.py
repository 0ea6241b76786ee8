"""Production GEMV layout shootout on the real chip.

Measures mxq_matmul (the production entry point) for each unpack layout
(slab / quad / bfexp) on the decode-critical shapes, with parity vs the jnp
reference dequant. Decides the GEMV_LAYOUT default.

Run: python tools/layout_bench.py [--layouts slab,quad,bfexp] [--shapes all]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.utils.benchlib import time_op

CFG = MXQConfig()

# (out, in): qkv-ish square, gate_up-wide (N=22016->22528 pad), down-tall
SHAPES = {"4096x4096": (4096, 4096),
          "11008x4096": (11008, 4096),
          "4096x11008": (4096, 11008),
          "22016x4096": (22016, 4096)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layouts", default="slab,quad,bfexp")
    ap.add_argument("--shapes", default="4096x4096,11008x4096,4096x11008")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    b = args.batch
    for sname in args.shapes.split(","):
        o, k = SHAPES[sname]
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(o, k).astype(np.float32))
        p = packfmt.quantize_pack(w, CFG)
        xb = jnp.asarray(rng.randn(b, k).astype(np.float32))
        ref = (xb.astype(jnp.bfloat16).astype(jnp.float32)
               @ packfmt.unpack_dequant(p, CFG))
        wb = (p.w2.size + p.w4.size + p.meta2.size) * 4 + (
            p.qscale.size + p.qmin.size) * 2
        from mxq_tpu.utils.benchlib import fold_to_input
        x0 = xb.astype(jnp.bfloat16)
        for layout in args.layouts.split(","):
            y = mm.mxq_matmul(xb, p, CFG, layout=layout)
            err = float(jnp.max(jnp.abs(y[:, :o] - ref))
                        / (float(jnp.max(jnp.abs(ref))) + 1e-9))

            def step(c, x, _l=layout):
                return fold_to_input(mm.mxq_matmul(x, c, CFG, layout=_l), k)
            t = time_op(step, x0, const=p)
            print(f"{sname} B={b} {layout:>6}: {t*1e6:7.1f} us "
                  f"({wb/t/1e9:4.0f} GB/s wt)  err={err:.1e}", flush=True)
        del p, w, xb, ref
        jax.clear_caches()


if __name__ == "__main__":
    main()
