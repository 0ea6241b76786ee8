"""Root-cause probe for the round-2 on-device `quad` parity failure
(BENCH_r02: quad rel=2.70e-03 vs slab, gate 2e-3).

Two hypotheses from VERDICT.md:
  (a) Mosaic's int32->int8 bitcast orders bytes differently on hardware than
      in interpret mode -> quad weights land on the wrong sublanes -> O(1)
      error (but 2.7e-3 is NOT O(1), so this is unlikely);
  (b) the slab and quad bodies accumulate through differently-structured MXU
      dot chains whose f32 lowering rounds differently -> both are "right",
      and the 2e-3 quad-vs-slab gate is simply tighter than two independent
      roundings can satisfy.

This probe decides it by comparing EACH layout against an exact float64 host
reference (dequant weight in f32 — bit-identical math to the kernel's scale
reconstruction — then a float64 matmul), plus a direct on-device byte-order
check of pltpu.bitcast.

Run on the TPU: python tools/probe_quad_parity.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mxq_tpu import packfmt
from mxq_tpu.ops import mxq_matmul as mm


def bitcast_probe(interpret: bool):
    """int32 word 0x03020100 -> int8: which sublane gets which byte?"""
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    x = jnp.full((8, 128), 0x03020100, jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int8),
        interpret=interpret,
    )(x)
    col = np.asarray(out[:, 0])
    return col[:8].tolist()


def main():
    print("backend:", jax.default_backend())
    print("bitcast col0 rows0-7 (device):   ", bitcast_probe(False))
    print("bitcast col0 rows0-7 (interpret):", bitcast_probe(True))

    # representative decode shape
    from bench import random_packed_linear
    key = jax.random.PRNGKey(0)
    k, o, b = 4096, 11008, 8
    p = random_packed_linear(key, k, o)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)

    # exact reference: f32 dequant (same arithmetic as the kernel's scale
    # reconstruction), f64 matmul, with x pre-rounded to bf16 exactly as
    # mxq_matmul does before the kernel
    wd = np.asarray(packfmt.unpack_dequant(p), dtype=np.float64)  # [K, N]
    xb = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32),
                    dtype=np.float64)
    y_ref = xb @ wd[:, :o]

    scale = np.abs(y_ref).max() + 1e-9
    results = {}
    for layout in ("slab", "quad", "bfexp"):
        try:
            y = np.asarray(mm.mxq_matmul(x, p, layout=layout),
                           dtype=np.float64)
            rel = np.abs(y - y_ref).max() / scale
            results[layout] = (rel, y)
            print(f"{layout:6s} max-rel vs f64 ref: {rel:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"{layout:6s} FAILED: {type(e).__name__}: {e}")

    if "slab" in results and "quad" in results:
        d = np.abs(results["slab"][1] - results["quad"][1]).max() / scale
        print(f"slab-vs-quad max-rel: {d:.3e}")

    # Same comparison with HIGHEST precision hint on dots, if the kernels
    # honor jax.default_matmul_precision:
    with jax.default_matmul_precision("float32"):
        jax.clear_caches()
        for layout in ("slab", "quad"):
            try:
                y = np.asarray(mm.mxq_matmul(x, p, layout=layout),
                               dtype=np.float64)
                rel = np.abs(y - y_ref).max() / scale
                print(f"{layout:6s} (precision=float32 ctx) max-rel: {rel:.3e}")
            except Exception as e:  # noqa: BLE001
                print(f"{layout:6s} (precision ctx) FAILED: {e}")


if __name__ == "__main__":
    main()
