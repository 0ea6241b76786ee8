"""Per-config decode throughput (BASELINE.md §3: tokens/sec/chip tracked per
config). Single-chip measurements; 13B runs at reduced depth and
extrapolates linearly in layer count (sound for decode — per-layer cost is
depth-independent), 70B-GQA measures the per-layer shape only (the full
model is a multi-host deployment).

Run: python tools/model_bench.py [--configs 7b,13b,70b]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from bench import packed_params, bench_decode, BATCH, autotune_layout


CONFIGS = {
    # name: (config factory, full depth or None, measured depths)
    # full depth None = report the per-layer cost only (the full model does
    # not fit one chip; single-chip extrapolation would be fiction)
    "7b": (llama.LlamaConfig.llama2_7b, 32, (32,)),
    # 13B packed ~5.8 GB + caches: measure depth 20 and 40-extrapolate
    "13b": (llama.LlamaConfig.llama2_13b, 40, (10, 20)),
    "70b": (llama.LlamaConfig.llama2_70b, None, (4, 8)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="7b,13b")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    from mxq_tpu.ops import mxq_matmul as mm
    layout, times = autotune_layout(key)
    mm.GEMV_LAYOUT = layout
    print("layout:", layout, {k: v for k, v in times.items()}, flush=True)
    for name in args.configs.split(","):
        if name not in CONFIGS:
            print(f"{name}: unknown config (choices: {sorted(CONFIGS)})")
            continue
        mk, full_depth, depths = CONFIGS[name]
        ts = {}
        for nl in depths:
            cfg = mk(num_hidden_layers=nl)
            params = packed_params(cfg, key)
            ts[nl] = bench_decode(cfg, params)
            del params
            jax.clear_caches()
        meas = {k: round(v * 1e3, 2) for k, v in ts.items()}
        if full_depth is None:
            (d1, t1), (d2, t2) = sorted(ts.items())
            per_layer = (t2 - t1) / (d2 - d1)
            print(f"{name}: {per_layer*1e6:.0f} us/layer/step per chip "
                  f"(full model is a multi-host deployment; measured "
                  f"depths: {meas})", flush=True)
            continue
        if len(ts) == 2:
            (d1, t1), (d2, t2) = sorted(ts.items())
            per_layer = (t2 - t1) / (d2 - d1)
            t_full = t2 + (full_depth - d2) * per_layer
        else:
            t_full = ts[depths[0]]
        print(f"{name}: {t_full*1e3:.2f} ms/step (depth {full_depth}"
              f"{' extrapolated' if len(ts) == 2 else ''}), "
              f"{BATCH/t_full:.0f} tok/s/chip (measured depths: {meas})",
              flush=True)


if __name__ == "__main__":
    main()
