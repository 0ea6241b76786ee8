"""On-device A/B: plain pipelined greedy engine vs speculative decoding
(synchronous and pipelined) on a repetitive and a random workload.

Model: 8-layer 7B-width packed random weights (per-layer cost identical to
the full model; depth shortened so prefill/compiles fit the probe budget).
Reported: wall-clock tokens/s over the drained queue + acceptance stats.
VERDICT r2 #6's measurement."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.serving import engine as eng
from bench import packed_params

key = jax.random.PRNGKey(0)
cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=8)
params = packed_params(cfg, key)

N_NEW = 48
ECFG = dict(num_slots=2, max_len=256, prefill_buckets=(16,), kv_quant=True)


def make_engine():
    return eng.Engine(params, cfg, eng.EngineConfig(**ECFG))


def drain(mode, prompts):
    from mxq_tpu.serving import spec
    e = make_engine()
    reqs = [e.submit(p, max_new_tokens=N_NEW) for p in prompts]
    t0 = time.monotonic()
    if mode == "plain":
        e.run()
    elif mode == "spec_sync":
        spec.run_spec(e, draft_len=4)
    else:
        spec.run_spec_pipelined(e, draft_len=4, rounds=4)
    dt = time.monotonic() - t0
    toks = sum(len(r.generated) for r in reqs)
    s = e.stats()
    acc = s.get("spec_accept_len_mean", 1.0)
    return toks / dt, acc, [r.generated for r in reqs]


rng = np.random.RandomState(0)
workloads = {
    "repetitive": [np.array([5, 6, 7, 8] * 3, np.int32) for _ in range(4)],
    "random": [rng.randint(1, cfg.vocab_size, size=12).astype(np.int32)
               for _ in range(4)],
}

for name, prompts in workloads.items():
    base_tps, _, base_gen = drain("plain", prompts)
    print(f"[{name}] plain pipelined: {base_tps:7.1f} tok/s", flush=True)
    for mode in ("spec_sync", "spec_pipe"):
        tps, acc, gen = drain(mode, prompts)
        exact = all(g[:N_NEW] == b[:N_NEW] for g, b in zip(gen, base_gen))
        print(f"[{name}] {mode:10s}: {tps:7.1f} tok/s "
              f"({tps / base_tps:4.2f}x, accept_len {acc:.2f}, "
              f"exact={exact})", flush=True)
