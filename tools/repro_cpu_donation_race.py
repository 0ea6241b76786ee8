"""Minimal repro attempt: jax CPU runtime donated-buffer chain race.

serving/engine.py serializes donated cache chains on the CPU backend
(engine.py `_dispatch` / `_admit` notes): in rounds 1-2, chaining a buffer
donated to computation A immediately into computation B with no host sync
intermittently (~30% of runs) made B read A's PRE-write contents — but only
on the CPU backend, and only in the full engine (prefill -> decode chains
over a dict-of-arrays cache with dynamic_update_slice writes).

This tool distills that pattern: a "prefill" writes a recognizable stripe
into a donated [slots, len] buffer, a chained "decode" immediately reads it
back (same donated buffer, no block_until_ready between dispatches), and
the readback is checked. Run it standalone:

    JAX_PLATFORMS=cpu python tools/repro_cpu_donation_race.py [trials]

Outcome on this image (jax 0.8.x, 2026-08): **does not reproduce in
isolation** across 500 trials x 4 shapes — the distilled chain is always
ordered. The race therefore needs something the full engine adds (multiple
live donated aliases? dispatch from Python between chains?). Until a
failing distillation exists, the engine keeps its CPU-only sync (the cost
is zero on TPU, where the chain is race-free and pipelined); anyone
touching that workaround should run this tool first and widen it with the
engine pattern that breaks.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("slot",))
def prefill_like(buf, val, slot: int):
    # dict-of-arrays + dynamic_update_slice, as the engine's prefill does
    row = jnp.full((1, buf["c"].shape[1]), val, buf["c"].dtype)
    return {"c": jax.lax.dynamic_update_slice(buf["c"], row, (slot, 0))}


@functools.partial(jax.jit, donate_argnums=(0,))
def decode_like(buf):
    out = jnp.sum(buf["c"], axis=1)
    return {"c": buf["c"] * 1}, out


def trial(n_slots, width, seed):
    buf = {"c": jnp.zeros((n_slots, width), jnp.float32)}
    want = np.zeros((n_slots,), np.float32)
    outs = []
    for s in range(n_slots):
        v = float(seed * 10 + s + 1)
        buf = prefill_like(buf, v, slot=s)        # donated write...
        buf, out = decode_like(buf)               # ...chained read, no sync
        want[s] = v * width
        outs.append(out)
    got = np.asarray(outs[-1])
    return np.array_equal(got, want), got, want


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    fails = 0
    for shape_i, (n_slots, width) in enumerate(
            [(2, 64), (4, 256), (8, 1024), (2, 8)]):
        for t in range(trials):
            ok, got, want = trial(n_slots, width, t)
            if not ok:
                fails += 1
                print(f"RACE: slots={n_slots} width={width} trial={t}\n"
                      f"  got  {got}\n  want {want}")
    print(f"{'no race observed' if not fails else f'{fails} failures'} "
          f"({trials} trials x 4 shapes, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
