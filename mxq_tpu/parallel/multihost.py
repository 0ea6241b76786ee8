"""Multi-host (ICI x DCN) topology plumbing — the capability the reference
covers with `torchrun --nproc_per_node=8` + torch FSDP process groups
(LLM-QAT/run_train.sh:10,44-45, utils/kd_trainer.py:172-255) and
`device_map="auto"` GPU spill for 30B/65B (mxq_quant/main.py:23,
lib/prune.py:371-379), rebuilt for JAX's multi-controller model:

* every host runs the same program; `initialize()` wires the processes into
  one JAX runtime (GSPMD then sees the global device set);
* the mesh gets an explicit ``dcn`` (cross-host) axis layered OVER the ICI
  axes, so collectives that must ride the slow network are chosen by the
  PartitionSpec, never by accident — gradients psum over dcn once per step
  (data parallel over hosts, the cheap default), or weights shard over
  ("dcn","tp") for models that exceed one host's HBM (the 70B config in
  BASELINE.json);
* per-host data feeding: each host tokenizes/loads only its own slice and
  `global_batch` assembles the global array from process-local shards
  (the analogue of torch's DistributedSampler).

Single-process (tests, the 8-virtual-device CPU mesh, one real chip) is the
degenerate case throughout: `initialize()` is a no-op, the dcn axis is a
real mesh axis of size >= 1 laid out over the flat device list, and
`global_batch` falls back to plain `device_put` — so the exact code path
that runs on a pod slice is exercised by `tests/test_multihost.py` and
`__graft_entry__.dryrun_multichip` with dcn=2 simulated hosts.

What MUST be re-measured on real multi-host hardware (cannot be validated
on the virtual mesh): DCN bandwidth/latency actually achieved by the
once-per-step gradient psum; whether tp-over-dcn all-reduces for the 70B
config hide behind layer compute (docs/SERVING.md); checkpoint write
fan-in from non-coordinator hosts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire this process into the multi-host JAX runtime.

    Call once at program start on EVERY host, before any device access
    (the multi-controller analogue of the reference's
    ``torch.distributed.init_process_group("nccl")``, LLM-QAT/train.py:46).

    Arguments default from the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID); on TPU pods all three are discoverable from
    the metadata server and may be left None.  A single-process run (no env,
    no args) is a no-op, so the same entrypoint works on a laptop, one chip,
    and a pod.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if already:
        return
    if coordinator_address is None and num_processes in (None, 1):
        return                     # single-process: nothing to wire
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_coordinator() -> bool:
    """True on the host that owns scheduling / logging / checkpoint-manifest
    writes (host-0 in the serving driver, the `log` host in the QAT loop)."""
    return jax.process_index() == 0


def make_hybrid_mesh(dcn: int = 1, dp: int = 1, fsdp: int = 1, tp: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ("dcn", "dp", "fsdp", "tp"): dcn spans hosts (slow
    network), the other three span ICI within a host.

    Multi-process: devices are arranged so that each dcn index is exactly
    one process's device set (via mesh_utils.create_hybrid_device_mesh), so
    any collective NOT naming "dcn" stays on ICI.  Single-process: the flat
    device list is reshaped [dcn, dp, fsdp, tp] — the simulated-host layout
    used by tests and dryrun_multichip.
    """
    n_ici = dp * fsdp * tp
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils
        # the construction below (dcn_mesh_shape=(dcn,1,1)) only produces
        # "each dcn index = one process's devices" when dcn equals the
        # process count; other multiples fail deep inside mesh_utils or
        # silently straddle hosts with ICI-intended collectives
        assert dcn == jax.process_count(), (
            f"dcn={dcn} must equal process_count={jax.process_count()} "
            "in multi-process runs (simulated hosts on one process may "
            "pick any dcn)")
        arr = mesh_utils.create_hybrid_device_mesh(
            (dp, fsdp, tp), dcn_mesh_shape=(dcn, 1, 1))
        arr = arr.reshape(dcn, dp, fsdp, tp)
        return Mesh(arr, axis_names=("dcn", "dp", "fsdp", "tp"))
    devices = list(devices) if devices is not None else jax.devices()
    n = dcn * n_ici
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dcn, dp, fsdp, tp)
    return Mesh(arr, axis_names=("dcn", "dp", "fsdp", "tp"))


def global_batch(batch, mesh: Mesh, spec: Optional[P] = None):
    """Assemble a global sharded batch from per-host data.

    Multi-process: each host passes ONLY its local shard (leading-axis
    slice) and `jax.make_array_from_process_local_data` stitches the global
    array — no host ever materializes the full batch (per-host data
    feeding; the reference relies on torch DistributedSampler inside HF
    Trainer for the same).  Single-process: a plain sharded device_put.
    """
    if spec is None:
        spec = batch_spec(mesh)

    def put(x):
        s = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def batch_spec(mesh: Mesh) -> P:
    """Batch partition over every data axis present in the mesh (dcn is a
    data axis by default: data parallel across hosts, one gradient psum
    over DCN per step)."""
    axes = tuple(a for a in ("dcn", "dp", "fsdp") if a in mesh.axis_names
                 and mesh.shape[a] > 1)
    return P(axes if axes else None)


def host_local_slice(n_global: int) -> slice:
    """The [start, stop) slice of a globally-indexed dataset this host is
    responsible for loading (contiguous block partitioning)."""
    pc, pi = jax.process_count(), jax.process_index()
    assert n_global % pc == 0, (
        f"global batch {n_global} not divisible by {pc} hosts")
    per = n_global // pc
    return slice(pi * per, (pi + 1) * per)


def sync_global_devices(name: str = "mxq") -> None:
    """Barrier across hosts (reference: torch.distributed.barrier(),
    LLM-QAT/train.py:151). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
