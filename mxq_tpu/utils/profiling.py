"""Tracing / profiling / observability — a real subsystem where the reference
had only ad-hoc time.time() ticks (mxqgpt.py:397, test_mxq_gemv.py:28-33).

* ``trace(dir)``: jax.profiler context — open the dump with TensorBoard or
  Perfetto.
* ``annotate(name)``: TraceAnnotation for custom spans inside jitted code
  regions (host-side nesting).
* ``Roofline``: per-kernel accounting of achieved vs peak bandwidth/FLOPs
  (the BASELINE.json target is >=80% of roofline for the dequant-GEMM).
* ``MetricsLogger``: structured jsonl metrics (the analogue of the
  reference's TensorBoard reporting, run_train.sh:30).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Optional

import jax


# v5e per-chip peaks (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM.
CHIP_PEAKS = {
    "v5e": dict(bf16_tflops=197.0, hbm_gbps=819.0, vmem_mb=128.0),
    "v5p": dict(bf16_tflops=459.0, hbm_gbps=2765.0, vmem_mb=128.0),
    "v4": dict(bf16_tflops=275.0, hbm_gbps=1228.0, vmem_mb=128.0),
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mxq_trace"):
    """Capture a device trace: ``with profiling.trace('/tmp/t'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class Roofline:
    """Roofline accounting for one op."""

    name: str
    bytes_accessed: int
    flops: int
    chip: str = "v5e"

    def report(self, seconds: float) -> dict:
        peaks = CHIP_PEAKS[self.chip]
        bw = self.bytes_accessed / seconds / 1e9
        tf = self.flops / seconds / 1e12
        t_bw = self.bytes_accessed / (peaks["hbm_gbps"] * 1e9)
        t_fl = self.flops / (peaks["bf16_tflops"] * 1e12)
        bound = "bandwidth" if t_bw > t_fl else "compute"
        t_roof = max(t_bw, t_fl)
        return {
            "op": self.name,
            "seconds": seconds,
            "achieved_gbps": round(bw, 1),
            "achieved_tflops": round(tf, 2),
            "bound": bound,
            "pct_of_roofline": round(100.0 * t_roof / seconds, 1),
            "roofline_seconds": t_roof,
        }


class MetricsLogger:
    """Append-only jsonl metrics with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, **kv) -> None:
        kv.setdefault("ts", time.time())
        line = json.dumps(kv)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line)

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None
