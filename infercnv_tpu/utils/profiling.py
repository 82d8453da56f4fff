"""Tracing / profiling subsystem.

The reference has no built-in profiling (SURVEY §5) — only log timestamps
and external per-step memory profiling via up_to_step re-runs.  Here
profiling is first-class: every pipeline step is wall-clock timed (written
to ``step_timings.tsv`` in the out_dir), and a jax.profiler trace of the
device program can be captured with INFERCNV_TPU_PROFILE=/path/to/dir.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

from infercnv_tpu.utils.logging import log_info


def _rss_gb() -> float:
    """Current VmRSS in GB (0.0 off-Linux) — per-step memory attribution
    for scale runs (a 1M-cell run was OOM-killed in round 5 with no record
    of WHICH step grew the footprint)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


class StepTimer:
    def __init__(self, out_dir: Optional[str] = None):
        self.out_dir = out_dir
        self.records: List[Dict] = []
        self._trace_dir = os.environ.get("INFERCNV_TPU_PROFILE")
        self._trace_active = False
        if self._trace_dir:
            import jax

            jax.profiler.start_trace(self._trace_dir)
            self._trace_active = True
            log_info(f"jax.profiler trace -> {self._trace_dir}")

    @contextlib.contextmanager
    def step(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.records.append({"step": name, "seconds": round(dt, 4)})
            log_info(f"[timing] {name}: {dt:.3f}s (rss {_rss_gb():.1f} GB)")

    def finish(self) -> None:
        if self._trace_active:
            import jax

            jax.profiler.stop_trace()
            self._trace_active = False
        if self.out_dir:
            path = os.path.join(self.out_dir, "step_timings.tsv")
            with open(path, "w") as f:
                f.write("step\tseconds\n")
                for r in self.records:
                    f.write(f"{r['step']}\t{r['seconds']}\n")

    def as_json(self) -> str:
        return json.dumps(self.records)
