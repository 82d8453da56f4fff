#!/usr/bin/env python
"""Per-step wall-clock + peak-RSS profiling of run(), the analogue of the
reference's ``example/run_memory_profiling_per_step.sh`` (which re-runs R
with increasing ``up_to_step``).  Runs each prefix of the pipeline in a
fresh subprocess so peak RSS is attributable to the last step added.

Usage:
    python scripts/profile_steps.py [out_base_dir] [--steps 1,2,3,...]
"""

import json
import os
import resource
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, resource, sys, time
sys.path.insert(0, {repo!r})
from infercnv_tpu.io import load_bundled_example
from infercnv_tpu.runner.pipeline import run

t0 = time.time()
obj = load_bundled_example()
run(obj, out_dir={out!r}, cutoff=1, analysis_mode="subclusters",
    denoise=True, HMM=True, save_rds=False, no_plot=True,
    up_to_step={step})
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print("STEP_PROFILE " + json.dumps(
    {{"step": {step}, "seconds": round(time.time() - t0, 2),
      "peak_rss_mb": round(peak_mb, 1)}}))
"""


def main():
    argv = sys.argv[1:]
    base = argv[0] if argv and not argv[0].startswith("--") else "/tmp/profile_steps"
    steps = [3, 10, 14, 15, 17, 19, 22]
    for a in argv:
        if a.startswith("--steps"):
            steps = [int(s) for s in a.split("=", 1)[1].split(",")]
    rows = []
    for step in steps:
        out = os.path.join(base, f"step_{step:02d}")
        code = _CHILD.format(repo=REPO, out=out, step=step)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("STEP_PROFILE "):
                rows.append(json.loads(line[len("STEP_PROFILE "):]))
                print(json.dumps(rows[-1]))
                break
        else:
            print(json.dumps({"step": step, "error": r.stderr[-400:]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
