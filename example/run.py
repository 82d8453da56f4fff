#!/usr/bin/env python
"""Run the bundled oligodendroglioma example end to end — the analogue of
the reference's example/run.R (reference example/run.R:8-25): subclusters
mode, i6 HMM, Bayes filtering, denoise with sd_amplifier=2.

Usage:
    python example/run.py [out_dir] [--i3] [--no-hmm]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infercnv_tpu.io import load_bundled_example
from infercnv_tpu.runner.pipeline import run


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    hmm_type = "i3" if "--i3" in argv else "i6"
    hmm = "--no-hmm" not in argv
    argv = [a for a in argv if not a.startswith("--")]
    out_dir = argv[0] if argv else "output_dir"

    obj = load_bundled_example()
    run(obj,
        cutoff=1,  # 1 for Smart-seq2; 0.1 for 10x Genomics
        out_dir=out_dir,
        cluster_by_groups=True,
        analysis_mode="subclusters",
        plot_steps=False,
        denoise=True,
        sd_amplifier=2.0,
        HMM=hmm,
        HMM_type=hmm_type)
    return 0


if __name__ == "__main__":
    sys.exit(main())
