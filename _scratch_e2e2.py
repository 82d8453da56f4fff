import os, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from infercnv_tpu.io import load_bundled_example
from infercnv_tpu.runner.pipeline import run
t0=time.time()
obj = load_bundled_example()
res = run(obj, out_dir="/tmp/e2e_full2", cutoff=1, HMM=True, denoise=True,
          sd_amplifier=2.0, analysis_mode="subclusters", save_rds=False,
          write_phylo=True, write_expr_matrix=True)
print("e2e done in", round(time.time()-t0,1), "s")
print(open("/tmp/e2e_full2/step_timings.tsv").read())
