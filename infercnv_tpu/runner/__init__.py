from infercnv_tpu.runner.config import RunConfig  # noqa: F401
from infercnv_tpu.runner.pipeline import RunResult, run  # noqa: F401
