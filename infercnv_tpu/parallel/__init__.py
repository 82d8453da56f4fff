from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig, make_cell_mesh  # noqa: F401
