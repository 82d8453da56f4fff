from infercnv_tpu.core.genome import GeneOrder, order_reduce  # noqa: F401
from infercnv_tpu.core.object import InferCNV, create_infercnv_object  # noqa: F401
