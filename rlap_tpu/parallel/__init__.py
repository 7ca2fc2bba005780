from rlap_tpu.parallel.mesh import make_mesh, graph_shardings  # noqa: F401
from rlap_tpu.parallel.partition import partition_edges_by_sender  # noqa: F401
from rlap_tpu.parallel.spmm import spmm_edge_partitioned  # noqa: F401
