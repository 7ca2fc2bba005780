from rlap_tpu.parallel.mesh import (make_mesh, make_mesh_2level,  # noqa: F401
                                    init_distributed, graph_shardings,
                                    shard_graph)
from rlap_tpu.parallel.partition import partition_edges_by_sender  # noqa: F401
from rlap_tpu.parallel.spmm import spmm_edge_partitioned  # noqa: F401
from rlap_tpu.parallel.rlap_dist import eliminate_sharded  # noqa: F401
from rlap_tpu.parallel.tp import shard_params_tp  # noqa: F401
