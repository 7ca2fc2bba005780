"""rlap_tpu: a TPU-native graph-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference `kvignesh1420/rlap` (ICML 2023, "Randomized Schur Complement
Views for Graph Contrastive Learning"): the randomized-elimination
(approximate Cholesky / Schur complement) graph augmentor, graph
contrastive-learning recipes (GRACE, MVGRL, GraphCL, BGRL-g2l, CCA-SSG),
sparse message-passing encoders (GCN / GIN), objectives (InfoNCE, JSD,
Bootstrap, CCA), linear-probe evaluation, and a distributed layer that
edge-partitions graphs over a `jax.sharding.Mesh`.

Everything on the compute path is jittable with static shapes; graphs are
held as padded COO edge lists (`rlap_tpu.core.graph.Graph`).
"""

__version__ = "0.1.0"

from rlap_tpu.core.graph import Graph  # noqa: F401
from rlap_tpu.ops.rlap import approximate_cholesky  # noqa: F401
