from rlap_tpu.ops.rlap import approximate_cholesky  # noqa: F401
from rlap_tpu.ops.spmm import spmm, gcn_norm  # noqa: F401
