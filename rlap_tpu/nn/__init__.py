from rlap_tpu.nn.layers import MLP, PReLU, MaskedBatchNorm  # noqa: F401
from rlap_tpu.nn.gcn import GCNConv, GCNEncoder  # noqa: F401
from rlap_tpu.nn.gin import GINConv, GINEncoder  # noqa: F401
