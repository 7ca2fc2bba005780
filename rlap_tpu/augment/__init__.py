from rlap_tpu.augment.base import Augmentor, Compose, Identity, RandomChoice  # noqa: F401
from rlap_tpu.augment.feature import FeatureMasking, FeatureDropout  # noqa: F401
from rlap_tpu.augment.edge import EdgeAdding, EdgeRemoving, NodeDropping  # noqa: F401
from rlap_tpu.augment.rlap import RLap  # noqa: F401
from rlap_tpu.augment.adaptive import (  # noqa: F401
    EdgeDroppingDegree, EdgeDroppingPR, EdgeDroppingEVC,
    degree_drop_weights, pr_drop_weights, evc_drop_weights,
    compute_pagerank, eigenvector_centrality)
from rlap_tpu.augment.diffusion import (  # noqa: F401
    PPRDiffusion, MarkovDiffusion, PPRDiffusionSubGraph, RLapPPRDiffusion,
    compute_ppr_dense, ppr_diffusion_graph)
from rlap_tpu.augment.rw import RWSampling  # noqa: F401
from rlap_tpu.augment.registry import make_augmentor_pair, AUGMENTOR_NAMES  # noqa: F401
