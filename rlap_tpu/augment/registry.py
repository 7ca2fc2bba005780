"""Augmentor registry: the 16 named (aug1, aug2) pipelines of the reference
GRACE driver (`scripts/node_shared.py:330-487`), every topology augmentor
composed with FeatureMasking(pf=0.3).
"""

from __future__ import annotations

from typing import Tuple

from rlap_tpu.augment.base import Augmentor, Compose, Identity
from rlap_tpu.augment.adaptive import (EdgeDroppingDegree, EdgeDroppingEVC,
                                       EdgeDroppingPR)
from rlap_tpu.augment.diffusion import (MarkovDiffusion, PPRDiffusion,
                                        RLapPPRDiffusion)
from rlap_tpu.augment.base import CachedAugmentor
from rlap_tpu.augment.edge import EdgeAdding, EdgeRemoving, NodeDropping
from rlap_tpu.augment.feature import FeatureMasking
from rlap_tpu.augment.rlap import RLap
from rlap_tpu.augment.rw import RWSampling

AUGMENTOR_NAMES = (
    "rLap", "rLapRandomDesc", "rLapRandomRandom",
    "rLapDegree", "rLapDegreeDesc", "rLapDegreeRandom", "rLapCoarsen",
    "EdgeAddition", "EdgeDropping",
    "EdgeDroppingDegree", "EdgeDroppingPR", "EdgeDroppingEVC",
    "NodeDropping", "RandomWalkSubgraph",
    "PPRDiffusion", "MarkovDiffusion",
)


def make_augmentor_pair(name: str, fraction1: float, fraction2: float,
                        num_nodes: int = 0, pf: float = 0.3,
                        use_cache: bool = True) -> Tuple[Augmentor, Augmentor]:
    """Build the (view1, view2) pipelines for a registry name."""

    def fm():
        return FeatureMasking(pf=pf)

    def pair(a1, a2):
        return Compose([a1, fm()]), Compose([a2, fm()])

    rlap_variants = {
        "rLap": ("random", "asc"),
        "rLapRandomDesc": ("random", "desc"),
        "rLapRandomRandom": ("random", "random"),
        "rLapDegree": ("degree", "asc"),
        "rLapDegreeDesc": ("degree", "desc"),
        "rLapDegreeRandom": ("degree", "random"),
        "rLapCoarsen": ("coarsen", "asc"),
    }
    if name in rlap_variants:
        o_v, o_n = rlap_variants[name]
        return pair(RLap(fraction1, o_v=o_v, o_n=o_n),
                    RLap(fraction2, o_v=o_v, o_n=o_n))
    if name == "EdgeAddition":
        return pair(EdgeAdding(pe=fraction1), EdgeAdding(pe=fraction2))
    if name == "EdgeDropping":
        return pair(EdgeRemoving(pe=fraction1), EdgeRemoving(pe=fraction2))
    if name == "EdgeDroppingDegree":
        return pair(EdgeDroppingDegree(p=fraction1, threshold=0.7),
                    EdgeDroppingDegree(p=fraction2, threshold=0.7))
    if name == "EdgeDroppingPR":
        return pair(EdgeDroppingPR(p=fraction1, threshold=0.7),
                    EdgeDroppingPR(p=fraction2, threshold=0.7))
    if name == "EdgeDroppingEVC":
        return pair(EdgeDroppingEVC(p=fraction1, threshold=0.7),
                    EdgeDroppingEVC(p=fraction2, threshold=0.7))
    if name == "NodeDropping":
        return pair(NodeDropping(pn=fraction1), NodeDropping(pn=fraction2))
    if name == "RandomWalkSubgraph":
        return pair(RWSampling(num_seeds=max(int(fraction1 * num_nodes), 1)),
                    RWSampling(num_seeds=max(int(fraction2 * num_nodes), 1)))
    if name == "PPRDiffusion":
        d = PPRDiffusion(alpha=0.2)
        return pair(Identity(),
                    CachedAugmentor(d, refresh_every=1 << 30)
                    if use_cache else d)
    if name == "MarkovDiffusion":
        d = MarkovDiffusion(alpha=0.05)
        return pair(Identity(),
                    CachedAugmentor(d, refresh_every=1 << 30)
                    if use_cache else d)
    if name == "rLapPPRDiffusion":
        # MVGRL's dedicated pairing (`node_dedicated.py:408-418`)
        d = RLapPPRDiffusion(frac=fraction2)
        return pair(Identity(),
                    CachedAugmentor(d, refresh_every=50) if use_cache else d)
    raise ValueError(f"unknown augmentor {name!r}; "
                     f"choose from {AUGMENTOR_NAMES + ('rLapPPRDiffusion',)}")
