"""CCA-SSG-style functional augmentors.

The reference's DGL-side augmentor set (`CCA-SSG/aug.py:15-340`) is ten
functions with signature `(graph, x, feat_drop_rate, frac) -> (graph, x)`;
both views come from the SAME function (`CCA-SSG/main.py:96-98`). Here each
name maps to `(g: Graph, key, feat_drop_rate, frac) -> Graph` where g.x
carries features. Names follow the reference CLI (`CCA-SSG/main.py:79-96`).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax

from rlap_tpu.augment.adaptive import (EdgeDroppingDegree, EdgeDroppingEVC,
                                       EdgeDroppingPR)
from rlap_tpu.augment.base import CachedAugmentor
from rlap_tpu.augment.diffusion import MarkovDiffusion, PPRDiffusion
from rlap_tpu.augment.edge import EdgeAdding, EdgeRemoving, NodeDropping
from rlap_tpu.augment.feature import mask_feature_dims
from rlap_tpu.augment.rlap import RLap
from rlap_tpu.augment.rw import RWSampling
from rlap_tpu.core.graph import Graph

# module-level single-entry diffusion caches, like the reference's
# MARKOVD_CACHE / PPRD_CACHE globals (`CCA-SSG/aug.py:11-12`). Each holds
# (graph, result): keeping a strong reference to the keying graph means an
# `is` check can never alias a new graph that reused a garbage-collected id.
_MARKOVD_CACHE: list = [None, None]
_PPRD_CACHE: list = [None, None]


def _with_feat_drop(topology_fn):
    def fn(g: Graph, key: jax.Array, feat_drop_rate: float,
           frac: float) -> Graph:
        k1, k2 = jax.random.split(key)
        out = topology_fn(g, k1, frac)
        if out.x is not None:
            out = out.replace(x=mask_feature_dims(out.x, k2, feat_drop_rate))
        return out

    return fn


@_with_feat_drop
def random_aug(g, key, frac):
    """edge mask with drop prob `frac` (`aug.py:15-30`)."""
    return EdgeRemoving(pe=frac)(g, key)


@_with_feat_drop
def rlap_aug(g, key, frac):
    return RLap(frac=frac, o_v="random", o_n="asc")(g, key)


@_with_feat_drop
def ea_aug(g, key, frac):
    return EdgeAdding(pe=frac)(g, key)


@_with_feat_drop
def nd_aug(g, key, frac):
    # reference passes keep_prob=frac to PyGCL drop_node (`aug.py:133-135`)
    return NodeDropping(pn=1.0 - frac)(g, key)


@_with_feat_drop
def markovd_aug(g, key, frac):
    if _MARKOVD_CACHE[0] is not g:
        _MARKOVD_CACHE[0] = g
        _MARKOVD_CACHE[1] = MarkovDiffusion(alpha=0.05)(g, key)
    return _MARKOVD_CACHE[1]


@_with_feat_drop
def pprd_aug(g, key, frac):
    if _PPRD_CACHE[0] is not g:
        _PPRD_CACHE[0] = g
        _PPRD_CACHE[1] = PPRDiffusion(alpha=0.2)(g, key)
    return _PPRD_CACHE[1]


@_with_feat_drop
def rws_aug(g, key, frac):
    return RWSampling(num_seeds=max(int(frac * g.num_nodes), 1),
                      walk_length=10)(g, key)


@_with_feat_drop
def ed_deg_aug(g, key, frac):
    return EdgeDroppingDegree(p=frac, threshold=0.7)(g, key)


@_with_feat_drop
def ed_ppr_aug(g, key, frac):
    return EdgeDroppingPR(p=frac, threshold=0.7)(g, key)


@_with_feat_drop
def ed_evc_aug(g, key, frac):
    return EdgeDroppingEVC(p=frac, threshold=0.7)(g, key)


CCA_AUGMENTORS: Dict[str, Callable] = {
    "random": random_aug,
    "rlap": rlap_aug,
    "ea": ea_aug,
    "nd": nd_aug,
    "markovd": markovd_aug,
    "pprd": pprd_aug,
    "rws": rws_aug,
    "ed_deg": ed_deg_aug,
    "ed_ppr": ed_ppr_aug,
    "ed_evc": ed_evc_aug,
}


def make_cca_augmentor(name: str, feat_drop_rate: float, frac: float):
    """Bind an augmentor name to (g, key) -> Graph for CCASSGTrainer."""
    fn = CCA_AUGMENTORS[name]

    def aug(g: Graph, key: jax.Array) -> Graph:
        return fn(g, key, feat_drop_rate, frac)

    return aug
