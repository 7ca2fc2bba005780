"""The rLap augmentor: randomized Schur-complement topology views.

Reference `rLap` (`scripts/augmentor_benchmarks.py:68-96`):
`num_remove = int(frac * num_nodes)`, run the elimination, and return the
sampled edge_index with **weights deliberately dropped** (set to 1 here,
`augmentor_benchmarks.py:91-96`). Pass `keep_weights=True` for the weighted
Schur complement (what `rLapPPRDiffusion` consumes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor
from rlap_tpu.core.graph import Graph
from rlap_tpu.ops.rlap import approximate_cholesky, eliminate


class RLap(Augmentor):
    def __init__(self, frac: float, o_v: str = "random", o_n: str = "asc",
                 keep_weights: bool = False,
                 d_cap: Optional[int] = None, b_cap: Optional[int] = None):
        self.frac = frac
        self.o_v = o_v
        self.o_n = o_n
        self.keep_weights = keep_weights
        self.d_cap = d_cap
        self.b_cap = b_cap

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        num_remove = int(self.frac * g.num_nodes)
        out = approximate_cholesky(
            g, key, num_remove, o_v=self.o_v, o_n=self.o_n,
            d_cap=self.d_cap, b_cap=self.b_cap)
        if not self.keep_weights:
            out = out.replace(
                weights=out.edge_mask.astype(out.weights.dtype))
        return out

    def traceable(self, g: Graph, key: jax.Array) -> Graph:
        """Same pipeline without the host-side overflow escalation (a
        traced overflow flag cannot drive a python branch) — used by the
        compiled-memory benchmark; overflow is simply ignored here."""
        num_remove = int(self.frac * g.num_nodes)
        out, _removed, _overflow = eliminate(
            g, key, num_remove, o_v=self.o_v, o_n=self.o_n)
        if not self.keep_weights:
            out = out.replace(
                weights=out.edge_mask.astype(out.weights.dtype))
        return out


class PairedRLap:
    """Both GCL views in ONE jitted elimination call (`eliminate_pair`):
    shared entry canonicalization + one dispatch, each view's stream
    byte-identical to a single `RLap` call. Optionally applies the
    standard FeatureMasking(pf) to each view (the registry always pairs a
    topology augmentor with feature masking, `node_shared.py:330-487`).

    Callable as `pair(g, key) -> (g1, g2)` — the `pair_augmentor`
    protocol of `GraceTrainer`/`CCASSGTrainer`-style recipes.
    """

    def __init__(self, frac: float, pf: float = 0.3, o_v: str = "random",
                 o_n: str = "asc", keep_weights: bool = False):
        self.frac = frac
        self.pf = pf
        self.o_v = o_v
        self.o_n = o_n
        self.keep_weights = keep_weights

    def __call__(self, g: Graph, key: jax.Array):
        from rlap_tpu.augment.feature import mask_feature_dims
        from rlap_tpu.ops.rlap import eliminate_pair

        ke, k1, k2 = jax.random.split(key, 3)
        num_remove = int(self.frac * g.num_nodes)
        (o1, _r1, ov1), (o2, _r2, ov2) = eliminate_pair(
            g, ke, num_remove, o_v=self.o_v, o_n=self.o_n)
        if bool(ov1) or bool(ov2):
            # same escalation as approximate_cholesky: budgeting off
            (o1, _r1, _), (o2, _r2, _) = eliminate_pair(
                g, ke, num_remove, o_v=self.o_v, o_n=self.o_n,
                compact=False)
        outs = []
        for o, kf in ((o1, k1), (o2, k2)):
            if not self.keep_weights:
                o = o.replace(weights=o.edge_mask.astype(o.weights.dtype))
            if self.pf and o.x is not None:
                o = o.replace(x=mask_feature_dims(o.x, kf, self.pf))
            outs.append(o)
        return tuple(outs)
