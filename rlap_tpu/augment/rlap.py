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
