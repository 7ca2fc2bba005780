"""Spectral analysis of iterated rLap — the reference's
`scripts/rlap_vc_spectral.py:14-173` as a library function: iterate the
elimination in `batch_count` steps of `batch_frac` of the *original* node
count, tracking per-step max singular value, unique-node count and edge
count, mean ± std over `num_runs` for each (o_v, o_n) combo.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.ops.rlap import approximate_cholesky


def _stats(g: Graph) -> Tuple[float, int, int]:
    d = np.asarray(G.to_dense(g))
    sv = float(np.linalg.svd(d, compute_uv=False)[0]) if d.any() else 0.0
    deg = (d > 0).sum(1)
    return sv, int((deg > 0).sum()), int((d > 0).sum())


def iterated_rlap_curves(g: Graph, o_v: str = "random", o_n: str = "random",
                         total_frac: float = 0.5, batch_count: int = 10,
                         num_runs: int = 10, seed: int = 0) -> Dict[str, np.ndarray]:
    """Returns arrays [batch_count+1] of mean/std for max-SV, node count,
    edge count across `num_runs` iterated-elimination trajectories."""
    per_step = int(total_frac / batch_count * g.num_nodes)
    curves = {k: np.zeros((num_runs, batch_count + 1))
              for k in ("max_sv", "nodes", "edges")}
    for run in range(num_runs):
        key = jax.random.PRNGKey(seed + run)
        cur = g
        sv, nn, ee = _stats(cur)
        curves["max_sv"][run, 0] = sv
        curves["nodes"][run, 0] = nn
        curves["edges"][run, 0] = ee
        for step in range(batch_count):
            key, k = jax.random.split(key)
            cur = approximate_cholesky(cur, k, per_step, o_v=o_v, o_n=o_n)
            sv, nn, ee = _stats(cur)
            curves["max_sv"][run, step + 1] = sv
            curves["nodes"][run, step + 1] = nn
            curves["edges"][run, step + 1] = ee
    out = {}
    for k, arr in curves.items():
        out[f"{k}_mean"] = arr.mean(0)
        out[f"{k}_std"] = arr.std(0)
    return out


def ppr_edge_counts(g: Graph, fractions=(0.1, 0.2, 0.3, 0.4, 0.5),
                    alpha: float = 0.2, eps: float = 1e-4, seed: int = 0):
    """PPR vs rLap->PPR edge counts per elimination fraction — the
    reference's `scripts/rlap_ppr_edge_plots.py:23-96` analysis."""
    from rlap_tpu.augment.diffusion import ppr_diffusion_graph

    key = jax.random.PRNGKey(seed)
    base = ppr_diffusion_graph(g, alpha=alpha, eps=eps)
    base_edges = int(np.asarray(base.edge_mask).sum())
    out = {"ppr": base_edges, "rlap_ppr": {}}
    for frac in fractions:
        key, k = jax.random.split(key)
        sc = approximate_cholesky(g, k, int(frac * g.num_nodes))
        dif = ppr_diffusion_graph(sc, alpha=alpha, eps=eps,
                                  add_self_loop=False)
        out["rlap_ppr"][frac] = int(np.asarray(dif.edge_mask).sum())
    return out
