"""Augmentor latency / memory benchmark harness.

Parity with `scripts/augmentor_benchmarks.py:366-468` +
`run_augmentor_benchmarks.sh`: per-augmentor wall-clock latency (node-level:
one full graph; graph-level: a 128-graph block-diagonal batch) and memory.
TPU-native measurement: `block_until_ready` wall clock and
`device.memory_stats()` deltas instead of memory_profiler RSS lines.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from rlap_tpu.augment import AUGMENTOR_NAMES, make_augmentor_pair
from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph


def _device_mem() -> Optional[int]:
    st = jax.devices()[0].memory_stats()
    return None if st is None else st.get("bytes_in_use")


def _peak_hbm(aug, g: Graph, key) -> Optional[Dict[str, int]]:
    """Compiled-executable memory analysis of the whole augmentation
    pipeline (the reference's memory-profiler axis,
    `augmentor_benchmarks.py:366-393`, measured the TPU way): peak HBM =
    arguments + outputs + XLA temp buffers of the jitted program. Uses
    the augmentor's `traceable` variant (host-side escalation branches
    omitted). Returns None when the backend exposes no analysis."""
    try:
        fn = getattr(aug, "traceable", aug)
        compiled = jax.jit(fn).lower(g, key).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        arg = int(getattr(ma, "argument_size_in_bytes", 0))
        out = int(getattr(ma, "output_size_in_bytes", 0))
        tmp = int(getattr(ma, "temp_size_in_bytes", 0))
        return {"peak_hbm_bytes": arg + out + tmp,
                "hbm_args_bytes": arg, "hbm_out_bytes": out,
                "hbm_temp_bytes": tmp}
    except Exception as e:  # noqa: BLE001 — analysis is best-effort,
        # but record WHY it is missing instead of failing silently
        return {"peak_hbm_bytes": None,
                "hbm_note": f"{type(e).__name__}: {str(e)[:120]}"}


def bench_augmentor(aug, g: Graph, repeats: int = 10,
                    seed: int = 0) -> Dict[str, float]:
    key = jax.random.PRNGKey(seed)
    # warm-up (compile)
    out = aug(g, key)
    jax.block_until_ready((out.senders, out.weights))
    m0 = _device_mem()
    times = []
    for i in range(repeats):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        out = aug(g, k)
        jax.block_until_ready((out.senders, out.weights,
                               out.x if out.x is not None else out.weights))
        times.append(time.perf_counter() - t0)
    m1 = _device_mem()
    e = int(np.asarray(g.edge_mask).sum())
    mean = float(np.mean(times))
    res = {
        "latency_ms_mean": mean * 1e3,
        "latency_ms_std": float(np.std(times)) * 1e3,
        "edges_per_s": e / mean if mean > 0 else float("inf"),
        "mem_delta_bytes": (None if m0 is None or m1 is None else m1 - m0),
    }
    hbm = _peak_hbm(aug, g, key)
    if hbm is not None:
        res.update(hbm)
    return res


def bench_all(g: Graph, names: Sequence[str] = AUGMENTOR_NAMES,
              fraction: float = 0.2, repeats: int = 10,
              graphs: Optional[Sequence[Graph]] = None,
              logger=None) -> Dict[str, Dict[str, float]]:
    """Node-level benchmarks for each augmentor registry name; optionally a
    graph-level benchmark on a block-diagonal batch (`graphs`)."""
    results = {}
    batch = None
    if graphs is not None:
        ncap = ((sum(gg.num_nodes for gg in graphs) + 127) // 128) * 128
        ecap = ((sum(int(gg.num_edges) for gg in graphs) + 255) // 256) * 256
        batch, _ = G.block_diagonal(list(graphs), node_capacity=ncap,
                                    edge_capacity=ecap)
    for name in names:
        a1, _ = make_augmentor_pair(name, fraction, fraction,
                                    num_nodes=g.num_nodes, use_cache=False)
        res = bench_augmentor(a1, g, repeats=repeats)
        results[name] = res
        if logger is not None:
            logger.log("augmentor_bench", augmentor=name, level="node", **res)
        if batch is not None:
            resb = bench_augmentor(a1, batch, repeats=max(repeats // 2, 1))
            results[name + "/batch"] = resb
            if logger is not None:
                logger.log("augmentor_bench", augmentor=name, level="graph",
                           **resb)
    return results
