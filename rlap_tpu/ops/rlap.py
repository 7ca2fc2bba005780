"""Randomized Schur-complement elimination (rLap) as a vectorized TPU kernel.

TPU-native redesign of the reference's sequential C++ elimination engine
(`rlap/csrc/preconditioner.cc`): instead of pointer-chased linked-list columns
popped one vertex at a time, elimination proceeds in **rounds over independent
sets** of vertices on a padded COO edge list with static shapes, entirely
inside `jax.jit`.

Why this is distribution-equivalent
-----------------------------------
Eliminating a vertex reads only its own incident edges and writes new clique
edges among its *neighbors*' columns. Two non-adjacent vertices therefore
never read each other's writes, so eliminating an independent set in parallel
samples from the same distribution as eliminating its members sequentially in
any order. Rounds select, among still-pending vertices, those whose priority
(elimination-order position for `o_v="random"`; current degree for
`o_v="degree"`/`"coarsen"`, matching the reference's bucket PQ,
`preconditioner.cc:125-190`) is a strict local minimum over pending
neighbors — a Luby-style schedule that terminates in O(log n) rounds w.h.p.

Closed form of the per-column sampling loop
-------------------------------------------
The reference's inner loop (`preconditioner.cc:740-776`) looks inherently
sequential — each neighbor updates `colScale *= (1-f)`, `wdeg *= (1-f)^2` —
but has a closed form. With column weights v_0..v_{d-1} in the `o_n` order,
total `csum`, inclusive prefix sums `cum_j`, and suffix sums
`S_j = csum - cum_j` (sum over m > j):

* the effective fraction is  f_j = v_j / (v_j + S_j),
* the sampled edge weight  f_j (1 - f_j) wdeg_j  reduces to
  ``w_new_j = v_j * S_j / csum``  (zero for the last neighbor — exactly the
  reference's "last neighbor is simply dropped", `preconditioner.cc:778-784`),
* the partner k is drawn from the suffix m > j with probability v_m / S_j,
  realized as r = cum_j + u * S_j and k = first index with cum_k > r —
  identical to `preconditioner.cc:748-757`.

So the whole column is processed with masked cumsums + one batched
`searchsorted`, and a round processes all its columns as a dense
``[batch, col_capacity]`` block on the VPU.

Storage reuse mirrors the reference (`preconditioner.cc:761-772`): the d
eliminated edges of a degree-d column (and their mirrors) are exactly the
slots into which the d-1 sampled clique edges (and mirrors) are written, so a
buffer of the input edge capacity always suffices.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph

_VALID_O_V = ("random", "degree", "coarsen")
_VALID_O_N = ("asc", "desc", "random")

_INT_MAX = np.iinfo(np.int32).max


def _batched_searchsorted_right(cum, q, d_cap: int):
    """First index k with cum[..., k] > q, per row — `searchsorted(side="right")`
    over the trailing axis, as an unrolled binary search (log2(d_cap) gathers).

    `jnp.searchsorted`/vmap lowers to per-row scalar loops that dominate the
    round time on TPU; this runs as log2(d_cap) vectorized [b, d] gathers.
    """
    b, d = q.shape
    lo = jnp.zeros_like(q, dtype=jnp.int32)
    hi = jnp.full_like(lo, d_cap)
    # result range is [0, d_cap] inclusive -> d_cap + 1 possible values
    steps = max(1, int(np.ceil(np.log2(d_cap + 1))))
    for _ in range(steps):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(cum, jnp.clip(mid, 0, d_cap - 1), axis=-1)
        go_right = v <= q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _column_batch(senders, receivers, weights, elim_pad, slot, pos_e, b_cap, d_cap, n):
    """Gather this round's eliminated columns into dense [b_cap, d_cap] blocks.

    Returns (val, nbr, eidx) with sentinel defaults; the extra sentinel row
    b_cap absorbs scatter writes from non-eliminated edges and is dropped.
    """
    e_cap = senders.shape[0]
    elim_edge = elim_pad[senders]
    idx_b = jnp.where(elim_edge, slot[senders], b_cap)
    idx_d = jnp.clip(pos_e, 0, d_cap - 1)
    val = jnp.zeros((b_cap + 1, d_cap), weights.dtype).at[idx_b, idx_d].set(
        jnp.where(elim_edge, weights, 0.0))
    nbr = jnp.full((b_cap + 1, d_cap), n, jnp.int32).at[idx_b, idx_d].set(
        jnp.where(elim_edge, receivers, n))
    eidx = jnp.full((b_cap + 1, d_cap), e_cap, jnp.int32).at[idx_b, idx_d].set(
        jnp.where(elim_edge, jnp.arange(e_cap, dtype=jnp.int32), e_cap))
    return val[:b_cap], nbr[:b_cap], eidx[:b_cap]


def _eliminate_impl(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_v: str, o_n: str, b_cap: int, d_cap: int,
):
    """One full elimination run. All shapes static; returns final edge list."""
    e_cap = senders.shape[0]
    wdtype = weights.dtype

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))

    if o_v == "random":
        pending = pos < t
    else:
        # min-degree modes eliminate whichever nodes reach local degree minima;
        # the budget cap below stops at t total, like the sequential PQ loop.
        pending = jnp.ones((n,), bool)

    state = dict(
        senders=senders, receivers=receivers, weights=weights,
        pending=pending, removed=jnp.zeros((), jnp.int32),
        npend=jnp.sum(pending.astype(jnp.int32)),
        overflow=jnp.zeros((), bool), key=key,
        rnd=jnp.zeros((), jnp.int32),
    )

    def cond(st):
        # scalars only: a cond that reads array state forces a per-iteration
        # host round-trip on remote-executed backends (~100x slowdown).
        return ((st["npend"] > 0) & (st["removed"] < t)
                & jnp.logical_not(st["overflow"]))

    def body(st):
        s, r, w = st["senders"], st["receivers"], st["weights"]
        pending = st["pending"]
        rkey = jax.random.fold_in(st["key"], st["rnd"])
        k_on, k_u, k_tie = jax.random.split(rkey, 3)

        live = s < n
        ones = live.astype(jnp.int32)
        deg = jax.ops.segment_sum(ones, s, num_segments=n + 1)[:n]
        # contiguous-segment start offsets (edge list is (s, r)-sorted)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(deg)])
        # position of each edge within its sender's segment; padding edges
        # sort to the tail so live segments are contiguous from `start`.
        pos_e = jnp.arange(e_cap, dtype=jnp.int32) - start[jnp.clip(s, 0, n)]

        # ---- round selection: strict local minima of `prio` over pending ----
        if o_v == "random":
            prio = pos
            cand = pending & (deg <= d_cap)
        else:
            # lexicographic (degree, random-pos) packed into int32
            prio = jnp.where(deg <= d_cap, deg, d_cap + 1) * (n + 1) + pos
            cand = pending & (deg <= d_cap)

        big = jnp.asarray(_INT_MAX, jnp.int32)
        prio_pad = jnp.concatenate([jnp.where(pending, prio, big),
                                    jnp.full((1,), big, jnp.int32)])
        # min over pending neighbors, via edges (i -> j): contribute prio[j] to i
        nbr_prio = jnp.where(live, prio_pad[r], big)
        nmin = jax.ops.segment_min(nbr_prio, s, num_segments=n + 1)[:n]
        elim = cand & (prio < nmin)

        if o_v != "random":
            # cap this round at the remaining elimination budget, preferring
            # the lowest (degree, tiebreak) priorities — the PQ pop order.
            remaining = t - st["removed"]
            sorted_prio = jnp.sort(jnp.where(elim, prio, big))
            kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
            elim = elim & (prio <= kth) & (remaining > 0)

        slot = jnp.cumsum(elim.astype(jnp.int32)) - 1
        elim = elim & (slot < b_cap)  # defer overflow beyond the batch cap
        b_count = jnp.sum(elim.astype(jnp.int32))
        # stall <=> every pending vertex is blocked by a >d_cap-degree vertex
        stall = (b_count == 0)

        elim_pad = jnp.concatenate([elim, jnp.zeros((1,), bool)])
        slot_pad = jnp.concatenate([slot, jnp.zeros((1,), jnp.int32)])

        val, nbr, eidx = _column_batch(
            s, r, w, elim_pad, slot_pad, pos_e, b_cap, d_cap, n)
        colmask = nbr < n

        # ---- o_n neighbor ordering (preconditioner.cc:662-674) ----
        if o_v == "coarsen":
            o_n_eff = "random"  # CoarseningPreconditioner forces o_n="random"
        else:
            o_n_eff = o_n
        if o_n_eff == "asc":
            skey = jnp.where(colmask, val, jnp.inf)
        elif o_n_eff == "desc":
            skey = jnp.where(colmask, -val, jnp.inf)
        else:
            skey = jnp.where(
                colmask,
                jax.random.uniform(k_on, colmask.shape, dtype=jnp.float32),
                jnp.inf)
        order = jnp.argsort(skey, axis=-1)
        v = jnp.take_along_axis(val, order, axis=-1)
        nb = jnp.take_along_axis(nbr, order, axis=-1)
        ei = jnp.take_along_axis(eidx, order, axis=-1)
        cm = nb < n
        v = jnp.where(cm, v, 0.0)

        length = jnp.sum(cm.astype(jnp.int32), axis=-1, keepdims=True)
        jidx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        cum = jnp.cumsum(v, axis=-1)
        csum = cum[:, -1:]
        suffix = csum - cum

        if o_v == "coarsen":
            # single partner k ~ v_k / csum; rewire all other neighbors onto k
            # with harmonic weights (preconditioner.cc:866-912)
            u = jax.random.uniform(k_u, (b_cap, 1),
                                   dtype=jnp.float32).astype(wdtype)
            rv = u * csum
            koff = _batched_searchsorted_right(cum, rv, d_cap)
            koff = jnp.clip(koff, 0, jnp.maximum(length - 1, 0))
            partner = jnp.take_along_axis(nb, koff, axis=-1)  # [b, 1]
            w_k = jnp.take_along_axis(v, koff, axis=-1)
            emit = cm & (jidx != koff) & (csum > 0)
            denom = jnp.where(v + w_k > 0, v + w_k, 1.0)
            wnew = jnp.where(emit, v * w_k / denom, 0.0)
            partner = jnp.broadcast_to(partner, v.shape)
        else:
            # clique sampling: partner from the suffix distribution
            u = jax.random.uniform(k_u, v.shape,
                                   dtype=jnp.float32).astype(wdtype)
            rv = cum + u * suffix
            kk = _batched_searchsorted_right(cum, rv, d_cap)
            kk = jnp.clip(kk, 0, jnp.maximum(length - 1, 0))
            partner = jnp.take_along_axis(nb, kk, axis=-1)
            emit = cm & (jidx < length - 1) & (csum > 0)
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, v * suffix / csafe, 0.0)

        # ---- write back: kill all edges of eliminated vertices, then emit ----
        kill = live & (elim_pad[s] | elim_pad[r])
        s1 = jnp.where(kill, n, s)
        r1 = jnp.where(kill, n, r)
        w1 = jnp.where(kill, 0.0, w)

        # mirror index: for a symmetric coalesced (s, r)-sorted list, sorting
        # by (r, s) yields at position i the mirror of edge i — the flip-index
        # trick (preconditioner.cc:486-512) without building a second matrix.
        mirror = jnp.lexsort((s, r)).astype(jnp.int32)

        flat_emit = emit.reshape(-1)
        flat_ei = ei.reshape(-1)
        tgt = jnp.where(flat_emit, flat_ei, e_cap)
        mtgt = jnp.where(flat_emit,
                         jnp.concatenate([mirror, jnp.full((1,), e_cap,
                                                           jnp.int32)])[flat_ei],
                         e_cap)
        src_new = jnp.where(flat_emit, nb.reshape(-1), n)
        dst_new = jnp.where(flat_emit, partner.reshape(-1), n)
        w_new = jnp.where(flat_emit, wnew.reshape(-1), 0.0)

        def scatter(arr, idx, vals, fill):
            pad = jnp.concatenate([arr, jnp.full((1,), fill, arr.dtype)])
            pad = pad.at[idx].set(vals)
            return pad[:-1]

        s2 = scatter(s1, tgt, src_new, n)
        r2 = scatter(r1, tgt, dst_new, n)
        w2 = scatter(w1, tgt, w_new, 0.0)
        s2 = scatter(s2, mtgt, dst_new, n)
        r2 = scatter(r2, mtgt, src_new, n)
        w2 = scatter(w2, mtgt, w_new, 0.0)

        # re-sort + merge duplicates for the next round (compressColumn merge).
        # Zero-drop runs *before* the coalesce sort (elementwise, keeps the
        # coalesced output sorted, so no second sort is needed); all emitted
        # weights are positive so this only catches killed-edge residue.
        gg = Graph(senders=s2, receivers=r2, weights=w2, num_nodes=n)
        gg = G.drop_zero_weight(gg)
        gg = G.coalesce(gg)

        pending_next = pending & jnp.logical_not(elim)
        return dict(
            senders=gg.senders, receivers=gg.receivers, weights=gg.weights,
            pending=pending_next,
            removed=st["removed"] + b_count,
            npend=jnp.sum(pending_next.astype(jnp.int32)),
            overflow=st["overflow"] | stall,
            key=st["key"],
            rnd=st["rnd"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return (out["senders"], out["receivers"], out["weights"],
            out["removed"], out["overflow"], out["rnd"])


@functools.partial(
    jax.jit,
    static_argnames=("o_v", "o_n", "b_cap", "d_cap"))
def eliminate(g: Graph, key: jax.Array, num_remove,
              o_v: str = "random", o_n: str = "random",
              b_cap: int = 1024, d_cap: int = 128):
    """Jittable core: returns (schur_graph, removed_count, overflow_flag).

    `overflow` is True when some column exceeded `d_cap` and blocked progress;
    callers should retry with a larger `d_cap` (see `approximate_cholesky`).
    """
    gg = G.remove_self_loops(g)
    gg = G.coalesce(gg)
    gg = G.drop_zero_weight(gg)
    gg = G.sort_edges(gg)
    # the reference never eliminates the last vertex (`while(it <= t && it < n)`,
    # preconditioner.cc:723)
    t = jnp.minimum(jnp.asarray(num_remove, jnp.int32), g.num_nodes - 1)
    s, r, w, removed, overflow, _rounds = _eliminate_impl(
        gg.senders, gg.receivers, gg.weights, key, t,
        n=g.num_nodes, o_v=o_v, o_n=o_n, b_cap=b_cap, d_cap=d_cap)
    out = Graph(senders=s, receivers=r, weights=w, num_nodes=g.num_nodes,
                x=g.x, node_mask=g.node_mask)
    return out, removed, overflow


def approximate_cholesky(
    g: Graph,
    key: jax.Array,
    num_remove: int,
    o_v: str = "random",
    o_n: str = "random",
    d_cap: Optional[int] = None,
    b_cap: Optional[int] = None,
    max_escalations: int = 4,
) -> Graph:
    """Compute a randomized Schur complement of `g` after removing
    `num_remove` vertices — API parity with `rlap.ops.approximate_cholesky`
    (reference `rlap/ops.py:7-58`), graph-in / graph-out.

    Host-level convenience: picks dense-column capacity from the input degree
    distribution and escalates (x4, recompiling at most `max_escalations`
    times against cached bucket sizes) if elimination ever produces a column
    wider than the chosen capacity.
    """
    if o_v not in _VALID_O_V:
        raise ValueError(f"o_v must be one of {_VALID_O_V}, got {o_v!r}")
    if o_n not in _VALID_O_N:
        raise ValueError(f"o_n must be one of {_VALID_O_N}, got {o_n!r}")
    n = g.num_nodes
    num_remove = int(num_remove)
    if num_remove <= 0:
        return G.coalesce(G.drop_zero_weight(G.remove_self_loops(g)))

    if d_cap is None:
        max_deg = int(jnp.max(G.degrees(g)))
        d_cap = 1 << max(5, int(np.ceil(np.log2(max(2 * max_deg, 2)))))
        d_cap = min(d_cap, max(32, 1 << int(np.ceil(np.log2(n)))))
    if b_cap is None:
        b_cap = int(min(max(num_remove, 8), max(1024, n // 2)))
        b_cap = ((b_cap + 7) // 8) * 8

    for _ in range(max_escalations + 1):
        out, removed, overflow = eliminate(
            g, key, num_remove, o_v=o_v, o_n=o_n, b_cap=b_cap, d_cap=d_cap)
        if not bool(overflow):
            return out
        d_cap = min(d_cap * 4, max(64, n))
    raise RuntimeError(
        f"rlap elimination overflowed col capacity even at d_cap={d_cap}")
