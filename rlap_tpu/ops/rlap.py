"""Randomized Schur-complement elimination (rLap) as a vectorized TPU kernel.

TPU-native redesign of the reference's sequential C++ elimination engine
(`rlap/csrc/preconditioner.cc`): instead of pointer-chased linked-list columns
popped one vertex at a time, elimination proceeds in **rounds over independent
sets** of vertices on a padded COO edge list with static shapes, entirely
inside `jax.jit`. Processing is fully *edge-centric* — there is no dense
per-column block, so there is no column-width cap, no overflow, and no
recompile-and-retry escalation: a round's work is a few e_cap-length sorts,
one segmented scan, and a static-depth batched binary search.

Why a round of an independent set is exact
------------------------------------------
Eliminating a vertex reads only its own incident edges and writes new clique
edges among its *neighbors'* columns. Members of an independent set never
read each other's writes, so eliminating the whole set in one round samples
from the same distribution as eliminating its members sequentially in any
relative order.

Why the schedule may reorder the set ("fast" schedule)
------------------------------------------------------
For `o_v="random"` the *set* of eliminated vertices is exactly the first `t`
entries of a uniform random permutation — identical to the reference. The
per-elimination star->clique sampler is unbiased (for a column with weights
v_j and total csum, E[sampled clique] has weight v_a v_b / csum on every
neighbor pair (a, b) — the true Schur-complement clique), so by the tower
property E[final edge list] equals the *exact* Schur complement of that set,
which is order-independent. Any valid rounds-of-independent-sets schedule
over the same set therefore preserves the spectral expectation (§4 of
SURVEY.md, the acceptance bar). The default "fast" schedule picks each
round's set as strict local minima of (current degree, random position) over
still-pending vertices — much larger sets (low-degree vertices beside hubs
all go at once) and thus far fewer rounds than pure random-position minima.
`schedule="luby"` restores the strict sequential-order coupling (local minima
of the random positions themselves), which terminates in O(log n) rounds
w.h.p. but with smaller sets.

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

Storage reuse mirrors the reference (`preconditioner.cc:761-772`): the d
eliminated edges of a degree-d column (and their mirrors) are exactly the
slots into which the d-1 sampled clique edges (and mirrors) are written, so a
buffer of the input edge capacity always suffices. In the edge-centric
layout the forward slot is the edge's *own* position (an elementwise select,
no scatter at all) and the mirror slot is reached by *gathering* through the
flip-index permutation (`preconditioner.cc:486-512`), which is an involution
on a symmetric list — scatters, the slowest primitive on TPU, never appear
in the round body.
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
_VALID_SCHEDULE = ("fast", "luby")

_INT_MAX = np.iinfo(np.int32).max


def _pair_hash(a, b, salt):
    """Symmetric per-undirected-pair hash -> non-negative int32 sort key.

    Symmetry (h(a,b) == h(b,a)) is what lets the flip-index mirror trick work
    for `o_n="random"`: both directions of an edge sort under the same key.
    murmur3-style finalizer for mixing quality.
    """
    x = jnp.minimum(a, b).astype(jnp.uint32) * np.uint32(0x9E3779B1)
    y = jnp.maximum(a, b).astype(jnp.uint32) * np.uint32(0x85EBCA77)
    h = x ^ y ^ salt
    h = (h ^ (h >> 16)) * np.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return (h >> 1).astype(jnp.int32)


def _segmented_cumsum(vals, heads):
    """Exact inclusive cumsum within segments (reset at head flags).

    Unlike `global cumsum - base[segment]`, the segmented-scan combine never
    subtracts two large running totals, so per-column precision is
    independent of edge count.
    """

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    out, _ = jax.lax.associative_scan(combine, (vals, heads))
    return out


def _batched_searchsorted_window(c, q, lo0, hi0, steps: int):
    """Per-element first index k in [lo0, hi0) with c[k] > q; returns hi0 if
    none. Static-depth binary search, vectorized over all edges."""
    lo = lo0
    hi = hi0
    for _ in range(steps):
        mid = (lo + hi) // 2
        v = c[jnp.clip(mid, 0, c.shape[0] - 1)]
        go_right = (v <= q) & (mid < hi0)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _segmented_maxscan_rev(vals, heads):
    """Per-segment running max from the RIGHT. When `vals` is nondecreasing
    within each segment this broadcasts the segment-tail value to every slot
    of the segment. `heads` marks segment starts."""
    t1 = jnp.ones((1,), bool)
    rv = vals[::-1]
    rh = jnp.concatenate([t1, heads[1:][::-1]])

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb

    out, _ = jax.lax.associative_scan(combine, (rv, rh))
    return out[::-1]


def _last_le_lookup(data_keys, query_keys):
    """For each query, the index of the LAST data item whose key tuple is
    lexicographically <= the query's (full ties count as <=); -1 if none.

    TPU-native replacement for a per-element binary search (log2(E)
    serialized e_cap-length gathers, the round body's dominant cost in
    round 1): ONE merge sort of data+queries, a forward-fill scan, and one
    unique-index scatter — ~5x cheaper at the bench size (measured in
    tools/profile_rlap3.py).

    data_keys / query_keys: tuples of equal-length key arrays, compared
    lexicographically; on a full tie the data item sorts first, so an
    exactly-matching data item IS counted as <=.
    """
    m = data_keys[0].shape[0]
    k = query_keys[0].shape[0]
    keys = tuple(jnp.concatenate([d, q])
                 for d, q in zip(data_keys, query_keys))
    tag = jnp.concatenate([jnp.zeros((m,), jnp.int32),
                           jnp.ones((k,), jnp.int32)])
    pos = jnp.concatenate([jnp.arange(m, dtype=jnp.int32),
                           jnp.arange(k, dtype=jnp.int32)])
    sorted_arrays = jax.lax.sort(keys + (tag, pos), num_keys=len(keys) + 1)
    st, sp = sorted_arrays[-2], sorted_arrays[-1]
    dataidx = jnp.where(st == 0, sp, -1)
    filled = jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), dataidx)
    qslot = jnp.where(st == 1, sp, k)  # non-queries write to a trash slot
    out = jnp.full((k + 1,), -1, jnp.int32).at[qslot].max(
        jnp.where(st == 1, filled, -1))
    return out[:k]


def _eliminate_impl_fast(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_v: str, schedule: str, subiters: int = 3,
):
    """One-sort-per-round elimination (o_n="random" semantics).

    TPU-first redesign of the round body around three measured facts
    (tools/profile_rlap3.py): XLA 1D gathers/searches are the slow primitive
    (~2 ms per e_cap gather), sorts are cheap (~3 ms), segmented scans and
    scatter-min are ~1 ms. Hence:

    * ONE fused-key sort (key = sender*(n+1)+receiver) per round regroups
      edges by column AND brings duplicate (s, r) pairs adjacent so the
      `compressColumn` merge (reference `preconditioner.cc:641-676`) is a
      segmented scan with no compaction scatter — non-tail duplicates become
      zero-weight ghosts killed at write-back.
    * Partner sampling and mirror lookup use `_last_le_lookup` (merge sort +
      scan + scatter) instead of per-element binary searches.
    * Column totals broadcast by a reversed segmented max-scan; per-node
      neighbor minima by scatter-min (which also eliminates isolated
      vertices: no incident edge -> nmin stays +inf -> immediate pop, like
      the reference's PQ popping degree-0 columns).
    * The independent set is enlarged by `subiters` Luby-style sub-rounds
      (select minima, exclude their neighborhood, select again), which cuts
      the round count ~3x (tools/sim_rounds.py) at ~2 scatter/gathers each.

    Why no weight-ordered frame is needed: the reference's suffix-CDF
    star->clique sampler (`preconditioner.cc:740-776`) is unbiased for ANY
    fixed column order — for a pair (a, b) with a earlier in the order, only
    a emits toward b, with probability v_b/S_a and weight v_a*S_a/csum, so
    E[w(a,b)] = v_a*v_b/csum independent of the order (the f(1-f)
    telescoping). o_n="asc"/"desc" change only the variance profile and are
    served by the sorted-frame path (`_eliminate_impl`).
    """
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    B = n + 1
    if n * (n + 2) >= _INT_MAX:
        raise ValueError("fast path requires n*(n+2) < 2^31; use sorted path")

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))

    if o_v == "random":
        pending = pos < t  # first t of the permutation (preconditioner.cc:588-613)
    else:
        pending = jnp.ones((n,), bool)

    state = dict(
        senders=senders, receivers=receivers, weights=weights,
        pending=pending, removed=jnp.zeros((), jnp.int32),
        npend=jnp.sum(pending.astype(jnp.int32)),
        key=key, rnd=jnp.zeros((), jnp.int32),
    )

    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f_pad = jnp.zeros((1,), bool)

    def cond(st):
        return (st["npend"] > 0) & (st["removed"] < t)

    def body(st):
        pending = st["pending"]
        rkey = jax.random.fold_in(st["key"], st["rnd"])

        # ---- the one pool sort: fused (sender, receiver) key --------------
        kappa = st["senders"] * B + st["receivers"]
        kappa, w = jax.lax.sort((kappa, st["weights"]), num_keys=1)
        s = kappa // B
        r = kappa - s * B
        real = s < n

        # ---- in-place coalesce: tail of each duplicate run keeps the sum --
        same = kappa[1:] == kappa[:-1]
        head_dup = jnp.concatenate([t1, jnp.logical_not(same)])
        is_tail = jnp.concatenate([jnp.logical_not(same), t1])
        wsum = _segmented_cumsum(w, head_dup)
        w = jnp.where(is_tail, wsum, jnp.zeros((), wdtype))
        live = real & (w > 0)

        # ---- degrees (live count per column) via one scatter-add ----------
        deg = jnp.zeros((n + 1,), jnp.int32).at[s].add(
            live.astype(jnp.int32))[:n]

        # ---- round selection: Luby sub-rounds of (degree, pos) minima -----
        if o_v == "random" and schedule == "luby":
            prio = pos
        else:
            dclamp = max(1, (_INT_MAX - n) // (n + 1) - 1)
            prio = jnp.minimum(deg, dclamp) * (n + 1) + pos

        elim = jnp.zeros((n,), bool)
        cand = pending
        for it in range(max(1, subiters)):
            pc_pad = jnp.concatenate([jnp.where(cand, prio, big),
                                      jnp.full((1,), big, jnp.int32)])
            nbr = jnp.where(live, pc_pad[r], big)
            nmin = jnp.full((n + 1,), big, jnp.int32).at[s].min(nbr)[:n]
            sel = cand & (prio < nmin)
            elim = elim | sel
            if it < subiters - 1:
                sel_pad = jnp.concatenate([sel, f_pad])
                nbrsel = jnp.zeros((n + 1,), bool).at[s].max(
                    live & sel_pad[r])[:n]
                cand = cand & jnp.logical_not(sel) & jnp.logical_not(nbrsel)

        if o_v != "random":
            # cap this round at the remaining budget, lowest priorities
            # first — the PQ pop order
            remaining = t - st["removed"]
            sorted_prio = jnp.sort(jnp.where(elim, prio, big))
            kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
            elim = elim & (prio <= kth) & (remaining > 0)

        b_count = jnp.sum(elim.astype(jnp.int32))
        elim_pad = jnp.concatenate([elim, f_pad])
        es = elim_pad[s]
        er = elim_pad[r]

        # ---- star->clique sampling in receiver order -----------------------
        hs = jnp.concatenate([t1, s[1:] != s[:-1]])
        vm = jnp.where(es & live, w, jnp.zeros((), wdtype))
        cum = _segmented_cumsum(vm, hs)
        csum = _segmented_maxscan_rev(cum, hs)
        suffix = csum - cum

        if o_v == "coarsen":
            # single partner per column ~ v_k/csum; rewire the others onto
            # it with harmonic weights (`preconditioner.cc:866-912`)
            u_node = jax.random.uniform(rkey, (n + 1,), dtype=jnp.float32)
            rv = u_node[jnp.clip(s, 0, n)].astype(wdtype) * csum
            maybe = es & live & (csum > 0)
        else:
            u = jax.random.uniform(rkey, (e_cap,),
                                   dtype=jnp.float32).astype(wdtype)
            rv = cum + u * suffix
            # the last live neighbor has cum == csum (suffix 0): it emits
            # nothing, exactly the reference's dropped last edge (:778-784)
            maybe = es & live & (suffix > 0)

        # first column index with cum > rv == (last with (s, cum) <= (s, rv)
        # lexicographically) + 1; ghosts never sit at an increase of cum so
        # the found index is always a live edge
        q = _last_le_lookup(
            (s, cum), (jnp.where(maybe, s, n + 1),
                       jnp.where(maybe, rv, jnp.zeros((), wdtype)))) + 1
        q = jnp.clip(q, 0, e_cap - 1)
        partner = r[q]

        if o_v == "coarsen":
            idx = jnp.arange(e_cap, dtype=jnp.int32)
            w_k = w[q]
            emit = maybe & (idx != q)
            denom = jnp.where(w + w_k > 0, w + w_k, 1.0)
            wnew = jnp.where(emit, w * w_k / denom, jnp.zeros((), wdtype))
        else:
            emit = maybe
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, w * suffix / csafe, jnp.zeros((), wdtype))

        # ---- mirror lookup: exact-match (r, s) among the sorted kappa;
        # the last-<= semantics lands on the duplicate-run tail, which is
        # the real (weight-carrying) twin
        mk = er & live  # receiver eliminated -> killed, maybe replaced
        m = _last_le_lookup(
            (kappa,), (jnp.where(mk, r * B + s, big),))
        m = jnp.clip(m, 0, e_cap - 1)
        # pack (emit, wnew) into one gather: wnew > 0 iff emit
        mw = jnp.where(emit, wnew, jnp.asarray(-1.0, wdtype))
        m_wnew = mw[m]
        m_emit = m_wnew > 0
        m_partner = partner[m]

        # ---- write-back: pure selects ---------------------------------------
        ghost = real & jnp.logical_not(live)
        dead = ghost | (es & jnp.logical_not(emit)) | (
            mk & jnp.logical_not(m_emit))
        s_new = jnp.where(emit, r, jnp.where(mk & m_emit, m_partner, s))
        r_new = jnp.where(emit, partner, jnp.where(mk & m_emit, s, r))
        w_new = jnp.where(emit, wnew,
                          jnp.where(mk & m_emit, m_wnew, w))
        s_new = jnp.where(dead, n, s_new)
        r_new = jnp.where(dead, n, r_new)
        w_new = jnp.where(dead, jnp.zeros((), wdtype), w_new)

        pending_next = pending & jnp.logical_not(elim)
        return dict(
            senders=s_new, receivers=r_new, weights=w_new,
            pending=pending_next,
            removed=st["removed"] + b_count,
            npend=jnp.sum(pending_next.astype(jnp.int32)),
            key=st["key"],
            rnd=st["rnd"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return (out["senders"], out["receivers"], out["weights"],
            out["removed"], out["rnd"])


def _segmented_minscan(vals, heads):
    """Inclusive per-segment running minimum (reset at head flags)."""

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, jnp.minimum(va, vb)), fa | fb

    out, _ = jax.lax.associative_scan(combine, (vals, heads))
    return out


def _eliminate_impl(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_v: str, o_n: str, schedule: str,
):
    """One full elimination run. All shapes static; returns final edge list."""
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    steps = max(1, int(np.ceil(np.log2(e_cap + 1))))

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))

    if o_v == "random":
        # the eliminated set is the first t of the permutation, exactly as
        # the sequential reference (`preconditioner.cc:588-613`)
        pending = pos < t
    else:
        # min-degree modes eliminate whichever nodes reach local degree
        # minima; the budget cap below stops at t total, like the PQ loop.
        pending = jnp.ones((n,), bool)

    state = dict(
        senders=senders, receivers=receivers, weights=weights,
        pending=pending, removed=jnp.zeros((), jnp.int32),
        npend=jnp.sum(pending.astype(jnp.int32)),
        key=key, rnd=jnp.zeros((), jnp.int32),
    )

    def cond(st):
        # scalars only: a cond that reads array state forces a per-iteration
        # host round-trip on remote-executed backends (~100x slowdown).
        return (st["npend"] > 0) & (st["removed"] < t)

    def body(st):
        s, r, w = st["senders"], st["receivers"], st["weights"]
        pending = st["pending"]
        rkey = jax.random.fold_in(st["key"], st["rnd"])
        k_on, k_u = jax.random.split(rkey, 2)

        live = s < n
        ones = live.astype(jnp.int32)
        deg = jax.ops.segment_sum(ones, s, num_segments=n + 1)[:n]

        # ---- round selection: strict local minima of `prio` over pending ---
        if o_v == "random" and schedule == "luby":
            prio = pos
        else:
            # lexicographic (degree, random-pos) packed into int32; the
            # clamp keeps the pack exact for any n (ties only shrink the
            # round, never break correctness).
            dclamp = max(1, (_INT_MAX - n) // (n + 1) - 1)
            prio = jnp.minimum(deg, dclamp) * (n + 1) + pos

        big = jnp.asarray(_INT_MAX, jnp.int32)
        prio_pad = jnp.concatenate([jnp.where(pending, prio, big),
                                    jnp.full((1,), big, jnp.int32)])
        # min over pending neighbors, via edges (i -> j): prio[j] scatters
        # to i's segment
        nbr_prio = jnp.where(live, prio_pad[r], big)
        nmin = jax.ops.segment_min(nbr_prio, s, num_segments=n + 1)[:n]
        elim = pending & (prio < nmin)

        if o_v != "random":
            # cap this round at the remaining elimination budget, preferring
            # the lowest (degree, tiebreak) priorities — the PQ pop order.
            remaining = t - st["removed"]
            sorted_prio = jnp.sort(jnp.where(elim, prio, big))
            kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
            elim = elim & (prio <= kth) & (remaining > 0)

        b_count = jnp.sum(elim.astype(jnp.int32))
        elim_pad = jnp.concatenate([elim, jnp.zeros((1,), bool)])

        # ---- frame F: sort edges by (sender, o_n key, receiver) -----------
        if o_v == "coarsen":
            o_n_eff = "random"  # CoarseningPreconditioner forces o_n="random"
        else:
            o_n_eff = o_n
        if o_n_eff == "asc":
            k2 = w.astype(jnp.float32)
        elif o_n_eff == "desc":
            k2 = -w.astype(jnp.float32)
        else:
            salt = jax.random.bits(k_on, dtype=jnp.uint32)
            k2 = _pair_hash(s, r, salt).astype(jnp.float32)
        # padding edges (s == n) sort to the tail via the primary key
        orderF = jnp.lexsort((r, k2, s))
        sF = s[orderF]
        rF = r[orderF]
        wF = w[orderF]
        k2F = k2[orderF]
        liveF = sF < n
        # flip-index mirror (involution): the k-th edge in (r, key, s) order
        # is the mirror of the k-th edge in (s, key, r) order.
        mirrorF = jnp.lexsort((sF, k2F, rF)).astype(jnp.int32)

        # ---- per-column geometry in frame F -------------------------------
        head = jnp.concatenate([
            jnp.ones((1,), bool), (sF[1:] != sF[:-1])]) & liveF
        col_elim = elim_pad[sF]
        degF = jnp.concatenate([deg, jnp.zeros((1,), jnp.int32)])[
            jnp.clip(sF, 0, n)]
        idx = jnp.arange(e_cap, dtype=jnp.int32)
        # start of each edge's segment: idx of the segment head
        startF = _segmented_cumsum(
            jnp.where(head, idx, 0), head).astype(jnp.int32)
        posF = idx - startF
        endF = startF + degF  # one past the last live edge of the column

        vmask = jnp.where(liveF & col_elim, wF, jnp.zeros((), wdtype))
        cum = _segmented_cumsum(vmask, head)
        csum_col = cum[jnp.clip(endF - 1, 0, e_cap - 1)]
        csum = jnp.where(liveF, csum_col, 0.0)
        suffix = csum - cum

        if o_v == "coarsen":
            # one partner per column ~ v_k / csum; rewire every other
            # neighbor onto it with harmonic weights
            # (`preconditioner.cc:866-912`)
            u_node = jax.random.uniform(k_u, (n + 1,), dtype=jnp.float32)
            rv = u_node[jnp.clip(sF, 0, n)].astype(wdtype) * csum
            q = _batched_searchsorted_window(cum, rv, startF, endF, steps)
            q = jnp.clip(q, startF, jnp.maximum(endF - 1, startF))
            partner = rF[jnp.clip(q, 0, e_cap - 1)]
            w_k = wF[jnp.clip(q, 0, e_cap - 1)]
            emit = liveF & col_elim & (idx != q) & (csum > 0)
            denom = jnp.where(wF + w_k > 0, wF + w_k, 1.0)
            wnew = jnp.where(emit, wF * w_k / denom, 0.0)
        else:
            # clique sampling: partner from the suffix distribution
            u = jax.random.uniform(k_u, (e_cap,),
                                   dtype=jnp.float32).astype(wdtype)
            rv = cum + u * suffix
            q = _batched_searchsorted_window(cum, rv, startF, endF, steps)
            q = jnp.clip(q, startF, jnp.maximum(endF - 1, startF))
            partner = rF[jnp.clip(q, 0, e_cap - 1)]
            emit = liveF & col_elim & (posF < degF - 1) & (csum > 0)
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, wF * suffix / csafe, 0.0)

        # ---- write-back, all gathers/selects (no scatters) ----------------
        # kill every edge touching an eliminated vertex, then overwrite:
        #  * slot e (sender eliminated, emitting): the new edge (rF, partner)
        #  * slot mirrorF[e']: its mirror (partner', rF') — reached by
        #    gathering e' = mirrorF[e] since mirrorF is an involution
        kill = liveF & (col_elim | elim_pad[rF])
        s1 = jnp.where(kill, n, sF)
        r1 = jnp.where(kill, n, rF)
        w1 = jnp.where(kill, jnp.zeros((), wdtype), wF)

        s2 = jnp.where(emit, rF, s1)
        r2 = jnp.where(emit, partner, r1)
        w2 = jnp.where(emit, wnew, w1)

        m_emit = emit[mirrorF]
        s3 = jnp.where(m_emit, partner[mirrorF], s2)
        r3 = jnp.where(m_emit, rF[mirrorF], r2)
        w3 = jnp.where(m_emit, wnew[mirrorF], w2)

        # merge duplicate (s, r) pairs before the next round
        # (the `compressColumn` merge, preconditioner.cc:641-676)
        gg = Graph(senders=s3, receivers=r3, weights=w3, num_nodes=n)
        gg = G.coalesce(gg)
        gg = G.drop_zero_weight(gg)

        pending_next = pending & jnp.logical_not(elim)
        return dict(
            senders=gg.senders, receivers=gg.receivers, weights=gg.weights,
            pending=pending_next,
            removed=st["removed"] + b_count,
            npend=jnp.sum(pending_next.astype(jnp.int32)),
            key=st["key"],
            rnd=st["rnd"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return (out["senders"], out["receivers"], out["weights"],
            out["removed"], out["rnd"])


@functools.partial(
    jax.jit,
    static_argnames=("o_v", "o_n", "schedule", "b_cap", "d_cap"))
def eliminate(g: Graph, key: jax.Array, num_remove,
              o_v: str = "random", o_n: str = "random",
              schedule: str = "fast",
              b_cap: Optional[int] = None, d_cap: Optional[int] = None):
    """Jittable core: returns (schur_graph, removed_count, overflow_flag).

    `b_cap`/`d_cap` are accepted for backward compatibility and ignored —
    the edge-centric round body has no column-width or batch-size caps, so
    `overflow` is always False.
    """
    del b_cap, d_cap
    if schedule not in _VALID_SCHEDULE:
        raise ValueError(
            f"schedule must be one of {_VALID_SCHEDULE}, got {schedule!r}")
    gg = G.remove_self_loops(g)
    gg = G.coalesce(gg)
    gg = G.drop_zero_weight(gg)
    # the reference never eliminates the last vertex
    # (`while(it <= t && it < n)`, preconditioner.cc:723)
    t = jnp.minimum(jnp.asarray(num_remove, jnp.int32), g.num_nodes - 1)
    n = g.num_nodes
    use_fast = (o_n == "random" or o_v == "coarsen") and n * (n + 2) < _INT_MAX
    if use_fast:
        s, r, w, removed, _rounds = _eliminate_impl_fast(
            gg.senders, gg.receivers, gg.weights, key, t,
            n=n, o_v=o_v, schedule=schedule)
    else:
        s, r, w, removed, _rounds = _eliminate_impl(
            gg.senders, gg.receivers, gg.weights, key, t,
            n=n, o_v=o_v, o_n=o_n, schedule=schedule)
    out = Graph(senders=s, receivers=r, weights=w, num_nodes=g.num_nodes,
                x=g.x, node_mask=g.node_mask)
    if use_fast:
        # the fast path's last write-back leaves uncoalesced emissions
        out = G.drop_zero_weight(G.coalesce(out))
    return out, removed, jnp.zeros((), bool)


def approximate_cholesky(
    g: Graph,
    key: jax.Array,
    num_remove: int,
    o_v: str = "random",
    o_n: str = "random",
    d_cap: Optional[int] = None,
    b_cap: Optional[int] = None,
    max_escalations: int = 0,
    schedule: str = "fast",
) -> Graph:
    """Compute a randomized Schur complement of `g` after removing
    `num_remove` vertices — API parity with `rlap.ops.approximate_cholesky`
    (reference `rlap/ops.py:7-58`), graph-in / graph-out.

    `d_cap`/`b_cap`/`max_escalations` are accepted for backward
    compatibility; the edge-centric kernel has no capacity caps so no
    escalation ever happens.
    """
    del d_cap, b_cap, max_escalations
    if o_v not in _VALID_O_V:
        raise ValueError(f"o_v must be one of {_VALID_O_V}, got {o_v!r}")
    if o_n not in _VALID_O_N:
        raise ValueError(f"o_n must be one of {_VALID_O_N}, got {o_n!r}")
    num_remove = int(num_remove)
    if num_remove <= 0:
        return G.coalesce(G.drop_zero_weight(G.remove_self_loops(g)))
    out, _removed, _overflow = eliminate(
        g, key, num_remove, o_v=o_v, o_n=o_n, schedule=schedule)
    return out
