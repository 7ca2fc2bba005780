"""Randomized Schur-complement elimination (rLap) as a vectorized TPU kernel.

TPU-native redesign of the reference's sequential C++ elimination engine
(`rlap/csrc/preconditioner.cc`): instead of pointer-chased linked-list columns
popped one vertex at a time, elimination proceeds in **rounds over independent
sets** of vertices on a padded COO edge list with static shapes, entirely
inside `jax.jit`. Processing is fully *edge-centric* over a CANONICAL
half-edge pool (one u < v slot per undirected edge): a round's work is ONE
pool sort (which groups each touched edge's duplicate copies and merges
them in place), a handful of segmented scans/scatters, and one merge-based
rank lookup for partner sampling — no dense per-column block, no
per-element binary searches, and no scatters in the write-back (each
sampled clique edge overwrites its own run-tail slot, the reference's
storage reuse `preconditioner.cc:761-772`). Rounds run on *staged*
active-set pool prefixes that shrink as pending vertices drain. See
`_eliminate_impl_fast` for the design and its measured-cost rationale.

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
eliminated canonical edges of a degree-d column are exactly the slots into
which the d-1 sampled clique edges are written (each emitting run tail
overwrites itself, re-canonicalized to u < v elementwise), so a pool of
half the directed edge capacity always suffices.
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
_RECOMPUTE_DEG = False  # debug knob: per-round full degree recompute
# stage-schedule tuning knobs (module-level so bench tools can A/B them),
# tuned on the v5e at BA(20k) t=n/2 (tools/ab_sched.py): touched-budget
# divisor per non-final stage (last entry repeats), divisor for the FINAL
# stage (endgame hub columns need the headroom), cls1-cap fraction
_ET_FRACS: Tuple[int, ...] = (6,)
_ET_FRAC_LAST = 2
_B_FRAC = 0.18
# ladder grids (geometric divisor sequences, ascending rung sizes):
# selection/er levels over (e_t, b_cap) and the touched-count pipeline
# rungs; finer grids cut static-prefix overshoot (the dominant
# quantization term, tools/quantized_roofline.py) at more compile time
_SEL_LADDER: Tuple[int, ...] = (64, 16, 4, 2, 1)
_ET_LADDER: Tuple[int, ...] = (16, 4, 1)


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


def _segmented_race_rev(x, o, v, heads):
    """Reversed segmented min-scan of race keys `x` carrying payloads
    (o, v): out[k] = (min, payloads-at-argmin) over slots >= k of the same
    segment. `heads` marks segment starts (forward orientation)."""
    t1 = jnp.ones((1,), bool)
    rx, ro, rv_ = x[::-1], o[::-1], v[::-1]
    rh = jnp.concatenate([t1, heads[1:][::-1]])

    def combine(a, b):
        xa, oa, va, fa = a
        xb, ob, vb, fb = b
        tb = fb | (xb <= xa)
        return (jnp.where(tb, xb, xa), jnp.where(tb, ob, oa),
                jnp.where(tb, vb, va), fa | fb)

    ox, oo, ov, _ = jax.lax.associative_scan(combine, (rx, ro, rv_, rh))
    return ox[::-1], oo[::-1], ov[::-1]


def _segmented_headscan(vals, heads):
    """Broadcast each segment head's value forward over its segment."""

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    out, _ = jax.lax.associative_scan(combine, (vals, heads))
    return out


def _last_le_lookup(data_keys, query_keys):
    """For each query, the index of the LAST data item whose key tuple is
    lexicographically <= the query's (full ties count as <=); -1 if none.

    TPU-native replacement for a per-element binary search (log2(E)
    serialized e_cap-length gathers, the round body's dominant cost in
    round 1): ONE merge sort of data+queries, a forward-fill scan, and one
    unique-index scatter — ~5x cheaper at the bench size (measured in
    tools/probe_access.py).

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


def _stage_sizes(e_cap: int, floor: int = 8192) -> Tuple[int, ...]:
    """Static pool-size schedule for staged active-set elimination.

    Stage k runs its rounds on the prefix [0, sizes[k]) only; the stage exits
    when every edge with a pending endpoint provably fits the next (2x
    smaller) prefix. Sizes are 1024-multiples with a floor that keeps the
    per-stage touched budget comfortably above any single column (tail
    rounds eliminate high-degree hubs)."""
    sizes = [e_cap]
    for d in (2, 4, 8, 16):
        p = max(floor, ((e_cap + d - 1) // d + 1023) // 1024 * 1024)
        if p < sizes[-1]:
            sizes.append(p)
    return tuple(sizes)


def _eliminate_impl_fast(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_v: str, o_n: str = "random", schedule: str = "fast",
    subiters: int = 3, sampler: str = "independent", compact: bool = True,
):
    """Class-partitioned staged rounds-of-independent-sets elimination
    (all o_v and o_n modes; graphs beyond the int32 key-packing bound use
    two-key sorts).

    TPU-first redesign of the reference's sequential loop
    (`preconditioner.cc:713-787`) built around measured TPU primitive
    costs (tools/probe_access.py, on-chip): arbitrary gathers ~9.2
    ns/element, scatters ~8.5, a 3-array sort ~4.8, segmented scans ~1.5.
    Round-dynamics simulation (tools/sim_counts.py) shows the Luby
    selection phase — the round body's dominant cost — only ever needs
    edges whose endpoints are BOTH pending (non-candidate neighbors
    contribute pack=+inf and never block), and that both-pending count
    collapses ~quadratically as pending drains: at BA(20k), t=n/2 the
    whole run touches 174k both-pending slot-rounds vs 5M pool
    slot-rounds. The kernel therefore keeps every slot CLASSIFIED and the
    pool partitioned so each phase runs on the smallest prefix that can
    affect it:

    * **Canonical half-edge pool.** The symmetric directed input folds to
      one slot per undirected edge at entry (unfolded at exit).
    * **Slot classes, maintained not recomputed.** cls 1 = both endpoints
      pending, 2 = exactly one (stored pending-endpoint-first), 3 =
      retired/dead. A class can only change when the slot is rewritten:
      an eliminated vertex's edges are all touched, so untouched slots
      keep their class — emissions are classified once at write-back.
    * **One sort per round, three jobs.** The per-round sort key is
      rho = owner*(n+1)+other for touched slots and a beyond-rho class
      code for untouched ones, so a single sort (a) groups each
      eliminated column's duplicate copies into adjacent runs (the
      `compressColumn` merge, preconditioner.cc:641-676), (b) packs
      [touched][cls1][cls2][cls3] so the next round's selection prefix
      and es/er split are positional, and (c) replaces the old
      stage-transition packing sort — a stage exits by slicing.
    * **cls1-range selection with a level ladder.** Luby blocking only
      flows through candidate-candidate (cls1) edges, and a small
      end-of-round prefix class-pack keeps cls1 confined to two ranges
      ([0, c1p) of the packed prefix plus the untouched tail block
      [e_t, pos1)). Each round's Luby sub-rounds (strict (degree, pos)
      minima, packed gather + scatter-min per sub-round) run on the
      smallest static level (A1, A2) covering those ranges, picked by
      one lax.switch — cls1 mass collapses quadratically as pending
      drains, so selection cost collapses with it. A round no level
      covers falls back to the full prefix (exact, never a cap).
    * **Ranged es/er.** A slot's receiver can only be eliminated when
      the slot is cls1 (cls2 stores its pending endpoint first and elim
      is a subset of pending), so the r-side gather runs only on the two
      cls1 ranges; the s-side gather covers the prefix.
    * **Incremental degrees.** Degrees (duplicate copies counted, like
      the reference's lazily-decremented PQ) are carried and updated from
      the touched prefix only: each touched copy decrements both
      endpoints, each emission increments its two.
    * **Touched-prefix budgeting** (`compact=True`) and **staged pool
      prefixes** as before: the round's eliminated set is trimmed so its
      touched edges fit e_t, and whole rounds re-run on statically
      smaller prefixes as the active bound drains.
    * **Suffix-CDF sampling in run order.** Unchanged semantics: the
      reference's sampler (`preconditioner.cc:740-776`) is unbiased for
      any fixed column order; o_n="asc"/"desc" add one prefix-only sort
      of merged run tails; partner samplers "independent" (merge-based
      rank lookup, the reference's exact distribution) and "race"
      (exponential-race, correlated within a column — opt-in).
    """
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    B = n + 1
    # (owner, other) pairs pack into one int32 sort key only while
    # n*(n+2) + 4 class codes fit; larger graphs use two-key sorts.
    packed = n * (n + 2) + 4 < _INT_MAX
    if sampler not in ("independent", "race"):
        raise ValueError(f"unknown sampler {sampler!r}")
    if o_v == "coarsen":
        o_n = "random"  # CoarseningPreconditioner forces o_n (cc:830-833)

    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f1 = jnp.zeros((1,), bool)
    zero_w = jnp.zeros((), wdtype)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # ---- canonical half-edge pool ----------------------------------------
    # The symmetric directed input (both copies present; the reference
    # asserts symmetry, factorizers.cc:19-22) folds to one canonical copy
    # per undirected edge: every per-edge cost below is paid on half the
    # slots and mirror-shift write-back machinery disappears. Live directed
    # copies <= e_cap implies pairs <= e_cap // 2, so the fold never drops
    # a live edge; the unfold at exit re-emits both copies.
    e_half = max(e_cap // 2, 1)
    fkey = jnp.where((senders < n) & (senders < receivers),
                     jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32))
    if packed:
        fkap = senders * B + receivers
        _, fkap, fw = jax.lax.sort((fkey, fkap, weights), num_keys=1)
        sh = fkap[:e_half] // B
        rh = fkap[:e_half] - sh * B
    else:
        _, fs, fr, fw = jax.lax.sort(
            (fkey, senders, receivers, weights), num_keys=1)
        sh, rh = fs[:e_half], fr[:e_half]
    wh = fw[:e_half]
    good = sh < rh
    sh = jnp.where(good, sh, n)
    rh = jnp.where(good, rh, n)
    wh = jnp.where(good, wh, zero_w)

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))

    if o_v == "random":
        pending = pos < t  # first t of the permutation (cc:588-613)
    else:
        pending = jnp.ones((n,), bool)

    # ---- initial classes + orientation + entry class sort ----------------
    pend_pad = jnp.concatenate([pending, f1])
    psc = pend_pad[sh]
    prc = pend_pad[rh]
    live0 = sh < n
    cls0 = jnp.where(live0 & psc & prc, 1,
                     jnp.where(live0 & (psc | prc), 2, 3)).astype(jnp.int32)
    flip0 = (cls0 == 2) & prc  # cls2 stores its pending endpoint first
    s0 = jnp.where(flip0, rh, sh)
    r0 = jnp.where(flip0, sh, rh)
    if packed:
        kap0 = s0 * B + r0
        cls_arr, kap0, w_full = jax.lax.sort((cls0, kap0, wh), num_keys=1)
        s_full = kap0 // B
        r_full = kap0 - s_full * B
    else:
        cls_arr, s_full, r_full, w_full = jax.lax.sort(
            (cls0, s0, r0, wh), num_keys=1)

    # ---- initial degrees (full pool, once; updated incrementally) --------
    livef = s_full < n
    deg0 = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.concatenate([s_full, r_full])].add(
        jnp.concatenate([livef, livef]).astype(jnp.int32))[:n]

    n1_0 = jnp.sum((cls_arr == 1).astype(jnp.int32))
    n2_0 = jnp.sum((cls_arr == 2).astype(jnp.int32))

    def make_stage(P: int, e_t: int, levels: Tuple[Tuple[int, int], ...],
                   et_levels: Tuple[int, ...], next_P, sub: int):
        do_compact = e_t < P

        def cond(st):
            go = ((st["npend"] > 0) & (st["removed"] < t)
                  & jnp.logical_not(st["overflow"]))
            if next_P is not None:
                go = go & (st["bound"] > next_P)
            return go

        def body(st):
            s, r, w = st["senders"], st["receivers"], st["weights"]
            cls = st["cls"]
            pending = st["pending"]
            deg = st["deg"]
            if _RECOMPUTE_DEG:  # debug: full per-round recompute (prefix)
                live_d = s < n
                deg = jnp.zeros((n + 1,), jnp.int32).at[
                    jnp.concatenate([s, r])].add(jnp.concatenate(
                        [live_d, live_d]).astype(jnp.int32))[:n]
            rkey = jax.random.fold_in(st["key"], st["rnd"])

            if o_v == "random" and schedule == "luby":
                prio = pos
            else:
                dclamp = max(1, (_INT_MAX - n) // (n + 1) - 1)
                prio = jnp.minimum(deg, dclamp) * (n + 1) + pos

            # ---- Luby selection -----------------------------------------
            # Blocking only ever flows through candidate-candidate (cls1)
            # edges (a non-candidate neighbor contributes pack=+inf), so
            # selection is exact over ANY slot superset of the cls1 set.
            # The end-of-round prefix class-pack keeps cls1 confined to
            # two ranges [0, c1p) and [r2s, r2e) whose sizes collapse
            # quadratically as pending drains; each round picks the
            # smallest static level (A1, A2) covering them via one
            # lax.switch. When no level covers (dense hubby graphs can
            # genuinely concentrate both-pending mass), the fallback runs
            # on the full prefix — the restriction is a pure
            # optimization, never a correctness cap.
            c1p, r2s, r2e = st["c1p"], st["r2s"], st["r2e"]

            def sel_ranges(A1, A2):
                def run():
                    if A2 > 0:
                        start2 = jnp.clip(r2s, 0, max(P - A2, 0))
                        s2 = jax.lax.dynamic_slice(s, (start2,), (A2,))
                        r2 = jax.lax.dynamic_slice(r, (start2,), (A2,))
                        sS = jnp.concatenate([s[:A1], s2])
                        rS = jnp.concatenate([r[:A1], r2])
                    else:
                        sS, rS = s[:A1], r[:A1]
                    liveS = sS < n
                    srS = jnp.concatenate([sS, rS])
                    rsS = jnp.concatenate([rS, sS])
                    live2S = jnp.concatenate([liveS, liveS])
                    elim = jnp.zeros((n,), bool)
                    cand = pending
                    sel = jnp.zeros((n,), bool)
                    for _ in range(max(1, sub)):
                        pack = jnp.where(sel, -1,
                                         jnp.where(cand, prio, big))
                        pack_pad = jnp.concatenate(
                            [pack, jnp.full((1,), big, jnp.int32)])
                        nbr2 = jnp.where(live2S, pack_pad[rsS], big)
                        nmin = jnp.full((n + 1,), big, jnp.int32).at[
                            srS].min(nbr2)[:n]
                        sel = cand & (prio < nmin) & (nmin >= 0)
                        elim = elim | sel
                        cand = cand & jnp.logical_not(sel) & (nmin >= 0)
                    return elim
                return run

            if levels:
                fits = [(c1p <= A1) & ((r2e - r2s) <= A2)
                        for (A1, A2) in levels]  # ascending, nested
                lvl = sum(jnp.logical_not(f).astype(jnp.int32)
                          for f in fits)
                branches = ([sel_ranges(A1, A2) for (A1, A2) in levels]
                            + [sel_ranges(P, 0)])
                elim = jax.lax.switch(lvl, branches)
            else:
                lvl = None
                elim = sel_ranges(P, 0)()
            overflow = st["overflow"]

            if o_v != "random":
                # cap this round at the remaining budget, lowest priority
                # first — the PQ pop order
                remaining = t - st["removed"]
                sorted_prio = jnp.sort(jnp.where(elim, prio, big))
                kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
                elim = elim & (prio <= kth) & (remaining > 0)

            if do_compact:
                # trim the set (cheapest prio first) so its touched edges
                # — exactly sum deg(i) over the set — fit the prefix. The
                # n-sized sort only runs when the set actually exceeds
                # the budget (early rounds); later rounds select small
                # sets and skip it via lax.cond.
                total_cost = jnp.sum(jnp.where(elim, deg, 0))

                def run_trim():
                    prs, nodes = jax.lax.sort(
                        (jnp.where(elim, prio, big), iota_n), num_keys=1)
                    cost = jnp.where(prs < big, deg[nodes], 0)
                    fits = (jnp.cumsum(cost) <= e_t) & (prs < big)
                    trimmed = jnp.zeros((n,), bool).at[nodes].max(fits)
                    over = (prs[0] < big) & jnp.logical_not(fits[0])
                    return trimmed, over

                def no_trim():
                    return elim, jnp.zeros((), bool)

                elim, trim_over = jax.lax.cond(total_cost > e_t,
                                               run_trim, no_trim)
                overflow = overflow | trim_over

            b_count = jnp.sum(elim.astype(jnp.int32))
            elim_pad = jnp.concatenate([elim, f1])

            # ---- es/er: the r-side of a slot can only be eliminated when
            # the slot is cls1 (cls2 stores its pending endpoint first and
            # elim is a subset of pending), so the receiver-side gather is
            # needed only on the two cls1 ranges; the sender-side gather
            # covers the whole prefix. Same level index as selection; the
            # fallback is the full two-sided gather. ----------------------
            live_p = s < n

            def esr_ranges(A1, A2):
                def run():
                    es_ = elim_pad[s] & live_p
                    er1 = elim_pad[r[:A1]] & live_p[:A1]
                    er_ = jnp.concatenate(
                        [er1, jnp.zeros((P - A1,), bool)])
                    if A2 > 0:
                        start2 = jnp.clip(r2s, 0, max(P - A2, 0))
                        r2 = jax.lax.dynamic_slice(r, (start2,), (A2,))
                        l2 = jax.lax.dynamic_slice(live_p, (start2,),
                                                   (A2,))
                        er_ = jax.lax.dynamic_update_slice(
                            er_, elim_pad[r2] & l2, (start2,))
                    return es_, er_
                return run

            def esr_full():
                sr2 = jnp.concatenate([s, r])
                e2 = elim_pad[sr2] & jnp.concatenate([live_p, live_p])
                return e2[:P], e2[P:]

            if levels:
                es, er = jax.lax.switch(
                    lvl, [esr_ranges(A1, A2) for (A1, A2) in levels]
                    + [esr_full])
            else:
                es, er = esr_full()

            # ---- the one pool sort: touched edges grouped by column,
            # untouched packed [cls1][cls2][cls3] by beyond-rho codes ------
            if packed:
                base = n * (n + 2) + 1  # > any rho = owner*B + other
                rho = jnp.where(es, s * B + r,
                                jnp.where(er, r * B + s, base - 1 + cls))
                kap = s * B + r
                rho, kap, w = jax.lax.sort((rho, kap, w), num_keys=1)
            else:
                ow_a = jnp.where(es, s, jnp.where(er, r, n + cls))
                ot_a = jnp.where(es, r, jnp.where(er, s, 0))
                ow_a, ot_a, sq, rq, w = jax.lax.sort(
                    (ow_a, ot_a, s, r, w), num_keys=2)

            pending_next = pending & jnp.logical_not(elim)

            # ---- post-sort pipeline, sized by a touched-count ladder -----
            # Everything below operates on the touched prefix only; its
            # exact size is sum(deg over elim) (Luby independence: each
            # touched slot has exactly one eliminated endpoint), usually
            # far below the static stage budget e_t in late rounds — the
            # switch picks the smallest static prefix that covers it.
            def pipeline(ET):
              def run():
                if packed:
                    kap_t = kap[ET:]
                    ks_t = kap_t // B
                    kr_t = kap_t - ks_t * B
                    cls_tail = rho[ET:] - (base - 1)  # all untouched
                    rho_p, kap_p, w_p = rho[:ET], kap[:ET], w[:ET]
                    touched = rho_p < base
                    owner = jnp.where(touched, rho_p // B, n)
                    other = jnp.where(touched, rho_p - owner * B, n)
                    ks = kap_p // B
                    kr = kap_p - ks * B
                    same = rho_p[1:] == rho_p[:-1]
                else:
                    ks_t, kr_t = sq[ET:], rq[ET:]
                    cls_tail = ow_a[ET:] - n
                    w_p = w[:ET]
                    touched = ow_a[:ET] < n
                    owner = jnp.where(touched, ow_a[:ET], n)
                    other = jnp.where(touched, ot_a[:ET], n)
                    ks, kr = sq[:ET], rq[:ET]
                    same = ((owner[1:] == owner[:-1])
                            & (other[1:] == other[:-1])) & touched[1:]
                w_t = w[ET:]

                # degree decrement indices: every touched copy's original
                # endpoints, captured before the o_n tail sort pads them
                dec_s = jnp.where(touched, ks, n)
                dec_r = jnp.where(touched, kr, n)

                # ---- runs: duplicate copies of one pair share a key ------
                head_run = jnp.concatenate(
                    [t1, jnp.logical_not(same)]) & touched
                is_tail = jnp.concatenate(
                    [jnp.logical_not(same), t1]) & touched
                run_sum = _segmented_cumsum(w_p, head_run)
                v = jnp.where(is_tail, run_sum, zero_w)  # column weight

                if o_n in ("asc", "desc"):
                    # order each eliminated column by weight before the
                    # suffix-CDF pass (compressColumn's sort, cc:295-307)
                    pad_mask = touched & jnp.logical_not(is_tail)
                    ks2 = jnp.where(pad_mask, n, ks)
                    kr2 = jnp.where(pad_mask, n, kr)
                    w_p2 = jnp.where(pad_mask, zero_w, w_p)
                    own_t = jnp.where(is_tail, owner, big)
                    o_key = v.astype(jnp.float32)
                    o_key = jnp.where(is_tail,
                                      o_key if o_n == "asc" else -o_key,
                                      jnp.asarray(jnp.inf, jnp.float32))
                    own_t, _, other2, v2, ks, kr, w_p = jax.lax.sort(
                        (own_t, o_key, other, v, ks2, kr2, w_p2),
                        num_keys=2)
                    other, v = other2, v2
                    owner = jnp.where(own_t < big, own_t, n)
                    touched = own_t < big
                    is_tail = touched

                # ---- suffix-CDF sampling over run tails per column -------
                hs = jnp.concatenate([t1, owner[1:] != owner[:-1]])
                cum = _segmented_cumsum(v, hs)
                csum = _segmented_maxscan_rev(cum, hs)
                suffix = csum - cum

                if o_v == "coarsen":
                    # one partner per whole column ~ v_k/csum; every other
                    # neighbor rewires onto it with harmonic weights
                    # (preconditioner.cc:866-912)
                    eu = jnp.maximum(
                        jax.random.uniform(rkey, (ET,), dtype=jnp.float32),
                        jnp.asarray(1e-12, jnp.float32))
                    race_x = jnp.where(
                        is_tail, -jnp.log(eu) / jnp.maximum(
                            v.astype(jnp.float32), 1e-30),
                        jnp.asarray(jnp.inf, jnp.float32))
                    _, race_o, race_v = _segmented_race_rev(
                        race_x, other, v, hs)
                    partner = _segmented_headscan(
                        jnp.where(hs, race_o, 0), hs)
                    w_k = _segmented_headscan(
                        jnp.where(hs, race_v, zero_w), hs)
                    emit = is_tail & (csum > 0) & (other != partner)
                    denom = jnp.where(v + w_k > 0, v + w_k, 1.0)
                    wnew = jnp.where(emit, v * w_k / denom, zero_w)
                elif sampler == "race":
                    eu = jnp.maximum(
                        jax.random.uniform(rkey, (ET,), dtype=jnp.float32),
                        jnp.asarray(1e-12, jnp.float32))
                    race_x = jnp.where(
                        is_tail, -jnp.log(eu) / jnp.maximum(
                            v.astype(jnp.float32), 1e-30),
                        jnp.asarray(jnp.inf, jnp.float32))
                    _, race_o, _ = _segmented_race_rev(race_x, other, v, hs)
                    partner = jnp.concatenate(
                        [race_o[1:], jnp.full((1,), n, jnp.int32)])
                    emit = is_tail & (suffix > 0)
                    csafe = jnp.where(csum > 0, csum, 1.0)
                    wnew = jnp.where(emit, v * suffix / csafe, zero_w)
                else:
                    # independent per-neighbor inverse-CDF draws, located
                    # by one merge-based rank lookup (first cum > rv)
                    u = jax.random.uniform(rkey, (ET,),
                                           dtype=jnp.float32).astype(wdtype)
                    rv = cum + u * suffix
                    rv = jnp.minimum(rv, jnp.nextafter(
                        csum, jnp.zeros_like(csum)))
                    emit = is_tail & (suffix > 0)
                    q = _last_le_lookup(
                        (owner, cum),
                        (jnp.where(emit, owner, n + 1),
                         jnp.where(emit, rv, zero_w))) + 1
                    q = jnp.clip(q, 0, ET - 1)
                    partner = other[q]
                    csafe = jnp.where(csum > 0, csum, 1.0)
                    wnew = jnp.where(emit, v * suffix / csafe, zero_w)

                # ---- write-back: each emitting run tail overwrites its
                # own slot; other touched slots retire to padding ----------
                can_s = jnp.minimum(other, partner)
                can_r = jnp.maximum(other, partner)
                s_new = jnp.where(touched, jnp.where(emit, can_s, n), ks)
                r_new = jnp.where(touched, jnp.where(emit, can_r, n), kr)
                w_new = jnp.where(touched,
                                  jnp.where(emit, wnew, zero_w), w_p)

                # ---- classify + orient the prefix, update degrees --------
                pnp = jnp.concatenate([pending_next, f1])
                live_new = s_new < n
                psn = pnp[s_new]
                prn = pnp[r_new]
                cls_p = jnp.where(live_new & psn & prn, 1,
                                  jnp.where(live_new & (psn | prn), 2, 3)
                                  ).astype(jnp.int32)
                flip = (cls_p == 2) & prn
                s_fin = jnp.where(flip, r_new, s_new)
                r_fin = jnp.where(flip, s_new, r_new)

                one_m = jnp.ones((ET,), jnp.int32)
                # increments: only touched slots hold NEW edges
                # (emissions); untouched pass-through slots in the prefix
                # were never decremented and must not be re-counted
                inc = touched & live_new
                didx = jnp.concatenate([
                    dec_s, dec_r,
                    jnp.where(inc, s_new, n),
                    jnp.where(inc, r_new, n)])
                dval = jnp.concatenate([-one_m, -one_m, one_m, one_m])
                deg_next = jnp.concatenate(
                    [deg, jnp.zeros((1,), jnp.int32)]).at[didx].add(
                        dval)[:n]

                # ---- prefix class-pack + exact cls1-range state ----------
                # One ET-sized sort groups the rewritten prefix [cls1]
                # [cls2][cls3], so the next round's selection and es/er
                # read cls1 from two tight ranges: [0, c1p) (prefix cls1)
                # and [ET, pos1) (untouched-tail cls1 the pool sort
                # packed right behind the touched block). Degree updates
                # above used the pre-pack indices (order-independent
                # scatters).
                if levels:
                    cls_s, s_out, r_out, w_out = jax.lax.sort(
                        (cls_p, s_fin, r_fin, w_new), num_keys=1)
                    cls_next = jnp.concatenate([cls_s, cls_tail])
                    c1p_new = jnp.sum((cls_s == 1).astype(jnp.int32))
                    r2s_new = jnp.asarray(ET, jnp.int32)
                else:
                    s_out, r_out, w_out = s_fin, r_fin, w_new
                    cls_next = jnp.concatenate([cls_p, cls_tail])
                    c1p_new = jnp.zeros((), jnp.int32)
                    r2s_new = jnp.zeros((), jnp.int32)

                # exact last-position bounds (end positions, index + 1):
                # pos1 over cls1 slots bounds the tail range; bound over
                # any active (cls <= 2) slot drives stage exit
                iota_p = jnp.arange(P, dtype=jnp.int32)
                pos1 = jnp.max(jnp.where(cls_next == 1, iota_p, -1)) + 1
                bound = jnp.max(jnp.where(cls_next <= 2, iota_p, -1)) + 1
                r2e_new = jnp.maximum(pos1, r2s_new)
                return (jnp.concatenate([s_out, ks_t]),
                        jnp.concatenate([r_out, kr_t]),
                        jnp.concatenate([w_out, w_t]),
                        cls_next, deg_next, c1p_new, r2s_new, r2e_new,
                        bound)
              return run

            if len(et_levels) > 1:
                # exact touched count: sum of deg over the (independent)
                # eliminated set — each touched slot has exactly one
                # eliminated endpoint
                tc = jnp.sum(jnp.where(elim, deg, 0))
                et_fits = [tc <= E for E in et_levels]  # ascending, nested
                et_lvl = sum(jnp.logical_not(f).astype(jnp.int32)
                             for f in et_fits[:-1])
                (s_next, r_next, w_next, cls_next, deg_next, c1p_new,
                 r2s_new, r2e_new, bound) = jax.lax.switch(
                    et_lvl, [pipeline(E) for E in et_levels])
            else:
                (s_next, r_next, w_next, cls_next, deg_next, c1p_new,
                 r2s_new, r2e_new, bound) = pipeline(et_levels[0])()

            return dict(
                senders=s_next,
                receivers=r_next,
                weights=w_next,
                cls=cls_next,
                pending=pending_next,
                deg=deg_next,
                removed=st["removed"] + b_count,
                npend=jnp.sum(pending_next.astype(jnp.int32)),
                key=st["key"],
                rnd=st["rnd"] + 1,
                overflow=overflow,
                c1p=c1p_new,
                r2s=r2s_new,
                r2e=r2e_new,
                bound=bound,
            )

        return cond, body

    stages = _stage_sizes(e_half) if compact else (e_half,)

    def stage_params(si, P, is_last):
        if compact:
            # touched budget: tight (P/6) while stages are shrinking —
            # smaller prefixes for every per-round op beat the extra
            # rounds — but generous (P/2) at the final stage, where the
            # endgame eliminates hub columns that must fit in one round
            if is_last:
                frac = _ET_FRAC_LAST
            else:
                fr = _ET_FRACS
                frac = fr[min(si, len(fr) - 1)]
            e_t = min(P, max(((P // frac + 1023) // 1024) * 1024, 1024))
        else:
            e_t = P
        if o_v == "random" and compact and e_t < P:
            # cls1 coverage levels (A1 over the packed prefix, A2 over
            # the tail range): round-0 both-pending mass is (t/n)^2 of
            # the pool (~25% at the t=n/2 production shape) and
            # collapses quadratically, so most rounds fit a small level;
            # a round no level covers falls back to full-prefix
            # selection via the in-body lax.switch
            b_cap = min(P, ((int(_B_FRAC * P) + 1023) // 1024) * 1024)

            def rnd1024(x, lo=2048):
                return max(lo, ((x + 1023) // 1024) * 1024)

            levels = []
            for d in _SEL_LADDER:  # ascending sizes => fits are nested
                lv = (min(e_t, rnd1024(e_t // d)),
                      min(b_cap, rnd1024(b_cap // d)))
                if lv not in levels:
                    levels.append(lv)
        else:
            levels = []
        if e_t < P:
            # touched-count ladder for the post-sort pipeline: late
            # rounds (the hub endgame especially) touch far fewer slots
            # than the static budget
            et_levels = []
            for d in _ET_LADDER:
                v_ = min(e_t, max(4096, ((e_t // d + 1023) // 1024) * 1024))
                if v_ not in et_levels:
                    et_levels.append(v_)
        else:
            et_levels = [e_t]
        return e_t, tuple(levels), tuple(et_levels)

    split0 = stage_params(0, stages[0], len(stages) == 1)[0]
    c1p0 = jnp.minimum(n1_0, jnp.asarray(split0, jnp.int32))
    carry = dict(
        pending=pending, deg=deg0,
        removed=jnp.zeros((), jnp.int32),
        npend=jnp.sum(pending.astype(jnp.int32)),
        key=key, rnd=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), bool),
        # entry layout is globally class-sorted: cls1 = [0, n1_0) =
        # [0, c1p0) u [c1p0, n1_0) — already in two-range form
        c1p=c1p0,
        r2s=c1p0,
        r2e=n1_0,
        bound=n1_0 + n2_0,
    )

    for si, P in enumerate(stages):
        next_P = stages[si + 1] if si + 1 < len(stages) else None
        e_t, levels, et_levels = stage_params(si, P, next_P is None)
        sub = (subiters if isinstance(subiters, int)
               else subiters[min(si, len(subiters) - 1)])
        st = dict(senders=s_full[:P], receivers=r_full[:P],
                  weights=w_full[:P], cls=cls_arr[:P], **carry)
        cond, body = make_stage(P, e_t, levels, et_levels, next_P, sub)
        out = jax.lax.while_loop(cond, body, st)
        carry = {k: out[k] for k in carry}
        # stage exit is a pure slice: the per-round sort already packs
        # [touched][cls1][cls2][cls3], and the bound gate guarantees all
        # active slots fit the next prefix
        s_full = jnp.concatenate([out["senders"], s_full[P:]])
        r_full = jnp.concatenate([out["receivers"], r_full[P:]])
        w_full = jnp.concatenate([out["weights"], w_full[P:]])
        cls_arr = jnp.concatenate([out["cls"], cls_arr[P:]])

    # ---- unfold the canonical pool back to symmetric directed COO --------
    pad = max(0, e_cap - 2 * e_half)  # 1 when e_cap is odd
    pad_s = jnp.full((pad,), n, jnp.int32)
    pad_w = jnp.zeros((pad,), wdtype)
    s_dir = jnp.concatenate([s_full, r_full, pad_s])[:e_cap]
    r_dir = jnp.concatenate([r_full, s_full, pad_s])[:e_cap]
    w_dir = jnp.concatenate([w_full, w_full, pad_w])[:e_cap]
    return (s_dir, r_dir, w_dir, carry["removed"], carry["rnd"],
            carry["overflow"])


@functools.partial(
    jax.jit,
    static_argnames=("o_v", "o_n", "schedule", "b_cap", "d_cap", "sampler",
                     "compact", "subiters"))
def eliminate(g: Graph, key: jax.Array, num_remove,
              o_v: str = "random", o_n: str = "random",
              schedule: str = "fast",
              b_cap: Optional[int] = None, d_cap: Optional[int] = None,
              sampler: str = "independent", compact: bool = True,
              subiters: int = 3):
    """Jittable core: returns (schur_graph, removed_count, overflow_flag).

    `b_cap`/`d_cap` are accepted for backward compatibility and ignored.
    `overflow` is True only when `compact` round-budgeting could not fit a
    single vertex's column into the static prefix (re-run with
    compact=False, which has no caps).

    `sampler`: "independent" (default) draws each neighbor's clique
    partner independently — the reference's exact distribution. "race" is
    ~8 ms/round cheaper but its partner draws are positively correlated
    within a column, which inflates the output's top singular value by
    ~20% on BA graphs — opt in ONLY for throughput-bound augmentation
    where spectral fidelity does not matter (never for spectral analysis
    or parity work).
    """
    del b_cap, d_cap
    if schedule not in _VALID_SCHEDULE:
        raise ValueError(
            f"schedule must be one of {_VALID_SCHEDULE}, got {schedule!r}")
    gg = G.remove_self_loops(g)
    gg = G.coalesce_fast(gg)
    gg = G.drop_zero_weight(gg)
    # the reference never eliminates the last vertex
    # (`while(it <= t && it < n)`, preconditioner.cc:723)
    t = jnp.minimum(jnp.asarray(num_remove, jnp.int32), g.num_nodes - 1)
    n = g.num_nodes
    s, r, w, removed, _rounds, overflow = _eliminate_impl_fast(
        gg.senders, gg.receivers, gg.weights, key, t,
        n=n, o_v=o_v, o_n=o_n, schedule=schedule, sampler=sampler,
        compact=compact, subiters=subiters)
    out = Graph(senders=s, receivers=r, weights=w, num_nodes=g.num_nodes,
                x=g.x, node_mask=g.node_mask)
    # the last write-back leaves uncoalesced emissions
    out = G.drop_zero_weight(G.coalesce_fast(out))
    return out, removed, overflow


@functools.partial(
    jax.jit,
    static_argnames=("o_v", "o_n", "schedule", "sampler", "compact",
                     "subiters"))
def eliminate_pair(g: Graph, key: jax.Array, num_remove,
                   o_v: str = "random", o_n: str = "random",
                   schedule: str = "fast", sampler: str = "independent",
                   compact: bool = True, subiters: int = 3):
    """Two INDEPENDENT rLap views of the same graph in one jitted call —
    the augmentation pattern of every GCL epoch (both views drawn from the
    same input, `node_shared.py:273-281`, `CCA-SSG/main.py:96-98`).

    Shares across the views exactly what is shareable without touching
    their distribution: the entry canonicalization (self-loop removal,
    coalesce, zero-drop — one sort over the full edge capacity), the
    output-coalesce infrastructure, and one dispatch/compile. The round
    loops themselves run per view with independent keys: the per-round
    costs are element-priced gathers/scatters/sorts that do not shrink by
    batching (vmap-batched views measured 38% SLOWER than two calls,
    BENCH_EXTRA.md), so each view's stream is kept byte-identical to a
    single `eliminate` call with the same subkey — parity is asserted
    exactly in tests, not statistically.

    Returns ((g1, removed1, overflow1), (g2, removed2, overflow2)).
    """
    if schedule not in _VALID_SCHEDULE:
        raise ValueError(
            f"schedule must be one of {_VALID_SCHEDULE}, got {schedule!r}")
    gg = G.remove_self_loops(g)
    gg = G.coalesce_fast(gg)
    gg = G.drop_zero_weight(gg)
    t = jnp.minimum(jnp.asarray(num_remove, jnp.int32), g.num_nodes - 1)
    n = g.num_nodes
    k1, k2 = jax.random.split(key)
    outs = []
    for kv in (k1, k2):
        s, r, w, removed, _rounds, overflow = _eliminate_impl_fast(
            gg.senders, gg.receivers, gg.weights, kv, t,
            n=n, o_v=o_v, o_n=o_n, schedule=schedule, sampler=sampler,
            compact=compact, subiters=subiters)
        out = Graph(senders=s, receivers=r, weights=w,
                    num_nodes=g.num_nodes, x=g.x, node_mask=g.node_mask)
        out = G.drop_zero_weight(G.coalesce_fast(out))
        outs.append((out, removed, overflow))
    return tuple(outs)


def approximate_cholesky(
    g: Graph,
    key: jax.Array,
    num_remove: int,
    o_v: str = "random",
    o_n: str = "random",
    d_cap: Optional[int] = None,
    b_cap: Optional[int] = None,
    max_escalations: int = 1,
    schedule: str = "fast",
) -> Graph:
    """Compute a randomized Schur complement of `g` after removing
    `num_remove` vertices — API parity with `rlap.ops.approximate_cholesky`
    (reference `rlap/ops.py:7-58`), graph-in / graph-out.

    `d_cap`/`b_cap` are accepted for backward compatibility and ignored.
    If compact round-budgeting overflows (a single column larger than the
    static per-round prefix — star-like graphs), one escalation re-runs
    with budgeting off, which has no caps.
    """
    del d_cap, b_cap
    if o_v not in _VALID_O_V:
        raise ValueError(f"o_v must be one of {_VALID_O_V}, got {o_v!r}")
    if o_n not in _VALID_O_N:
        raise ValueError(f"o_n must be one of {_VALID_O_N}, got {o_n!r}")
    num_remove = int(num_remove)
    if num_remove <= 0:
        return G.coalesce(G.drop_zero_weight(G.remove_self_loops(g)))
    out, _removed, overflow = eliminate(
        g, key, num_remove, o_v=o_v, o_n=o_n, schedule=schedule)
    if max_escalations > 0 and bool(overflow):
        out, _removed, _ = eliminate(
            g, key, num_remove, o_v=o_v, o_n=o_n, schedule=schedule,
            compact=False)
    return out
