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
    """Staged rounds-of-independent-sets elimination (all o_v and o_n modes;
    graphs beyond the int32 key-packing bound use two-key sorts).

    TPU-first redesign of the reference's sequential loop
    (`preconditioner.cc:713-787`) built around measured TPU primitive costs
    (tools/profile_rlap3.py): XLA 1D gathers are the slow primitive (~2 ms
    per e_cap pass), sorts ~3 ms, segmented scans and scatter-min ~1 ms.
    The round body therefore uses ONE full-pool sort, a handful of
    scans/scatters, and zero per-element binary searches:

    * **Canonical half-edge pool.** The symmetric directed input folds to
      one u < v slot per undirected edge at entry (unfolded at exit), so
      every per-edge pass below runs on half the slots and the mirror-copy
      bookkeeping disappears.
    * **Column grouping.** Every edge touching an eliminated vertex i is
      sorted by the key rho = i*(n+1) + other; duplicate copies of one
      pair land in ONE adjacent run whose total is v_ij — the
      `compressColumn` duplicate merge (preconditioner.cc:641-676) for
      free. Each emitting run tail overwrites its own slot with the
      sampled clique edge (j, k), re-canonicalized elementwise — the
      reference's storage reuse (preconditioner.cc:761-772). Untouched
      edges ride behind the touched block (key = +inf) and pass through
      unchanged.
    * **Touched-prefix compaction** (`compact=True`): each round's
      independent set is budgeted so that its touched edges (exactly
      sum deg over the set) fit in a static prefix; all per-edge heavy ops
      (scans, sampling, the merge lookup) run on that prefix only. A set
      whose cheapest vertex alone exceeds the budget raises the overflow
      flag (callers escalate by re-running with compact=False).
    * **Staged active-set pools.** Rounds only read edges with a pending
      endpoint; as pending drains, whole rounds re-run on statically
      smaller pool prefixes (see the staged-schedule note in the body),
      which is where most of the round cost — the per-element-priced
      gathers/scatters — shrinks.
    * **Suffix-CDF sampling in run order.** The reference's sampler
      (`preconditioner.cc:740-776`) is unbiased for ANY fixed column
      order: for a pair (a, b) with a earlier, only a emits toward b, with
      probability v_b/S_a and weight v_a*S_a/csum, so E[w(a,b)] =
      v_a*v_b/csum by the f(1-f) telescoping. o_n="asc"/"desc" shape only
      the variance: they ride this same staged kernel via one extra
      prefix-only sort of the merged run tails by (owner, +-v). Two
      partner samplers:
      - "independent" (default): per-neighbor independent inverse-CDF
        draws located by a merge-based rank lookup (`_last_le_lookup`) —
        matches the reference's distribution exactly;
      - "race": one reversed segmented min-scan of Exp(1)/v_m keys. Exact
        per-neighbor marginals but partners within a column are positively
        correlated (they share race draws), which inflates the top
        singular value of the output by ~20% on BA graphs. ~8 ms/round
        cheaper; opt-in for throughput-bound augmentation.
    * **Packed Luby selection.** Each of `subiters` sub-rounds grows the
      independent set (strict (degree, pos) minima over remaining
      candidates) with ONE gather + ONE scatter-min: the packed per-node
      code -1 = "selected" propagates blocking and the candidate minimum
      in the same reduction. Isolated vertices keep nmin = +inf and pop
      immediately, like the reference PQ popping degree-0 columns.
      Sub-rounds cut the round count ~3x (tools/sim_rounds.py).
    """
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    B = n + 1
    # (owner, other) pairs pack into one int32 sort key only while
    # n*(n+2) < 2^31; larger graphs use two-key sorts with the raw ids.
    packed = n * (n + 2) < _INT_MAX
    if sampler not in ("independent", "race"):
        raise ValueError(f"unknown sampler {sampler!r}")
    if o_v == "coarsen":
        o_n = "random"  # CoarseningPreconditioner forces o_n (cc:830-833)

    # ---- canonical half-edge pool ----------------------------------------
    # The symmetric directed input (both copies present; the reference
    # asserts symmetry, factorizers.cc:19-22) folds to one canonical (u < v)
    # copy per undirected edge: every per-edge cost below (sorts, scans, the
    # merge lookup, the es/er lookups) is paid on half the slots, and the
    # mirror-shift write-back machinery disappears — a run tail emits its
    # sampled clique edge once, re-canonicalized elementwise. Live directed
    # copies <= e_cap implies pairs <= e_cap // 2, so the fold never drops a
    # live edge; the unfold at exit re-emits both copies.
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
    # the slice's tail may hold (v, u) reverse copies that sorted behind the
    # canonical block; they decode with sh >= rh — blank them to padding
    # (their canonical twins are already in the block).
    good = sh < rh
    sh = jnp.where(good, sh, n)
    rh = jnp.where(good, rh, n)
    wh = jnp.where(good, wh, jnp.zeros((), wdtype))

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))

    if o_v == "random":
        pending = pos < t  # first t of the permutation (preconditioner.cc:588-613)
    else:
        pending = jnp.ones((n,), bool)

    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f1 = jnp.zeros((1,), bool)
    zero_w = jnp.zeros((), wdtype)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # ---- staged active-set schedule -------------------------------------
    # Every quantity a round reads is determined by edges with at least one
    # PENDING endpoint: a pending vertex's incident edges are by definition
    # all such edges, so degrees and (deg, pos) priorities computed from the
    # active set are exact for every candidate; non-pending vertices enter
    # selection only through their pack value, which never depends on their
    # degree; and the touched edges of a round are incident to the (pending)
    # eliminated set. An edge whose endpoints are both non-pending can never
    # be read or written again — it is final output. Each stage therefore
    # runs its rounds on a statically smaller pool prefix [0, P) that holds
    # every active edge, exiting to a 4x smaller prefix once a SAFE bound on
    # the active count fits it: bound = sum(deg over pending') + sum(deg
    # over this round's eliminated set), where the second term dominates the
    # degree growth pending vertices can gain from this round's emissions
    # (one per sampled clique edge, and emissions < touched = sum deg over
    # the eliminated set). The transition packs active edges to the front
    # with one sort; retired edges accumulate behind the next prefix and
    # pass through to the output untouched.
    def pending_bound(s_arr, r_arr, pend):
        live_arr = s_arr < n
        one = live_arr.astype(jnp.int32)
        deg_arr = jnp.zeros((n + 1,), jnp.int32).at[s_arr].add(
            one).at[r_arr].add(one)[:n]
        return jnp.sum(jnp.where(pend, deg_arr, 0))

    def make_stage(P: int, e_t: int, next_P, sub: int):
        do_compact = e_t < P

        def cond(st):
            go = ((st["npend"] > 0) & (st["removed"] < t)
                  & jnp.logical_not(st["overflow"]))
            if next_P is not None:
                go = go & (st["bound"] > next_P)
            return go

        def body(st):
            s, r, w = st["senders"], st["receivers"], st["weights"]
            pending = st["pending"]
            rkey = jax.random.fold_in(st["key"], st["rnd"])
            live = s < n  # invariant: every real edge has w > 0 at round start

            # ---- degrees (duplicate copies counted, like the reference's
            # lazily-decremented PQ degrees); each canonical edge feeds both
            # endpoints. Both-endpoint scatters/gathers below run as ONE
            # 2P-element op on a concatenated index array — same element
            # count, fewer serialized scatter passes. --------------------
            sr = jnp.concatenate([s, r])
            rs = jnp.concatenate([r, s])
            live2 = jnp.concatenate([live, live])
            deg = jnp.zeros((n + 1,), jnp.int32).at[sr].add(
                live2.astype(jnp.int32))[:n]

            if o_v == "random" and schedule == "luby":
                prio = pos
            else:
                dclamp = max(1, (_INT_MAX - n) // (n + 1) - 1)
                prio = jnp.minimum(deg, dclamp) * (n + 1) + pos

            # ---- packed Luby sub-rounds: one gather + one scatter-min each ----
            elim = jnp.zeros((n,), bool)
            cand = pending
            sel = jnp.zeros((n,), bool)
            n_active = jnp.zeros((), jnp.int32)
            for it in range(max(1, sub)):
                pack = jnp.where(sel, -1, jnp.where(cand, prio, big))
                pack_pad = jnp.concatenate([pack, jnp.full((1,), big, jnp.int32)])
                nbr2 = jnp.where(live2, pack_pad[rs], big)
                if it == 0 and next_P is not None:
                    # free exact active count: at sub-round 0 cand == pending,
                    # so pack[u] < big <=> u pending — an edge is active iff
                    # either gathered pack is finite.
                    half_p = nbr2.shape[0] // 2
                    n_active = jnp.sum((live & ((nbr2[:half_p] < big)
                                                | (nbr2[half_p:] < big))
                                        ).astype(jnp.int32))
                nmin = jnp.full((n + 1,), big, jnp.int32).at[sr].min(nbr2)[:n]
                sel = cand & (prio < nmin) & (nmin >= 0)
                elim = elim | sel
                cand = cand & jnp.logical_not(sel) & (nmin >= 0)

            if o_v != "random":
                # cap this round at the remaining budget, lowest priority first
                # — the PQ pop order
                remaining = t - st["removed"]
                sorted_prio = jnp.sort(jnp.where(elim, prio, big))
                kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
                elim = elim & (prio <= kth) & (remaining > 0)

            overflow = st["overflow"]
            if do_compact:
                # trim the set (cheapest prio first) so its touched edges —
                # exactly sum deg(i) over the set (one canonical copy per
                # incident edge; no two set members adjacent) — fit the
                # static prefix
                prs, nodes = jax.lax.sort(
                    (jnp.where(elim, prio, big), iota_n), num_keys=1)
                cost = jnp.where(prs < big, deg[nodes], 0)
                fits = (jnp.cumsum(cost) <= e_t) & (prs < big)
                elim = jnp.zeros((n,), bool).at[nodes].max(fits)
                overflow = overflow | ((prs[0] < big)
                                       & jnp.logical_not(fits[0]))

            b_count = jnp.sum(elim.astype(jnp.int32))
            elim_pad = jnp.concatenate([elim, f1])
            e2 = elim_pad[sr] & live2
            es = e2[:s.shape[0]]
            er = e2[s.shape[0]:]

            # ---- the one pool sort: touched edges grouped by their
            # eliminated endpoint, untouched edges ride to the tail ----------
            if packed:
                rho = jnp.where(es, s * B + r, jnp.where(er, r * B + s, big))
                kap = s * B + r  # identity payload (padding decodes (n, n))
                rho, kap, w = jax.lax.sort((rho, kap, w), num_keys=1)
                kap_t = kap[e_t:]
                ks_t = kap_t // B
                kr_t = kap_t - ks_t * B
                rho_p, kap_p, w_p = rho[:e_t], kap[:e_t], w[:e_t]
                touched = rho_p < big
                owner = jnp.where(touched, rho_p // B, n)
                other = jnp.where(touched, rho_p - owner * B, n)
                ks = kap_p // B
                kr = kap_p - ks * B
                same = rho_p[1:] == rho_p[:-1]
            else:
                ow_a = jnp.where(es, s, jnp.where(er, r, big))
                ot_a = jnp.where(es, r, jnp.where(er, s, big))
                ow_a, ot_a, sq, rq, w = jax.lax.sort(
                    (ow_a, ot_a, s, r, w), num_keys=2)
                ks_t, kr_t = sq[e_t:], rq[e_t:]
                w_p = w[:e_t]
                touched = ow_a[:e_t] < big
                owner = jnp.where(touched, ow_a[:e_t], n)
                other = jnp.where(touched, ot_a[:e_t], n)
                ks, kr = sq[:e_t], rq[:e_t]
                same = ((owner[1:] == owner[:-1])
                        & (other[1:] == other[:-1])) & touched[1:]
            w_t = w[e_t:]

            # ---- runs: duplicate canonical copies of one pair share a key ----
            head_run = jnp.concatenate([t1, jnp.logical_not(same)]) & touched
            is_tail = jnp.concatenate([jnp.logical_not(same), t1]) & touched
            run_sum = _segmented_cumsum(w_p, head_run)
            v = jnp.where(is_tail, run_sum, zero_w)  # column weight v_ij

            if o_n in ("asc", "desc"):
                # o_n orders each eliminated column by weight before the
                # suffix-CDF pass (compressColumn's sort, cc:295-307): one
                # cheap prefix-only sort of the merged run tails by
                # (owner, +-v). Non-tail duplicates were already merged into
                # their tail, so their identity retires to padding first.
                pad_mask = touched & jnp.logical_not(is_tail)
                ks = jnp.where(pad_mask, n, ks)
                kr = jnp.where(pad_mask, n, kr)
                w_p = jnp.where(pad_mask, zero_w, w_p)
                own_t = jnp.where(is_tail, owner, big)
                o_key = v.astype(jnp.float32)
                o_key = jnp.where(is_tail,
                                  o_key if o_n == "asc" else -o_key,
                                  jnp.asarray(jnp.inf, jnp.float32))
                own_t, _, other, v, ks, kr, w_p = jax.lax.sort(
                    (own_t, o_key, other, v, ks, kr, w_p), num_keys=2)
                owner = jnp.where(own_t < big, own_t, n)
                touched = own_t < big
                is_tail = touched

            # ---- suffix-CDF sampling over run tails within each owner column --
            hs = jnp.concatenate([t1, owner[1:] != owner[:-1]])
            cum = _segmented_cumsum(v, hs)
            csum = _segmented_maxscan_rev(cum, hs)
            suffix = csum - cum

            if o_v == "coarsen":
                # one partner per whole column ~ v_k/csum; every other neighbor
                # rewires onto it with harmonic weights (preconditioner.cc:866-912):
                # broadcast the column-wide exponential-race winner forward
                eu = jnp.maximum(
                    jax.random.uniform(rkey, (e_t,), dtype=jnp.float32),
                    jnp.asarray(1e-12, jnp.float32))
                race_x = jnp.where(is_tail, -jnp.log(eu) / jnp.maximum(
                    v.astype(jnp.float32), 1e-30), jnp.asarray(jnp.inf,
                                                               jnp.float32))
                _, race_o, race_v = _segmented_race_rev(race_x, other, v, hs)
                partner = _segmented_headscan(jnp.where(hs, race_o, 0), hs)
                w_k = _segmented_headscan(jnp.where(hs, race_v, zero_w), hs)
                # the winner's own edge (i, k) is zeroed (preconditioner.cc:879-882)
                emit = is_tail & (csum > 0) & (other != partner)
                denom = jnp.where(v + w_k > 0, v + w_k, 1.0)
                wnew = jnp.where(emit, v * w_k / denom, zero_w)
            elif sampler == "race":
                # suffix sample via exponential race: min over later tails of
                # Exp(1)/v_m picks m with probability v_m/S_j — exact marginals,
                # positively correlated within a column (see docstring)
                eu = jnp.maximum(
                    jax.random.uniform(rkey, (e_t,), dtype=jnp.float32),
                    jnp.asarray(1e-12, jnp.float32))
                race_x = jnp.where(is_tail, -jnp.log(eu) / jnp.maximum(
                    v.astype(jnp.float32), 1e-30), jnp.asarray(jnp.inf,
                                                               jnp.float32))
                _, race_o, _ = _segmented_race_rev(race_x, other, v, hs)
                partner = jnp.concatenate([race_o[1:],
                                           jnp.full((1,), n, jnp.int32)])
                emit = is_tail & (suffix > 0)
                csafe = jnp.where(csum > 0, csum, 1.0)
                wnew = jnp.where(emit, v * suffix / csafe, zero_w)
            else:
                # independent per-neighbor inverse-CDF draws, located by one
                # merge-based rank lookup (first tail with cum > rv)
                u = jax.random.uniform(rkey, (e_t,),
                                       dtype=jnp.float32).astype(wdtype)
                rv = cum + u * suffix
                # rv can round UP to csum in f32; keep it strictly inside the
                # column so the lookup can never escape into the next column
                rv = jnp.minimum(rv, jnp.nextafter(csum, jnp.zeros_like(csum)))
                emit = is_tail & (suffix > 0)
                q = _last_le_lookup(
                    (owner, cum),
                    (jnp.where(emit, owner, n + 1),
                     jnp.where(emit, rv, zero_w))) + 1
                q = jnp.clip(q, 0, e_t - 1)
                partner = other[q]
                csafe = jnp.where(csum > 0, csum, 1.0)
                wnew = jnp.where(emit, v * suffix / csafe, zero_w)

            # ---- write-back: each emitting run tail overwrites its own slot
            # with the sampled clique edge, re-canonicalized; every other
            # touched slot retires to padding -------------------------------
            can_s = jnp.minimum(other, partner)
            can_r = jnp.maximum(other, partner)
            s_new = jnp.where(touched, jnp.where(emit, can_s, n), ks)
            r_new = jnp.where(touched, jnp.where(emit, can_r, n), kr)
            w_new = jnp.where(touched, jnp.where(emit, wnew, zero_w), w_p)

            s_new = jnp.concatenate([s_new, ks_t])
            r_new = jnp.concatenate([r_new, kr_t])
            w_new = jnp.concatenate([w_new, w_t])

            pending_next = pending & jnp.logical_not(elim)
            if next_P is not None:
                # safe active-count bound for the NEXT round: the exact
                # start-of-round active count (active edges only shrink as
                # pending shrinks) plus sum(deg over elim), which dominates
                # the new active edges this round's emissions can add.
                bound = n_active + jnp.sum(jnp.where(elim, deg, 0))
            else:
                bound = st["bound"]
            return dict(
                senders=s_new, receivers=r_new, weights=w_new,
                pending=pending_next,
                removed=st["removed"] + b_count,
                npend=jnp.sum(pending_next.astype(jnp.int32)),
                key=st["key"],
                rnd=st["rnd"] + 1,
                overflow=overflow,
                bound=bound,
            )

        return cond, body

    carry = dict(
        pending=pending, removed=jnp.zeros((), jnp.int32),
        npend=jnp.sum(pending.astype(jnp.int32)),
        key=key, rnd=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), bool),
    )
    s_full, r_full, w_full = sh, rh, wh
    stages = _stage_sizes(e_half) if compact else (e_half,)
    for si, P in enumerate(stages):
        next_P = stages[si + 1] if si + 1 < len(stages) else None
        if compact:
            # touched budget: a quarter of the pool for the big first stage
            # (measured touched peaks at ~24% of E on BA(20k); the per-round
            # trim defers overflowing vertices), half for the small tails
            # where single high-degree hub columns need the headroom.
            frac = 4 if si == 0 else 2
            e_t = min(P, max(((P // frac + 1023) // 1024) * 1024, 1024))
        else:
            e_t = P
        st = dict(senders=s_full[:P], receivers=r_full[:P],
                  weights=w_full[:P], **carry)
        st["bound"] = (pending_bound(st["senders"], st["receivers"],
                                     carry["pending"])
                       if next_P is not None else jnp.zeros((), jnp.int32))
        sub = (subiters if isinstance(subiters, int)
               else subiters[min(si, len(subiters) - 1)])
        cond, body = make_stage(P, e_t, next_P, sub)
        out = jax.lax.while_loop(cond, body, st)
        carry = {k: out[k] for k in carry}
        sP, rP, wP = out["senders"], out["receivers"], out["weights"]
        if next_P is not None:
            # transition: pack active (pending-incident) edges into the
            # front of [0, P) so the next stage's prefix holds all of them;
            # retired edges settle behind it as finished output.
            pend_pad = jnp.concatenate([carry["pending"], f1])
            act = (sP < n) & (pend_pad[sP] | pend_pad[rP])
            akey = jnp.where(act, 0, 1).astype(jnp.int32)
            if packed:
                kapP = sP * B + rP
                _, kapP, wP = jax.lax.sort((akey, kapP, wP), num_keys=1)
                sP = kapP // B
                rP = kapP - sP * B
            else:
                _, sP, rP, wP = jax.lax.sort((akey, sP, rP, wP), num_keys=1)
        s_full = jnp.concatenate([sP, s_full[P:]])
        r_full = jnp.concatenate([rP, r_full[P:]])
        w_full = jnp.concatenate([wP, w_full[P:]])

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
