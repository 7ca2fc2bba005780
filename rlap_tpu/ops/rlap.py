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


def _window_params(e_half: int, n: int, e_cap: int) -> Tuple[int, int]:
    """Static (W, A) schedule for `_eliminate_impl_windowed`.

    A is the active-prefix cap every round op runs on; W is the number of
    permutation positions opened per window. W is sized so the edges
    incident to a window's candidates fit A with ~2.5x slack over the
    *initial* average degree: by t = n/2 the average remaining degree
    roughly doubles (eliminations conserve edge count to first order while
    vertices drain), and spilled stragglers add ~15%. Small pools skip
    windowing entirely (one window = the whole permutation)."""
    if e_half <= 65536:
        return n, e_half
    A = min(e_half, max(65536, ((e_half // 2 + 1023) // 1024) * 1024))
    d0 = max(2.0, e_cap / max(n, 1))  # initial undirected degree
    W = max(1024, int(A / (2.5 * d0)))
    return W, A


def _band_params(e_half: int, n: int) -> Optional[Tuple[int, int, int, int, int]]:
    """Static (W, NW, C, SP, DC) schedule for `_eliminate_impl_banded`.

    W positions of the elimination permutation open per round; NW = number
    of windows covering all n positions (windows past the removal count
    never run). C (cold-band cap) is sized from the expected largest band:
    a band holds the static edges whose earlier endpoint opens in that
    window, E[band_0] = e_half * (1 - (1 - W/n)^2) ~ 2 W e_half / n, with
    1.75x slack for permutation variance and degree skew (measured max/mean
    ~1.02 over BA seeds; the slack covers heavier-tailed graphs — a band
    larger than C raises `overflow` at setup and the caller escalates).
    SP (spill cap) holds edges of Luby-blocked candidates between rounds;
    DC (deferred-region cap) holds emissions routed to one future window.
    Small pools skip banding (the staged kernel's whole-pool rounds win
    below ~2^17 edges)."""
    if e_half <= (1 << 17):
        return None
    W = max(1024, (n // 24 + 1023) // 1024 * 1024)
    NW = -(-n // W)
    band0 = 2.0 * W * e_half / max(n, 1)
    C = max(8192, int(1.75 * band0 + 1023) // 1024 * 1024)
    C = min(C, e_half)
    # spill holds blocked candidates' full neighborhoods; at W/n ratios
    # where candidates conflict often the backlog approaches a band's
    # worth of edges, so give it a full C.
    SP = C
    DC = max(8192, C // 2)
    return W, NW, C, SP, DC


def _eliminate_impl_banded(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_n: str = "random", subiters: int = 2,
    sampler: str = "independent",
    window: Optional[int] = None,
):
    """Banded rounds-of-independent-sets elimination (o_v="random").

    The round-3 performance kernel. The staged kernel's cost is dominated
    by per-element-priced gathers/scatters and sorts over the (shrinking
    but large) whole active pool every round; the round-2 "windowed"
    variant shrank the round body to a prefix but still paid one
    full-pool packing sort + full-pool gather per round (~30+ ms at
    BA(100k)) and could stall past the device watchdog when its spill
    backlog snowballed. This kernel removes ALL per-round full-pool work:

    * **Cold storage, sorted once.** Every static edge's *first window*
      fw = min over endpoints of (position // W, counting only targets)
      is known up front because the elimination permutation is drawn at
      entry. One setup sort orders the pool by fw; band k then sits at
      [off[k], off[k+1]) and is loaded with a single C-sized
      dynamic_slice when window k opens. An edge is provably untouched
      before its first window: only candidates are eliminated, and
      neither endpoint is a candidate before window fw.
    * **Deferred-emission regions.** A sampled clique edge whose nearest
      pending-target endpoint opens in a future window w is routed (one
      M-sized scatter) into a static region DEF[w*DC:(w+1)*DC] and loaded
      together with cold band w. Emissions between non-targets (or
      already-eliminated endpoints' partners) flush to the output
      accumulator the round they are created. Every copy of a pair (u,v)
      — static or emitted — shares the same fw, so all copies meet in
      the same round's working buffer and the rho sort's duplicate merge
      (the `compressColumn` analogue) still sees them together.
    * **Working buffer.** Each round runs the staged kernel's round body
      (packed Luby selection on (degree, pos) priorities, ONE rho sort,
      segmented scans, suffix-CDF sampling with the merge-based rank
      lookup, in-place write-back) on a static M = SP + C + DC buffer —
      at BA(100k) M is ~1/4 of the pool, and NO op in the loop touches
      the pool. Blocked candidates' edges stay in the buffer (the spill
      prefix) and retry next round while the next window's band joins.
    * **Classification + flush.** After write-back one M-sized sort
      groups slots by destination (keep / DEF region w / output); ranks
      from a segmented scan give unique scatter targets, and per-region
      cursors advance by the flushed counts. Slots whose endpoints no
      longer include a pending target are final output (they can never
      be read again).

    Exactness is the staged kernel's argument unchanged (module
    docstring): the eliminated set is exactly the first t of the
    permutation, each round eliminates an independent set (all
    candidate-candidate edges are in the working buffer, so Luby
    blocking is exact), and the per-column sampler is unbiased, so the
    expected output is the true Schur complement of the set. Banding
    only reorders rounds, which the tower property covers.

    Static caps (C per band at setup, SP for spill, DC per DEF region,
    and a round-count safety cap below the device watchdog) raise
    `overflow` when exceeded; the caller escalates to the uncapped
    staged path. Matches the reference semantics of
    `preconditioner.cc:713-787` (loop), `:748-757` (suffix sampling),
    `:761-772` (storage reuse).
    """
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    B = n + 1
    packed = n * (n + 2) < _INT_MAX
    if sampler not in ("independent", "race"):
        raise ValueError(f"unknown sampler {sampler!r}")

    params = _band_params(e_cap // 2, n)
    if isinstance(window, tuple):
        # explicit static caps (W, C, SP, DC) — cap-tuning escape hatch
        W, C, SP, DC = (int(x) for x in window)
        NW = -(-n // W)
    elif window is not None:
        W = int(window)
        NW = -(-n // W)
        e_half = max(e_cap // 2, 1)
        band0 = 2.0 * W * e_half / max(n, 1)
        C = min(e_half, max(1024, int(1.75 * band0 + 1023) // 1024 * 1024))
        SP = C
        DC = max(1024, C // 2)
    else:
        assert params is not None
        W, NW, C, SP, DC = params
    M = SP + C + DC

    # ---- canonical half-edge pool (same fold as the staged kernel) -------
    e_half = max(e_cap // 2, 1)
    fkey = jnp.where((senders < n) & (senders < receivers),
                     jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32))
    if packed:
        fkap = senders * B + receivers
        _, fkap, fw_ = jax.lax.sort((fkey, fkap, weights), num_keys=1)
        sh = fkap[:e_half] // B
        rh = fkap[:e_half] - sh * B
    else:
        _, fs, fr, fw_ = jax.lax.sort(
            (fkey, senders, receivers, weights), num_keys=1)
        sh, rh = fs[:e_half], fr[:e_half]
    wh = fw_[:e_half]
    good = sh < rh
    sh = jnp.where(good, sh, n)
    rh = jnp.where(good, rh, n)
    wh = jnp.where(good, wh, jnp.zeros((), wdtype))

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    pending = pos < t  # first t of the permutation

    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f1 = jnp.zeros((1,), bool)
    zero_w = jnp.zeros((), wdtype)
    i32 = jnp.int32

    # window-of-target table: wtab[x] = pos[x] // W while x is a pending
    # target, else NW ("never"); recomputed per round from pending.
    def make_wtab(pend):
        return jnp.concatenate([
            jnp.where(pend, pos // W, NW).astype(i32),
            jnp.full((1,), NW, i32)])

    wtab = make_wtab(pending)

    # ---- cold storage: sort the pool by first window ---------------------
    live0 = sh < n
    fw_edge = jnp.where(live0, jnp.minimum(wtab[sh], wtab[rh]), NW + 1)
    if packed:
        ckap = sh * B + rh
        cold_fw, ckap, cold_w = jax.lax.sort((fw_edge, ckap, wh), num_keys=1)
        cold_s = ckap // B
        cold_r = ckap - cold_s * B
    else:
        cold_fw, cold_s, cold_r, cold_w = jax.lax.sort(
            (fw_edge, sh, rh, wh), num_keys=1)
    counts = jnp.zeros((NW + 2,), i32).at[cold_fw].add(1)
    off = jnp.concatenate([jnp.zeros((1,), i32), jnp.cumsum(counts)])
    band_max = jnp.max(counts[:NW])
    overflow0 = band_max > C
    # pad cold by C so a dynamic_slice at the last band never clamps/shifts
    cpad_s = jnp.full((C,), n, i32)
    cpad_w = jnp.zeros((C,), wdtype)
    cold_s = jnp.concatenate([cold_s, cpad_s])
    cold_r = jnp.concatenate([cold_r, cpad_s])
    cold_w = jnp.concatenate([cold_w, cpad_w])
    cold_fw = jnp.concatenate([cold_fw, jnp.full((C,), NW + 1, i32)])

    # unified flush buffer: NW deferred regions of DC slots, then the
    # output accumulator (cap e_half), then one trash slot — ONE scatter
    # per payload array flushes deferred emissions AND final output
    OUT0 = NW * DC
    TRASH = OUT0 + e_half
    # region base offsets indexed by class-1 (def regions, then out)
    rbase = jnp.concatenate([
        jnp.arange(NW, dtype=jnp.int32) * DC,
        jnp.full((1,), OUT0, jnp.int32)])
    st0 = dict(
        wb_s=jnp.full((M,), n, i32), wb_r=jnp.full((M,), n, i32),
        wb_w=jnp.zeros((M,), wdtype),
        fb_s=jnp.full((TRASH + 1,), n, i32),
        fb_r=jnp.full((TRASH + 1,), n, i32),
        fb_w=jnp.zeros((TRASH + 1,), wdtype),
        cur=jnp.zeros((NW + 1,), i32),  # [w]=def region w fill; [NW]=out
        pending=pending, wtab=wtab,
        removed=jnp.zeros((), i32),
        k=jnp.zeros((), i32), rnd=jnp.zeros((), i32),
        key=key, overflow=overflow0,
        kc_max=jnp.zeros((), i32), dcur_max=jnp.zeros((), i32),
    )

    max_rounds = NW + 256

    def cond(st):
        return ((st["removed"] < t) & jnp.logical_not(st["overflow"])
                & (st["rnd"] < max_rounds))

    def body(st):
        pending = st["pending"]
        # adaptive advance: open window k only once the backlog of
        # already-opened pending candidates has drained below W/4 —
        # otherwise run a drain round on the working buffer alone. This
        # bounds the spill (blocked candidates' edges) independently of
        # the graph: candidates never exceed ~1.25 W. A drain round
        # always eliminates at least the minimum-priority candidate, so
        # the loop cannot stall (the round-count safety cap catches
        # pathological inputs and escalates instead of faulting).
        backlog = jnp.sum(
            (pending & (pos < jnp.minimum(st["k"], NW) * W)).astype(i32))
        advance = (backlog <= W // 4) & (st["k"] < NW)
        k = st["k"]
        kk = jnp.minimum(k, NW - 1)
        in_range = advance

        # ---- load cold band k and DEF region k into the working buffer ---
        start = off[kk]
        cnt_band = jnp.where(in_range, off[kk + 1] - off[kk], 0)
        bs = jax.lax.dynamic_slice(cold_s, (start,), (C,))
        br = jax.lax.dynamic_slice(cold_r, (start,), (C,))
        bw = jax.lax.dynamic_slice(cold_w, (start,), (C,))
        bmask = jnp.arange(C, dtype=i32) < cnt_band
        bs = jnp.where(bmask, bs, n)
        br = jnp.where(bmask, br, n)
        bw = jnp.where(bmask, bw, zero_w)

        dstart = kk * DC
        cnt_def = jnp.where(in_range, st["cur"][kk], 0)
        ds = jax.lax.dynamic_slice(st["fb_s"], (dstart,), (DC,))
        dr = jax.lax.dynamic_slice(st["fb_r"], (dstart,), (DC,))
        dw = jax.lax.dynamic_slice(st["fb_w"], (dstart,), (DC,))
        dmask = jnp.arange(DC, dtype=i32) < cnt_def
        ds = jnp.where(dmask, ds, n)
        dr = jnp.where(dmask, dr, n)
        dw = jnp.where(dmask, dw, zero_w)

        s = jnp.concatenate([st["wb_s"][:SP], bs, ds])
        r = jnp.concatenate([st["wb_r"][:SP], br, dr])
        w = jnp.concatenate([st["wb_w"][:SP], bw, dw])

        rkey = jax.random.fold_in(st["key"], st["rnd"])
        live = s < n
        k_next = k + advance.astype(i32)
        wm = jnp.minimum(k_next * W, n)
        wm = jnp.where(k_next >= NW, n, wm)
        cand = pending & (pos < wm)

        # ---- packed Luby selection on position priorities ----------------
        # prio = pos is the reference's own o_v="random" elimination order
        # (preconditioner.cc:588-613): hubs eliminate at their window
        # rather than deferring to the endgame, which (a) keeps the spill
        # backlog small and hub-free (a (deg, pos) priority starves hubs
        # until only mutually-adjacent hubs remain, serializing the tail
        # at ~1 elimination/round — measured kc 147k > SP at BA(100k)),
        # (b) matches the reference's emission volume, and (c) saves the
        # per-round degree scatter entirely.
        sr = jnp.concatenate([s, r])
        rs = jnp.concatenate([r, s])
        live2 = jnp.concatenate([live, live])
        prio = pos

        sel = jnp.zeros((n,), bool)
        candr = cand
        for _ in range(max(1, subiters)):
            pack = jnp.where(sel, -1, jnp.where(candr, prio, big))
            pack_pad = jnp.concatenate([pack, jnp.full((1,), big, i32)])
            nbr2 = jnp.where(live2, pack_pad[rs], big)
            nmin = jnp.full((n + 1,), big, i32).at[sr].min(nbr2)[:n]
            snew = candr & (prio < nmin) & (nmin >= 0)
            sel = sel | snew
            candr = candr & jnp.logical_not(snew) & (nmin >= 0)
        elim = sel
        b_count = jnp.sum(elim.astype(i32))
        elim_pad = jnp.concatenate([elim, f1])
        e2 = elim_pad[sr] & live2
        es = e2[:M]
        er = e2[M:]

        # ---- rho sort over the working buffer ----------------------------
        if packed:
            rho = jnp.where(es, s * B + r, jnp.where(er, r * B + s, big))
            kap_p = s * B + r
            rho, kap_p, w_p = jax.lax.sort((rho, kap_p, w), num_keys=1)
            touched = rho < big
            owner = jnp.where(touched, rho // B, n)
            other = jnp.where(touched, rho - owner * B, n)
            ks = kap_p // B
            kr = kap_p - ks * B
            same = rho[1:] == rho[:-1]
        else:
            ow_a = jnp.where(es, s, jnp.where(er, r, big))
            ot_a = jnp.where(es, r, jnp.where(er, s, big))
            ow_a, ot_a, ks, kr, w_p = jax.lax.sort(
                (ow_a, ot_a, s, r, w), num_keys=2)
            touched = ow_a < big
            owner = jnp.where(touched, ow_a, n)
            other = jnp.where(touched, ot_a, n)
            same = ((owner[1:] == owner[:-1])
                    & (other[1:] == other[:-1])) & touched[1:]

        head_run = jnp.concatenate([t1, jnp.logical_not(same)]) & touched
        is_tail = jnp.concatenate([jnp.logical_not(same), t1]) & touched
        run_sum = _segmented_cumsum(w_p, head_run)
        v = jnp.where(is_tail, run_sum, zero_w)

        if o_n in ("asc", "desc"):
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

        hs = jnp.concatenate([t1, owner[1:] != owner[:-1]])
        cum = _segmented_cumsum(v, hs)
        csum = _segmented_maxscan_rev(cum, hs)
        suffix = csum - cum

        if sampler == "race":
            eu = jnp.maximum(
                jax.random.uniform(rkey, (M,), dtype=jnp.float32),
                jnp.asarray(1e-12, jnp.float32))
            race_x = jnp.where(is_tail, -jnp.log(eu) / jnp.maximum(
                v.astype(jnp.float32), 1e-30), jnp.asarray(jnp.inf,
                                                           jnp.float32))
            _, race_o, _ = _segmented_race_rev(race_x, other, v, hs)
            partner = jnp.concatenate([race_o[1:],
                                       jnp.full((1,), n, i32)])
            emit = is_tail & (suffix > 0)
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, v * suffix / csafe, zero_w)
        else:
            u = jax.random.uniform(rkey, (M,),
                                   dtype=jnp.float32).astype(wdtype)
            rv = cum + u * suffix
            rv = jnp.minimum(rv, jnp.nextafter(csum, jnp.zeros_like(csum)))
            emit = is_tail & (suffix > 0)
            q = _last_le_lookup(
                (owner, cum),
                (jnp.where(emit, owner, n + 1),
                 jnp.where(emit, rv, zero_w))) + 1
            q = jnp.clip(q, 0, M - 1)
            partner = other[q]
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, v * suffix / csafe, zero_w)

        can_s = jnp.minimum(other, partner)
        can_r = jnp.maximum(other, partner)
        s_new = jnp.where(touched, jnp.where(emit, can_s, n), ks)
        r_new = jnp.where(touched, jnp.where(emit, can_r, n), kr)
        w_new = jnp.where(touched, jnp.where(emit, wnew, zero_w), w_p)

        # ---- classify every slot by destination and flush ----------------
        pending_next = pending & jnp.logical_not(elim)
        wtab_next = make_wtab(pending_next)
        live_n = s_new < n
        wE = jnp.minimum(wtab_next[s_new], wtab_next[r_new])
        # class: 0 keep (nearest pending window already open), 1+w DEF
        # region w, NW+1 output, NW+2 dead
        cls = jnp.where(
            live_n,
            jnp.where(wE < k_next, 0,
                      jnp.where(wE < NW, 1 + wE, NW + 1)),
            NW + 2).astype(i32)
        cls, s_new, r_new, w_new = jax.lax.sort(
            (cls, s_new, r_new, w_new), num_keys=1)
        iota_m = jnp.arange(M, dtype=i32)
        chead = jnp.concatenate([t1, cls[1:] != cls[:-1]])
        seg_start = _segmented_headscan(iota_m, chead)
        rank = iota_m - seg_start
        kc = jnp.sum((cls == 0).astype(i32))
        ccounts = jnp.zeros((NW + 3,), i32).at[cls].add(1)

        # ONE scatter per payload flushes every non-keep slot into its
        # region of the unified buffer (deferred regions + output block)
        is_fl = (cls >= 1) & (cls <= NW + 1)
        reg = jnp.where(is_fl, cls - 1, 0)
        fdest = jnp.where(is_fl,
                          rbase[reg] + st["cur"][reg] + rank, TRASH)
        fb_s = st["fb_s"].at[fdest].set(jnp.where(is_fl, s_new, n))
        fb_r = st["fb_r"].at[fdest].set(jnp.where(is_fl, r_new, n))
        fb_w = st["fb_w"].at[fdest].set(jnp.where(is_fl, w_new, zero_w))
        cur = st["cur"] + ccounts[1:NW + 2]

        keep_mask = iota_m < kc
        wb_s = jnp.where(keep_mask, s_new, n)
        wb_r = jnp.where(keep_mask, r_new, n)
        wb_w = jnp.where(keep_mask, w_new, zero_w)

        overflow = (st["overflow"] | (kc > SP)
                    | jnp.any(cur[:NW] > DC) | (cur[NW] > e_half))
        return dict(
            wb_s=wb_s, wb_r=wb_r, wb_w=wb_w,
            fb_s=fb_s, fb_r=fb_r, fb_w=fb_w, cur=cur,
            pending=pending_next, wtab=wtab_next,
            removed=st["removed"] + b_count,
            k=k_next, rnd=st["rnd"] + 1,
            key=st["key"], overflow=overflow,
            kc_max=jnp.maximum(st["kc_max"], kc),
            dcur_max=jnp.maximum(st["dcur_max"], jnp.max(cur[:NW])),
        )

    out = jax.lax.while_loop(cond, body, st0)
    overflow = out["overflow"] | ((out["rnd"] >= max_rounds)
                                  & (out["removed"] < t))

    # ---- assemble the surviving pool -------------------------------------
    # out accumulator + unflushed DEF regions (>= k, never loaded) + cold
    # bands never loaded (fw >= k) + working-buffer leftovers. Total live
    # copies can never exceed e_half (eliminating a degree-d vertex
    # deletes d copies and emits d-1, so the live count only shrinks),
    # so one pack sort and an e_half prefix always suffice.
    k_out = out["k"]
    iota_d = jnp.arange(OUT0, dtype=i32)
    dreg = iota_d // DC
    dlive = ((dreg >= k_out) & (iota_d - dreg * DC < out["cur"][dreg])
             & (out["fb_s"][:OUT0] < n))
    cold_live = ((cold_fw[:e_half] >= jnp.minimum(k_out, NW))
                 & (cold_fw[:e_half] <= NW))

    all_s = jnp.concatenate([
        out["fb_s"][OUT0:TRASH], jnp.where(dlive, out["fb_s"][:OUT0], n),
        jnp.where(cold_live, cold_s[:e_half], n), out["wb_s"]])
    all_r = jnp.concatenate([
        out["fb_r"][OUT0:TRASH], jnp.where(dlive, out["fb_r"][:OUT0], n),
        jnp.where(cold_live, cold_r[:e_half], n), out["wb_r"]])
    all_w = jnp.concatenate([
        out["fb_w"][OUT0:TRASH], jnp.where(dlive, out["fb_w"][:OUT0],
                                           zero_w),
        jnp.where(cold_live, cold_w[:e_half], zero_w), out["wb_w"]])
    pkey = jnp.where(all_s < n, 0, 1).astype(i32)
    if packed:
        pkap = all_s * B + all_r
        _, pkap, all_w = jax.lax.sort((pkey, pkap, all_w), num_keys=1)
        s_full = (pkap // B)[:e_half]
        r_full = (pkap - (pkap // B) * B)[:e_half]
    else:
        _, all_s, all_r, all_w = jax.lax.sort(
            (pkey, all_s, all_r, all_w), num_keys=1)
        s_full = all_s[:e_half]
        r_full = all_r[:e_half]
    w_full = all_w[:e_half]
    # live copies beyond e_half would mean the live-count invariant broke;
    # flag it rather than silently dropping edges (the tail is all-padding
    # when the invariant holds).
    if packed:
        first_dropped_live = (pkap[e_half] // B) < n
    else:
        first_dropped_live = all_s[e_half] < n
    overflow = overflow | first_dropped_live
    livem = s_full < n
    s_full = jnp.where(livem, s_full, n)
    r_full = jnp.where(livem, r_full, n)
    w_full = jnp.where(livem, w_full, zero_w)

    pad = max(0, e_cap - 2 * e_half)
    pad_s = jnp.full((pad,), n, i32)
    pad_w = jnp.zeros((pad,), wdtype)
    s_dir = jnp.concatenate([s_full, r_full, pad_s])[:e_cap]
    r_dir = jnp.concatenate([r_full, s_full, pad_s])[:e_cap]
    w_dir = jnp.concatenate([w_full, w_full, pad_w])[:e_cap]
    return (s_dir, r_dir, w_dir, out["removed"], out["rnd"], overflow,
            dict(kc_max=out["kc_max"], dcur_max=out["dcur_max"],
                 ocur=out["cur"][NW]))


def _eliminate_impl_windowed(
    senders, receivers, weights, key,
    t,  # traced: number of vertices to eliminate
    *,
    n: int, o_n: str = "random", subiters: int = 3,
    sampler: str = "independent",
    window: Optional[int] = None, active_cap: Optional[int] = None,
):
    """Windowed rounds-of-independent-sets elimination (o_v="random").

    The round-3 performance design. The staged kernel
    (`_eliminate_impl_fast`) keeps ALL `t` targets pending from the first
    round, so its early rounds pay per-element-priced gathers/scatters over
    nearly the whole edge pool. This variant opens the elimination
    permutation in *windows* of W positions: each outer step
    (1) advances `wmark` by W, making candidates = still-pending targets
        with `pos < wmark`;
    (2) packs every edge with a candidate endpoint into a static prefix
        [0, A) with ONE full-pool sort (the *transition*) — a live edge's
        endpoint is a candidate iff its position-if-target value, a static
        per-vertex table, is below `wmark`, because eliminated vertices
        have no live edges; and
    (3) runs ONE round on that prefix: packed Luby selection with
        prio = pos (the sequential order itself — no degree pass, no
        budget trim), the rho pool sort, segmented scans, suffix-CDF
        sampling, and in-place write-back, all A-sized.

    Candidates blocked by a selected neighbor *spill*: they stay pending
    and ride into the next window's candidate set (their edges are
    re-packed by the next transition), so no mop-up rounds run at window
    granularity; once `wmark` covers the whole permutation the remaining
    stragglers drain in a couple of final rounds.

    Exactness is the staged kernel's argument unchanged: the eliminated
    set is exactly the first t of the permutation, every round eliminates
    an independent set, and the per-column sampler is unbiased, so the
    expected output is the true Schur complement of that set (see module
    docstring). Windowing only reorders *rounds*, which the tower property
    already covers.

    Why the prefix is safe: all edges incident to a candidate are packed
    into [0, A) by the transition (or `overflow` is raised and the caller
    escalates to the uncapped staged path). A round only touches edges
    incident to its eliminated set (a subset of candidates), and each
    emission overwrites a touched slot, so no round ever reads or writes
    beyond the prefix; edges beyond A have no candidate endpoint and are
    untouched by construction.

    Matches the same reference semantics as `_eliminate_impl_fast`
    (`preconditioner.cc:713-787` loop, `:748-757` suffix sampling,
    `:761-772` storage reuse).
    """
    e_cap = senders.shape[0]
    wdtype = weights.dtype
    B = n + 1
    packed = n * (n + 2) < _INT_MAX
    if sampler not in ("independent", "race"):
        raise ValueError(f"unknown sampler {sampler!r}")

    # ---- canonical half-edge pool (same fold as the staged kernel) -------
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
    wh = jnp.where(good, wh, jnp.zeros((), wdtype))

    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    pending = pos < t  # first t of the permutation

    Wn, A = _window_params(e_half, n, e_cap)
    if window is not None:
        Wn = int(window)
    if active_cap is not None:
        A = min(int(active_cap), e_half)

    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f1 = jnp.zeros((1,), bool)
    zero_w = jnp.zeros((), wdtype)

    # position-if-target: static per call. A LIVE edge's endpoint is a
    # candidate iff tpos[endpoint] < wmark (eliminated vertices keep no
    # live edges, so pending needn't be consulted during transitions).
    tpos = jnp.where(pending, pos, big)
    tpos_pad = jnp.concatenate([tpos, jnp.full((1,), big, jnp.int32)])

    def cond(st):
        return (st["removed"] < t) & jnp.logical_not(st["overflow"])

    def body(st):
        s, r, w = st["senders"], st["receivers"], st["weights"]
        pending = st["pending"]
        # adaptive advance: only open the next W positions once the spilled
        # backlog (candidates blocked in earlier rounds) has drained below
        # W/2 — otherwise the backlog snowballs and candidate-incident
        # edges outgrow the prefix. A no-advance round cannot overflow: its
        # candidates are a subset of the previous round's, whose incident
        # edges (plus any emissions) already fit [0, A).
        adv = jnp.where(st["ncand"] <= Wn // 2, Wn, 0)
        wm = jnp.minimum(st["wmark"] + adv, jnp.asarray(n, jnp.int32))

        # ---- transition: pack candidate-incident edges into [0, A) -------
        live = s < n
        ab = tpos_pad[jnp.concatenate([s, r])]
        act = live & ((ab[:e_half] < wm) | (ab[e_half:] < wm))
        n_act = jnp.sum(act.astype(jnp.int32))
        overflow = st["overflow"] | (n_act > A)
        akey = jnp.where(act, 0, jnp.where(live, 1, 2)).astype(jnp.int32)
        if packed:
            kap = s * B + r
            _, kap, w = jax.lax.sort((akey, kap, w), num_keys=1)
            s = kap // B
            r = kap - s * B
        else:
            _, s, r, w = jax.lax.sort((akey, s, r, w), num_keys=1)
        sA, rA, wA = s[:A], r[:A], w[:A]

        # ---- one round on the prefix -------------------------------------
        rkey = jax.random.fold_in(st["key"], st["rnd"])
        cand = pending & (pos < wm)
        liveA = sA < n
        live2 = jnp.concatenate([liveA, liveA])
        srA = jnp.concatenate([sA, rA])
        rsA = jnp.concatenate([rA, sA])

        # packed Luby sub-rounds, prio = pos (sequential order); exact for
        # candidates because every candidate-candidate edge is in [0, A)
        sel = jnp.zeros((n,), bool)
        candr = cand
        for _ in range(max(1, subiters)):
            pack = jnp.where(sel, -1, jnp.where(candr, pos, big))
            pack_pad = jnp.concatenate([pack, jnp.full((1,), big, jnp.int32)])
            nbr2 = jnp.where(live2, pack_pad[rsA], big)
            nmin = jnp.full((n + 1,), big, jnp.int32).at[srA].min(nbr2)[:n]
            snew = candr & (pos < nmin) & (nmin >= 0)
            sel = sel | snew
            candr = candr & jnp.logical_not(snew) & (nmin >= 0)
        elim = sel
        b_count = jnp.sum(elim.astype(jnp.int32))
        elim_pad = jnp.concatenate([elim, f1])
        e2 = elim_pad[srA] & live2
        es = e2[:A]
        er = e2[A:]

        # ---- rho pool sort over the prefix (e_t == A: no tail) -----------
        if packed:
            rho = jnp.where(es, sA * B + rA,
                            jnp.where(er, rA * B + sA, big))
            kap_p = sA * B + rA
            rho, kap_p, w_p = jax.lax.sort((rho, kap_p, wA), num_keys=1)
            touched = rho < big
            owner = jnp.where(touched, rho // B, n)
            other = jnp.where(touched, rho - owner * B, n)
            ks = kap_p // B
            kr = kap_p - ks * B
            same = rho[1:] == rho[:-1]
        else:
            ow_a = jnp.where(es, sA, jnp.where(er, rA, big))
            ot_a = jnp.where(es, rA, jnp.where(er, sA, big))
            ow_a, ot_a, ks, kr, w_p = jax.lax.sort(
                (ow_a, ot_a, sA, rA, wA), num_keys=2)
            touched = ow_a < big
            owner = jnp.where(touched, ow_a, n)
            other = jnp.where(touched, ot_a, n)
            same = ((owner[1:] == owner[:-1])
                    & (other[1:] == other[:-1])) & touched[1:]

        head_run = jnp.concatenate([t1, jnp.logical_not(same)]) & touched
        is_tail = jnp.concatenate([jnp.logical_not(same), t1]) & touched
        run_sum = _segmented_cumsum(w_p, head_run)
        v = jnp.where(is_tail, run_sum, zero_w)

        if o_n in ("asc", "desc"):
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

        hs = jnp.concatenate([t1, owner[1:] != owner[:-1]])
        cum = _segmented_cumsum(v, hs)
        csum = _segmented_maxscan_rev(cum, hs)
        suffix = csum - cum

        if sampler == "race":
            eu = jnp.maximum(
                jax.random.uniform(rkey, (A,), dtype=jnp.float32),
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
            u = jax.random.uniform(rkey, (A,),
                                   dtype=jnp.float32).astype(wdtype)
            rv = cum + u * suffix
            rv = jnp.minimum(rv, jnp.nextafter(csum, jnp.zeros_like(csum)))
            emit = is_tail & (suffix > 0)
            q = _last_le_lookup(
                (owner, cum),
                (jnp.where(emit, owner, n + 1),
                 jnp.where(emit, rv, zero_w))) + 1
            q = jnp.clip(q, 0, A - 1)
            partner = other[q]
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, v * suffix / csafe, zero_w)

        can_s = jnp.minimum(other, partner)
        can_r = jnp.maximum(other, partner)
        s_new = jnp.where(touched, jnp.where(emit, can_s, n), ks)
        r_new = jnp.where(touched, jnp.where(emit, can_r, n), kr)
        w_new = jnp.where(touched, jnp.where(emit, wnew, zero_w), w_p)

        pending_next = pending & jnp.logical_not(elim)
        ncand = jnp.sum((pending_next & (pos < wm)).astype(jnp.int32))
        return dict(
            senders=jnp.concatenate([s_new, s[A:]]),
            receivers=jnp.concatenate([r_new, r[A:]]),
            weights=jnp.concatenate([w_new, w[A:]]),
            pending=pending_next,
            removed=st["removed"] + b_count,
            wmark=wm,
            ncand=ncand,
            key=st["key"],
            rnd=st["rnd"] + 1,
            overflow=overflow,
        )

    st = dict(
        senders=sh, receivers=rh, weights=wh,
        pending=pending, removed=jnp.zeros((), jnp.int32),
        wmark=jnp.zeros((), jnp.int32),
        ncand=jnp.zeros((), jnp.int32),
        key=key, rnd=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), bool),
    )
    out = jax.lax.while_loop(cond, body, st)
    s_full, r_full, w_full = (out["senders"], out["receivers"],
                              out["weights"])

    pad = max(0, e_cap - 2 * e_half)
    pad_s = jnp.full((pad,), n, jnp.int32)
    pad_w = jnp.zeros((pad,), wdtype)
    s_dir = jnp.concatenate([s_full, r_full, pad_s])[:e_cap]
    r_dir = jnp.concatenate([r_full, s_full, pad_s])[:e_cap]
    w_dir = jnp.concatenate([w_full, w_full, pad_w])[:e_cap]
    return (s_dir, r_dir, w_dir, out["removed"], out["rnd"],
            out["overflow"])


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
                     "compact", "subiters", "window", "active_cap"))
def eliminate(g: Graph, key: jax.Array, num_remove,
              o_v: str = "random", o_n: str = "random",
              schedule: str = "fast",
              b_cap: Optional[int] = None, d_cap: Optional[int] = None,
              sampler: str = "independent", compact: bool = True,
              subiters: int = 3, window: Optional[int] = None,
              active_cap: Optional[int] = None):
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
    # banded is opt-in (explicit `window`) until its static caps are tuned
    # at production scale; the staged kernel remains the default
    use_banded = o_v == "random" and compact and window is not None
    if use_banded:
        # banded schedule: the pool is pre-sorted by first-window once,
        # and every round's work runs on a small static working buffer —
        # no per-round full-pool passes at all. Degree and coarsen
        # orderings need global (degree, pos) priorities each round, so
        # they stay on the staged kernel; compact=False is the uncapped
        # escalation path for all modes. Small graphs also use the staged
        # kernel (its whole-pool rounds win below ~2^17 pool slots).
        s, r, w, removed, _rounds, overflow, _diag = _eliminate_impl_banded(
            gg.senders, gg.receivers, gg.weights, key, t,
            n=n, o_n=o_n, sampler=sampler, subiters=subiters,
            window=window)
    else:
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
    window: Optional[int] = None,
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
        g, key, num_remove, o_v=o_v, o_n=o_n, schedule=schedule,
        window=window)
    if max_escalations > 0 and bool(overflow):
        out, _removed, _ = eliminate(
            g, key, num_remove, o_v=o_v, o_n=o_n, schedule=schedule,
            compact=False)
    return out
