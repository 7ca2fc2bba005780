"""Speed-of-light (roofline) model for the staged elimination kernel.

BASELINE.md's bar is "speed-of-light per chip", but a roofline for this
kernel cannot come from FLOPs or HBM bytes alone: the algorithm is made of
random-access gathers/scatters and sorts whose on-chip costs were measured
directly (tools/probe_access.py, committed in BENCH_EXTRA.md):

    arbitrary gather   9.2 ns/element
    scatter-add/min    8.5 ns/element
    sort               4.8 ns/slot for 1 key + 2 payloads (~1.6 ns per
                       array-element; scales with payload count)
    segmented scan     1.5 ns/element
    elementwise        ~0.5 ns/element (stream-bound)

This module replays the kernel's round dynamics in numpy (same Luby
(degree, pos) selection, same staged touched budgets from `ops.rlap`, same
star->clique emission counts) and prices EVERY op of the round body at
exactly the elements it must touch — the limit of infinitely fine
stage/ladder granularity. The result is the minimum wall time achievable
by this access pattern on this chip: `roofline_fraction = model / measured`
printed by bench.py says how close the real kernel (static stage prefixes,
a 3-level cls1 ladder) gets to that ceiling.

The simulation's RNG stream differs from the kernel's (partner draws are
resampled), so per-round counts are statistically representative rather
than bit-identical; round counts match the kernel's within ~1-2 at the
bench shapes (kernel's `rnd` output vs `rounds` here).

Per-round op schedule priced (mirrors `_eliminate_impl_fast`):

    pool rho-sort        ACT slots x (3 packed | 5 unpacked) arrays
    Luby selection       subiters x (gather + scatter-min) x 2*C1
    es / er lookup       gather ACT (sender side) + gather C1 (receiver)
    budget trim sort     2n array-elements, only in rounds that overflow
    run/suffix scans     ~6 scans x T
    partner rank lookup  merge sort 2T x 3 arrays + scan
    classify/orient      gather 2T
    degree update        scatter 4T
    prefix class-pack    sort T x 4 arrays
    bookkeeping          ACT elementwise (pos1/bound reductions)

where ACT = slots with >= 1 pending endpoint (what stages shrink toward),
C1 = both-pending slots (all selection ever needs), T = touched slots
(the eliminated columns, capped by the stage budget). Entry (fold + class
sort + initial degrees) and exit (unfold) are priced once.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# measured on the v5e (tools/probe_access.py; BENCH_EXTRA.md:7-17)
NS_GATHER = 9.2
NS_SCATTER = 8.5
NS_SORT_ARR = 1.6   # per array-element; a k-array sort costs k * this
NS_SCAN = 1.5
NS_ELEM = 0.5

_INT32_MAX = np.iinfo(np.int32).max


def simulate(n: int, m: int = 8, frac: float = 0.5, seed: int = 0,
             subiters: int = 3) -> Dict:
    """Replay the round dynamics on BA(n, m), t = frac*n, o_v=o_n=random
    (the bench configuration) and return the priced model."""
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import _ET_FRAC_LAST, _ET_FRACS, _stage_sizes

    g = barabasi_albert(n, m, seed=seed)
    e_cap = int(g.senders.shape[0])
    e_half = max(e_cap // 2, 1)
    mask = np.asarray(g.edge_mask)
    s_all = np.asarray(g.senders)[mask].astype(np.int64)
    r_all = np.asarray(g.receivers)[mask].astype(np.int64)
    keep = s_all < r_all
    s, r = s_all[keep], r_all[keep]

    t = int(frac * n)
    rng = np.random.default_rng(seed)
    pos = rng.permutation(n)
    pending = pos < t
    packed = n * (n + 2) + 4 < _INT32_MAX
    n_sort_arr = 3 if packed else 5

    stages = _stage_sizes(e_half)

    def stage_et(si: int, P: int, is_last: bool) -> int:
        fr = _ET_FRACS
        f = _ET_FRAC_LAST if is_last else fr[min(si, len(fr) - 1)]
        return min(P, max(((P // f + 1023) // 1024) * 1024, 1024))

    cost = dict(sort=0.0, selection=0.0, esr=0.0, trim=0.0, scans=0.0,
                lookup=0.0, classify=0.0, degree=0.0, pack=0.0, book=0.0)
    # entry: fold sort over e_cap + class sort + initial degree scatter +
    # pending gathers; exit: unfold copies
    entry_exit = (NS_SORT_ARR * 3 * e_cap + NS_SORT_ARR * 3 * e_half
                  + NS_SCATTER * 2 * e_half + NS_GATHER * 2 * e_half
                  + NS_ELEM * e_cap)

    si = 0
    rounds = 0
    hist = []
    BIG = np.iinfo(np.int64).max
    while pending.any() and rounds < 200:
        deg = (np.bincount(s, minlength=n)
               + np.bincount(r, minlength=n))
        ps, pr = pending[s], pending[r]
        ACT = int((ps | pr).sum())
        C1 = int((ps & pr).sum())

        # stage advance mirrors the bound gate (all active fit next prefix)
        while si + 1 < len(stages) and ACT <= stages[si + 1]:
            si += 1
        P = stages[si]
        e_t = stage_et(si, P, si == len(stages) - 1)

        # Luby sub-rounds on (deg, pos) minima over cls1 edges
        prio = deg.astype(np.int64) * (n + 1) + pos
        sel = np.zeros(n, bool)
        cand = pending.copy()
        for _ in range(subiters):
            pack = np.where(sel, -1, np.where(cand, prio, BIG))
            nmin = np.full(n, BIG)
            np.minimum.at(nmin, s, pack[r])
            np.minimum.at(nmin, r, pack[s])
            snew = cand & (prio < nmin) & (nmin >= 0)
            sel |= snew
            cand &= ~snew & (nmin >= 0)

        # budget trim (cheapest prio first, cumulative deg <= e_t)
        nodes = np.nonzero(sel)[0]
        order = nodes[np.argsort(prio[nodes])]
        csum = np.cumsum(deg[order])
        trimmed = csum[-1] > e_t if len(order) else False
        keep_nodes = order[csum <= e_t]
        elim = np.zeros(n, bool)
        elim[keep_nodes] = True

        es, er = elim[s], elim[r]
        touched = es | er
        T = int(touched.sum())

        cost["sort"] += NS_SORT_ARR * n_sort_arr * ACT
        cost["selection"] += subiters * (NS_GATHER + NS_SCATTER) * 2 * C1
        cost["esr"] += NS_GATHER * (ACT + C1)
        if trimmed:
            cost["trim"] += NS_SORT_ARR * 2 * n
        cost["scans"] += NS_SCAN * 6 * T
        cost["lookup"] += NS_SORT_ARR * 3 * 2 * T + NS_SCAN * 2 * T
        cost["classify"] += NS_GATHER * 2 * T
        cost["degree"] += NS_SCATTER * 4 * T
        cost["pack"] += NS_SORT_ARR * 4 * T
        cost["book"] += NS_ELEM * ACT
        hist.append(dict(rnd=rounds, ACT=ACT, C1=C1, T=T, P=P, e_t=e_t,
                         elim=int(elim.sum())))

        # apply: drop touched columns, emit d-1 clique edges per column
        # (vectorized per-segment suffix partner draw; weights don't
        # change counts)
        tsel = np.nonzero(touched)[0]
        owners = np.where(elim[s[tsel]], s[tsel], r[tsel])
        others = np.where(elim[s[tsel]], r[tsel], s[tsel])
        # merge duplicates within columns
        okey = owners * np.int64(n + 1) + others
        okey = np.unique(okey)
        owners = okey // (n + 1)
        others = okey - owners * (n + 1)
        o_sort = np.argsort(owners, kind="stable")
        owners, others = owners[o_sort], others[o_sort]
        starts = np.searchsorted(owners, np.unique(owners))
        seg_id = np.searchsorted(np.unique(owners), owners)
        seg_start = starts[seg_id]
        j = np.arange(len(owners)) - seg_start
        counts = np.bincount(seg_id)
        d = counts[seg_id]
        emit = j < d - 1
        u = rng.random(len(owners))
        pidx = (j + 1 + np.floor(u * (d - 1 - j)).astype(np.int64))
        pidx = np.minimum(pidx, d - 1)
        partner = others[seg_start + pidx]
        a = np.minimum(others, partner)[emit]
        b = np.maximum(others, partner)[emit]

        s = np.concatenate([s[~touched], a])
        r = np.concatenate([r[~touched], b])
        key = s * np.int64(n + 1) + r
        key = np.unique(key)
        s = key // (n + 1)
        r = key - s * (n + 1)

        pending &= ~elim
        rounds += 1

    total_ns = sum(cost.values()) + entry_exit
    return dict(model_ms=total_ns / 1e6, rounds=rounds,
                entry_exit_ms=entry_exit / 1e6,
                breakdown_ms={k: v / 1e6 for k, v in cost.items()},
                removed=int(t - pending.sum()) if pending.any() else t,
                hist=hist)


def roofline_ms(n: int, m: int = 8, frac: float = 0.5,
                seed: int = 0) -> Tuple[float, Dict]:
    res = simulate(n, m=m, frac=frac, seed=seed)
    return res["model_ms"], res


def schedule_ms(n: int, res: Dict, subiters: int = 3,
                b_frac: float = 0.18) -> Dict:
    """Price the IMPLEMENTED static schedule from a `simulate()` result.

    The ideal model prices every op at exactly the elements it must touch;
    the real kernel pays static sizes — the pool sort and sender-side es
    gather at the stage prefix P, selection/er at the smallest cls1 level
    covering the ranges, the pipeline at the touched-count rung — plus
    replicated n-sized vertex work per sub-round. The delta between the
    two decomposes the roofline gap into named quantization terms
    (committed at BA(100k) in BENCH_EXTRA.md); the residue between this
    price and the measured time is per-op XLA overhead.
    """
    packed = n * (n + 2) + 4 < _INT32_MAX
    n_sort_arr = 3 if packed else 5

    def rnd1024(x, lo=2048):
        return max(lo, ((x + 1023) // 1024) * 1024)

    cost = dict(sort=0.0, selection=0.0, esr=0.0, scans=0.0, lookup=0.0,
                classify=0.0, degree=0.0, pack=0.0, vertex=0.0)
    for h in res["hist"]:
        P, e_t, T, C1 = h["P"], h["e_t"], h["T"], h["C1"]
        b_cap = min(P, ((int(b_frac * P) + 1023) // 1024) * 1024)
        levels = []
        for d in (64, 16, 4, 2, 1):
            lv = (min(e_t, rnd1024(e_t // d)),
                  min(b_cap, rnd1024(b_cap // d)))
            if lv not in levels:
                levels.append(lv)
        sel_elems = next((A1 + A2 for (A1, A2) in levels if C1 <= A1 + A2),
                         P)
        et_levels = []
        for d in (16, 4, 1):
            v_ = min(e_t, max(4096, ((e_t // d + 1023) // 1024) * 1024))
            if v_ not in et_levels:
                et_levels.append(v_)
        ET = next((v for v in et_levels if T <= v), e_t)

        cost["sort"] += NS_SORT_ARR * n_sort_arr * P
        cost["selection"] += (subiters * (NS_GATHER + NS_SCATTER)
                              * 2 * sel_elems)
        cost["esr"] += NS_GATHER * (P + sel_elems)
        cost["scans"] += NS_SCAN * 6 * ET
        cost["lookup"] += NS_SORT_ARR * 3 * 2 * ET + NS_SCAN * 2 * ET
        cost["classify"] += NS_GATHER * 2 * ET
        cost["degree"] += NS_SCATTER * 4 * ET
        cost["pack"] += NS_SORT_ARR * 4 * ET
        cost["vertex"] += NS_ELEM * n * (7 * subiters + 6)
    total = sum(cost.values()) / 1e6 + res["entry_exit_ms"]
    return dict(sched_ms=total,
                breakdown_ms={k: v / 1e6 for k, v in cost.items()})
