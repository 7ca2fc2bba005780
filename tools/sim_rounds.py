"""Numpy simulation of the rounds-of-independent-sets schedule to study
round-count vs MIS sub-iterations. Mirrors the kernel's selection rule
((degree, pos) local minima over pending) and the star->clique rewiring
(suffix sampling in receiver order), without padding concerns.

Usage: python tools/sim_rounds.py [n] [subiters]
"""

import sys
import numpy as np


def simulate(n=20000, m=8, frac=0.5, subiters=1, seed=0):
    rng = np.random.default_rng(seed)
    # Barabasi-Albert-ish: each new node attaches to m random earlier nodes
    src = []
    dst = []
    for v in range(1, n):
        ks = rng.integers(0, v, size=min(m, v))
        for k in np.unique(ks):
            src.append(v)
            dst.append(k)
    s = np.array(src + dst)
    r = np.array(dst + src)
    w = np.ones(s.shape[0])

    t = int(frac * n)
    pos = rng.permutation(n)
    pending = pos < t
    rounds = []
    total_removed = 0

    while pending.any():
        deg = np.bincount(s, minlength=n)
        prio = np.minimum(deg, 10**5) * (n + 1) + pos
        p = np.where(pending, prio, np.iinfo(np.int64).max)

        elim = np.zeros(n, bool)
        cand = pending.copy()
        for _ in range(subiters):
            if not cand.any():
                break
            pc = np.where(cand, prio, np.iinfo(np.int64).max)
            nmin = np.full(n, np.iinfo(np.int64).max)
            np.minimum.at(nmin, s, pc[r])
            sel = cand & (prio < nmin)
            elim |= sel
            # remove sel and its neighbors from candidates
            nbr_sel = np.zeros(n, bool)
            np.logical_or.at(nbr_sel, s, sel[r])
            cand &= ~(sel | nbr_sel)

        k = int(elim.sum())
        if k == 0:
            break
        rounds.append(k)
        total_removed += k

        # rewire: for each eliminated column, suffix sampling in r order
        order = np.lexsort((r, s))
        s, r, w = s[order], r[order], w[order]
        es = elim[s]
        er = elim[r]
        new_s, new_r, new_w = [], [], []
        # keep untouched edges
        keep = ~es & ~er
        ks_, kr_, kw_ = s[keep], r[keep], w[keep]
        # process eliminated columns
        cols = np.flatnonzero(elim)
        idx_by_col = np.searchsorted(s, np.arange(n + 1))
        for i in cols:
            lo, hi = idx_by_col[i], idx_by_col[i + 1]
            if hi <= lo:
                continue
            rv = r[lo:hi]
            vv = w[lo:hi]
            csum = vv.sum()
            cum = np.cumsum(vv)
            for j in range(hi - lo - 1):
                suf = csum - cum[j]
                u = rng.random()
                x = cum[j] + u * suf
                q = np.searchsorted(cum, x, side="right")
                q = min(q, hi - lo - 1)
                new_s.append(rv[j]); new_r.append(rv[q])
                new_w.append(vv[j] * suf / csum)
        add_s = np.array(new_s + new_r, dtype=np.int64)
        add_r = np.array(new_r + new_s, dtype=np.int64)
        add_w = np.array(new_w + new_w)
        s = np.concatenate([ks_, add_s])
        r = np.concatenate([kr_, add_r])
        w = np.concatenate([kw_, add_w])
        # coalesce
        key = s * (n + 1) + r
        uk, inv = np.unique(key, return_inverse=True)
        w2 = np.zeros(uk.shape[0])
        np.add.at(w2, inv, w)
        s = uk // (n + 1)
        r = uk % (n + 1)
        w = w2
        pending &= ~elim

    return rounds, total_removed, s.shape[0]


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    for subiters in (1, 2, 4, 8):
        rounds, removed, edges = simulate(n=n, subiters=subiters)
        rr = np.array(rounds)
        print(f"subiters={subiters}: rounds={len(rounds)} removed={removed} "
              f"final_edges={edges} sizes head={rr[:8].tolist()} "
              f"tail={rr[-8:].tolist()}", flush=True)
