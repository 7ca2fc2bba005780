"""Simulate the staged kernel's round dynamics to size the selection
restriction win: per-round counts of

  A  = edges with >= 1 pending endpoint (what es/er + sorts must cover)
  B  = edges with BOTH endpoints pending (all Luby selection ever needs:
       non-candidate neighbors contribute pack=big and never block)
  T  = touched edges (columns of the round's eliminated set)

on BA(n, m) with t = n/2, o_v=random, priority (deg, pos), 3 Luby
sub-rounds, touched budget e_t = pool/4 — the production bench shape's
schedule. Emission partners are sampled uniformly per column (weight
magnitudes don't change counts materially).

Usage: python tools/sim_counts.py [n] [m] [seed]
"""

import sys

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    rng = np.random.default_rng(seed)

    # BA construction matching rlap_tpu.data.synthetic.barabasi_albert
    targets = np.arange(m)
    edges = []
    rep = []
    for v in range(m, n):
        for t_ in targets[:m] if v == m else rng.choice(
                rep, size=m, replace=False):
            pass
        if v == m:
            chosen = np.arange(m)
        else:
            chosen = np.unique(rng.choice(rep, size=m))
        for u in chosen:
            edges.append((min(u, v), max(u, v)))
        rep.extend(chosen.tolist())
        rep.extend([v] * len(chosen))
    e = np.array(sorted(set(edges)), dtype=np.int64)
    E0 = len(e)
    print(f"n={n} m={m} canonical edges={E0}")

    t = n // 2
    pos = rng.permutation(n)
    pending = pos < t
    e_half = E0  # pool capacity reference
    e_t_budget = max(e_half // 4, 1024)

    s, r = e[:, 0].copy(), e[:, 1].copy()
    rounds = 0
    totals = dict(A=0, B=0, T=0, P=0)
    print(f"{'rnd':>3} {'npend':>7} {'A':>8} {'B':>8} {'T':>8} {'elim':>7}")
    while pending.any() and rounds < 100:
        live = s >= 0
        deg = np.bincount(s[live], minlength=n) + np.bincount(
            r[live], minlength=n)
        ps, pr = pending[s[live]], pending[r[live]]
        A = int((ps | pr).sum())
        B = int((ps & pr).sum())

        # 3 packed Luby sub-rounds on (deg, pos) minima
        prio = deg.astype(np.int64) * (n + 1) + pos
        sel = np.zeros(n, bool)
        cand = pending.copy()
        BIG = np.iinfo(np.int64).max
        sl, rl = s[live], r[live]
        for _ in range(3):
            pack = np.where(sel, -1, np.where(cand, prio, BIG))
            nmin = np.full(n, BIG)
            np.minimum.at(nmin, sl, pack[rl])
            np.minimum.at(nmin, rl, pack[sl])
            snew = cand & (prio < nmin) & (nmin >= 0)
            sel |= snew
            cand &= ~snew & (nmin >= 0)

        # budget trim (cheapest prio first, cumulative deg <= e_t)
        nodes = np.nonzero(sel)[0]
        order = nodes[np.argsort(prio[nodes])]
        csum = np.cumsum(deg[order])
        keep = order[csum <= e_t_budget]
        elim = np.zeros(n, bool)
        elim[keep] = True

        es, er = elim[s[live]], elim[r[live]]
        touched = es | er
        T = int(touched.sum())

        # apply: remove touched, emit d-1 clique edges per column
        idx_l = np.nonzero(live)[0]
        tl = idx_l[touched]
        owners = np.where(elim[s[tl]], s[tl], r[tl])
        others = np.where(elim[s[tl]], r[tl], s[tl])
        new_edges = []
        for o in np.unique(owners):
            nbrs = others[owners == o]
            # duplicate-merge
            nbrs = np.unique(nbrs)
            d = len(nbrs)
            if d >= 2:
                # suffix partner per neighbor except last (random order)
                nbrs = rng.permutation(nbrs)
                for j in range(d - 1):
                    k = nbrs[rng.integers(j + 1, d)]
                    a, b = (nbrs[j], k) if nbrs[j] < k else (k, nbrs[j])
                    new_edges.append((a, b))
        s[tl] = -1
        r[tl] = -1
        if new_edges:
            ne = np.array(new_edges)
            s = np.concatenate([s[s >= 0], ne[:, 0]])
            r = np.concatenate([r[r >= 0], ne[:, 1]])
            # coalesce
            key = s.astype(np.int64) * (n + 1) + r
            _, ui = np.unique(key, return_index=True)
            s, r = s[ui], r[ui]
        else:
            s, r = s[s >= 0], r[r >= 0]

        pending &= ~elim
        rounds += 1
        totals["A"] += A
        totals["B"] += B
        totals["T"] += T
        totals["P"] += len(s)
        print(f"{rounds:>3} {int(pending.sum()):>7} {A:>8} {B:>8} "
              f"{T:>8} {int(elim.sum()):>7}")

    print(f"rounds={rounds}")
    print("sums:", {k: v for k, v in totals.items()})
    print(f"B/A element ratio: {totals['B'] / max(totals['A'], 1):.3f}; "
          f"B/P: {totals['B'] / max(totals['P'], 1):.3f}")


if __name__ == "__main__":
    main()
