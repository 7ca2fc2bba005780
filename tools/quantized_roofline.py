"""Price the IMPLEMENTED static schedule of the staged kernel against the
ideal (infinitely-fine-ladder) roofline, per cost category.

The roofline model (rlap_tpu/bench/roofline.py) prices every op at exactly
the elements it must touch. The real kernel pays static sizes: the pool
sort and sender-side es gather run at the stage prefix P, selection and
the receiver er gather at the smallest cls1 level (A1, A2) covering the
two cls1 ranges, and the post-sort pipeline at the smallest touched-count
rung covering T. This tool replays the same round dynamics and prices
BOTH schedules, so `predicted_actual - ideal` decomposes the measured
roofline gap (BENCH_r05: 587 ms vs 295 ms at BA(100k)) into named
quantization terms — the evidence for which lever (if any) is worth
pulling next.

Usage: python tools/quantized_roofline.py [n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rlap_tpu.bench.roofline import (  # noqa: E402
    NS_ELEM, NS_GATHER, NS_SCAN, NS_SCATTER, NS_SORT_ARR, simulate)


def rnd1024(x, lo=2048):
    return max(lo, ((x + 1023) // 1024) * 1024)


def quantize(n, hist, e_half, packed, subiters=3, b_frac=0.18):
    """Price the implemented schedule from the replay history."""
    n_sort_arr = 3 if packed else 5
    cost = dict(sort=0.0, selection=0.0, esr=0.0, scans=0.0, lookup=0.0,
                classify=0.0, degree=0.0, pack=0.0, vertex=0.0)
    for h in hist:
        P, e_t, T, C1, ACT = h["P"], h["e_t"], h["T"], h["C1"], h["ACT"]
        # selection level ladder: (A1, A2) rungs as in ops.rlap
        b_cap = min(P, ((int(b_frac * P) + 1023) // 1024) * 1024)
        levels = []
        for d in (64, 16, 4, 2, 1):
            lv = (min(e_t, rnd1024(e_t // d)), min(b_cap, rnd1024(b_cap // d)))
            if lv not in levels:
                levels.append(lv)
        # the two cls1 ranges together hold the C1 count; assume the split
        # fits whenever A1 + A2 >= C1 + e_t-resident margin (optimistic for
        # the rung choice, exact in aggregate scale)
        sel_elems = None
        for (A1, A2) in levels:
            if C1 <= A1 + A2:
                sel_elems = A1 + A2
                break
        if sel_elems is None:
            sel_elems = P
        # touched rung
        et_levels = []
        for d in (16, 4, 1):
            v_ = min(e_t, max(4096, ((e_t // d + 1023) // 1024) * 1024))
            if v_ not in et_levels:
                et_levels.append(v_)
        ET = next((v for v in et_levels if T <= v), e_t)

        cost["sort"] += NS_SORT_ARR * n_sort_arr * P
        cost["selection"] += subiters * (NS_GATHER + NS_SCATTER) * 2 * sel_elems
        cost["esr"] += NS_GATHER * (P + sel_elems)
        cost["scans"] += NS_SCAN * 6 * ET
        cost["lookup"] += NS_SORT_ARR * 3 * 2 * ET + NS_SCAN * 2 * ET
        cost["classify"] += NS_GATHER * 2 * ET
        cost["degree"] += NS_SCATTER * 4 * ET
        cost["pack"] += NS_SORT_ARR * 4 * ET
        # replicated vertex-dimension work per round (prio, pack wheres,
        # elim bookkeeping): ~7 n-sized elementwise arrays per sub-round +
        # ~6 per round body
        cost["vertex"] += NS_ELEM * n * (7 * subiters + 6)
    return cost


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    res = simulate(n)
    e_half = None
    packed = n * (n + 2) + 4 < np.iinfo(np.int32).max
    q = quantize(n, res["hist"], e_half, packed)
    ideal = res["breakdown_ms"]
    qms = {k: v / 1e6 for k, v in q.items()}
    rows = sorted(set(ideal) | set(qms))
    print(f"n={n} rounds={res['rounds']} packed={packed}")
    print(f"{'category':<10} {'ideal_ms':>9} {'sched_ms':>9} {'delta':>8}")
    tot_i = tot_q = 0.0
    for k in rows:
        i, s = ideal.get(k, 0.0), qms.get(k, 0.0)
        tot_i += i
        tot_q += s
        print(f"{k:<10} {i:9.1f} {s:9.1f} {s - i:8.1f}")
    ee = res["entry_exit_ms"]
    print(f"{'entry/exit':<10} {ee:9.1f} {ee:9.1f} {0.0:8.1f}")
    print(f"{'TOTAL':<10} {tot_i + ee:9.1f} {tot_q + ee:9.1f} "
          f"{tot_q - tot_i:8.1f}")
    out = dict(n=n, rounds=res["rounds"], ideal_ms=ideal,
               sched_ms=qms, entry_exit_ms=ee,
               ideal_total_ms=tot_i + ee, sched_total_ms=tot_q + ee)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
