"""Price the IMPLEMENTED static schedule of the staged kernel against the
ideal (infinitely-fine-ladder) roofline, per cost category.

The roofline model (rlap_tpu/bench/roofline.py) prices every op at exactly
the elements it must touch; `schedule_ms` prices the real kernel's static
sizes. `predicted_actual - ideal` decomposes the measured roofline gap
(BENCH_r05: 587 ms vs 295 ms at BA(100k)) into named quantization terms —
the evidence for which lever (if any) is worth pulling next; the residue
vs the measured time is per-op XLA overhead. Table committed in
BENCH_EXTRA.md.

Usage: python tools/quantized_roofline.py [n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlap_tpu.bench.roofline import schedule_ms, simulate  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    res = simulate(n)
    sched = schedule_ms(n, res)
    ideal = res["breakdown_ms"]
    qms = sched["breakdown_ms"]
    rows = sorted(set(ideal) | set(qms))
    print(f"n={n} rounds={res['rounds']}")
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
    print(json.dumps(dict(n=n, rounds=res["rounds"], ideal_ms=ideal,
                          sched_ms=qms, entry_exit_ms=ee,
                          ideal_total_ms=tot_i + ee,
                          sched_total_ms=sched["sched_ms"])))


if __name__ == "__main__":
    main()
