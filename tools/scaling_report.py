"""Measured scaling exponents between two bench runs at different SFs.

For each query present in both BENCH_RESULT-style files, prints the
cold/warm times and the measured exponent e = log(t_hi/t_lo)/log(ratio)
(t ∝ data^e): e≈1 is linear, e≈0 is input-size-invariant (fixed-size
fixtures, bounded side inputs), e>1.2 is a scale finding to explain or
fix. Warm times are the steady-state signal (cold includes per-query
plan compile, which is size-invariant and so biases e DOWN at small t).

Usage:
  python tools/scaling_report.py LO.json HI.json RATIO [query ...]
e.g.
  python tools/scaling_report.py /tmp/bench_result_sf01.json \
      BENCH_RESULT.json 10
"""

from __future__ import annotations

import json
import math
import sys


def main():
    lo_f, hi_f, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:]
    lo = json.load(open(lo_f))
    hi = json.load(open(hi_f))
    lo_c, hi_c = lo["queries"], hi["queries"]
    lo_w, hi_w = lo.get("queries_warm", {}), hi.get("queries_warm", {})
    if not names:
        names = [
            n
            for n in lo_c
            if isinstance(lo_c.get(n), (int, float))
            and isinstance(hi_c.get(n), (int, float))
        ]

    def exp(a, b):
        if not (
            isinstance(a, (int, float))
            and isinstance(b, (int, float))
            and a > 0
            and b > 0
        ):
            return None
        return math.log(b / a) / math.log(ratio)

    rows = []
    for n in names:
        ec = exp(lo_c.get(n), hi_c.get(n))
        ew = exp(lo_w.get(n), hi_w.get(n))
        rows.append((n, lo_c.get(n), hi_c.get(n), ec, lo_w.get(n), hi_w.get(n), ew))
    rows.sort(key=lambda r: -(r[6] if r[6] is not None else r[3] or -9))
    print("| query | cold lo | cold hi | e_cold | warm lo | warm hi | e_warm |")
    print("|---|---|---|---|---|---|---|")
    for n, cl, ch, ec, wl, wh, ew in rows:
        f = lambda v: f"{v:.2f}" if isinstance(v, (int, float)) else "—"
        print(
            f"| {n} | {f(cl)} | {f(ch)} | {f(ec)} | {f(wl)} | {f(wh)} | {f(ew)} |"
        )


if __name__ == "__main__":
    main()
