#!/usr/bin/env python3
"""Scale-soak ratio report: per-query sf0.1 -> sf1 scaling.

Usage: tools/scaling_report.py <bench_sf0.1.json> <bench_sf1.json> [factor]

The dataset factor defaults to 10 (ScaleGen's default). A query is flagged
super-linear when time_sf1 / time_sf0.1 > flag_ratio (default 1.5 x factor
is NOT used: at local[32] most small queries are overhead-dominated, so the
interesting signal is the ratio itself; anything well beyond the data
growth factor scales worse than linearly).
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs_small, qs_big = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs_big):
        if name not in qs_small:
            continue
        t0, t1 = qs_small[name], qs_big[name]
        if t0 <= 0 or t1 <= 0:  # -1 sentinel = failed
            rows.append((float("inf"), name, t0, t1))
            continue
        rows.append((t1 / t0, name, t0, t1))
    rows.sort(reverse=True)
    print(f"{'query':34} {'sf0.1':>8} {'sf1':>8} {'ratio':>7}  note")
    for ratio, name, t0, t1 in rows:
        note = ""
        if ratio == float("inf"):
            note = "FAILED"
        elif ratio > factor * 1.5:
            note = f"SUPER-LINEAR (> {factor * 1.5:.0f}x)"
        elif ratio > factor:
            note = "above data factor"
        elif ratio < 2.0:
            note = "overhead-dominated"
        print(f"{name:34} {t0:8.3f} {t1:8.3f} {ratio:7.2f}  {note}")
    tot0 = sum(t for t in qs_small.values() if t > 0)
    tot1 = sum(t for t in qs_big.values() if t > 0)
    print(f"\n{'TOTAL':34} {tot0:8.2f} {tot1:8.2f} {tot1 / tot0:7.2f}")
    print(f"failed at sf1: {big.get('failed', [])}")
    print(f"pass_totals sf1: {big.get('pass_totals')}")


if __name__ == "__main__":
    main()
