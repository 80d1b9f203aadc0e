#!/usr/bin/env python3
"""Two-point scaling report: compare graft.Bench artifacts from two
generated dirs (same distribution, mult=1 vs mult=N) and emit a
per-family slope table.

Usage: python3 tools/scaling_report.py SCALING_r08_1x.json SCALING_r08_10x.json 10
"""
import json
import sys

FAMILIES = {
    "headline": [
        "q01_", "q02_", "q03_", "q04_", "q05_", "q06_", "q07_", "q08_",
        "q09_", "q10_", "q11_", "q12_", "q13_", "q14_", "q15_", "q16_",
        "q17_", "q18_", "q19_", "q20_"],
    "dedup": ["q21_", "q26_", "q27_", "q28_", "q57_", "q58_", "q60_",
              "q61_", "q62_"],
    "ann": ["q29_", "q30_", "q47_", "q48_", "q83_", "q85_", "q88_", "q89_"],
    "scd2": ["q80_", "q82_", "q84_"],
    "snapshot": ["q42_"],
}


def family(q: str) -> str:
    for fam, prefixes in FAMILIES.items():
        if any(q.startswith(p) for p in prefixes):
            return fam
    return "other"


def load(path: str) -> dict:
    b = json.load(open(path))
    qs = dict(b.get("queries", {}))
    qs.update(b.get("aux_queries", {}))
    return {k: v for k, v in qs.items() if v is not None and v >= 0}


def main(p1: str, pn: str, mult: float) -> None:
    t1, tn = load(p1), load(pn)
    common = sorted(set(t1) & set(tn))
    rows = []
    for q in common:
        slope = tn[q] / t1[q] if t1[q] > 0 else float("nan")
        rows.append((q, family(q), t1[q], tn[q], slope))
    rows.sort(key=lambda r: (r[1], r[0]))
    print(f"| query | family | t(1x) s | t({mult:g}x) s | slope | vs {mult:g}x |")
    print("|---|---|---|---|---|---|")
    for q, fam, a, b, s in rows:
        verdict = ("sub-linear" if s < 0.8 * mult
                   else "~linear" if s <= 1.5 * mult
                   else "SUPER-LINEAR")
        print(f"| {q} | {fam} | {a:.2f} | {b:.2f} | {s:.1f}x | {verdict} |")
    # per-family sums
    print()
    print(f"| family | sum t(1x) | sum t({mult:g}x) | slope |")
    print("|---|---|---|---|")
    for fam in list(FAMILIES) + ["other"]:
        fa = sum(a for q, f, a, b, s in rows if f == fam)
        fb = sum(b for q, f, a, b, s in rows if f == fam)
        if fa > 0:
            print(f"| {fam} | {fa:.2f} | {fb:.2f} | {fb / fa:.1f}x |")
    only1 = sorted(set(t1) - set(tn))
    if only1:
        print(f"\nmeasured at 1x only (excluded at {mult:g}x): " +
              ", ".join(only1))


def main3(p1: str, p10: str, p100: str) -> None:
    """Three-point report (1x/10x/100x): per-segment slopes bound the
    curvature two points cannot — a gently super-linear query shows a
    growing segment slope (s2 >> s1), a linear one holds s2 ~ s1 ~ 10."""
    t1, t10, t100 = load(p1), load(p10), load(p100)
    common = sorted(set(t1) & set(t10) & set(t100))
    rows = [(q, family(q), t1[q], t10[q], t100[q],
             t10[q] / t1[q], t100[q] / t10[q]) for q in common]
    rows.sort(key=lambda r: (r[1], r[0]))
    print("| query | family | t(1x) s | t(10x) s | t(100x) s "
          "| slope 1→10x | slope 10→100x | curvature |")
    print("|---|---|---|---|---|---|---|---|")
    for q, fam, a, b, c, s1, s2 in rows:
        curv = ("flattening" if s2 < 0.8 * s1
                else "steady" if s2 <= 1.25 * max(s1, 1.0)
                else "steepening")
        print(f"| {q} | {fam} | {a:.2f} | {b:.2f} | {c:.2f} "
              f"| {s1:.1f}x | {s2:.1f}x | {curv} |")
    print()
    print("| family | sum t(1x) | sum t(10x) | sum t(100x) "
          "| slope 1→10x | slope 10→100x |")
    print("|---|---|---|---|---|---|")
    for fam in list(FAMILIES) + ["other"]:
        fa = sum(r[2] for r in rows if r[1] == fam)
        fb = sum(r[3] for r in rows if r[1] == fam)
        fc = sum(r[4] for r in rows if r[1] == fam)
        if fa > 0:
            print(f"| {fam} | {fa:.2f} | {fb:.2f} | {fc:.2f} "
                  f"| {fb / fa:.1f}x | {fc / fb:.1f}x |")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3].endswith(".json"):
        main3(sys.argv[1], sys.argv[2], sys.argv[3])
    else:
        main(sys.argv[1], sys.argv[2],
             float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
