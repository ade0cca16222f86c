#!/usr/bin/env python3
"""Compare two graft.Bench recordings query-by-query.

Usage: compare_bench.py BASE.json SCALED.json [ratio_threshold]

Prints every query whose SCALED/BASE wall ratio exceeds the threshold
(default 10.0), plus the calibration ratio when both artifacts carry
calibration fields, so host-load contamination is visible next to the
per-query ratios it would inflate.
"""
import json
import sys


def load(path):
    """Accept either a single JSON object or JSONL with a total line."""
    queries, total, calib = {}, None, {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("metric") == "query":
                queries[d["name"]] = d["value"]
            elif d.get("metric") == "total" or "queries" in d:
                total = d.get("value")
                queries.update(d.get("queries", {}))
                calib = {k: d[k] for k in d if k.startswith("calib") or k.startswith("load")}
    return queries, total, calib


def main():
    base_path, scaled_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    base, base_total, base_cal = load(base_path)
    scaled, scaled_total, scaled_cal = load(scaled_path)
    shared = sorted(set(base) & set(scaled))
    print(f"base: {base_path} total={base_total} n={len(base)} {base_cal}")
    print(f"scaled: {scaled_path} total={scaled_total} n={len(scaled)} {scaled_cal}")
    print(f"shared queries: {len(shared)}  only-base: {sorted(set(base) - set(scaled))}"
          f"  only-scaled: {sorted(set(scaled) - set(base))}")
    rows = []
    for q in shared:
        b, s = base[q], scaled[q]
        ratio = s / b if b > 0 else float("inf")
        rows.append((ratio, q, b, s))
    rows.sort(reverse=True)
    breaches = [r for r in rows if r[0] > threshold]
    print(f"\n{len(breaches)} queries over {threshold}x:")
    for ratio, q, b, s in breaches:
        print(f"  {q:34s} {b:8.2f}s -> {s:8.2f}s  {ratio:6.2f}x")
    print("\ntop 15 by ratio:")
    for ratio, q, b, s in rows[:15]:
        print(f"  {q:34s} {b:8.2f}s -> {s:8.2f}s  {ratio:6.2f}x")
    print("\ntop 15 by scaled wall:")
    for ratio, q, b, s in sorted(rows, key=lambda r: -r[3])[:15]:
        print(f"  {q:34s} {b:8.2f}s -> {s:8.2f}s  {ratio:6.2f}x")


if __name__ == "__main__":
    main()
