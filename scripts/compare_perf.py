#!/usr/bin/env python3
"""Perf regression gate (reference: scripts/compare_perf.py semantics).

Compares two performance CSVs (schema: run_id,profile,sf,N,pps,
cycles_per_symbol); exits 2 when any profile's pps drops or cycles/symbol
rises versus the baseline.
"""
import csv
import sys


def load(path):
    with open(path, newline="") as f:
        return {row["profile"]: {
            "pps": float(row["pps"]),
            "cycles_per_symbol": float(row["cycles_per_symbol"] or 0)}
            for row in csv.DictReader(f)}


def main() -> int:
    if len(sys.argv) != 3:
        print("usage: compare_perf.py <baseline.csv> <new.csv>")
        return 1
    base, new = load(sys.argv[1]), load(sys.argv[2])
    reg = []
    for profile, m in new.items():
        if profile not in base:
            continue
        b = base[profile]
        if (m["pps"] < b["pps"]
                or m["cycles_per_symbol"] > b["cycles_per_symbol"]):
            reg.append((profile, b, m))
    if reg:
        print("REGRESSION DETECTED")
        for profile, b, m in reg:
            print(f"{profile}: pps {b['pps']:.2f}->{m['pps']:.2f}, "
                  f"cycles/sym {b['cycles_per_symbol']:.2f}->"
                  f"{m['cycles_per_symbol']:.2f}")
        return 2
    print("No regressions detected.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
