#!/usr/bin/env python3
"""Renders the sf1 full-suite parity table for BASELINE.md from a
check_oracle.py log (PASS/FAIL/DNF lines).

Usage: python3 tools/render_sf1_table.py <check_oracle_log>
"""
import re
import sys


def main(log_path: str) -> None:
    rows = []
    for line in open(log_path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
        if m:
            rows.append((m.group(1), "pass", int(m.group(2))))
            continue
        m = re.match(r"DNF  (\S+): oracle exceeded (\S+)s \(engine rows: (\d+)\)",
                     line.strip())
        if m:
            rows.append((m.group(1), f"oracle DNF >{m.group(2)}s",
                         int(m.group(3))))
            continue
        m = re.match(r"FAIL (\S+):", line.strip())
        if m:
            rows.append((m.group(1), "FAIL", -1))
    n_pass = sum(1 for r in rows if r[1] == "pass")
    n_dnf = sum(1 for r in rows if r[1].startswith("oracle DNF"))
    n_fail = sum(1 for r in rows if r[1] == "FAIL")
    print(f"{len(rows)} queries: {n_pass} hash-parity pass, "
          f"{n_dnf} oracle-DNF (engine-only), {n_fail} FAIL\n")
    print("| query | sf1 result | engine rows |")
    print("|---|---|---|")
    for name, status, nrows in sorted(rows):
        print(f"| {name} | {status} | {nrows if nrows >= 0 else '—'} |")


if __name__ == "__main__":
    main(sys.argv[1])
