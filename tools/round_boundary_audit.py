#!/usr/bin/env python3
"""Audit dumped Verify results for values near decimal-rounding boundaries
(driver-side tooling only — not part of the shipped Scala library).

Usage: python3 tools/round_boundary_audit.py <verifyOutDir> [epsilon]

Spark (Java BigDecimal on the shortest repr) and DuckDB (scale by 10^n,
then round) disagree on doubles within ~1 ulp of a half boundary — see
NOTES_r5.md (eval_langkit's ari). Any query column holding RAW doubles
that an oracle re-derives and rounds is one unlucky input away from a
hash mismatch.

Limits: dumps hold post-round values, so a column already rounded at
scale n cannot reveal its own pre-round boundary cases (those surface as
check_oracle mismatches instead). What this catches is raw double
columns drifting within epsilon of the repo's round-6 half grid — the
early-warning case for oracles that round at 6, this repo's convention.
Exit 1 when anything is flagged. Columns canonicalized via floor(x*1e6)
are integers and never flagged.
"""
import math
import os
import sys

import pyarrow.parquet as pq

SCALE = 1e6


def near_half(v: float, eps: float) -> bool:
    if v is None or not math.isfinite(v):
        return False
    frac = abs(v) * SCALE
    frac = frac - math.floor(frac)
    return abs(frac - 0.5) < eps


def main() -> None:
    out_dir = sys.argv[1]
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-9
    flagged = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            table = pq.read_table(path)
        except Exception:
            continue
        for col in table.schema.names:
            typ = str(table.schema.field(col).type)
            if typ not in ("double", "float"):
                continue
            hits = [v for v in table[col].to_pylist() if near_half(v, eps)]
            if hits:
                flagged += len(hits)
                print(f"NEAR-BOUNDARY {name}.{col}: "
                      f"{len(hits)} value(s), e.g. {hits[0]!r}")
    if flagged:
        print(f"{flagged} value(s) within eps of a 1e-6 rounding half boundary")
        sys.exit(1)
    print("no values near a 1e-6 rounding half boundary")


if __name__ == "__main__":
    main()
