#!/usr/bin/env python3
"""Driver-artifact guard (r16 verdict #2): the round's formal correctness
signal is the driver-written CORRECTNESS_r{N}.json, and r16's arrived as
an EMPTY `{}` without anything in the repo noticing — every query was
formally "untested" that round even though the engine was green. This
guard makes that condition loud and machine-checkable:

  * diff the artifact's query set against the queries graft.Verify
    actually dumped (the Verify outDir's oracle_sql.json keys plus the
    per-query parquet directories — i.e. SparkEntry.queries, measured
    from the artifact of record rather than re-parsed from Scala);
  * FAIL (exit 1) on an empty/unparseable artifact, on queries Verify
    exposes that the artifact never tested, and on any per-query entry
    whose rows/schema/hash checks are false.

Usage: correctness_guard.py CORRECTNESS.json VERIFY_OUTDIR
  VERIFY_OUTDIR is a graft.Verify dump (contains oracle_sql.json and one
  <query>.parquet dir per registry query).

Exit 0 = the artifact covers the registry and every covered check holds.
"""
import json
import os
import sys


def verify_queries(outdir):
    """The query set graft.Verify exposed: parquet dump dirs (every
    registry query, oracled or not) ∪ oracle_sql.json keys."""
    qs = set()
    for name in os.listdir(outdir):
        if name.endswith(".parquet"):
            qs.add(name[: -len(".parquet")])
    sql = os.path.join(outdir, "oracle_sql.json")
    if os.path.exists(sql):
        with open(sql) as f:
            qs |= set(json.load(f).keys())
    return qs


def main():
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    art_path, outdir = sys.argv[1], sys.argv[2]

    try:
        with open(art_path) as f:
            art = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"correctness_guard: FAIL - {art_path} unreadable: {e}")
        return 1
    if not isinstance(art, dict) or not art:
        print(
            f"correctness_guard: FAIL - {art_path} is EMPTY ({art!r}): the "
            "round's formal correctness signal is missing — every query is "
            "formally untested this round (r16 precedent). Re-run the "
            "driver gate or record the gap in NOTES."
        )
        return 1

    expected = verify_queries(outdir)
    if not expected:
        print(f"correctness_guard: FAIL - no queries found under {outdir} "
              "(is this a graft.Verify dump?)")
        return 1

    untested = sorted(expected - set(art))
    extra = sorted(set(art) - expected)
    bad = sorted(
        q
        for q, r in art.items()
        if isinstance(r, dict)
        and not all(
            r.get(k, True) is not False
            for k in ("rows_match", "schema_match", "hash_match")
        )
    )
    # entries that are not dicts at all are malformed
    malformed = sorted(q for q, r in art.items() if not isinstance(r, dict))

    print(
        f"correctness_guard: artifact={len(art)} queries, "
        f"verify={len(expected)}, untested={len(untested)}, "
        f"extra={len(extra)}, failing={len(bad)}, malformed={len(malformed)}"
    )
    for label, names in (
        ("UNTESTED (in Verify, absent from artifact)", untested),
        ("FAILING (a match flag is false)", bad),
        ("MALFORMED entries", malformed),
    ):
        for q in names[:20]:
            print(f"  {label}: {q}")
        if len(names) > 20:
            print(f"  ... {len(names) - 20} more")
    if extra:
        # queries the driver tested that Verify no longer dumps — stale
        # artifact vs newer registry; informational, not fatal
        print(f"  note: {len(extra)} artifact-only queries "
              f"(registry moved on?): {extra[:10]}")

    if untested or bad or malformed:
        print("correctness_guard: FAIL")
        return 1
    print("correctness_guard: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
