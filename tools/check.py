#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB differential oracle.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, loads the Spark result parquet for
the same query name, sorts columns by name (as the driver does), and
compares cell-by-cell. Exact comparison — any float divergence is a
bug in the query/oracle pair, not noise (see graft.ops.Det).

Dev-only tool: the library itself has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    matched = {}  # name -> row count, for the sf0.1 ledger
    # exempt failures tracked separately: they affect the exit code but
    # not the "N/N oracles match" summary denominator
    exempt_failures = []
    # oracle-exempt queries still get the driver's rows-only check:
    # flag empty or missing outputs
    import os
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in oracles:
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            status = f"OK   {name}: {n} rows (no oracle)" if n else \
                f"WARN {name}: EMPTY output (rows-only check would look bad)"
            print(status)
        except Exception as e:
            exempt_failures.append(name)
            print(f"FAIL {name}: unreadable exempt output: {e}")
    # a query that THREW during Verify leaves no output dir — without
    # failures.json it would read as "not dumped here — partial run"
    # and a full run would still report N/N match (ADVICE r12). Verify
    # writes failures.json even when empty, so every selected query is
    # either a dir or a failure entry; only genuinely-unselected
    # queries fall through to "skipped".
    # ... and a Verify JVM that DIED mid-run (OOM, kill) leaves no
    # failures.json at all — the dumped subset would otherwise read
    # as a clean partial run. Verify writes the file at the end of
    # EVERY run (filtered ones included), so absence is itself a
    # hard failure, not an empty default.
    try:
        with open(f"{out_dir}/failures.json") as f:
            verify_failures = json.load(f)
    except (OSError, ValueError) as e:
        print(f"FAIL <run>: {out_dir}/failures.json missing/unreadable "
              f"({e}) — Verify did not complete; the dumped subset "
              f"proves nothing")
        return 1
    for name, err in sorted(verify_failures.items()):
        failures.append(name)
        print(f"FAIL {name}: threw during Verify: {str(err)[:200]}")
    skipped = 0
    for name, sql in sorted(oracles.items()):
        if name in verify_failures:
            continue
        # partial dev runs (SPARK_GRAFT_ONLY): only compare queries
        # that were dumped into THIS dir — oracle_sql.json always
        # carries the full registered map, and running every sf0.1
        # oracle to check two queries costs tens of minutes. Full runs
        # have every dir, so nothing is ever skipped there; per-query
        # Verify crashes come from failures.json above.
        if not os.path.isdir(os.path.join(out_dir, name)):
            skipped += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark result missing: {e}")
            continue
        oracle = oracle.reindex(sorted(oracle.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(oracle.columns) != list(got.columns):
            failures.append(name)
            print(f"FAIL {name}: columns differ oracle={list(oracle.columns)} "
                  f"spark={list(got.columns)}")
            continue
        if len(oracle) != len(got):
            failures.append(name)
            print(f"FAIL {name}: rows differ oracle={len(oracle)} spark={len(got)}")
            continue
        bad = 0
        for col in oracle.columns:
            a, b = oracle[col].tolist(), got[col].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    if x != y:
                        if bad < 3:
                            print(f"  {name}.{col}[{i}]: oracle={x!r} spark={y!r} "
                                  f"diff={abs(x - y):g}")
                        bad += 1
                elif str(x) != str(y):
                    if bad < 3:
                        print(f"  {name}.{col}[{i}]: oracle={x!r} spark={y!r}")
                    bad += 1
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {bad} mismatched cells ({len(oracle)} rows)")
        else:
            matched[name] = len(oracle)
            print(f"OK   {name}: {len(oracle)} rows match")
    print(f"\n{len(matched)}/"
          f"{len(oracles) - skipped} queries match"
          + (f" ({skipped} not dumped here — partial run)" if skipped
             else ""))
    if exempt_failures:
        print(f"({len(exempt_failures)} exempt outputs unreadable: "
              f"{', '.join(exempt_failures)})")
    # sf0.1 verification ledger: a checked-in per-query record of the
    # last full-scale hash match, kept current by THIS tool (the only
    # place that knows "matched") whenever it runs against sf0.1.
    # RegistrationDisciplineSpec requires every registered query to
    # have an entry, turning round 11's one-time sweep into a
    # standing invariant. Partial runs (SPARK_GRAFT_ONLY) update only
    # the queries that matched; keys gone from oracle_sql.json are
    # pruned (that file always carries the full registered map).
    if "sf0.1" in os.path.basename(os.path.normpath(sf_dir)):
        import datetime
        ledger_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "SF01_LEDGER.json")
        try:
            with open(ledger_path) as f:
                ledger = json.load(f)
        except (OSError, ValueError):
            ledger = {}
        today = datetime.date.today().isoformat()
        for name, rows in matched.items():
            ledger[name] = {"rows": rows, "date": today}
        ledger = {k: v for k, v in sorted(ledger.items()) if k in oracles}
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"sf0.1 ledger updated: {len(matched)} entries refreshed, "
              f"{len(ledger)} total")
    return 1 if failures or exempt_failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
