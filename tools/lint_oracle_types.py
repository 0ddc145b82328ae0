#!/usr/bin/env python3
"""Oracle result-type lint (round 9, VERDICT r8 task 2).

The driver's correctness gate hashes str()-rendered values from BOTH
engines. DuckDB widens integer sums silently — sum(BIGINT) in a window
or GROUP BY is HUGEINT (int128 -> arrow decimal128) — and a HUGEINT
renders apart from Spark's int64 even when every value agrees (the
round-8 hash-fails: stats_chisq, mm_shard_manifest, mm_interleave).
So: no oracle may surface HUGEINT/UHUGEINT/DECIMAL at its result
boundary; every windowed/grouped integer sum reaching the SELECT needs
CAST(... AS BIGINT) (or AS DOUBLE when the op's contract is float).

Usage: python3 tools/lint_oracle_types.py <sfDir> <oracle_sql.json>
Exits nonzero listing offenders. Run by OracleTypeLintSpec in sbt test.
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
WIDE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_bad = 0
    for name in sorted(oracle):
        try:
            dtypes = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            # DESCRIBE planning failure is itself a broken oracle
            print(f"[DESCRIBE-ERR] {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        wide = [(c, t) for (c, t, *_) in dtypes if t.startswith(WIDE)]
        if wide:
            print(f"[WIDE] {name}: {wide} — wrap in CAST(... AS BIGINT/DOUBLE)")
            n_bad += 1
    print(f"== {len(oracle) - n_bad} ok, {n_bad} wide/broken of {len(oracle)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
