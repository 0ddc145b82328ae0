#!/usr/bin/env python3
"""Self-check harness mirroring the driver's correctness gate:
run Verify output (parquet per query) against oracle_sql.json in DuckDB
over the same sf dir's parquet tables; compare schema/rows/values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb, pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def rows_of(cols, names):
    rows = list(zip(*[[norm(v) for v in c] for c in cols])) if cols else []
    order = sorted(range(len(names)), key=lambda i: names[i])
    names2 = [names[i] for i in order]
    rows2 = sorted([tuple(r[i] for i in order) for r in rows],
                   key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return names2, rows2

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        # concatenate ALL part files — relying on Verify's coalesce(1)
        # would silently compare a subset if output ever multi-parts
        import pyarrow as pa
        tb = pa.concat_tables([pq.read_table(f) for f in files])
        s_names, s_rows = rows_of([tb.column(i).to_pylist() for i in range(tb.num_columns)], list(tb.column_names))
        try:
            res = con.execute(oracle[name])
            d_names = [d[0] for d in res.description]
            cols = list(zip(*res.fetchall())) or [[] for _ in d_names]
            d_names, d_rows = rows_of([list(c) for c in cols], d_names)
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        if [n.lower() for n in s_names] != [n.lower() for n in d_names]:
            print(f"[SCHEMA] {name}: spark={s_names} duck={d_names}"); n_bad += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"[ROWS] {name}: spark={len(s_rows)} duck={len(d_rows)}")
            print("  spark:", s_rows[:3], "\n  duck :", d_rows[:3]); n_bad += 1; continue
        # decimal-typed OUTPUT columns are banned: result consumers
        # render Decimal('138014.00') vs float 138014.0 differently, so
        # any trailing-zero value flips a strict hash even when values
        # are equal (the round-2 driver hash-fails). Decimals stay
        # internal; the query boundary must be double/int/string.
        decs = [f.name for f in tb.schema if str(f.type).startswith("decimal")]
        if decs:
            print(f"[DECIMAL-BOUNDARY] {name}: output columns {decs}"); n_bad += 1; continue
        # ... and symmetrically on the DUCK side (the round-8 driver
        # hash-fails): an uncast sum(...) OVER/GROUP BY of a BIGINT is
        # HUGEINT (int128 -> arrow decimal128), which str()-renders
        # apart from Spark's int64 even when every value agrees. Every
        # windowed/grouped integer sum reaching the oracle's SELECT
        # needs CAST(... AS BIGINT).
        try:
            dtypes = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            wide = [(c, t) for (c, t, *_) in dtypes
                    if t.startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))]
            if wide:
                print(f"[DUCK-TYPE-BOUNDARY] {name}: oracle columns {wide} — "
                      "wrap in CAST(... AS BIGINT/DOUBLE)"); n_bad += 1; continue
        except Exception as e:
            # DESCRIBE can fail on multi-statement oracles. The value
            # check still runs, but say so LOUDLY (ADVICE r9) — the
            # float-coerced value compare cannot catch the
            # HUGEINT-render class this gate exists for — and fall
            # back to sniffing the FETCHED values: duckdb surfaces
            # HUGEINT/DECIMAL results as python Decimal objects.
            print(f"[DESCRIBE-SKIP] {name}: duck type gate degraded to "
                  f"fetched-value sniff ({type(e).__name__}: {e})")
            wide = sorted({d_names[i] for r in d_rows for i, x in enumerate(r)
                           if hasattr(x, 'as_tuple')})
            if wide:
                print(f"[DUCK-TYPE-BOUNDARY] {name}: fetched Decimal values in "
                      f"{wide} — wrap in CAST(... AS BIGINT/DOUBLE)")
                n_bad += 1; continue
        bad = render_bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            ca = [float(x) if hasattr(x, 'as_tuple') or isinstance(x, (int, float)) and not isinstance(x, bool) else x for x in a]
            cb = [float(x) if hasattr(x, 'as_tuple') or isinstance(x, (int, float)) and not isinstance(x, bool) else x for x in b]
            if ca != cb: bad = (i, a, b); break
            # strict render parity, emulating a str()-keyed hash: a
            # value pair that is numerically equal but renders apart
            # (Decimal vs float repr) is still a driver hash mismatch
            ra = [repr(x) if isinstance(x, float) else str(x) for x in a]
            rb = [repr(x) if isinstance(x, float) else str(x) for x in b]
            if ra != rb and not render_bad: render_bad = (i, ra, rb)
        if bad:
            print(f"[VAL] {name}: row {bad[0]}\n  spark: {bad[1]}\n  duck : {bad[2]}"); n_bad += 1
        elif render_bad:
            print(f"[RENDER] {name}: row {render_bad[0]} equal values, unequal renderings"
                  f"\n  spark: {render_bad[1]}\n  duck : {render_bad[2]}"); n_bad += 1
        else:
            print(f"[OK] {name}: {len(s_rows)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
