#!/usr/bin/env python3
"""Re-materialize a testdata scale dir into a multi-file layout.

MEASUREMENT tool for the scan-parallelism experiment (SURVEY §6): the
driver's sf0.1 parquet files are each ONE row group, and a row group
is the atomic unit of parallel parquet scanning — in BOTH Spark and
DuckDB the file's scan runs on one core no matter how many are idle.
That is the opposite of the 100 TB layout this engine targets, where
a table is thousands of ~128 MB files and every scan fans out.

This script rewrites each table into `<name>.parquet/part-NNNNN.parquet`
(a directory — both `spark.read.parquet` and DuckDB's
`read_parquet('.../*.parquet')` accept it), preserving global row
order across the lexicographically named parts, one row group per
part. Data is bit-identical; only the physical layout changes. The
driver's testdata is never touched — output goes to a scratch dir.

Usage:
  python3 tools/rematerialize_layout.py <sf_dir> <out_dir>
"""
import math
import os
import sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# rows per part file: big fact tables split by row count; the small
# CPU-dense corpora (every text/dedup/ANN op is compute-bound per row,
# not IO-bound) get a fixed fan-out so their operators parallelize too
ROWS_PER_PART = 12500
FORCED_PARTS = {"documents": 8, "embeddings": 8}
MAX_PARTS = 32


def n_parts(name, rows):
    if name in FORCED_PARTS:
        return FORCED_PARTS[name]
    return max(1, min(MAX_PARTS, rows // ROWS_PER_PART))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        parts = n_parts(t, tbl.num_rows)
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        for old in os.listdir(dst):
            os.remove(os.path.join(dst, old))
        chunk = math.ceil(tbl.num_rows / parts)
        for i in range(parts):
            piece = tbl.slice(i * chunk, chunk)
            pq.write_table(piece, os.path.join(dst, f"part-{i:05d}.parquet"),
                           row_group_size=max(1, piece.num_rows))
        print(f"{t}: {tbl.num_rows} rows -> {parts} part(s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
