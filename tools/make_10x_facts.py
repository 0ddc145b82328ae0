#!/usr/bin/env python3
"""Build the 10x-facts probe layout (SURVEY §6 scale attribution).

Takes a multi-file layout produced by rematerialize_layout.py and
grows the three FACT tables 10x by concatenating shifted copies:

  - lineitem: l_orderkey += i*1e9  (copies stay join-consistent per
    copy is NOT needed — the 10x probe runs single-fact-table ops)
  - orders:   o_orderkey += i*1e9; o_custkey untouched (the q22
    literal-bounded slice grows 10x per customer, still client-sized)
  - events:   event_id/user_id += i*1e9; ts += i*(span+1h) so event
    DENSITY per second stays constant — q30's within-1s pair count
    grows linearly, not quadratically, matching a corpus that grows
    by covering more time.

Dims and the text/vector corpora copy through unchanged (the probe's
subset is the fact-table ops; doc/embedding ops are layout-probed at
1x). Output is multi-file, one row group per part, preserving order.

Usage:
  python3 tools/make_10x_facts.py <multi_layout_dir> <out_dir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10
SHIFT = 10**9

ALL = ["region", "nation", "customer", "supplier", "part", "orders",
       "lineitem", "events", "documents", "embeddings"]
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
}


def read_multi(d):
    return pq.read_table(d)


def grow(tbl, name):
    span = None
    if name == "events":
        ts = tbl.column("ts")
        span = pc.subtract(pc.max(ts), pc.min(ts)).as_py()
    out = []
    for i in range(COPIES):
        t = tbl
        for k in FACT_KEYS[name]:
            t = t.set_column(t.column_names.index(k), k,
                             pc.add(t.column(k), i * SHIFT))
        if name == "events":
            hour = 3600 * 10**6 if isinstance(span, int) else None
            # ts arithmetic works in the column's unit via a duration
            import datetime
            if isinstance(span, datetime.timedelta):
                delta = (span + datetime.timedelta(hours=1)) * i
            else:  # integer micros
                delta = (span + hour) * i
            t = t.set_column(t.column_names.index("ts"), "ts",
                             pc.add(t.column("ts"), delta))
        out.append(t)
    return pa.concat_tables(out)


def write_parts(tbl, dst, parts):
    os.makedirs(dst, exist_ok=True)
    for old in os.listdir(dst):
        os.remove(os.path.join(dst, old))
    chunk = -(-tbl.num_rows // parts)
    for i in range(parts):
        piece = tbl.slice(i * chunk, chunk)
        if piece.num_rows == 0:
            break
        pq.write_table(piece, os.path.join(dst, f"part-{i:05d}.parquet"),
                       row_group_size=max(1, piece.num_rows))


def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    for name in ALL:
        s = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(s):
            continue
        d = os.path.join(out, f"{name}.parquet")
        if name in FACT_KEYS:
            tbl = grow(read_multi(s), name)
            write_parts(tbl, d, 32)
            print(f"{name}: -> {tbl.num_rows} rows x 32 parts", file=sys.stderr)
        else:
            if os.path.isdir(s):
                if os.path.isdir(d):
                    shutil.rmtree(d)
                shutil.copytree(s, d)
            else:
                shutil.copy(s, d)
            print(f"{name}: copied", file=sys.stderr)


if __name__ == "__main__":
    main()
