#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script exists so we can catch
Spark↔DuckDB mismatches before the driver does).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Compares each <verifyOutDir>/<name> parquet dump against DuckDB running
<verifyOutDir>/oracle_sql.json's SQL over <sfDir>/*.parquet, with columns
sorted by name (mirrors the driver: sorts columns by name before hashing).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_bad += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_bad += 1
            continue
        tmis = [(c, got.schema.field(c).type, want.schema.field(c).type)
                for c in gcols
                if got.schema.field(c).type != want.schema.field(c).type]
        if tmis:
            print(f"FAIL {name}: dtype mismatch {tmis}")
            n_bad += 1
            continue
        grows = [[canon(r[c]) for c in gcols] for r in got.to_pylist()]
        wrows = [[canon(r[c]) for c in wcols] for r in want.to_pylist()]
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rowcount {len(grows)} != {len(wrows)}")
            n_bad += 1
            continue
        if grows != wrows:
            # unordered compare as a hint whether it's an ordering-only diff
            order_only = sorted(map(tuple, grows)) == sorted(map(tuple, wrows))
            bad = next(i for i, (g, w) in enumerate(zip(grows, wrows)) if g != w)
            print(f"FAIL {name}: rows differ (order_only={order_only}) "
                  f"first diff at row {bad}:\n  spark={grows[bad]}\n  duck ={wrows[bad]}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(grows)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
