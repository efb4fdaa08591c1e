#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs each SparkEntry query's dumped parquet (produced by `sbt "runMain
graft.Verify <sfDir> <outDir>"`) against DuckDB executing the matching
oracle SQL over the same testdata parquet, comparing:
  - row count
  - column names (sorted)
  - cell values (rows sorted, columns sorted by name, exact match;
    floats compared bitwise via repr)

Usage: python tools/oracle_check.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    n_pass = n_fail = n_rowsonly = 0
    for missing in sorted(set(oracle) - set(names)):
        print(f"FAIL {missing}: no parquet dump (query threw in Verify)")
        n_fail += 1
    for name in names:
        got_rel = con.execute(
            f"SELECT * FROM '{Path(out_dir) / name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got_rows = got_rel.fetchall()
        if got_cols == ["__error"]:
            # Verify's sentinel dump for a query that threw: the schema
            # can never match an oracle, and we surface the message here.
            msg = got_rows[0][0] if got_rows else "<no message>"
            print(f"FAIL {name}: query threw in Verify: {msg}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            # HUGEINT (int128, e.g. SUM over integers) round-trips fine
            # through fetchall() here, but the DRIVER's hasher renders it
            # differently from Spark's BIGINT -> guaranteed hash mismatch
            # (CORRECTNESS_r02: the only 4 fails were exactly the 4
            # HUGEINT-emitting oracles). Fail loudly so it never ships.
            trel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
            huge = [c for c, t in zip(trel.columns, trel.types)
                    if str(t) == "HUGEINT"]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT cols {huge} "
                      "(driver hash-mismatches; CAST(... AS BIGINT))")
                n_fail += 1
                continue
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = frame_key(got_cols, got_rows)
        ec, er = frame_key(exp_cols, exp_rows)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  cols:  {gc}")
            print(f"  spark: {gr[bad]}")
            print(f"  duck:  {er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
