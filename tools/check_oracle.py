#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + oracle_sql.json), then this script executes
each oracle SQL in DuckDB over the same sf tables and compares row multisets
(columns sorted by name, values normalized). Dev tool only — the engine
itself is pure Scala/Spark.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda k: cols[k])
    return sorted(tuple(norm(r[k]) for k in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            )
            got_cols = [c.lower() for c in got_rel.columns]
            got = rowset(got_cols, got_rel.fetchall())
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = rowset(exp_cols, exp_rel.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            for g, e in list(zip(got, exp))[:3]:
                if g != e:
                    print(f"  got {g}\n  exp {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
