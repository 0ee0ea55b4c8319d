#!/usr/bin/env python3
"""Local replay of the driver's t2 correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares against the
parquet results Spark wrote, mimicking the driver: columns sorted by name,
rows compared in produced order (and re-sorted as a diagnostic).

Usage: python3 tools/local_verify.py <verify_out_dir> <sf_dir>
(run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first)
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = [tuple(norm(v) for v in row) for row in
               got_rel.select(", ".join(f'"{c}"' for c in got_cols)).fetchall()]
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = sorted(exp_rel.columns)
            exp_types = {c: str(t) for c, t in zip(exp_rel.columns, exp_rel.types)}
            exp = [tuple(norm(v) for v in row) for row in
                   con.sql(f"SELECT {', '.join(chr(34)+c+chr(34) for c in exp_cols)} FROM ({oracle[name]})").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = True
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} duck={exp_cols}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} duck={len(exp)}")
            ok = False
        elif got != exp:
            if sorted(got) == sorted(exp):
                print(f"FAIL {name}: same multiset, different ORDER")
            else:
                diffs = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
                print(f"FAIL {name}: {len(diffs)} differing rows; first 3:")
                for i, g, e in diffs[:3]:
                    print(f"    row {i}: spark={g}\n             duck ={e}")
            ok = False
        if ok:
            n_pass += 1
            print(f"  PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
