#!/usr/bin/env python3
"""Local oracle parity check (dev tool, mirrors the driver's t2 gate).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names (sorted), and a hash of all values
(columns sorted by name, rows sorted, floats rounded to 9 sig places).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints/floats → float repr rounded; everything else str
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    import hashlib
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        elif dtype_mismatches := [
            # dtype-strict: the driver renders int64 5 and float64 5.0
            # differently, so a DuckDB HUGEINT (→ float64 via pandas)
            # against a Spark BIGINT must FAIL here even though the
            # values hash equal under %.9g. Compare dtype *kind* per
            # column: int-vs-float is the driver-visible divergence.
            f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
            for c in sorted(got.columns)
            if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}
        ]:
            problems.append("dtype mismatch " + "; ".join(dtype_mismatches))
        elif canon(got) != canon(exp):
            problems.append("value hash mismatch")
            merged = got.reindex(sorted(got.columns), axis=1)
            expm = exp.reindex(sorted(exp.columns), axis=1)
            if len(got) == len(exp):
                for c in merged.columns:
                    a, b = merged[c], expm[c]
                    try:
                        neq = ~((a == b) | (a.isna() & b.isna()))
                        if neq.any():
                            i = neq.idxmax()
                            problems.append(f"  first diff col={c} row={i}: {a[i]!r} vs {b[i]!r}")
                    except Exception:
                        problems.append(f"  col={c} not comparable")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
