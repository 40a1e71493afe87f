#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata parquet, compares row count / schema /
values per query. Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

This is a dev-only tool (driver-side python: duckdb/pyarrow/pandas);
the engine itself is pure Scala/Spark.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    return df.reindex(sorted(df.columns), axis=1)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return a == b


def main(sf_dir: str, out_dir: str, json_out=None) -> int:
    """Optional third arg: write a machine-readable verdict JSON
    (the committed CORRECTNESS_SF* artifacts)."""
    ok = []
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    failures = []
    no_oracle = []
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        try:
            got = norm(con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df())
        except Exception as e:
            failures.append(f"{name}: unreadable spark output: {e}")
            continue
        if name not in oracle:
            no_oracle.append(f"{name}: rows={len(got)} (rows-only check)")
            if len(got) == 0:
                failures.append(f"{name}: EMPTY result (rows-only check)")
            continue
        try:
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            failures.append(f"{name}: oracle SQL failed: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(f"{name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            continue
        # dtype strictness: the driver's hash may be dtype-sensitive
        # (e.g. duckdb HUGEINT -> float64 vs spark int64)
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                failures.append(
                    f"{name}: dtype mismatch col={c} spark={got[c].dtype} duck={exp[c].dtype}")
        if len(got) != len(exp):
            failures.append(f"{name}: rowcount spark={len(got)} duck={len(exp)}")
            continue
        mism = 0
        first = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                gn = g is None or (isinstance(g, float) and math.isnan(g)) or g is pd.NaT
                en = e is None or (isinstance(e, float) and math.isnan(e)) or e is pd.NaT
                if gn and en:
                    continue
                if gn != en or not values_equal(g, e):
                    mism += 1
                    if first is None:
                        first = f"col={c} row={i} spark={g!r} duck={e!r}"
        if mism:
            failures.append(f"{name}: {mism} value mismatches; first: {first}")
        else:
            print(f"OK   {name}: rows={len(got)}")
            ok.append({"query": name, "rows": len(got)})
    for line in no_oracle:
        print(f"WARN {line}")
    for f in failures:
        print(f"FAIL {f}")
    missing = set(oracle) - {p.name for p in out.iterdir() if p.is_dir()}
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no parquet output (query crashed?)")
    print(f"\n{len(failures) + len(missing)} failures")
    if json_out:
        Path(json_out).write_text(json.dumps({
            "sf_dir": sf_dir, "n_ok": len(ok),
            "n_failed": len(failures) + len(missing),
            "failures": failures + [f"{m}: missing output" for m in sorted(missing)],
            "rows_only": no_oracle, "ok": ok}, indent=1) + "\n")
    return 1 if (failures or missing) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
