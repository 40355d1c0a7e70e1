"""Local replica of the driver's correctness gate.

Runs every queries()[key] on Spark and the matching oracle_sql()[key] on
DuckDB at a given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded) — so oracle mismatches surface before the driver runs.

Usage: python tools/check_oracle.py [sf_dir] [key ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints → int64, floats → rounded float64, rest → str
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    h = hashlib.sha256(out.to_csv(index=False).encode()).hexdigest()[:16]
    return len(out), sorted(df.columns), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tesserae_ng_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    failures = []
    for key in sorted(qs):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[key](spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(key)
            print(f"FAIL {key}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if key not in oq:
            print(f"ok?  {key}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oq[key]).df()
        except Exception as e:
            failures.append(key)
            print(f"FAIL {key}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        sn, sc, sh = canon(sdf)
        dn, dc, dh = canon(ddf)
        status = "PASS" if (sn, sc, sh) == (dn, dc, dh) else "FAIL"
        if status == "FAIL":
            failures.append(key)
        print(
            f"{status} {key}: spark({sn} rows, {sh}) duckdb({dn} rows, {dh})"
            f" cols={'==' if sc == dc else f'{sc} vs {dc}'} [{time.time()-t0:.1f}s]"
        )
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
