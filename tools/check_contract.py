"""Local emulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and, where an
oracle exists, the matching oracle_sql() in DuckDB over the same
parquet tables; compares row count, column names/types and an
order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialjoincountovershells_spark import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    df = norm(df)
    payload = df.to_csv(index=False, float_format="%.17g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark(app="contract_check", master="local[8]", driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spdf)} rows  [{t1 - t0:.1f}s]")
            if len(spdf) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {e}")
            continue
        t2 = time.time()
        ok_rows = len(spdf) == len(odf)
        s_schema = {c: str(t) for c, t in zip(spdf.columns, spdf.dtypes)}
        o_schema = {c: str(t) for c, t in zip(odf.columns, odf.dtypes)}
        ok_schema = s_schema == o_schema
        ok_hash = value_hash(spdf) == value_hash(odf) if ok_rows else False
        status = "ok  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(spdf)}/{len(odf)} schema={ok_schema} "
            f"hash={ok_hash}  [spark {t1 - t0:.1f}s oracle {t2 - t1:.1f}s]"
        )
        if not ok_schema:
            print(f"     spark  {s_schema}\n     oracle {o_schema}")
        if ok_rows and ok_schema and not ok_hash:
            a, b = norm(spdf), norm(odf)
            diff = a.compare(b) if a.shape == b.shape else None
            print(f"     first diffs:\n{diff.head(5) if diff is not None else '(shape mismatch)'}")
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:] or None))
