#!/usr/bin/env python3
"""Run the driver's correctness gate locally: every __spark_entry__
queries() entry side-by-side with its oracle_sql() on DuckDB over the same
parquet tables, comparing row counts, sorted column names, and values.

Usage:
    python tools/verify_driver_contract.py                # all keys, sf0.01
    python tools/verify_driver_contract.py vg_bm25_topk dedup_exact
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/verify_...

Exits non-zero on any mismatch. Keys without an oracle get a rows-only
check (printed as such). Pass --fresh to clear the harness's cached
index dirs first (forces the production-path keys to rebuild through the
current code)."""

from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
HARNESS_CACHES = ("vg_stem_harness", "vg_compact_harness",
                  "vg_merge_harness", "vg_uri_harness",
                  "vg_tie_harness", "vg_pos_harness", "vg_del_harness")


def main() -> int:
    import tempfile

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--fresh" in sys.argv:
        for d in HARNESS_CACHES:
            shutil.rmtree(os.path.join(tempfile.gettempdir(), d),
                          ignore_errors=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    keys = args or sorted(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {unknown}; available: {sorted(qs)}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    bad: list[str] = []
    for k in keys:
        spdf = qs[k](spark, sf_dir).toPandas()
        if k not in osql:
            print(f"{k}: rows-only ({len(spdf)} rows)")
            continue
        odf = con.sql(osql[k]).df()
        cols = sorted(spdf.columns)
        if cols != sorted(odf.columns):
            print(f"{k}: SCHEMA MISMATCH {cols} vs {sorted(odf.columns)}")
            bad.append(k)
            continue
        if len(spdf) != len(odf):
            print(f"{k}: ROW MISMATCH {len(spdf)} vs {len(odf)}")
            bad.append(k)
            continue
        a = spdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        ok = True
        for c in cols:
            if np.issubdtype(a[c].dtype, np.number):
                ok = np.allclose(a[c].astype(float), b[c].astype(float),
                                 rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = a[c].astype(str).tolist() == b[c].astype(str).tolist()
            if not ok:
                print(f"{k}: VALUE MISMATCH in column {c}")
                bad.append(k)
                break
        else:
            print(f"{k}: OK ({len(spdf)} rows)")
    if bad:
        print(f"\nFAILED keys: {bad}")
        return 1
    print(f"\nALL {len(keys)} keys OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
