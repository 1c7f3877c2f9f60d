#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every entry in
__spark_entry__.queries() against its oracle_sql() twin on the same parquet
tables via DuckDB, and compare row count + column names + an
order-insensitive value hash.

Usage: python scripts/oracle_check.py [sf_dir] [name ...] [--fast]

The hazard pass re-executes each entry through the driver's actual fetch
paths (DataFrame.toPandas / duckdb .df()) IN ADDITION to the collect()-
based hash — roughly doubling wall time — because deriving the hash rows
from the pandas frames would itself reintroduce the dtype coercions
(None->NaN, int->float) the pass exists to detect. Pass --fast to skip
the hazard pass when iterating on values rather than shapes.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from bullet_storm_spark import get_spark
from bullet_storm_spark.sources.tables import TABLE_NAMES


def canon(value):
    """Canonical scalar rendering for hashing (both engines feed through
    this, so representation differences like 1 vs 1.0 are normalized)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        # 17 significant digits distinguishes every double — the local
        # gate must be at least as strict as the driver's canonicalizer
        # (r8 shipped a ROUND(double,9) 1-ulp divergence invisible at
        # the previous %.10g).
        return f"{value:.17g}"
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in sorted(value.items())) + "}"
    return str(value)


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype into the classes that matter to the
    driver's canonicalizer: int/float divergence and datetime unit
    divergence both flip the value hash even when values agree."""
    kind = dtype.kind
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return f"datetime[{dtype}]"  # full dtype: ns vs us matters
    if kind == "b":
        return "bool"
    return "object"


def hazard_check(spdf, ddf) -> list[str]:
    """Emulate the driver-side canonicalizer hazards that the
    collect()-based hash above is blind to (VERDICT r5 'What's wrong' #3):

    1. any list/dict/ndarray cell -> the driver's pandas sort_values
       raises TypeError: unhashable type (a hard ERROR row);
    2. int-vs-float dtype divergence on a shared column (e.g. an uncast
       DuckDB HUGEINT arriving as float64 vs Spark int64) -> hash-FAIL;
    3. datetime unit divergence (Spark ns vs DuckDB us) -> depends on
       canonicalizer tolerance; flagged so no entry relies on it.

    Both frames come from the same fetch paths the driver uses
    (DataFrame.toPandas() / duckdb .df()).
    """
    import numpy as np

    issues = []
    for pdf, side in ((spdf, "spark"), (ddf, "duck")):
        for col in pdf.columns:
            if pdf[col].dtype.kind == "O":
                bad = pdf[col].map(
                    lambda v: isinstance(v, (list, tuple, dict, set, np.ndarray))
                )
                if bad.any():
                    issues.append(
                        f"{side}.{col}: unhashable container cells "
                        f"({type(pdf[col][bad.idxmax()]).__name__})"
                    )
    shared = [c for c in spdf.columns if c in set(ddf.columns)]
    for col in shared:
        sc, dc = _dtype_class(spdf[col].dtype), _dtype_class(ddf[col].dtype)
        if sc != dc:
            issues.append(
                f"{col}: dtype divergence spark={spdf[col].dtype}({sc}) "
                f"vs duck={ddf[col].dtype}({dc})"
            )
    return issues


def table_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--fast"]
    run_hazards = "--fast" not in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark(app_name="oracle-check")
    from bullet_storm_spark.sources.tables import load_tables

    load_tables(spark, sf_dir)

    con = duckdb.connect()
    import os

    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            failed.append(name)
            print(f"[FAIL spark] {name}: {e}")
            continue
        if name not in oracles:
            hazards = []
            if run_hazards:
                try:
                    spdf = fn(spark, sf_dir).toPandas()
                    hazards = hazard_check(spdf, spdf[[]])
                except Exception as e:  # driver would record an ERROR row
                    hazards = [f"toPandas failed: {str(e)[:200]}"]
            results[name] = {
                "status": "HAZARD" if hazards else "NO_ORACLE",
                "rows": len(srows),
                "hazards": hazards,
                "secs": round(time.time() - t0, 2),
            }
            if hazards:
                failed.append(name)
                print(f"[HAZARD rows-only] {name}: {hazards}")
            else:
                print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            failed.append(name)
            print(f"[FAIL oracle] {name}: {e}")
            continue
        status = {}
        status["rows"] = (len(srows), len(drows), len(srows) == len(drows))
        status["cols"] = (sorted(scols), sorted(dcols), sorted(scols) == sorted(dcols))
        sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
        status["hash"] = (sh[:12], dh[:12], sh == dh)
        hazards = []
        if run_hazards:
            try:
                spdf = fn(spark, sf_dir).toPandas()
                ddf = con.sql(oracles[name]).df()
                hazards = hazard_check(spdf, ddf)
            except Exception as e:
                hazards = [f"pandas fetch failed: {str(e)[:200]}"]
        status["hazards"] = (hazards, [], not hazards)
        ok = all(v[2] for v in status.values())
        results[name] = {
            "status": "MATCH" if ok else "MISMATCH",
            "detail": status,
            "secs": round(time.time() - t0, 2),
        }
        if not ok:
            failed.append(name)
            print(f"[MISMATCH] {name}: {status}")
            # show a small diff to debug
            sset = {tuple(map(canon, r)) for r in srows}
            dset = {tuple(map(canon, r)) for r in drows}
            print("  spark cols:", scols, " duck cols:", dcols)
            print("  spark-only:", list(sset - dset)[:3])
            print("  duck-only :", list(dset - sset)[:3])
        else:
            print(f"[MATCH] {name}: {len(srows)} rows in {status and results[name]['secs']}s")

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(
        f"\n{n_match} MATCH / {len(results)} checked; "
        f"{len(failed)} failing: {failed}"
    )
    with open("/tmp/oracle_check.json", "w") as f:
        json.dump(results, f, indent=2, default=str)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
