"""CLI: run a BQL query against the synthetic tables and print the Clip.

    python -m bullet_storm_spark "SELECT event_type, COUNT(*) AS cnt \
        FROM events GROUP BY event_type"
    python -m bullet_storm_spark --sf /root/testdata/sf0.01 --oracle "..."

--oracle additionally prints the generated DuckDB twin SQL.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="bullet_storm_spark")
    parser.add_argument("bql", help="BQL query string")
    parser.add_argument(
        "--sf", default="/root/testdata/sf0.001", help="table directory"
    )
    parser.add_argument(
        "--oracle", action="store_true", help="also print the DuckDB twin SQL"
    )
    parser.add_argument("--master", default="local[4]")
    args = parser.parse_args(argv)

    from bullet_storm_spark import get_spark, oracle_sql_for
    from bullet_storm_spark.api import execute
    from bullet_storm_spark.bql import parse
    from bullet_storm_spark.sources.tables import load_tables

    query = parse(args.bql)
    if args.oracle:
        try:
            print("-- DuckDB twin --")
            print(oracle_sql_for(query))
            print("-- result --")
        except ValueError as e:
            print(f"-- no exact oracle: {e} --")
    spark = get_spark(app_name="bullet-storm-spark-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, args.sf)
    clip = execute(query, spark=spark, query_id="cli")
    print(clip.to_json())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
