"""Pre-verify the driver-gate window before the driver runs.

For every query in ``registry._PRIORITY`` (the exact set the driver's
bounded correctness window will witness), run the Spark plan AND the
DuckDB oracle (fetched via .arrow(), like the driver), and emit one
markdown row per query: row counts, the ORACLE'S compared-surface Arrow
types, the Spark schema, and the local gate verdict.  The r03/r04
lesson was that local-green via fetchall !== driver-green — the Arrow
type line is the thing to eyeball for anything non-BIGINT/non-string
(decimals, timestamps, blobs) on the compared surface.

Usage:  python tools/window_preverify.py [sf_dir] > WINDOW_r{N}.md
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from check_oracle import arrow_type_violations, df_digest  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    from mqtt2sql_spark.fixtures import TABLES
    from mqtt2sql_spark.registry import _PRIORITY, all_specs
    from mqtt2sql_spark.session import get_spark

    spark = get_spark("window_preverify", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = all_specs()
    print(f"# Driver-window pre-verification ({len(_PRIORITY)} queries, "
          f"{sf_dir})\n")
    print("| query | spark rows | oracle rows | oracle Arrow types "
          "(compared surface) | verdict |")
    print("|---|---|---|---|---|")
    n_bad = 0
    for name in _PRIORITY:
        spec = specs.get(name)
        if spec is None:
            print(f"| {name} | - | - | - | MISSING FROM REGISTRY |")
            n_bad += 1
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # pragma: no cover - report, don't die
            print(f"| {name} | ERR | - | - | spark error: "
                  f"{str(e)[:80]} |")
            n_bad += 1
            continue
        osql = spec.oracle_sql()
        if osql is None:
            print(f"| {name} | {len(srows)} | - | - | rows-only "
                  "(no oracle) |")
            continue
        try:
            res = con.execute(osql)
            otable = res.arrow()
            ocols = [f.name for f in otable.schema]
            orows = list(
                zip(*(otable.column(i).to_pylist()
                      for i in range(otable.num_columns)))
            ) if otable.num_columns else []
        except Exception as e:  # pragma: no cover
            print(f"| {name} | {len(srows)} | ERR | - | duckdb error: "
                  f"{str(e)[:80]} |")
            n_bad += 1
            continue
        types = ", ".join(
            f"{f.name}:{f.type}" for f in sorted(
                otable.schema, key=lambda f: f.name
            )
        )
        spark_decimal_cols = {
            f.name for f in sdf.schema.fields
            if f.dataType.typeName().startswith("decimal")
        }
        problems = arrow_type_violations(otable.schema, spark_decimal_cols)
        if len(srows) != len(orows):
            problems.append("ROWCOUNT")
        elif sorted(scols) != sorted(ocols):
            problems.append("SCHEMA")
        elif df_digest(scols, srows) != df_digest(ocols, orows):
            problems.append("HASH")
        if len(srows) == 0:
            problems.append("ZERO ROWS")
        verdict = "ok" if not problems else "; ".join(problems)
        if problems:
            n_bad += 1
        print(f"| {name} | {len(srows)} | {len(orows)} | {types} "
              f"| {verdict} |")
    print(f"\n**{len(_PRIORITY) - n_bad}/{len(_PRIORITY)} clean.**")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
