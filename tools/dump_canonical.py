"""Dump a query's canonical sorted rows from BOTH engines, side by side.

The driver's correctness gate reports only a value-hash verdict, so a
driver-red query that is green in the local gate (check_oracle.py) is
otherwise undebuggable.  This tool prints the exact canonical lines the
hash is computed over — Spark on the left, DuckDB (fetched via Arrow,
like the driver) on the right — plus the first N differing lines and
the Arrow schema of the oracle result.

Usage:  python tools/dump_canonical.py <query> [sf_dir] [--max-diff N]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from check_oracle import canon_cell  # noqa: E402  (same canonicalization)


def canonical_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    max_diff = 20
    for i, a in enumerate(sys.argv):
        if a == "--max-diff" and i + 1 < len(sys.argv):
            max_diff = int(sys.argv[i + 1])

    import duckdb

    from mqtt2sql_spark.fixtures import TABLES
    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    spec = all_specs().get(name)
    if spec is None:
        print(f"unknown query: {name}")
        return 2

    spark = get_spark("dump_canonical", cpus=8)
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sl = canonical_lines(scols, srows)

    osql = spec.oracle_sql()
    if osql is None:
        print(f"{name}: no oracle SQL (rows-only query); Spark side:")
        for ln in sl[:max_diff]:
            print(f"  {ln}")
        return 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(osql)
    ocols = [d[0] for d in res.description]
    otable = res.arrow()
    orows = list(
        zip(*(otable.column(i).to_pylist()
              for i in range(otable.num_columns)))
    ) if otable.num_columns else []
    ol = canonical_lines(ocols, orows)

    print(f"query: {name}   sf_dir: {sf_dir}")
    print(f"spark  cols: {sorted(scols)}  rows: {len(sl)}")
    print(f"oracle cols: {sorted(ocols)}  rows: {len(ol)}")
    print("oracle Arrow schema:")
    for field in otable.schema:
        print(f"  {field.name}: {field.type}")
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema}
    print("spark schema:")
    for c in scols:
        print(f"  {c}: {spark_types[c]}")

    if sl == ol:
        print("\nCANONICAL ROWS IDENTICAL — local parity holds.")
        return 0

    print(f"\nfirst {max_diff} differing canonical lines "
          "(column order: sorted names):")
    shown = 0
    for i in range(max(len(sl), len(ol))):
        a = sl[i] if i < len(sl) else "<missing>"
        b = ol[i] if i < len(ol) else "<missing>"
        if a != b:
            print(f"  [{i}] spark : {a[:300]}")
            print(f"  [{i}] oracle: {b[:300]}")
            shown += 1
            if shown >= max_diff:
                break
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
