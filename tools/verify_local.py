"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` in
DuckDB at a given sf dir, then compares row count, sorted column names,
and order-insensitive values.  Floats are compared exactly first (the
engine's parity strategy aims at bit-identical results); on mismatch
the max absolute difference is reported so a tolerance-level diff is
distinguishable from a real bug.

Usage: python tools/verify_local.py [--value-content] [sf_dir] [query ...]

``--value-content`` (VERDICT r12 next-step #5) additionally audits the
VALUE CONTENT of each Spark result against degeneracy: oracle parity
certifies cross-engine *agreement*, not *meaning* — the r12 OLS probe
was hash-green while both engines produced the same all-NULL
coefficients.  The flag fails any entry with an all-NULL column
(unless named in ``VALUE_CONTENT_OK`` with a reason) and prints
constant columns of multi-row results for eyeballing (constants are
often legitimate: broadcast model coefficients, all-true gate flags).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    return v


def rows_key(rows, colnames):
    """Order-insensitive, column-name-sorted canonical form."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(normalize_cell(r[i]) for i in order) for r in rows), key=repr
    )


#: spark simpleString / duckdb type-name → common canonical dtype
_CANON = {
    "bigint": "i64", "long": "i64", "hugeint": "i128",
    "int": "i32", "integer": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "real": "f32",
    "string": "str", "varchar": "str",
    "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "timestamp with time zone": "ts",
}


def _canon_type(t: str) -> str:
    t = str(t).lower()
    if t.endswith("[]") or t.startswith(("array", "list")):
        return "array"
    if t.startswith(("decimal", "struct", "map")):
        return t.split("(")[0]
    return _CANON.get(t, t)


def compare(
    name, spark_rows, spark_cols, duck_rows, duck_cols,
    spark_types=None, duck_types=None,
) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if spark_types is not None and duck_types is not None:
        st = {c: _canon_type(t) for c, t in zip(spark_cols, spark_types)}
        dt = {c: _canon_type(t) for c, t in zip(duck_cols, duck_types)}
        drift = {c: (st[c], dt[c]) for c in st if st[c] != dt.get(c)}
        if drift:
            problems.append(f"dtype drift {drift}")
    a = rows_key(spark_rows, spark_cols)
    b = rows_key(duck_rows, duck_cols)
    if a != b:
        # locate first difference + max float delta for diagnostics
        max_delta = 0.0
        n_diff = 0
        first = None
        for ra, rb in zip(a, b):
            if ra != rb:
                n_diff += 1
                if first is None:
                    first = (ra, rb)
                for xa, xb in zip(ra, rb):
                    if isinstance(xa, float) and isinstance(xb, float):
                        max_delta = max(max_delta, abs(xa - xb))
        problems.append(
            f"values differ: {n_diff} rows, max_float_delta={max_delta:.3e}, "
            f"first diff:\n  spark={first[0] if first else None}\n  duck ={first[1] if first else None}"
        )
    return problems


#: entries allowed to carry an all-NULL column, with the semantic
#: reason — everything else with one fails the --value-content audit.
VALUE_CONTENT_OK: dict[str, str] = {
    # moving average / EWMA warmups: the first N-1 rows per key are
    # NULL by the exactly-full-window contract, but the column as a
    # whole is never all-NULL on the fixtures — listed here only if a
    # future fixture shrinks below the window (fail loudly today).
}


def value_content_audit(name: str, rows, cols) -> tuple[list[str], list[str]]:
    """Per-column degeneracy report over a collected Spark result:
    returns (all_null_columns, constant_columns).  Constants are only
    meaningful on multi-row results.  Entries named in
    :data:`VALUE_CONTENT_OK` have their all-NULL findings suppressed
    here (with the recorded semantic reason), so the caller treats any
    returned all-NULL column as a failure."""
    all_null, constant = [], []
    for i, c in enumerate(cols):
        vals = [normalize_cell(r[i]) for r in rows]
        nonnull = [v for v in vals if v is not None]
        if rows and not nonnull:
            all_null.append(c)
        elif len(rows) > 1 and len(set(map(repr, nonnull))) == 1 and len(
            nonnull
        ) == len(vals):
            constant.append(c)
    if name in VALUE_CONTENT_OK:
        all_null = []
    return all_null, constant


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--value-content"]
    value_content = "--value-content" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import os

    import __spark_entry__ as e

    if os.environ.get("SPARK_GRAFT_PRISTINE"):
        # driver-fidelity mode: the harness builds its own SparkSession
        # with NONE of session.py's configs — replicate that (plus a
        # hostile non-UTC timezone) so anything correctness-critical
        # that leaked into session.py instead of the query path fails
        # HERE, not in the driver.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("verify_pristine")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "America/New_York")
            .getOrCreate()
        )
    else:
        from financial_data_stream_processing_engine_spark.session import get_spark

        spark = get_spark("verify_local")
    con = duck_connection(sf_dir)

    from tools.freshness import entry_hash, update_ledger

    qs = e.queries()
    oracles = e.oracle_sql()
    failed = []
    green: dict[str, dict] = {}

    def record(name: str, fn, check: str) -> None:
        green[name] = {
            "hash": entry_hash(fn, oracles.get(name)),
            "check": check,
            "sf_dir": sf_dir,
            "mode": "pristine" if os.environ.get("SPARK_GRAFT_PRISTINE") else "session",
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_types = [f.dataType.simpleString() for f in df.schema.fields]
        spark_rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        vc_problems: list[str] = []
        if value_content:
            nulls, consts = value_content_audit(name, spark_rows, spark_cols)
            if nulls:
                vc_problems.append(f"value-content: all-NULL columns {nulls}")
            if consts:
                print(f"  {name:32s} value-content: constant columns {consts}")
        if name not in oracles:
            status = f"rows-only: {len(spark_rows)} rows"
            print(f"  {name:32s} [{t_spark:5.1f}s] {status}")
            if len(spark_rows) == 0 or vc_problems:
                for p in vc_problems:
                    print(f"    {p}")
                failed.append(name)
            else:
                record(name, fn, "rows_only")
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        duck_cols = list(rel.columns)
        duck_types = [str(t) for t in rel.types]
        duck_rows = rel.fetchall()
        t_duck = time.time() - t0
        problems = compare(
            name, spark_rows, spark_cols, duck_rows, duck_cols,
            spark_types, duck_types,
        )
        problems.extend(vc_problems)
        if problems:
            failed.append(name)
            print(f"✗ {name:32s} [{t_spark:5.1f}s/{t_duck:4.1f}s]")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name:32s} [{t_spark:5.1f}s/{t_duck:4.1f}s] {len(spark_rows)} rows")
            record(name, fn, "oracle")
    if green:
        update_ledger(green)
        print(f"\nledger: recorded {len(green)} green entries at current code hashes")
    print()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
