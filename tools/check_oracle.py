"""Driver-style correctness check: run every registry query on Spark
and its DuckDB oracle side-by-side; compare row count, column names,
and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_val(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "\x1f".join(_norm_val(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(sf_dir: str, names: list[str] | None = None) -> bool:
    from jena_spark.queries import registry as R
    from jena_spark.session import get_spark

    spark = get_spark(
        "oracle_check", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = R.queries(), R.oracle_sql()
    names = names or sorted(qs)
    ok = True
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            ok = False
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            ok = False
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            ok = False
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
            continue
        ms, md = _rows_to_multiset(spark_cols, spark_rows), _rows_to_multiset(duck_cols, duck_rows)
        if ms != md:
            diff_s = {k: v for k, v in ms.items() if md.get(k) != v}
            diff_d = {k: v for k, v in md.items() if ms.get(k) != v}
            print(f"FAIL {name}: value mismatch ({len(diff_s)} spark-side, {len(diff_d)} duck-side)")
            for k in list(diff_s)[:3]:
                print(f"  S {k!r}")
            for k in list(diff_d)[:3]:
                print(f"  D {k!r}")
            ok = False
            continue
        print(f"ok   {name}: {len(spark_rows)} rows match")
    return ok


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    sys.exit(0 if compare(sf, names) else 1)
