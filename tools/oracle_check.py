"""Local replica of the driver's DuckDB-oracle differential check.

For every entry in ``__spark_entry__.queries()``:
- run the Spark query at sf0.01 (or $SPARK_GRAFT_SF_DIR)
- run the matching ``oracle_sql()`` in DuckDB over the same parquet
- compare row count, sorted column names, and an order-insensitive
  value hash (columns sorted by name, rows sorted, values canonicalized)

Exit code 0 iff every query matches (rows-only queries must return
>= 0 rows without error).

Usage: python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if v != v:
            return "NaN"
        # collapse -0.0 / 0.0 and print with fixed precision
        if v == 0.0:
            v = 0.0
        return f"{v:.9g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonicalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return sorted_cols, h


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from nebuia_vector_db_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # pandas path on the Spark side too, mirroring the driver
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            status = "rows-only"
            print(
                f"OK?   {name}: {len(srows)} rows [{status}] ({spark_s:.1f}s)"
            )
            continue
        try:
            # mirror the driver: materialize the oracle result through
            # pandas (DuckDB .df()), where e.g. HUGEINT sums surface as
            # float64 — fetchall() would hide that class of drift
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        sc, sh = canonicalize(scols, srows)
        oc, oh = canonicalize(ocols, orows)
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sc != oc:
            ok = False
            msgs.append(f"schema spark={sc} oracle={oc}")
        if sh != oh:
            ok = False
            msgs.append(f"value-hash spark={sh} oracle={oh}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows hash={sh} ({spark_s:.1f}s)")
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            if sc == oc and len(srows) == len(orows):
                # dump first differing rows for debugging
                a = sorted(
                    "\x1f".join(
                        _canon(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                b = sorted(
                    "\x1f".join(
                        _canon(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                shown = 0
                for x, y in zip(a, b):
                    if x != y and shown < 5:
                        print(f"      spark : {x!r}")
                        print(f"      oracle: {y!r}")
                        shown += 1
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
