#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against ``oracle_sql()`` in DuckDB: row count, column-name set, and an
order-insensitive value hash (floats at FULL round-trip precision —
``repr``; the round-7 ``gini_prices`` red proved a 9-sig-digit local
hash is weaker than the driver's, which let an order-dependent double
sum ship "green". The local gate must be at least as strict as the
driver's). Queries without an oracle get a rows-only check (runs,
>= 0 rows, stable schema).

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# DuckDB output types that the driver's type-sensitive hasher represents
# differently from Spark's (Spark has no int128 / unsigned ints, and its
# DECIMAL hash differs from DOUBLE): an oracle emitting one of these can
# be cell-for-cell identical locally yet red at the driver — exactly how
# the round-5 `inverted_index` HUGEINT bug shipped. Cast to BIGINT/DOUBLE
# in the oracle SQL instead.
_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def bad_oracle_types(con, sql):
    """Return [(column, type), ...] for driver-divergent output types.

    Uses ``DESCRIBE`` so the check is plan-time (no execution needed).
    """
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        (name, typ) for name, typ, *_ in desc
        if any(typ.upper().startswith(b) for b in _BAD_ORACLE_TYPES)
    ]


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == 0:
            return "0"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames) -> str:
    """Order-insensitive: sort columns by name, then rows lexicographically."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main(selected=None):
    import duckdb

    import __spark_entry__ as entrymod
    from simba_spark.context import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    # merge the driver-windowed registry with the rotated-out bedrock
    # queries: local oracle coverage stays total even though the
    # external driver checks only the first 50 of queries()
    qs = dict(entrymod.queries())
    qs.update(getattr(entrymod, "extra_queries", dict)())
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} spark error: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok    {name:24s} rows-only: {len(srows):6d} rows  cols={scols} ({el:.1f}s)")
            continue
        try:
            bad = bad_oracle_types(con, oracles[name])
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} duckdb error: {e}")
            continue
        problems = []
        if bad:
            problems.append(f"driver-divergent oracle types {bad} "
                            "(cast to BIGINT/DOUBLE)")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        else:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name:24s} {'; '.join(problems)} ({el:.1f}s)")
            if "value-hash mismatch" in problems and len(srows) == len(orows):
                _diff_sample(srows, scols, orows, ocols)
        else:
            print(f"ok    {name:24s} {len(srows):6d} rows hash-match ({el:.1f}s)")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall green")
    return 0


def _diff_sample(srows, scols, orows, ocols, n=3):
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = sorted("|".join(_norm_cell(r[i]) for i in so) for r in srows)
    oset = sorted("|".join(_norm_cell(r[i]) for i in oo) for r in orows)
    only_s = [x for x in sset if x not in set(oset)][:n]
    only_o = [x for x in oset if x not in set(sset)][:n]
    print(f"        cols: {sorted(scols)}")
    for x in only_s:
        print(f"        spark-only: {x}")
    for x in only_o:
        print(f"        duck-only:  {x}")


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
