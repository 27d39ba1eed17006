"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF, compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# DuckDB types that pandas/Arrow collection (the driver's path) widens to
# float64 or Decimal while fetchall() returns Python ints/floats — the
# exact class of divergence that kept running_user_totals red for two
# rounds while this mirror said "pass". Any oracle emitting one of these
# is a latent driver hash failure, so the mirror now refuses it outright.
WIDENING_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def widened_columns(con, sql):
    """(col, type) pairs of an oracle's output that DuckDB types as a
    widening type (HUGEINT/UHUGEINT/DECIMAL). DESCRIBE plans without
    executing, so this is cheap to run on every oracle."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if any(t in r[1].upper() for t in WIDENING_TYPES)]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main():
    import duckdb
    import __spark_entry__ as entrymod
    from texoo_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0 and name != "dedup_prefix":
                failures.append((name, "0 rows"))
            continue
        try:
            widened = widened_columns(con, oracles[name])
            if widened:
                failures.append((name, f"widening oracle types {widened}"))
                print(f"FAIL {name}: oracle emits widening type(s) "
                      f"{widened} — the driver's pandas collection renders "
                      f"these differently from Spark (CAST them)")
                continue
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            continue
        sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        idx = {c: i for i, c in enumerate(ocols_raw)}
        oset = sorted(tuple(norm(r[idx[c]]) for c in ocols) for r in orows)
        if sset != oset:
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
