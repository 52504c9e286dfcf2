"""Driver-legibility lint for the query registry (r4 verdict items #1/#8).

The per-round driver canonicalizes each query's output with a pandas
sort over ALL columns; that crashes on list cells (``unhashable type:
'list'`` — the one red row of CORRECTNESS_r04) and is ambiguous when a
float column mixes NaN with NULL. This tool builds every ``queries()``
entry (lazy — no job runs in schema mode) and flags:

  FAIL  top-level array/map/struct output column (driver crash)
  FAIL  oracle SQL missing while the query is in the driver head
        (rows-only weak check where a hash check was intended)
  WARN  float/double output column (NaN-vs-null risk; ``--nan`` executes
        each flagged query at the given sf dir and upgrades to FAIL only
        if actual NaNs are produced)

Usage:
    python tools/schema_lint.py [sf_dir] [--nan]

Exit status 0 = clean, 1 = any FAIL. Wired into the verify flow; run it
before committing any new @query registration.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import __spark_entry__ as entry
    from crawl4ai_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    check_nan = "--nan" in sys.argv

    spark = get_spark(app_name="schema-lint", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails, warns = [], []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except TypeError as e:
            # the registry guard already formats the complex-type message
            fails.append(f"{name}: {e}")
            continue
        except Exception as e:  # build error is a fail: the driver would red-row it
            fails.append(f"{name}: builder raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            warns.append(f"{name}: no oracle SQL (driver records rows-only)")
        float_cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (T.FloatType, T.DoubleType))
        ]
        if not float_cols:
            continue
        if not check_nan:
            warns.append(f"{name}: float columns {float_cols} (NaN risk; rerun --nan)")
            continue
        nan_cnt = df.select(
            F.sum(sum((F.isnan(c).cast("long") for c in float_cols),
                      F.lit(0))).alias("n")
        ).collect()[0]["n"]
        if nan_cnt:
            fails.append(f"{name}: {nan_cnt} NaN cells in {float_cols} "
                         "(driver hash treats NaN != NULL)")

    for w in warns:
        print(f"WARN {w}")
    for f_ in fails:
        print(f"FAIL {f_}")
    print(f"== {len(qs)} queries, {len(fails)} fail, {len(warns)} warn")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
