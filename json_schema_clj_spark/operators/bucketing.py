"""Bucketed-table layout: co-located, shuffle-free repeated joins.

The 100 TB referential story has three tiers.  Broadcast joins cover
small dims and the bloom prefilter covers big dims (referential.py /
bloom.py), but both still shuffle SOMETHING every run.  When the same
fact table is validated against the same dimension every day — the
steady-state of a production validation engine — the classic Spark
answer is BUCKETED TABLES: pay one `bucketBy(n, key).sortBy(key)` write,
and every subsequent equi-join/anti-join on that key compiles with NO
Exchange on either side (each bucket pair joins co-located; with sorted
buckets the sort-merge join reads them in key order).  The shuffle cost
moves from every-run to once-per-layout, exactly like an index build.

`write_bucketed` materializes a DataFrame as a bucketed+sorted catalog
table; `bucketed_dangling` is the referential anti-join over two such
tables (result-identical to referential.dangling — bucketing is pure
layout).  tests/test_bucketing.py pins both the equivalence and the
plan property (zero Exchange nodes under a forced sort-merge join).

The reference has no storage layer at all (single-document validation);
this backs SURVEY.md §2.7's partitioning/layout column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize `df` as a bucketed (and by default sorted) parquet
    catalog table.  `n_buckets` is the layout contract: every table that
    should co-locate joins with this one must use the SAME bucket count
    on the SAME key semantics (Spark only elides the shuffle when the
    output partitionings match)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a managed-table location can survive a session that never
        # registered the table (fresh in-memory catalog + old warehouse
        # dir) — saveAsTable then fails LOCATION_ALREADY_EXISTS.  Drop
        # the catalog entry AND the orphan location through the Hadoop
        # FS API (works on any filesystem, not just local).
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc.sc()
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table.split('.')[-1]}")
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_dangling(
    spark: SparkSession, fact_table: str, fact_key: str, dim_table: str, dim_key: str
) -> DataFrame:
    """Dangling foreign keys via a co-located anti-join over two bucketed
    tables: rows of `fact_table` whose `fact_key` has no match in
    `dim_table`.  NULL keys are not dangling (SQL semantics, same as
    referential.dangling).  The `merge` hint forces the sort-merge path
    so the plan property (no Exchange) is stable against broadcast
    thresholds."""
    fact = spark.table(fact_table).where(F.col(fact_key).isNotNull())
    dim = spark.table(dim_table).hint("merge")
    return fact.join(dim, fact[fact_key] == dim[dim_key], "left_anti")
