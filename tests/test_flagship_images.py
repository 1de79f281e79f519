"""Flagship end-to-end slice: validate the synthetic images table against
FLAGSHIP_SCHEMA and check golden violation counts derivable from the
seeded generator (FIXTURES.md §1)."""

from pyspark.sql import functions as F

from json_schema_clj_spark import validate, with_validation
from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA, images_df

N = 10_000


def test_flagship_counts(spark):
    df = images_df(spark, N)
    res = validate(df, FLAGSHIP_SCHEMA, id_cols=["image_id"], part_col="part_id")

    kw = {r["keyword_path"]: r["n_violations"] for r in res["keywords"].collect()}
    # injection residues mod 200 over 10k rows → 50 rows each
    assert kw["properties/image_id/pattern"] == N // 200  # uppercase ids
    # w: residue 23 → 0 (violates minimum), residue 57 → 70000 (maximum)
    assert kw["properties/w/minimum"] == N // 200
    assert kw["properties/w/maximum"] == N // 200
    assert kw["properties/h/minimum"] == N // 200
    assert kw["properties/h/maximum"] == N // 200
    # fmt: bmp + "" → enum violations; "" also hits the blank-string quirk
    assert kw["properties/fmt/enum"] == 2 * (N // 200)
    assert kw["properties/fmt/type"] == N // 200
    # caption: null skips subschema; "" violates type(blank quirk)+minLength
    assert kw["properties/caption/type"] == N // 200
    assert kw["properties/caption/minLength"] == N // 200

    # triage exemplars: ≤3 ranked examples per violated path, ranks dense
    # from 1, and every example row genuinely violates (ids join back to
    # the violations set)
    ex = res["examples"].collect()
    paths = {r["keyword_path"] for r in ex}
    assert paths == set(kw)
    by_path = {}
    for r in ex:
        by_path.setdefault(r["keyword_path"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in by_path.values())
    vio_ids = {(r["keyword_path"], r["image_id"])
               for r in res["violations"].withColumn(
                   "keyword_path", F.array_join("keyword_path", "/")
               ).select("keyword_path", "image_id").collect()}
    assert all((r["keyword_path"], r["image_id"]) in vio_ids for r in ex)

    verd = res["verdicts"].collect()
    assert len(verd) == 64
    assert sum(r["n_rows"] for r in verd) == N
    total_fail = sum(r["n_fail"] for r in verd)
    assert 0 < total_fail < N // 10
    assert all((r["n_fail"] == 0) == r["pass"] for r in verd)


def test_determinism_across_parallelism(spark):
    """Bit-reproducibility across partition counts — the correctness half of
    the two-cluster-size scaling evidence."""
    a = images_df(spark, 2000).orderBy("image_id").collect()
    b = images_df(spark, 2000).repartition(13).orderBy("image_id").collect()
    assert a == b


def test_explain_no_python_udf(spark):
    """The flagship plan must stay JVM-side: no BatchEvalPython / ArrowEval
    nodes — whole-stage codegen end to end."""
    df = images_df(spark, 100)
    out = with_validation(df, FLAGSHIP_SCHEMA)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
