"""JSON-lines file ingest: parse-failure quarantine semantics and the
reference-parity edges (literal null document, blank lines)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from json_schema_clj_spark.sources.jsonl import read_jsonl, validate_jsonl

SCHEMA = {
    "type": "object",
    "required": ["id"],
    "properties": {"id": {"type": "integer", "minimum": 1}},
}


def _write(tmp_path, lines):
    p = os.path.join(tmp_path, "docs.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return p


def test_jsonl_blank_lines_dropped_docs_kept(spark, tmp_path):
    p = _write(
        str(tmp_path),
        ['{"id": 1}', "", "   ", '{"id": 2}', '{"id": 0}'],
    )
    df = read_jsonl(spark, p)
    assert df.count() == 3
    assert df.select("ingest_id").distinct().count() == 3


def test_jsonl_validation_routes_parse_and_schema_failures(spark, tmp_path):
    p = _write(
        str(tmp_path),
        [
            '{"id": 5}',          # valid
            "{not json",          # malformed → $parse
            '{"id": 0}',          # minimum violated
            '{"other": true}',    # required violated
        ],
    )
    out = validate_jsonl(spark, p, SCHEMA).collect()
    verdicts = {r["doc_json"]: r for r in out}
    assert verdicts['{"id": 5}']["valid"] is True
    bad = verdicts["{not json"]
    assert bad["valid"] is False
    assert [v["keyword"] for v in bad["violations"]] == ["$parse"]
    assert verdicts['{"id": 0}']["valid"] is False
    assert verdicts['{"other": true}']["valid"] is False


def test_jsonl_literal_null_document_is_parsed_not_malformed(spark, tmp_path):
    # the reference validates a nil document (type:null passes, others
    # fail) — it must NOT be treated as a parse failure
    p = _write(str(tmp_path), ["null"])
    ok = validate_jsonl(spark, p, {"type": "null"}).collect()[0]
    assert ok["valid"] is True, ok
    bad = validate_jsonl(spark, p, {"type": "object"}).collect()[0]
    assert bad["valid"] is False
    assert all(v["keyword"] != "$parse" for v in bad["violations"])


def test_jsonl_quarantine_split_roundtrip(spark, tmp_path):
    lines = ['{"id": %d}' % i for i in range(1, 21)] + ["oops"] * 3
    p = _write(str(tmp_path), lines)
    out = validate_jsonl(spark, p, SCHEMA)
    clean = out.where(F.col("valid"))
    quarantined = out.where(~F.col("valid"))
    assert clean.count() == 20
    assert quarantined.count() == 3
    assert {
        v["keyword"]
        for r in quarantined.collect()
        for v in r["violations"]
    } == {"$parse"}


def test_jsonl_streaming_validation(spark, tmp_path):
    from json_schema_clj_spark.sources.jsonl import validate_jsonl_stream

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.jsonl").write_text('{"id": 1}\n{not json\n{"id": 0}\n')
    out = validate_jsonl_stream(spark, str(land), SCHEMA)
    assert out.isStreaming

    got = {}

    def sink(batch_df, epoch_id):
        got.setdefault("rows", []).extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    verdicts = {r["doc_json"]: r["valid"] for r in got["rows"]}
    assert verdicts == {'{"id": 1}': True, "{not json": False, '{"id": 0}': False}
