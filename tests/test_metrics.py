"""A4 counters (SURVEY §2.4): df.observe-based metrics mirror the
reference's MapReduce counters — USER_COUNT/HOTCAR_COUNT
(UserHotcar.java:35,97-98) and the silent malformed-row drops that the
sources previously swallowed without a trace."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hadoop_app_spark.functions.metrics import observe_counts
from hadoop_app_spark.plans.recommend import run_user_hotcar
from hadoop_app_spark.sources.tsv import read_tsv_observed

SEP = "\x01"


def _profile_line(user, cityid_enc, priceid):
    doc = {"bycar_profile": {"cityid": cityid_enc, "priceid": priceid}}
    return f"{user}{SEP}{json.dumps(doc)}"


def _cars_line(city, infoidlist):
    return f"{city}{SEP}{json.dumps({'infoidlist': infoidlist})}"


def test_observe_counts_basic(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x int")
    observed, obs = observe_counts(df, "basic", negatives=F.col("x") < 0, big=F.col("x") >= 7)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got == {"rows": 10, "negatives": 0, "big": 3}


def test_tsv_malformed_drop_counter(spark, tmp_path):
    p = tmp_path / "emp.tsv"
    p.write_text("1\talice\t10\n2\tbob\t20\nbad-line\n3\tcarol\t30\textra\n")
    df, obs = read_tsv_observed(
        spark, str(p), [("id", "int"), ("name", "string"), ("dept", "int")]
    )
    assert df.count() == 2  # the 1-field and 4-field lines drop
    assert obs.get == {"rows": 4, "malformed_dropped": 2}


def test_recommend_counters(spark, tmp_path):
    profiles = tmp_path / "profiles.txt"
    profiles.write_text(
        "\n".join(
            [
                _profile_line("u1", "2@0.9$3@0.8", "150"),
                _profile_line("u2", "2@1.0", "90"),
                "malformed-no-separator",
            ]
        )
        + "\n"
    )
    cars = tmp_path / "cars.txt"
    cars.write_text(_cars_line("2", "a@100,b@200") + "\n")

    observations: dict = {}
    recs = run_user_hotcar(spark, str(profiles), str(cars), observations=observations)
    n_recs = recs.count()

    assert observations["user_id_source"].get == {"rows": 3, "malformed_dropped": 1}
    assert observations["city_id_source"].get == {"rows": 1, "malformed_dropped": 0}
    # u1 explodes to cities {2,3}, u2 to {2} -> 3 (user, city) rows
    assert observations["user_count"].get["rows"] == 3
    # only city 2 has cars: (u1,2) and (u2,2) x 2 cars each
    assert observations["rec_count"].get["rows"] == n_recs == 4


def test_read_jsonl_schema_not_mutated_and_countable(spark, tmp_path):
    """r3 review: StructType.add mutated the caller's schema object, and
    counting a fresh read crashed on corrupt-record-only pruning."""
    from pyspark.sql import types as T

    from hadoop_app_spark.sources.jsonl import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "x"}\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    n_fields = len(schema.fields)
    df = read_jsonl(spark, str(p), schema)
    assert df.count() == 2  # previously raised UNSUPPORTED_FEATURE
    assert len(schema.fields) == n_fields  # caller's schema untouched
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]
    kept = read_jsonl(spark, str(p), schema, keep_corrupt=True)
    assert kept.where(F.col("_corrupt_record").isNotNull()).count() == 1


def test_read_jsonl_skips_blank_lines(spark, tmp_path):
    """r3 ADVICE: a blank/whitespace-only line made from_json('') emit a
    null struct whose null _corrupt_record survived the corrupt filter
    as a phantom all-null row; the native JSON source skips such lines."""
    from hadoop_app_spark.sources.jsonl import read_jsonl

    # '\t' line: F.trim strips only ASCII spaces, so the filter must use
    # a whitespace-class regex or tab-only lines still slip through
    p = tmp_path / "blank.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n\n   \n\t\n{"doc_id": 2, "text": "b"}\n\n')
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    assert df.count() == 2  # previously 5: three phantom all-null rows
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]
    # keep_corrupt must not resurrect blank lines as corrupt rows either
    kept = read_jsonl(spark, str(p), "doc_id long, text string", keep_corrupt=True)
    assert kept.count() == 2
