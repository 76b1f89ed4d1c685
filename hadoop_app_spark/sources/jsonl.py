"""JSON-lines source/sink — the lingua franca of training-data drops.

The reference ingests JSON only as embedded documents inside its
``\\x01``-delimited format (UserNewcar.java's info fields; see
``delim001.py``); a standalone JSONL path is the natural completion for
a corpus pipeline, where crawl/annotation drops arrive as ``.jsonl``.

Scale notes (100 TB):
- Reads take an EXPLICIT schema. ``spark.read.json`` without one runs a
  full inference pass over the data — a second scan of the corpus
  before the first real job. At scale that's hours; callers declare the
  schema once.
- ``columnNameOfCorruptRecord`` keeps malformed lines as rows instead
  of throwing mid-job (PERMISSIVE mode), so one bad crawl record can't
  kill a week-long backfill; count them with ``observe_counts`` and
  route them to a quarantine sink.
- The in-plan ``encode_jsonl``/``decode_jsonl`` pair stays inside
  whole-stage codegen (JVM ``to_json``/``from_json``), so serializing
  for a downstream text sink costs no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def encode_jsonl(*cols: Column | str, **aliased: Column | str) -> Column:
    """Serialize columns to one JSON object per row (field order =
    argument order, matching a ``to_json(struct(...))`` plan)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    parts += [
        (F.col(c) if isinstance(c, str) else c).alias(name) for name, c in aliased.items()
    ]
    return F.to_json(F.struct(*parts))


def decode_jsonl(col: Column | str, schema: T.StructType | str) -> Column:
    """Parse a JSON-object string column back into a struct."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write one JSON object per line, uncompressed text (S10 semantics:
    downstream tools expect cat-able output)."""
    df.write.mode("overwrite").option("compression", "none").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with a declared schema (no inference scan).

    Malformed lines land in ``_corrupt_record`` (PERMISSIVE) when
    ``keep_corrupt`` is set; otherwise they are dropped and should be
    counted upstream via an ``observe_counts`` checkpoint.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # COPY before adding the corrupt column — StructType.add mutates in
    # place, and permanently injecting _corrupt_record into a caller's
    # module-level schema constant breaks their later from_json/
    # createDataFrame calls
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        if CORRUPT_COL not in [f.name for f in schema.fields]
        else list(schema.fields)
    )
    # text-scan + from_json instead of the raw JSON source: the JSON
    # source refuses any query whose pruned schema is ONLY the corrupt
    # column (so even read_jsonl(...).count() crashed with
    # UNSUPPORTED_FEATURE); a text scan always has its value column and
    # from_json applies the identical PERMISSIVE semantics
    paths = path if isinstance(path, list) else [path]
    lines = spark.read.text(paths)
    # the native JSON source skips whitespace-only lines entirely; the
    # text-scan path must do the same or from_json('') yields a null
    # struct whose null _corrupt_record survives the keep_corrupt=False
    # filter as a phantom all-null row (common trailing-newline input).
    # rlike(\S), not trim() != '': trim strips only ASCII spaces, so a
    # tab-only line would still slip through
    lines = lines.where(F.col("value").rlike(r"\S"))
    parsed = lines.select(
        F.from_json(
            F.col("value"),
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    )
    df = parsed.select("r.*")
    if not keep_corrupt:
        df = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df
