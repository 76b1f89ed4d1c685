"""\\x01-delimited + embedded-JSON sources and their micro-format codecs.

Reference inputs (UserHotcar.java:44-49, :124-129):
  profile line:  userId \\x01 {"bycar_profile": {"cityid": "2@0.9$3@0.8",
                                                 "priceid": "120000"}}
  hotcar line:   cityId \\x01 {"infoidlist": "7@100.0,8@200.0"}

Micro-formats (SURVEY §1.1):
  cityid    = "cityId@score" list joined by '$'   (fan-out per city)
  infoidlist = "infoId@price" list joined by ','  (fan-out per car)

Reference bug (SURVEY §1.3.2): Java ``split("$")`` is a regex no-op, so
only the FIRST city is ever used. ``first_city_only=True`` reproduces
that; the default implements the intended explode-all-cities semantics.

Spark-first: read.csv(sep='\\x01') + F.from_json with declared structs;
the encoded lists become ArrayType via F.split + transform — all
JVM-side expressions, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_app_spark.functions.metrics import observe_counts

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField(
            "bycar_profile",
            T.StructType(
                [
                    T.StructField("cityid", T.StringType()),
                    T.StructField("priceid", T.StringType()),
                ]
            ),
        )
    ]
)

CARLIST_SCHEMA = T.StructType([T.StructField("infoidlist", T.StringType())])


def read_delim001_json(
    spark: SparkSession,
    path: str | list[str],
    json_schema: T.StructType,
    key_name: str = "key",
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Generic ``key \\x01 json`` reader -> DataFrame[key, doc: struct].

    Rows with < 2 fields are dropped (reference arity check,
    UserHotcar.java:46-48). Extra \\x01 fields beyond the second are
    ignored, matching ``split("\\x01")[1]`` indexing.

    observations: pass a dict to make the silent malformed-row drop an
    observed A4 counter — stored under ``<key_name>_source`` with
    metrics ``rows`` (in) and ``malformed_dropped``.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\x01", -1)
    staged = lines.select(parts.alias("_p"))
    if observations is not None:
        staged, obs = observe_counts(staged, malformed_dropped=F.size("_p") < 2)
        observations[f"{key_name}_source"] = obs
    return (
        staged.where(F.size("_p") >= 2)
        .select(
            F.col("_p").getItem(0).alias(key_name),
            F.from_json(F.col("_p").getItem(1), json_schema).alias("doc"),
        )
    )


def decode_at_pairs(col: F.Column, list_sep: str) -> F.Column:
    """Decode an ``"a@b<sep>a@b..."`` encoded list into
    array<struct<id: string, val: string>> — the engine's reusable codec
    for the reference's two micro-formats."""
    from hadoop_app_spark.sources.tsv import _escape_regex

    sep = _escape_regex(list_sep)  # split() takes a REGEX — '|' or '.'
    # unescaped would split between every character
    return F.transform(
        F.split(col, sep, -1),
        lambda p: F.struct(
            F.split(p, "@", -1).getItem(0).alias("id"),
            F.split(p, "@", -1).getItem(1).alias("val"),
        ),
    )


def encode_at_pairs(id_col: F.Column, val_col: F.Column) -> F.Column:
    """Inverse codec for one pair: ``id@val``."""
    return F.concat_ws("@", id_col, val_col)


def read_user_profiles(
    spark: SparkSession,
    path: str | list[str],
    first_city_only: bool = False,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Profile source -> DataFrame[user_id, city_id, city_score, fav_price].

    One output row per (user, preferred city). fav_price falls back to
    0.0 on unparseable input (UserHotcar.java:57-62 try/catch default).
    first_city_only reproduces the split("$") regex bug (§1.3.2).
    """
    raw = read_delim001_json(spark, path, PROFILE_SCHEMA, key_name="user_id", observations=observations)
    prof = raw.select(
        "user_id",
        F.col("doc.bycar_profile.cityid").alias("cityid_enc"),
        F.coalesce(F.col("doc.bycar_profile.priceid").try_cast("double"), F.lit(0.0)).alias("fav_price"),
    ).where(F.col("cityid_enc").isNotNull())
    if first_city_only:
        # bug-compat: whole cityid string survives split('$'); only
        # split('@')[0] is used as the city id, score is [1] of pair 1
        first = F.split(F.col("cityid_enc"), "@", -1)
        return prof.select(
            "user_id",
            first.getItem(0).alias("city_id"),
            F.lit(None).cast("double").alias("city_score"),
            "fav_price",
        )
    cities = decode_at_pairs(F.col("cityid_enc"), "$")
    return (
        prof.select("user_id", F.explode(cities).alias("c"), "fav_price")
        .select(
            "user_id",
            F.col("c.id").alias("city_id"),
            F.col("c.val").try_cast("double").alias("city_score"),
            "fav_price",
        )
        .where(F.col("city_id") != "")
    )


def read_city_cars(
    spark: SparkSession,
    path: str | list[str],
    dt: str | None = None,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Broadcast-side source -> DataFrame[city_id, info_id, price].

    One row per (city, car). ``dt`` selects a Hive-style ``dt=yyyy-MM-dd``
    partition subdirectory (UserNewcar.java:241-247 date-partitioned
    side input) — at scale this is partition pruning, not an ls().
    """
    if dt is not None:
        if isinstance(path, str):
            path = f"{path}/dt={dt}"
        else:
            path = [f"{p}/dt={dt}" for p in path]
    raw = read_delim001_json(spark, path, CARLIST_SCHEMA, key_name="city_id", observations=observations)
    cars = decode_at_pairs(F.col("doc.infoidlist"), ",")
    return (
        raw.where(F.col("doc.infoidlist").isNotNull())
        .select("city_id", F.explode(cars).alias("car"))
        .select(
            "city_id",
            F.col("car.id").alias("info_id"),
            F.col("car.val").try_cast("double").alias("price"),
        )
        .where(F.col("info_id") != "")
    )
