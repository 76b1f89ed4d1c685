"""Car-recommendation pipeline (reference jobs 3+4: UserHotcar/UserNewcar).

Reference shape (UserHotcar.java:42-200, UserNewcar.java:42-199):
  profile (userId \\x01 JSON) -> extract preferred cities + fav price
  -> probe a side-input HashMap<city, "infoId@price,..."> (broadcast)
  -> fan-out to one row per (user, city, car)
  -> dist = |fav_price - car_price|
  -> per (user, city): sort by dist, min/max over the FULL group,
     score = 1 - (dist-min)/(max-min), keep top-K (100 hotcar / 60 newcar)
  -> emit ``userId_cityId \\x01 {"infoids": "id@score,..."}``

Spark plan: explode(cities) -> join(broadcast(city_cars)) ->
explode(cars is already row-per-car from the source) -> window
min/max/row_number -> filter rn<=K -> ordered re-assembly -> to_json.
One Exchange total (hash by user_id,city_id for the window); the
broadcast replaces the distributed-cache machinery wholesale.

Scale notes (100 TB): the side input is bounded (~300 cities,
BASELINE.md) -> broadcast is safe. The window partitions by
(user_id, city_id) — high cardinality, so no skew concentration; AQE
skew-join handles a hot city in the join stage. Top-K via row_number
never materializes more than a partition at a time.

Bug-compat flags (SURVEY §1.3):
  first_city_only — reproduce the split("$") regex no-op (§1.3.2)
  nan_compat      — emit NaN score for degenerate groups (§1.3.5)
  Ties: reference TreeSet order is shuffle-dependent (§1.3.6); we
  impose the deterministic (dist, info_id) tiebreak everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_app_spark.functions.metrics import observe_counts
from hadoop_app_spark.functions.normalize import min_max_score
from hadoop_app_spark.sources.delim001 import read_city_cars, read_user_profiles
from hadoop_app_spark.sources.sinks import write_text_lines

HOTCAR_TOP_K = 100  # UserHotcar.java:32 HOTCAR_NUM
NEWCAR_TOP_K = 60  # UserNewcar.java:33 TOP_60


def recommend_cars(
    profiles: DataFrame,
    city_cars: DataFrame,
    top_k: int = HOTCAR_TOP_K,
    nan_compat: bool = True,
) -> DataFrame:
    """Structured result: one row per recommended car.

    profiles:  [user_id, city_id, fav_price, ...]
    city_cars: [city_id, info_id, price]
    returns    [user_id, city_id, info_id, dist, score, rank]
    """
    joined = profiles.join(F.broadcast(city_cars), "city_id", "inner").withColumn(
        "dist", F.abs(F.col("fav_price") - F.col("price"))
    )
    grp = Window.partitionBy("user_id", "city_id")
    ordered = grp.orderBy(F.col("dist").asc(), F.col("info_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(ordered))
        .withColumn("min_d", F.min("dist").over(grp))
        .withColumn("max_d", F.max("dist").over(grp))
        .where(F.col("rank") <= top_k)
        .select(
            "user_id",
            "city_id",
            "info_id",
            "dist",
            min_max_score(F.col("dist"), F.col("min_d"), F.col("max_d"), nan_compat).alias("score"),
            "rank",
        )
    )


def assemble_output(recs: DataFrame) -> DataFrame:
    """Re-assemble the reference's output lines:
    ``user_id + "_" + city_id \\x01 {"infoids": "id@score,..."}``
    (UserHotcar.java:195-199) — items in rank order."""
    pairs = recs.select(
        "user_id",
        "city_id",
        F.struct(F.col("rank"), F.concat_ws("@", F.col("info_id"), F.col("score").cast("string")).alias("pair")).alias(
            "rp"
        ),
    )
    return (
        pairs.groupBy("user_id", "city_id")
        .agg(F.array_sort(F.collect_list("rp")).alias("rps"))
        .select(
            F.concat_ws("_", "user_id", "city_id").alias("key"),
            F.to_json(
                F.struct(F.concat_ws(",", F.transform(F.col("rps"), lambda s: s["pair"])).alias("infoids"))
            ).alias("payload"),
        )
        .select(F.concat_ws("\x01", "key", "payload").alias("value"))
    )


def _run(
    spark: SparkSession,
    profile_path: str,
    cars_path: str,
    out_path: str | None,
    top_k: int,
    dt: str | None,
    first_city_only: bool,
    nan_compat: bool,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    profiles = read_user_profiles(
        spark, profile_path, first_city_only=first_city_only, observations=observations
    )
    cars = read_city_cars(spark, cars_path, dt=dt, observations=observations)
    if observations is not None:
        # USER_COUNT twin (UserHotcar.java:35,97): one count per
        # (user, preferred city) row entering the join — the unit the
        # reference's mapper iterates
        profiles, observations["user_count"] = observe_counts(profiles)
    recs = recommend_cars(profiles, cars, top_k=top_k, nan_compat=nan_compat)
    if observations is not None:
        # HOTCAR_COUNT twin (UserHotcar.java:98): recommendations emitted
        recs, observations["rec_count"] = observe_counts(recs)
    if out_path is not None:
        write_text_lines(assemble_output(recs), out_path)
    return recs


def run_user_hotcar(
    spark: SparkSession,
    profile_path: str,
    hotcar_path: str,
    out_path: str | None = None,
    first_city_only: bool = False,
    nan_compat: bool = True,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """UserHotcar.java: top-100, undated side input.

    observations: pass a dict to collect the reference's A4 counters
    (USER_COUNT/HOTCAR_COUNT twins plus per-source malformed-drop
    counts); populated after any action on the returned frame.
    """
    return _run(
        spark, profile_path, hotcar_path, out_path, HOTCAR_TOP_K, None,
        first_city_only, nan_compat, observations,
    )


def run_user_newcar(
    spark: SparkSession,
    profile_path: str,
    newcar_path: str,
    dt: str,
    out_path: str | None = None,
    first_city_only: bool = False,
    nan_compat: bool = True,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """UserNewcar.java: top-60, side input read from the dt= partition
    (UserNewcar.java:241-247 — partition pruning, not directory math)."""
    return _run(
        spark, profile_path, newcar_path, out_path, NEWCAR_TOP_K, dt,
        first_city_only, nan_compat, observations,
    )
