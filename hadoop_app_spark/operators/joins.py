"""Join builders: the reference's two join shapes plus the Spark
completions it lacks (semi/anti/outer/range/as-of — SURVEY §2.3
"absent" list, exposed as engine API).

Scale notes baked into each builder:
- equi_join broadcasts the small side when told (J2) — otherwise
  Catalyst/AQE picks sort-merge vs shuffled-hash and splits skew.
- range_join keeps the equi key in ``on`` so the theta predicate is
  evaluated post-shuffle inside the equi-join, not as a cartesian.
- asof_join uses the join+rank formulation: at 100 TB the right side
  is bucketed by key; the window dedup is one Exchange. (The
  sort-merge interleave trick is a future physical optimization;
  semantics first.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1 (shuffle equi-join) / J2 (broadcast hash join) in one builder."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — the reference's null-lookup filter P4 as a first-class op."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no key match in ``right``."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    salt_by: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-mitigating inner equi-join for EXTREME single-key skew.

    AQE's skew-join split handles moderate skew automatically; when one
    key holds a double-digit share of the rows, every row of that key
    still lands in one task family. Salting fixes that structurally:
    left rows scatter across ``n_salts`` sub-keys (deterministic hash
    of ``salt_by`` columns, or all non-key columns), and the right side
    is replicated n_salts times via a tiny explode, so the join key
    becomes (key, salt) and the hot key spreads over n_salts tasks.

    Cost model: right side is duplicated n_salts x — use only when
    right is small relative to the skew being split (dims, lookup
    tables). Results are identical to a plain inner join; only the
    physical row distribution changes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = list(salt_by) if salt_by else [c for c in left.columns if c not in keys]
    if not salt_cols:
        raise ValueError("need at least one non-key column (or salt_by) to derive a salt")
    salted_l = left.withColumn("_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int"))
    salted_r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return salted_l.join(salted_r, keys + ["_salt"], "inner").drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_on: str | None,
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi + theta predicate. Always pass the equi key when one exists
    so the physical plan is a hash/sort-merge join with a post-filter
    rather than BroadcastNestedLoop over the cross product."""
    if equi_on is not None:
        cond = (left[equi_on] == right[equi_on]) & range_cond
        out = left.join(right, cond, how)
        return out.drop(right[equi_on])
    return left.join(right, range_cond, how)


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    right_tiebreak: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Sort-merge as-of join — the scale path.

    Union both sides tagged by origin, run ONE window per key ordered
    by (ts, side[, right tiebreaks]), and carry the most recent right
    row's values onto each left row with last(..., ignoreNulls). Cost:
    one shuffle + one sort over |L|+|R| rows. The join+rank form
    (asof_join) explodes every left row by its full matching-right
    history first — at a 100 TB click log that fan-out dwarfs the
    inputs; this form never materializes it.

    ``how='inner'`` (default) drops left rows with no qualifying right
    row, matching asof_join; ``how='left'`` keeps them with null
    matched columns — including rows whose nearest right row falls
    OUTSIDE ``tolerance`` (out-of-tolerance = no match, not a drop).
    Matched right columns colliding with left names come back suffixed
    ``_right``. ``right_tiebreak`` columns break equal-ts
    right rows deterministically: ascending window order, last() wins,
    so the LAST value in tiebreak order is kept (e.g. pass
    ['event_id'] to keep the highest event id — the same result as
    rank-1 with event_id DESC in the join+rank form).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    vals = list(right_value_cols)
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in [right_ts, *vals]],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in [right_ts, *vals]],
    )
    unioned = l_tagged.unionByName(r_tagged)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc(), *[F.col(f"_r_{c}").asc() for c in right_tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in [right_ts, *vals]]
    )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        gap = (
            F.col("_ts") - F.col(f"_m_{right_ts}")
            if direction == "backward"
            else F.col(f"_m_{right_ts}") - F.col("_ts")
        )
        in_tol = gap <= tolerance
        if how == "left":
            # out-of-tolerance = NO match: null the matched columns and
            # KEEP the left row (pandas merge_asof semantics) — a where()
            # here would silently drop it
            for c in [right_ts, *vals]:
                out = out.withColumn(f"_m_{c}", F.when(in_tol, F.col(f"_m_{c}")))
        else:
            out = out.where(in_tol)
    if how == "inner":
        out = out.where(F.col(f"_m_{right_ts}").isNotNull())

    def out_name(c: str) -> str:
        # right_ts (or a right value col) may share the left's column
        # name — suffix instead of emitting a duplicate, unusable column
        taken = set(lcols)
        return f"{c}_right" if c in taken else c

    return out.select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in (on, left_ts)],
        *[F.col(f"_m_{c}").alias(out_name(c)) for c in [right_ts, *vals]],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    left_key: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest right_ts <= left_ts (backward; 'forward' = least >=),
    within an optional tolerance.

    Implementation: range join on (key, ts ineq) then keep rank-1 per
    left row — all shuffle-partitioned by the join key; no driver state.
    Pass ``left_key`` (a unique left row id) so the dedup window
    partitions by one narrow column instead of the whole left row.
    Without it, a synthetic unique row id is added so IDENTICAL left
    rows each keep their own match (an all-columns partition would
    collapse genuine duplicates into one output row). Right columns
    colliding with left names come back suffixed ``_right``.
    """
    synth_key = left_key is None
    if synth_key:
        left_key = "_asof_lid"
        left = left.withColumn(left_key, F.monotonically_increasing_id())
    lk, rk = left.alias("l"), right.alias("r")
    if direction == "backward":
        ineq = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
        order = F.col(f"r.{right_ts}").desc()
        if tolerance is not None:
            ineq = ineq & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - tolerance)
    elif direction == "forward":
        ineq = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
        order = F.col(f"r.{right_ts}").asc()
        if tolerance is not None:
            ineq = ineq & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + tolerance)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & ineq
    joined = lk.join(rk, cond, "inner")
    # rank-1 per left row; tiebreak fully deterministic
    w = Window.partitionBy(F.col(f"l.{left_key}")).orderBy(order)
    out_left = [c for c in left.columns if not (synth_key and c == left_key)]
    taken = set(out_left)
    right_cols = [
        F.col(f"r.{c}").alias(f"{c}_right" if c in taken else c)
        for c in right.columns
        if c != on
    ]
    return (
        joined.withColumn("_asof_rn", F.row_number().over(w))
        .where(F.col("_asof_rn") == 1)
        .select(*[F.col(f"l.{c}").alias(c) for c in out_left], *right_cols)
    )


def key_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    by: Sequence[str] = (),
) -> DataFrame:
    """Bloom filter over a key column -> [*by, word, bits]: the
    generic-key twin of corpus.build_bloom_filter (same md5-slice
    positions, same 32-bit words, same bit_or merge — see that
    docstring for the determinism/mergeability contract). Keys are
    stringified so any key type hashes identically across engines.
    ``by`` builds one independent filter PER group (e.g. per file for
    sources/skipping's sidecar index) in the same single pass."""
    if k > 4:
        raise ValueError("k <= 4: positions are 32-bit slices of one 128-bit md5")
    by = list(by)
    kk = keys.select(
        *by, F.col(key_col).cast("string").alias("_k")
    ).where(F.col("_k").isNotNull()).distinct()
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda j: F.conv(
                F.substring(F.md5(F.col("_k")), (j - 1) * 8 + 1, 8), 16, 10
            ).cast("long")
            % F.lit(m_bits),
        )
    ).alias("pos")
    return (
        kk.select(*by, pos)
        .select(
            *by,
            F.floor(F.col("pos") / F.lit(32)).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy(*by, "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_prefilter_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Fact rows whose key PASSES the Bloom filter built from ``keys``
    — a superset of the true semi-join (no false negatives, FP rate
    ~(1 - e^(-k*n/m))^k) that the exact join then reduces.

    This is Spark's own runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.*) made explicit and
    engine-reproducible: at 100 TB the win is shipping m_bits/32
    longs (~256 KB at defaults) instead of the key set, and dropping
    most fact rows BEFORE the shuffle the exact join needs. The
    filter probe is k BROADCAST hash joins against the bounded word
    table with the bit test riding each join condition — the fact
    side never shuffles and never aggregates; a row survives iff all
    k probed bits are set, exactly the membership rule the oracle
    replays bit-for-bit."""
    bloom = key_bloom(keys, keys_key, m_bits, k)
    out = fact
    kstr = F.col(fact_key).cast("string")
    drop_cols = []
    for j in range(1, k + 1):
        p = (
            F.conv(F.substring(F.md5(kstr), (j - 1) * 8 + 1, 8), 16, 10).cast("long")
            % F.lit(m_bits)
        )
        out = out.withColumn(f"_p{j}", p).withColumn(
            f"_m{j}",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{j} % 32 AS INT))"),
        )
        b = bloom.select(F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}"))
        out = out.join(
            F.broadcast(b),
            (F.floor(F.col(f"_p{j}") / F.lit(32)).cast("long") == F.col(f"_w{j}"))
            & (F.col(f"_b{j}").bitwiseAND(F.col(f"_m{j}")) == F.col(f"_m{j}")),
            "inner",
        )
        drop_cols += [f"_p{j}", f"_m{j}", f"_w{j}", f"_b{j}"]
    return out.drop(*drop_cols)
