"""Declarative data-quality expectations — the publish gate of a
large-scale pipeline (Deequ / Great-Expectations class, rebuilt
Spark-first).

A corpus or mart is only as good as the checks that ran before it was
published: row counts in range, keys non-null and unique, measures
inside their domain, categorical columns drawn from their dictionary,
foreign keys resolving. This module declares those checks as data
(small spec objects) and evaluates them efficiently:

- **One scan for all row-local expectations.** ``NotNull``,
  ``ValueRange``, ``AcceptedValues``, ``RowCountBetween`` and
  ``UniqueKey`` all reduce to aggregates, so they are computed in a
  SINGLE wide ``agg`` over the table — adding an expectation adds a
  column to the aggregate, never a pass over the data. (``UniqueKey``
  rides along as ``count_distinct``; Spark plans the distinct via
  expand, still one scan.)
- **One join pass per referenced dimension.** ``ForeignKey`` counts
  unresolved keys with a broadcast-eligible left-anti join — the only
  expectation class that cannot be a scan-local aggregate.
- **Verdicts are data.** The result is a DataFrame
  ``[expectation, metric, passed]`` — pipe it to a sink, alert on
  ``passed = false``, or join it into a run manifest. ``metric`` is
  the measured value (violation count, fraction, row count) so a
  failure is diagnosable without a re-run.

Everything here is deterministic and SQL-expressible, so the registry
oracle recomputes every metric and verdict independently in DuckDB.

No reference analogue: the reference validates per-record (arity
checks, quality-digit filters — S4/P2); this is that idea lifted from
"drop the bad row" to "judge the dataset".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCountBetween:
    lo: int
    hi: int

    @property
    def name(self) -> str:
        return f"row_count_between({self.lo},{self.hi})"


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null({self.col})"


@dataclass(frozen=True)
class UniqueKey:
    cols: tuple

    @property
    def name(self) -> str:
        return f"unique_key({','.join(self.cols)})"


@dataclass(frozen=True)
class ValueRange:
    col: str
    lo: float
    hi: float

    @property
    def name(self) -> str:
        return f"value_range({self.col},{self.lo},{self.hi})"


@dataclass(frozen=True)
class AcceptedValues:
    col: str
    values: tuple

    @property
    def name(self) -> str:
        return f"accepted_values({self.col})"


@dataclass(frozen=True)
class ForeignKey:
    col: str
    dim: DataFrame = field(compare=False)
    dim_col: str = ""

    @property
    def name(self) -> str:
        return f"foreign_key({self.col}->{self.dim_col})"


@dataclass(frozen=True)
class DriftBound:
    """Distribution-drift admission gate: the batch's binned
    distribution (``bin_expr``, a SQL expression over the batch's
    columns) may differ from ``reference``'s by at most
    ``max_tvd_milli`` total variation distance (milli-units, the
    `distribution_drift` metric). The gate a continuously-fed corpus
    needs beyond row-local checks: a feed whose rows are individually
    valid can still silently shift the length/language/quality MIX —
    this quarantines such batches with the drifted bins attributable
    via `distribution_drift` on the quarantined file.

    An EMPTY batch evaluates to metric 1000 (maximal drift, ADVICE
    r11) — it quarantines like any shifted batch instead of raising,
    so a foreachBatch sink without its own isEmpty guard degrades to
    a recoverable quarantine rather than a forever-replaying job
    kill. An empty REFERENCE still raises (that is a configuration
    error: TVD against nothing must never read as 0)."""

    bin_expr: str
    reference: DataFrame = field(compare=False)
    max_tvd_milli: int = 100

    @property
    def name(self) -> str:
        return f"drift_bound({self.bin_expr},{self.max_tvd_milli})"


def _sum0(cond: Column) -> Column:
    """Violation counter that is 0 (not NULL) on an EMPTY table: a
    bare sum over zero rows is NULL, which would make ``passed`` NULL
    — neither true nor false — and split consumers ('alert on false'
    sees nothing, 'require true' sees a failure)."""
    return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).cast("double")


def _metric_expr(e) -> Column:
    """The scan-local aggregate measuring one expectation.

    NULL semantics, stated once: NULLs count as violations for
    ``ValueRange``/``AcceptedValues`` (an unparseable measure is not
    in its domain), and ``UniqueKey`` counts any row with a NULL key
    component as a violation (``count_distinct`` excludes such rows,
    so they land in the rows-minus-distinct difference — a NULL key
    component is not a usable identifier)."""
    if isinstance(e, RowCountBetween):
        return F.count(F.lit(1)).cast("double")
    if isinstance(e, NotNull):
        return _sum0(F.col(e.col).isNull())
    if isinstance(e, UniqueKey):
        # duplicates = rows - distinct keys (0 when the key is unique)
        return (
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in e.cols])
        ).cast("double")
    if isinstance(e, ValueRange):
        c = F.col(e.col)
        return _sum0(c.isNull() | (c < e.lo) | (c > e.hi))
    if isinstance(e, AcceptedValues):
        c = F.col(e.col)
        return _sum0(c.isNull() | ~c.isin(list(e.values)))
    raise TypeError(f"not a scan-local expectation: {e}")


def _passed_expr(e, metric: Column) -> Column:
    if isinstance(e, RowCountBetween):
        return (metric >= e.lo) & (metric <= e.hi)
    return metric == 0  # every other class counts violations


def check_expectations(df: DataFrame, expectations: list) -> DataFrame:
    """Evaluate *expectations* over *df*, returning one row per
    expectation: ``[expectation string, metric double, passed
    boolean]`` — metrics are violation counts (or the row count for
    ``RowCountBetween``), so 0 means clean.

    Cost: ONE wide aggregate scan for all scan-local expectations plus
    one left-anti join per ``ForeignKey`` and one grouped-count merge
    per ``DriftBound`` (whose reference side is pre-aggregated once by
    Spark's plan — the batch side is the only per-call scan); the
    verdict frame itself is |expectations| rows.
    """
    if not expectations:
        raise ValueError(
            "no expectations given — an empty gate would silently pass "
            "everything; assert at least one check (or skip the call)"
        )
    local = [
        e for e in expectations if not isinstance(e, (ForeignKey, DriftBound))
    ]
    fks = [e for e in expectations if isinstance(e, ForeignKey)]
    drifts = [e for e in expectations if isinstance(e, DriftBound)]
    parts = []
    if local:
        wide = df.agg(
            *[_metric_expr(e).alias(f"_m{i}") for i, e in enumerate(local)]
        )
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(e.name).alias("expectation"),
                            F.col(f"_m{i}").alias("metric"),
                            _passed_expr(e, F.col(f"_m{i}")).alias("passed"),
                        )
                        for i, e in enumerate(local)
                    ]
                )
            ).alias("r")
        ).select("r.expectation", "r.metric", "r.passed")
        parts.append(stacked)
    for e in fks:
        dangling = (
            df.select(F.col(e.col))
            .where(F.col(e.col).isNotNull())
            .join(
                e.dim.select(F.col(e.dim_col).alias(e.col)).distinct(),
                e.col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        )
        parts.append(
            dangling.select(
                F.lit(e.name).alias("expectation"),
                "metric",
                (F.col("metric") == 0).alias("passed"),
            )
        )
    for e in drifts:
        # TVD in milli-units = sum(|old_share - new_share|) / 2 over
        # the drift rows; half-integers are exact doubles, so the
        # metric is engine- and partitioning-independent like every
        # other gate metric. An EMPTY batch side pins the metric to
        # exactly 1000 (maximal drift — quarantine, don't kill the
        # stream; ADVICE r11): sum(n_new) rides the same drift frame,
        # no extra scan.
        # The reference side is aggregated ONCE per gate instance and
        # pinned as an executor-local checkpoint (r12): a DriftBound
        # lives across micro-batches in a foreachBatch sink, and
        # re-scanning a corpus-sized reference every trigger is the
        # hidden O(|reference|)-per-batch cost this removes — each
        # batch now pays one batch scan + a |bins|-row merge.
        ref_binned = getattr(e, "_ref_binned", None)
        if ref_binned is None:
            ref_binned = (
                e.reference.select(F.expr(e.bin_expr).alias("bin"))
                .groupBy("bin")
                .agg(F.count("*").alias("n_old"))
                .localCheckpoint(eager=True)
            )
            object.__setattr__(e, "_ref_binned", ref_binned)
        tvd = distribution_drift(
            e.reference, df, F.expr(e.bin_expr), old_binned=ref_binned
        ).agg(
            F.when(
                F.coalesce(F.sum("n_new"), F.lit(0)) == 0, F.lit(1000.0)
            )
            .otherwise(
                F.coalesce(F.sum("diff_milli"), F.lit(0)) / F.lit(2.0)
            )
            .cast("double")
            .alias("metric")
        )
        parts.append(
            tvd.select(
                F.lit(e.name).alias("expectation"),
                "metric",
                (F.col("metric") <= e.max_tvd_milli).alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    bin_col: Column | str,
    out_bin: str = "bin",
    old_binned: DataFrame | None = None,
) -> DataFrame:
    """Binned distribution drift between two snapshots, everything in
    EXACT integer milli-units -> one row per observed bin:
    ``[bin, n_old, n_new, old_milli, new_milli, diff_milli]`` — the
    drift gate a refreshed corpus/feature pipeline runs beside the
    value expectations above ("did this crawl shift the length /
    quality / language distribution?"). Total variation distance is
    ``sum(diff_milli) / 2`` over the result — left to the caller so
    the per-bin attribution (WHICH bins moved) ships with the number.

    Integer by construction (the PSI/KL alternatives need ln —
    engine-divergent): shares are ``count * 1000 div total`` and the
    diff is an absolute integer difference, bit-identical anywhere.
    Scale shape: one grouped count per snapshot (map-side combined),
    one full-outer merge on the bin key, output = |bins|.

    Edge semantics (ADVICE r10/r11): the bin merge is NULL-SAFE — a
    NULL bin (e.g. a NULL input column) is ONE group on both sides,
    exactly as GROUP BY already treats it, so it merges into one row
    instead of inflating TVD as an old-only + new-only pair. An EMPTY
    REFERENCE raises at evaluation (``raise_error`` inside the share
    expression) rather than NULL-ing every share — it would otherwise
    coalesce to TVD 0 downstream and wave ANY batch through a
    `DriftBound` gate. An empty NEW side, by contrast, is a
    RECOVERABLE condition (an empty micro-batch must quarantine, not
    kill the stream in a forever-replay loop): its shares evaluate to
    0, so every reference bin reads as pure loss and the summed TVD is
    maximal-drift-sized; `DriftBound` additionally pins that case to
    an exact metric of 1000.

    ``old_binned`` (columns ``[{out_bin}, n_old]``, already grouped
    under the SAME binning) replaces the reference-side aggregation —
    the scale lever for repeated gates: a `DriftBound` evaluated once
    per micro-batch must not re-scan a corpus-sized reference every
    trigger, so `check_expectations` pre-aggregates it ONCE per gate
    instance and passes the |bins|-row result here."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col

    def _binned(df, n_name):
        return df.select(b.alias(out_bin)).groupBy(out_bin).agg(
            F.count("*").alias(n_name)
        )

    o = (
        old_binned.select(F.col(out_bin), F.col("n_old"))
        if old_binned is not None
        else _binned(old, "n_old")
    ).withColumnRenamed(out_bin, "_ob")
    n = _binned(new, "n_new").withColumnRenamed(out_bin, "_nb")
    merged = o.join(n, F.col("_ob").eqNullSafe(F.col("_nb")), "full_outer").select(
        F.coalesce("_ob", "_nb").alias(out_bin),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = merged.agg(
        F.sum("n_old").alias("_to"), F.sum("n_new").alias("_tn")
    )

    old_m = F.when(
        F.col("_to") == 0,
        F.raise_error(
            F.lit(
                "distribution_drift: the old/reference snapshot is empty — "
                "shares are undefined and a TVD of 0 against nothing "
                "must not pass a drift gate"
            )
        ).cast("long"),
    ).otherwise(F.expr("n_old * 1000 div _to"))
    # empty NEW side: shares 0 (recoverable maximal drift), never raise
    # — an empty batch in a foreachBatch gate would replay forever
    new_m = F.when(F.col("_tn") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("n_new * 1000 div _tn")
    )
    return merged.crossJoin(F.broadcast(tot)).select(
        out_bin,
        "n_old",
        "n_new",
        old_m.alias("old_milli"),
        new_m.alias("new_milli"),
        F.abs(old_m - new_m).alias("diff_milli"),
    )
