"""Employee x dept equi-join (reference job 2).

Reference: ReduceJoinJob.java:100-176 — a hand-built reduce-side
repartition join: both files unioned at scan, rows tagged "0_"/"1_",
shuffled on dept_id, reducer emits the per-key cartesian product.

Semantic fine print (SURVEY §1.3.1): the docstring says LEFT JOIN but
the implementation drops employees whose dept is missing -> INNER.
``how='inner'`` is the bug-compat default; ``how='left'`` gives the
documented intent.

Spark plan: two typed scans + one ``join`` — Catalyst chooses broadcast
hash (dept is small) or sort-merge; either way the M:N cartesian within
a key is native join semantics, and the tag/parse/re-split machinery
(ReduceJoinJob.java:117,153 value encoding, with its '_'-collision bug,
SURVEY §1.3.7) disappears. At scale: dept is a classic broadcast dim;
employee never shuffles at all under broadcast-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_app_spark.sources.sinks import write_text_lines
from hadoop_app_spark.sources.tsv import read_tsv

EMPLOYEE_COLS = [("name", "string"), ("salary", "long"), ("dept_id", "long")]
DEPT_COLS = [("dept_id", "long"), ("dept_name", "string")]


def reduce_join(employee: DataFrame, dept: DataFrame, how: str = "inner") -> DataFrame:
    """Join employees to departments; output column order matches the
    reference reducer: name, dept_id, dept_name, salary
    (ReduceJoinJob.java:169-171 reorders vs input)."""
    small = F.broadcast(dept) if how in ("inner", "left") else dept
    return (
        employee.join(small, "dept_id", how)
        .select("name", "dept_id", "dept_name", "salary")
    )


def run_reduce_join(
    spark: SparkSession,
    employee_path: str,
    dept_path: str,
    out_path: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """End-to-end ReduceJoinJob: TSV sources -> equi-join -> tab-text sink."""
    employee = read_tsv(spark, employee_path, EMPLOYEE_COLS)
    dept = read_tsv(spark, dept_path, DEPT_COLS)
    result = reduce_join(employee, dept, how)
    if out_path is not None:
        line = F.concat_ws("\t", "name", "dept_id", "dept_name", "salary")
        write_text_lines(result.select(line.alias("value")), out_path)
    return result
