"""Stable fingerprints of physical plans — regression tripwires.

A query can stay CORRECT while its plan silently degrades (a broadcast
becomes a shuffle join, a WindowGroupLimit disappears, an extra
Exchange sneaks in). The fingerprint hashes the `explain("formatted")`
operator TREE — normalized to drop volatile node/expression ids — so a
changed hash in BENCH_r{N}.json names exactly which operator's plan
moved since the last round, turning "total got slower" into a
one-query diff. The hash covers plan SHAPE (operators + structure),
not literals or statistics.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import re

from pyspark.sql import DataFrame


def plan_tree(df: DataFrame) -> str:
    """The operator-tree section of ``explain('formatted')`` (node
    details dropped — they carry expr ids and sizes that vary run to
    run)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("\n\n")[0].strip()


def plan_fingerprint(df: DataFrame) -> str:
    """10-hex-char digest of the normalized plan tree."""
    norm = re.sub(r"\(\d+\)", "", plan_tree(df))
    norm = re.sub(r"#\d+L?", "#", norm)
    norm = re.sub(r"[ \t]+", " ", norm)
    return hashlib.md5(norm.encode()).hexdigest()[:10]
