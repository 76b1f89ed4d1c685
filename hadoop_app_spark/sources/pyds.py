"""Spark 4 Python DataSource for the NCDC fixed-width weather format.

The reference ingests NCDC lines through Hadoop's TextInputFormat +
a mapper that substrings fixed offsets (MaxTemperatureMapper.java:17-22:
year at [15,19), sign-aware temperature at [87,92), quality at [92,93)).
`sources/ncdc.py` re-expresses that as `spark.read.text` + substring
projections; THIS module is the third face: a first-class custom source
on the public Python DataSource API (Spark 4, SPARK-44076), so the
format participates in Spark's scan planning like any built-in source —
`spark.read.format("ncdc").load(path)` with its own splits and its own
filter pushdown instead of a post-scan projection.

Scale design (what TextInputFormat's HDFS block splits give the
reference, recreated on the Python API):

- **Record-stride byte splitting.** NCDC is a fixed-width format: every
  record is the same byte length. `partitions()` stats each file,
  validates the stride from the first line, and emits byte ranges
  ALIGNED to whole records — a 100 GB file becomes N independent range
  reads with no line-boundary scan-ahead and no driver pre-pass over
  the data (the stride check reads ONE line per file). Files whose
  first line disproves uniformity fall back to one partition per file:
  correctness first, parallelism where the format contract holds.
- **Filter pushdown that skips PARSING, not just rows.**
  `pushFilters` accepts year/quality comparisons
  (=, <, <=, >, >=, IN). Accepted filters are evaluated inside
  `read()` on the raw fixed-offset slice BEFORE the temperature parse
  and tuple construction — the Python-side analogue of a parquet
  row-group skip. Everything else is declined (returned), so Spark
  keeps evaluating it post-scan; declining is always safe, silently
  "accepting" without applying never is.
- **Arrow-batched returns.** `read()` yields one pyarrow RecordBatch
  per partition instead of per-row tuples — the batch path the Python
  worker hands to the JVM without per-row pickling.

Short or garbled lines are dropped, matching `parse_fixed_width`'s
null-drop decision (FIXTURES.md A1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from typing import Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

# field offsets, byte positions in the record (reference parity)
YEAR_SLICE = slice(15, 19)
TEMP_SLICE = slice(87, 92)
QUALITY_SLICE = slice(92, 93)
MIN_LINE = 93


@dataclass(frozen=True)
class ByteRange(InputPartition):
    """One record-aligned byte range of one file (pickled to workers)."""

    path: str
    start: int
    end: int


def _predicate(f: Filter):
    """Compile an accepted Filter into a plain int -> bool closure."""
    v = f.value
    if isinstance(f, EqualTo):
        return lambda x: x == v
    if isinstance(f, GreaterThan):
        return lambda x: x > v
    if isinstance(f, GreaterThanOrEqual):
        return lambda x: x >= v
    if isinstance(f, LessThan):
        return lambda x: x < v
    if isinstance(f, LessThanOrEqual):
        return lambda x: x <= v
    if isinstance(f, In):
        vs = set(f.value)
        return lambda x: x in vs
    raise AssertionError(f"unaccepted filter reached compile: {f}")


_PUSHABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)
_PUSH_COLS = {("year",): "year", ("quality",): "quality"}


class NcdcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ncdc source requires a path")
        self.path = path
        self.num_partitions = int(options.get("numPartitions", 8))
        # column -> [compiled predicates]; populated by pushFilters
        self._pushed: dict[str, list] = {}

    # -- pushdown -----------------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = _PUSH_COLS.get(getattr(f, "attribute", None))
            if col is not None and isinstance(f, _PUSHABLE):
                self._pushed.setdefault(col, []).append(_predicate(f))
            else:
                yield f  # declined: Spark keeps evaluating it post-scan

    # -- splits -------------------------------------------------------
    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                p
                for p in glob(os.path.join(self.path, "*"))
                if os.path.isfile(p) and os.path.getsize(p) > 0
                and not os.path.basename(p).startswith((".", "_"))
            )
        return sorted(p for p in glob(self.path) if os.path.isfile(p))

    def partitions(self) -> Sequence[ByteRange]:
        files = self._files()
        sizes = {p: os.path.getsize(p) for p in files}
        total = sum(sizes.values()) or 1
        # per-file split budget proportional to its byte share; the
        # stride check reads ONE line per file, never a pre-scan
        parts: list[ByteRange] = [
            r
            for p in files
            for r in _split_file(
                p, max(1, round(self.num_partitions * sizes[p] / total))
            )
        ]
        return parts or [ByteRange("", 0, 0)]

    # -- execution ----------------------------------------------------
    def read(self, partition: ByteRange):
        yield _read_range(
            partition,
            self._pushed.get("year", ()),
            self._pushed.get("quality", ()),
        )


def _read_range(partition: ByteRange, ypred=(), qpred=()):
    """Parse one record-aligned byte range into a pyarrow RecordBatch
    (shared by the batch and streaming readers; runs on executors)."""
    import pyarrow as pa

    years: list[int] = []
    temps: list[int] = []
    quals: list[int] = []
    if partition.path:
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            blob = fh.read(partition.end - partition.start)
        for raw in blob.splitlines():
            if len(raw) < MIN_LINE:
                continue
            line = raw.decode("ascii", errors="replace")
            ys, qs = line[YEAR_SLICE], line[QUALITY_SLICE]
            if not (ys.isdigit() and qs.isdigit()):
                continue
            year, qual = int(ys), int(qs)
            # pushed predicates run BEFORE the temperature parse
            if any(not p(year) for p in ypred):
                continue
            if any(not p(qual) for p in qpred):
                continue
            ts = line[TEMP_SLICE]
            try:
                temp = int(ts)  # int() accepts the '+'/'-' sign byte
            except ValueError:
                continue
            years.append(year)
            temps.append(temp)
            quals.append(qual)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(years, pa.int32()),
            pa.array(temps, pa.int32()),
            pa.array(quals, pa.int32()),
        ],
        names=["year", "temp", "quality"],
    )


def _split_file(path: str, want: int) -> list[ByteRange]:
    """Record-aligned byte ranges for one file (~``want`` of them), with
    the one-partition fallback when the stride contract fails."""
    size = os.path.getsize(path)
    if size == 0:
        return []
    with open(path, "rb") as fh:
        first = fh.readline()
    stride = len(first)
    if stride == 0 or not first.endswith(b"\n") or size % stride:
        return [ByteRange(path, 0, size)]
    n_rec = size // stride
    per = max(1, -(-n_rec // max(1, want)))  # ceil
    return [
        ByteRange(path, i * stride, min((i + per) * stride, size))
        for i in range(0, n_rec, per)
    ]


class NcdcStreamReader(DataSourceStreamReader):
    """Streaming face of the NCDC source: an append-only DIRECTORY of
    fixed-width files where new files arrive with lexicographically
    increasing names (the part-file writer convention). The offset is
    just the filename high-watermark — the driver never opens data
    files to plan a microbatch (it stats them), and each batch's files
    split into the same record-stride byte ranges as the batch reader,
    read on executors. That is the FileStreamSource contract rebuilt on
    the public Python API, minus the unbounded seen-file log: the
    name-ordered arrival convention makes one string a complete,
    checkpointable offset.

    Admission control: ``maxFilesPerTrigger`` (default unlimited) caps
    how far past the last planned offset each ``latestOffset()`` call
    advances, so a pre-populated directory drains over SEVERAL real
    micro-batches instead of one — FileStreamSource's option rebuilt
    Python-side. (Spark 4.1's JVM wrapper for Python streams implements
    neither SupportsTriggerAvailableNow nor SupportsAdmissionControl,
    so Trigger.AvailableNow logs a WARN and falls back to one
    drain-everything batch REGARDLESS of this option — pair the option
    with a processing-time trigger and stop when a progress round
    reports zero input rows, as `q_stream_pyds_exec` does. Under that
    fallback leave the option unset: a capped latestOffset would make
    the single Once-style batch stop early and silently skip files.)
    Restart safety (the subtle part): the engine calls the FIRST
    ``latestOffset()`` before ``initialOffset()`` on a fresh query and
    before anything at all on a restarted one, so at that moment the
    reader cannot see the checkpoint's committed offset — and any
    answer BEHIND it would be committed as a regressed offset, poisoning
    the log for every later restart. Two regimes:

    - ``paceStateDir`` set (pair it with ``maxFilesPerTrigger``; keep
      it next to the query's checkpoint — same lifetime): ``commit()``
      durably records the committed watermark (one string, atomic
      rename), and the first ``latestOffset()`` resumes pacing from it.
      A fresh query has no state file and paces from the beginning, so
      intake is paced from the very first trigger in both lifecycles.
    - no ``paceStateDir``: the first ``latestOffset()`` is UNPACED (the
      true directory latest — the only answer that is never behind an
      unknown committed offset); later triggers pace normally.

    ``partitions()`` adds defense-in-depth either way: every batch
    START the engine sends is an offset it already planned/committed,
    so the max start ever seen is a FLOOR and batch files are filtered
    against ``max(start, floor)`` — even a manually wiped state file
    cannot make this reader instance re-emit a file it has seen the
    engine move past."""

    STATE_FILE = "ncdc-pace-watermark"

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ncdc stream requires a directory path")
        self.path = path
        self.num_partitions = int(options.get("numPartitions", 8))
        self.max_files = int(options.get("maxFilesPerTrigger", 0))  # 0 = unlimited
        self.state_dir = options.get("paceStateDir")
        # high-watermark this reader last planned up to; None = not yet
        # recovered (first latestOffset decides: state file, or unpaced)
        self._cursor: str | None = None
        # max batch-start ever observed: every start the engine sends is
        # a committed/planned offset, so files <= floor are never re-emitted
        self._floor = ""

    def _files(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            os.path.basename(p)
            for p in glob(os.path.join(self.path, "*"))
            if os.path.isfile(p) and os.path.getsize(p) > 0
            and not os.path.basename(p).startswith((".", "_"))
        )

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, self.STATE_FILE)

    def _recover_cursor(self, names: list[str]) -> str:
        """First-latestOffset cursor: the durably committed watermark
        when pace state exists, else the unpaced-safe true latest."""
        if self.state_dir:
            try:
                with open(self._state_path(), "r", encoding="utf-8") as fh:
                    return fh.read()
            except FileNotFoundError:
                return ""  # fresh query: pace from the beginning
        return names[-1] if names else ""

    def _sync(self, watermark: str) -> None:
        """Advance the pacing cursor — it may lag the engine, never
        lead it backward."""
        if self._cursor is None or watermark > self._cursor:
            self._cursor = watermark

    def initialOffset(self) -> dict:
        # does NOT touch the cursor: on a fresh query the engine calls
        # this AFTER the first latestOffset() has already paced past ""
        return {"watermark": ""}

    def latestOffset(self) -> dict:
        names = self._files()
        if self._cursor is None:
            self._cursor = self._recover_cursor(names)
        if self.max_files > 0:
            fresh = [n for n in names if n > self._cursor][: self.max_files]
            if fresh:
                self._cursor = fresh[-1]
        elif names:
            self._cursor = max(self._cursor, names[-1])
        return {"watermark": self._cursor}

    def partitions(self, start: dict, end: dict) -> Sequence[ByteRange]:
        lo, hi = start["watermark"], end["watermark"]
        # the engine only sends committed/planned starts: raise the
        # floor, and re-sync pacing so it never plans behind the engine
        if lo > self._floor:
            self._floor = lo
        self._sync(lo)
        self._sync(hi)
        eff_lo = max(lo, self._floor)
        batch = [n for n in self._files() if eff_lo < n <= hi]
        if not batch:
            return []
        want = max(1, self.num_partitions // len(batch))
        return [
            r
            for n in batch
            for r in _split_file(os.path.join(self.path, n), want)
        ]

    def read(self, partition: ByteRange):
        yield _read_range(partition)

    def commit(self, end: dict) -> None:
        # files are immutable once named — nothing to clean; the commit
        # is a floor for pacing and, with paceStateDir, the durable
        # watermark the next incarnation resumes from (atomic rename so
        # a crash mid-write leaves the previous state intact)
        self._sync(end["watermark"])
        if self.state_dir:
            os.makedirs(self.state_dir, exist_ok=True)
            tmp = self._state_path() + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(end["watermark"])
            os.replace(tmp, self._state_path())


class NcdcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ncdc"

    def schema(self) -> str:
        return "year int, temp int, quality int"

    def reader(self, schema) -> NcdcReader:
        return NcdcReader(self.options)

    def streamReader(self, schema) -> "NcdcStreamReader":
        return NcdcStreamReader(self.options)


def register_ncdc_source(spark) -> None:
    """Idempotent registration + enable Python-source filter pushdown
    (off by default; without it pushFilters is never called and every
    filter stays a post-scan Filter node — still correct, just not
    skipping the parse)."""
    spark.dataSource.register(NcdcDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def read_ncdc_py(spark, path: str, num_partitions: int = 8):
    """DataFrame[year int, temp int, quality int] over NCDC files via
    the custom source: record-stride splits + year/quality pushdown."""
    register_ncdc_source(spark)
    return (
        spark.read.format("ncdc")
        .option("numPartitions", str(num_partitions))
        .load(path)
    )


def read_ncdc_stream(
    spark,
    path: str,
    num_partitions: int = 8,
    max_files_per_trigger: int = 0,
    pace_state_dir: str | None = None,
):
    """Streaming DataFrame over an append-only directory of NCDC files
    (new files must arrive with increasing names; offset = filename
    high-watermark). ``max_files_per_trigger`` > 0 paces intake so a
    backlog drains over several real micro-batches (use with a
    processing-time trigger; see NcdcStreamReader's availableNow
    caveat). Pass ``pace_state_dir`` (a directory with the same
    lifetime as the query's checkpoint) to make pacing engage from the
    FIRST trigger and survive restarts; without it the first batch is
    unpaced — the only restart-safe answer when the committed offset
    is unknowable (see NcdcStreamReader docstring)."""
    register_ncdc_source(spark)
    r = spark.readStream.format("ncdc").option("numPartitions", str(num_partitions))
    if max_files_per_trigger > 0:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if pace_state_dir:
        r = r.option("paceStateDir", pace_state_dir)
    return r.load(path)
