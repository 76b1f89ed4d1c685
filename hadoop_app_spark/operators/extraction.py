"""HTML -> text extraction + C4-style boilerplate line filtering.

Beyond-reference surface (north star): the very first stage of a
web-crawl training-data pipeline — turn raw HTML payloads (WARC-class
input) into clean text BEFORE any quality gate, dedup, or tokenizer
sees them. Reference parity: the reference has no extraction stage
(its inputs are already line-oriented text, cf. reference NCDC/TSV
readers); this is a completion the 100 TB corpus use-case requires.

Pipeline per document (pure Catalyst — regexp/replace/HOF chain, no
Python in the hot path, whole-stage codegen end to end):

1. drop <script>/<style> blocks and <!-- comments --> (content AND
   tags — script bodies are not text);
2. convert block-element boundaries (</p>, <br>, </li>, ...) to
   newlines so document line structure survives tag stripping;
3. strip every remaining tag;
4. decode the six entities that appear in virtually all web text
   (&amp; LAST, so "&amp;lt;" decodes to the literal "&lt;" the
   author wrote, not to "<");
5. split to lines, collapse intra-line whitespace, drop empty lines;
6. (optional) C4-style boilerplate line filter: keep lines with >=
   min_words words that end in terminal punctuation and don't
   mention javascript/cookies/copyright — the Raffel et al. 2020
   (C4) heuristic family.

Exactness discipline: every pattern below parses identically in Java
regex (Spark) and RE2 (DuckDB) — no lookarounds, no backreferences —
and ``html_to_text_sql`` / ``clean_lines_sql`` generate the DuckDB
oracle expression from the SAME tables that drive the Spark chain,
so the oracle cannot drift from the implementation.

Scale shape (100 TB): a narrow per-row map — no shuffle, no UDF; the
only cost is regex time, which AQE-sized input splits parallelize
perfectly. Filters on the result (e.g. n_lines_kept > 0) push down
to the scan when the html column is stored, because the whole chain
is a deterministic Catalyst expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order with GLOBAL replacement in
# both engines. (?is) = case-insensitive + dotall, inline so the same
# pattern string feeds Java regex and RE2.
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # script/style bodies are code, not text: drop content + tags
    (r"(?is)<script\b[^>]*>.*?</script\s*>", ""),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", ""),
    (r"(?s)<!--.*?-->", ""),
    # block-element boundaries -> newline (line structure survives)
    (r"(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)\s*>", "\n"),
    # attribute-carrying variants (<br class="x">, <hr id=y/>) must
    # still break lines, not fall through to the tag->space rule
    (r"(?i)<(?:br|hr)\b[^>]*/?>", "\n"),
    # every remaining tag -> space (so "a</b>b" doesn't glue to "ab").
    # Known limitation: a literal '>' inside a quoted attribute value
    # ends this match early and leaks the attribute tail into output —
    # acceptable for the C4-class heuristic (the content-line filter
    # downstream drops most such fragments), documented so callers on
    # adversarial HTML know to pre-sanitize.
    (r"<[^>]*>", " "),
)

# literal entity decodes, in order; &amp; LAST so double-encoded text
# ("&amp;lt;") decodes one level, exactly like a browser's first pass.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# C4-class boilerplate cues (checked lowercase, substring match)
BOILERPLATE_CUES: tuple[str, ...] = ("javascript", "cookie", "all rights reserved")
TERMINAL_PUNCT: tuple[str, ...] = (".", "!", "?", '"', "'")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sq(s: str) -> str:
    """Quote a string as a SQL literal (single-quote doubling)."""
    return "'" + s.replace("'", "''") + "'"


def html_strip(col: Column | str) -> Column:
    """Raw HTML -> flat text (steps 1-4 above): one regexp/replace
    chain, newline-delimited at block boundaries, entities decoded."""
    out = _c(col)
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_strip_sql(col_sql: str) -> str:
    """DuckDB expression equivalent of ``html_strip`` — generated from
    the same tables, so implementation and oracle cannot diverge."""
    out = col_sql
    for pat, repl in HTML_STRIP_STEPS:
        out = f"regexp_replace({out}, {_sq(pat)}, {_sq(repl)}, 'g')"
    for ent, ch in HTML_ENTITIES:
        out = f"replace({out}, {_sq(ent)}, {_sq(ch)})"
    return out


def text_lines(col: Column | str) -> Column:
    """Flat extracted text -> array of non-empty trimmed lines with
    intra-line whitespace collapsed (step 5)."""
    lines = F.split(_c(col), "\n", -1)
    cleaned = F.transform(lines, lambda x: F.trim(F.regexp_replace(x, r"[ \t\r]+", " ")))
    return F.filter(cleaned, lambda x: x != "")


def text_lines_sql(col_sql: str) -> str:
    """DuckDB twin of ``text_lines`` (chr(10) split + trim/collapse +
    drop-empty)."""
    return (
        "list_filter(list_transform(string_split(" + col_sql + ", chr(10)), "
        "x -> trim(regexp_replace(x, '[ \\t\\r]+', ' ', 'g'))), x -> x != '')"
    )


def _is_content_line(x: Column, min_words: int) -> Column:
    words = F.size(F.split(x, " ", -1))
    ends_punct = F.substring(x, -1, 1).isin(list(TERMINAL_PUNCT))
    lower = F.lower(x)
    cue_free = F.lit(True)
    for cue in BOILERPLATE_CUES:
        cue_free = cue_free & ~F.contains(lower, F.lit(cue))
    return (words >= min_words) & ends_punct & cue_free


def content_lines(lines: Column, min_words: int = 3) -> Column:
    """C4-style boilerplate filter over a line array (step 6): keep
    lines with >= min_words words, terminal punctuation, and no
    boilerplate cue. Pure HOF filter — stays in codegen."""
    return F.filter(lines, lambda x: _is_content_line(x, min_words))


def content_lines_sql(lines_sql: str, min_words: int = 3) -> str:
    """DuckDB twin of ``content_lines``."""
    punct = ", ".join(_sq(p) for p in TERMINAL_PUNCT)
    cues = " AND ".join(f"NOT contains(lower(x), {_sq(c)})" for c in BOILERPLATE_CUES)
    pred = (
        f"len(string_split(x, ' ')) >= {min_words} "
        f"AND x[-1] IN ({punct}) AND {cues}"
    )
    return f"list_filter({lines_sql}, x -> {pred})"


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 3,
    keep_lines: bool = False,
) -> DataFrame:
    """Full extraction pipeline: html -> (id, text, n_lines,
    n_content_lines, content) where ``text`` joins ALL extracted lines
    and ``content`` joins only the boilerplate-filtered ones. One
    narrow projection — zero shuffle at any scale."""
    lines = text_lines(html_strip(html_col))
    kept = content_lines(lines, min_words)
    if keep_lines:
        return df.select(F.col(id_col), lines.alias("lines"), kept.alias("content_lines"))
    return df.select(
        F.col(id_col),
        F.array_join(lines, "\n").alias("text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_content_lines"),
        F.array_join(kept, "\n").alias("content"),
    )
