"""HTML -> text extraction + boilerplate filter (operators/extraction).

Covers: script/style/comment removal, block-tag line breaks, entity
decoding (incl. double-encoded &amp;lt;), whitespace collapse, the
C4-style content-line rules, null/empty propagation, and Spark/DuckDB
parity of the generated oracle expressions on hostile HTML.
"""

from __future__ import annotations

import duckdb
import pytest

from hadoop_app_spark.operators.extraction import (
    content_lines_sql,
    extract_text,
    html_strip_sql,
    text_lines_sql,
)

HOSTILE = (
    '<html><head><title>T</title><style media="x">p .a</style>'
    '<SCRIPT type="text/javascript">if(a<b&&c>d){alert("</p>")}</SCRIPT></head>'
    "<body><h1>Doc one</h1><p>Hello &amp; welcome to the page. It works!</p>"
    "<ul><li>Home</li><li>About &nbsp; us</li></ul><!-- nav\nmultiline -->"
    "<P>Second   paragraph with &quot;quotes&quot;, &#39;ticks&#39; "
    "and the literal &amp;lt; stays encoded.</P>"
    '<div class="footer">Copyright 2026 - All rights reserved.</div>'
    "<p>Please enable JavaScript to view this site.</p>"
    "<p>We use cookies to improve your experience.</p>"
    "<br><hr/>Short line</body></html>"
)


def _extract(spark, html_rows):
    df = spark.createDataFrame(html_rows, ["doc_id", "html"])
    return {
        r.doc_id: r for r in extract_text(df, "html", "doc_id").collect()
    }


def test_hostile_page(spark):
    r = _extract(spark, [(1, HOSTILE)])[1]
    lines = r.text.split("\n")
    # script body (with its embedded "</p>") and style body are gone
    assert all("alert" not in x and "p .a" not in x for x in lines)
    # comment gone, including its newline
    assert all("nav" not in x and "multiline" not in x for x in lines)
    # entity decoding: one level only
    assert "Hello & welcome to the page. It works!" in lines
    assert 'Second paragraph with "quotes", \'ticks\' and the literal &lt; stays encoded.' in lines
    # block boundaries became line breaks: list items are separate lines
    assert "Home" in lines and "About us" in lines
    # content filter: short/unpunctuated/boilerplate lines dropped
    kept = r.content.split("\n")
    assert kept == [
        "Hello & welcome to the page. It works!",
        'Second paragraph with "quotes", \'ticks\' and the literal &lt; stays encoded.',
    ]
    assert r.n_lines == len(lines)
    assert r.n_content_lines == 2


def test_edge_inputs(spark):
    out = _extract(
        spark,
        [
            (1, ""),
            (2, "no tags at all, plain text."),
            (3, "<p></p><div>   </div>"),
            (4, None),
        ],
    )
    assert out[1].n_lines == 0 and out[1].text == "" and out[1].content == ""
    assert out[2].text == "no tags at all, plain text."
    assert out[2].n_content_lines == 1
    assert out[3].n_lines == 0
    # null html propagates to null outputs (never fabricates rows/text)
    assert out[4].text is None and out[4].n_lines is None


def test_unclosed_script_drops_rest(spark):
    # an unclosed <script> matches nothing (non-greedy needs the close
    # tag), so the raw code text survives tag-stripping — the content
    # filter is the backstop that keeps it out of `content`
    r = _extract(spark, [(1, "<p>Real text here.</p><script>var x=1")])[1]
    assert "Real text here." in r.content
    assert "var x=1" not in r.content


def test_oracle_parity_on_hostile_html(spark):
    """The generated DuckDB expressions reproduce Spark's extraction
    bit-for-bit on hostile inputs (not just the synthesized corpus)."""
    cases = [
        (1, HOSTILE),
        (2, ""),
        (3, "plain. text."),
        (4, "<p>a&amp;&amp;b c d.</p>"),
        (5, "<P CLASS='x'>upper tags work fine here.</P>"),
        (6, "tab\tand\r\nCRLF  spacing.  "),
    ]
    df = spark.createDataFrame(cases, ["doc_id", "html"])
    got = sorted(
        (r.doc_id, r.text, r.n_lines, r.n_content_lines, r.content)
        for r in extract_text(df, "html", "doc_id").collect()
    )
    lines = text_lines_sql(html_strip_sql("html"))
    kept = content_lines_sql(lines, 3)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id INTEGER, html VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = con.execute(
        f"""SELECT doc_id, coalesce(array_to_string({lines}, chr(10)), '') AS text,
            CAST(len({lines}) AS INTEGER), CAST(len({kept}) AS INTEGER),
            coalesce(array_to_string({kept}, chr(10)), '')
            FROM t ORDER BY doc_id"""
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_min_words_threshold(spark):
    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.extraction import content_lines, text_lines

    df = spark.createDataFrame([("one two.\nthree four five.",)], ["t"])
    out = df.select(
        content_lines(text_lines(F.col("t")), min_words=3).alias("k")
    ).head()
    assert out.k == ["three four five."]


def test_br_hr_with_attributes_break_lines(spark):
    # <br class=..> / <hr id=..> must produce newlines like their bare
    # forms, not fall through to the generic tag->space rule
    html = (
        "<p>First sentence stays on its own line here.</p>"
        'Second sentence before a break.<br class="wide">'
        "Third sentence after the attribute break lives alone.<hr id='x' />"
        "Fourth sentence closes out the document properly."
    )
    r = _extract(spark, [(1, html)])[1]
    lines = [x.strip() for x in r.text.split("\n") if x.strip()]
    assert "Second sentence before a break." in lines
    assert "Third sentence after the attribute break lives alone." in lines
    assert "Fourth sentence closes out the document properly." in lines


def test_br_attribute_oracle_parity(spark):
    import duckdb

    from hadoop_app_spark.operators.extraction import html_strip

    html = 'a line before.<br data-x="1">a line after the attribute break.'
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    got = df.select(html_strip("html").alias("t")).head().t
    want = duckdb.sql(
        f"SELECT {html_strip_sql('html')} AS t FROM (SELECT '{html}' AS html)"
    ).fetchone()[0]
    assert got == want and "\n" in got
