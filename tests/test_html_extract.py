"""HTML→text extraction: the Spark chain and its DuckDB oracle replay
must be BYTE-identical on crafted edge cases, and the raw-WARC
response reader must feed the quality pipeline end to end."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from luzzu_spark.rules.html import html_to_text_expr, html_to_text_oracle

CASES = [
    # script/style/noscript content must vanish; entities decode once;
    # block tags break lines; stray '<' inside script must not confuse
    "<html><head><script>var x = 1 < 2;</script><style>p{color:red}"
    "</style></head><body><p>Hello &amp; welcome to the caf&#39;s "
    "page.</p><div>Second block with &lt;tags&gt; shown literally."
    "</div><ul><li>one</li><li>two</li></ul>"
    "<table><tr><td>cell</td></tr></table>"
    "<blockquote>quoted &quot;text&quot;&nbsp;here</blockquote>"
    "<noscript>js off</noscript>footer text</body></html>",
    # newlines inside an element; <br> break
    "<p>multi\nline\ninside one tag</p><br>after break",
    # no tags at all; double-encoded entity decodes exactly once
    "plain text no tags &amp;amp; stays half-encoded",
    # empty and whitespace-only
    "",
    "   \n\n  ",
    # attributes with '>' lookalikes, self-closing, uppercase tags
    '<DIV CLASS="x"><P>upper</P></DIV><img src="a.png"/><BR/>tail',
    # multi-line script block (the (?s) flag path)
    "<script>\nline1();\nline2();\n</script>kept",
]


def test_spark_duckdb_extraction_identical(spark):
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", html_to_text_expr("html").alias("t")).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") v(i, html)", CASES)
    want = dict(con.execute(
        f"SELECT i, {html_to_text_oracle('html')} FROM t").fetchall())
    for i in range(len(CASES)):
        assert got[i] == want[i], (i, got[i], want[i])


def test_extraction_content_expectations(spark):
    df = spark.createDataFrame([(0, CASES[0])], "i int, html string")
    out = df.select(html_to_text_expr("html").alias("t")).collect()[0]["t"]
    assert "var x" not in out and "color:red" not in out
    assert "js off" not in out
    assert "Hello & welcome" in out
    assert '<tags> shown literally' in out
    assert 'quoted "text" here' in out
    assert out.splitlines()[0].startswith("Hello")  # leading \n trimmed
    assert "one" in out and "two" in out


_WARC = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/page\r\n"
    "WARC-Date: 2026-02-03T04:05:06Z\r\n"
    "WARC-Record-ID: <urn:uuid:resp-1>\r\n"
    "Content-Type: application/http; msgtype=response\r\n"
    "\r\n"
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/html; charset=UTF-8\r\n"
    "\r\n"
    "<html><head><title>T</title><script>x()</script></head><body>"
    "<p>A real paragraph of crawl text with enough words to read "
    "naturally and sensible punctuation.</p>"
    "<div>Another &amp; final block.</div></body></html>\r\n"
    "\r\n"
)


@pytest.fixture()
def warc_path(tmp_path):
    p = tmp_path / "crawl-000.warc"
    p.write_bytes(_WARC.encode("utf-8"))
    return str(p)


def test_read_warc_html_end_to_end(spark, warc_path):
    from luzzu_spark.pipeline import QualityPipeline
    from luzzu_spark.sources import read_warc_html
    pages = read_warc_html(spark, warc_path)
    row = pages.collect()[0]
    assert row["url"] == "http://example.com/page"
    assert row["source"] == "example.com"
    # HTTP headers stripped, tags stripped, entity decoded
    assert "HTTP/1.1" not in row["text"] and "200 OK" not in row["text"]
    assert "x()" not in row["text"]
    assert "Another & final block." in row["text"]
    assert row["text"].startswith("T\nA real paragraph")
    assert row["html"].decode("utf-8").startswith("<html>")
    # and it assesses through the full pipeline unchanged
    assessed = QualityPipeline().assess(pages)
    assert assessed.select("url", "keep").count() == 1


def test_read_corpus_routes_warc(spark, warc_path):
    """.warc paths route to the response reader (conversion-only WET
    parsing would silently return zero rows on a raw crawl)."""
    from luzzu_spark.sources import read_corpus, sniff_format
    assert sniff_format(warc_path) == "warc"
    docs = read_corpus(spark, warc_path)
    assert docs.count() == 1
    assert "html" in docs.columns


def test_comments_dropped_as_unit(spark):
    """A comment containing '>' must vanish whole, not leak its tail
    (review r04): commented-out markup and ad/analytics boilerplate
    would otherwise contaminate the text the rules consume."""
    cases = ["<p>hi</p><!-- if width > 600 show banner --><p>bye</p>",
             "<!--\nmulti\nline > comment\n-->kept"]
    df = spark.createDataFrame(list(enumerate(cases)), "i int, html string")
    out = {r["i"]: r["t"] for r in
           df.select("i", html_to_text_expr("html").alias("t")).collect()}
    assert out[0] == "hi\n\nbye"   # </p> and <p> both break; comment gone
    assert out[1] == "kept"
    # and the oracle replays it identically
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (0, ?), (1, ?))"
                " v(i, html)", cases)
    want = dict(con.execute(
        f"SELECT i, {html_to_text_oracle('html')} FROM t").fetchall())
    assert out == want


def test_block_break_needs_name_boundary(spark):
    """<link>/<pre>/<track> must NOT break lines (prefix-matching bug,
    review r04): only the listed block tags themselves do."""
    cases = ['before<link rel="stylesheet">after',
             "a<pre>code</pre>b",
             "x<li>item</li>y",          # real <li> still breaks
             "m<br/>n"]                   # self-closing br still breaks
    df = spark.createDataFrame(list(enumerate(cases)), "i int, html string")
    out = {r["i"]: r["t"] for r in
           df.select("i", html_to_text_expr("html").alias("t")).collect()}
    assert "\n" not in out[0] and "after" in out[0]
    assert "\n" not in out[1] and "code" in out[1]
    assert "\n" in out[2]
    assert out[3] == "m\nn"
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i in range(len(cases)))
                + ") v(i, html)", cases)
    want = dict(con.execute(
        f"SELECT i, {html_to_text_oracle('html')} FROM t").fetchall())
    assert out == want


def test_robots_noindex_flag(spark, tmp_path):
    """Publishers' opt-out signal: meta-robots noindex (any attribute
    order) and the X-Robots-Tag HTTP header both flag; ordinary pages
    don't; a 'noindex' WORD in body text doesn't."""
    from luzzu_spark.sources import read_warc_html

    def rec(i, http_headers, body):
        return ("WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: http://x.example/{i}\r\n"
                "WARC-Date: 2026-02-03T04:05:06Z\r\n"
                f"WARC-Record-ID: <urn:uuid:r{i}>\r\n\r\n"
                "HTTP/1.1 200 OK\r\n" + http_headers + "\r\n"
                + body + "\r\n\r\n")

    warc = (
        rec(0, "Content-Type: text/html\r\n",
            '<html><head><meta name="robots" content="noindex, nofollow">'
            "</head><body><p>opted out</p></body></html>")
        + rec(1, "Content-Type: text/html\r\n",
              '<html><head><meta content="NOINDEX" name="ROBOTS"/></head>'
              "<body><p>attr order + case</p></body></html>")
        + rec(2, "Content-Type: text/html\r\nX-Robots-Tag: noindex\r\n",
              "<html><body><p>header opt-out</p></body></html>")
        + rec(3, "Content-Type: text/html\r\n",
              "<html><body><p>the word noindex in prose is fine"
              "</p></body></html>"))
    p = tmp_path / "robots.warc"
    p.write_bytes(warc.encode("utf-8"))
    rows = {r["url"].rsplit("/", 1)[-1]: r["robots_noindex"]
            for r in read_warc_html(spark, str(p)).collect()}
    assert rows == {"0": True, "1": True, "2": True, "3": False}


def _rec(i: int, body: str, http_headers: str = "") -> str:
    return ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://x.example/{i}\r\n"
            "WARC-Date: 2026-02-03T04:05:06Z\r\n"
            f"WARC-Record-ID: <urn:uuid:r{i}>\r\n\r\n"
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + http_headers + "\r\n" + body + "\r\n\r\n")


def test_robots_noindex_quoted_tag_semantics(spark, tmp_path):
    """Head-restricted detection (VERDICT r04): a docs page QUOTING a
    literal noindex tag inside a body <pre>/code example must NOT
    flag; a head-level tag still flags with such a <pre> present; and
    headless markup falls back to a whole-body scan, so a real meta
    tag in malformed HTML still flags."""
    from luzzu_spark.sources import read_warc_html

    warc = (
        _rec(0,  # prose page quoting the tag in a body code sample
             "<html><head><title>How to opt out</title></head><body>"
             "<p>Add this tag inside your page head:</p>"
             '<pre><meta name="robots" content="noindex"></pre>'
             "</body></html>")
        + _rec(1,  # headless page carrying a REAL meta robots tag
               '<meta name="robots" content="noindex">'
               "<p>page with no head element</p>")
        + _rec(2,  # head-level tag flags even with a body <pre>
               '<html><head><meta name="robots" content="noindex">'
               "</head><body><pre>unrelated code</pre></body></html>"))
    p = tmp_path / "quoted.warc"
    p.write_bytes(warc.encode("utf-8"))
    rows = {r["url"].rsplit("/", 1)[-1]: r["robots_noindex"]
            for r in read_warc_html(spark, str(p)).collect()}
    assert rows == {"0": False, "1": True, "2": True}


def _keeping_text(spark) -> str:
    """Text of a fixture doc the default pipeline keeps, free of
    markup-significant characters so HTML extraction is an identity."""
    from luzzu_spark.fixtures import as_webpages, load_table
    from luzzu_spark.pipeline import QualityPipeline
    docs = load_table(spark, "/root/testdata/sf0.001",
                      "documents").where("doc_id < 40")
    kept = QualityPipeline().filtered(as_webpages(docs))
    for r in kept.select("text").collect():
        t = r["text"]
        if ("&" not in t and "<" not in t and "\n" not in t
                and len(t) > 200):
            return t
    raise AssertionError("no suitable kept fixture doc")


def test_drop_noindex_end_to_end(spark, tmp_path):
    """--drop-noindex wired as a pipeline rule: the planted noindex
    pages (meta AND header variants) drop end-to-end through the CLI
    run, the funnel JSON counts them, the clean twin with IDENTICAL
    body text survives, and the drop lands in the per-rule firing
    rates + daQ observations under accessibility/licensing."""
    import argparse

    import scripts.run_filter as rf
    from luzzu_spark.checkpoint import ResumableRun
    from luzzu_spark.metrics import observations, rule_firing_rates
    from luzzu_spark.pipeline import QualityPipeline
    from luzzu_spark.rules.registry import (extended_registry,
                                            robots_noindex_rule)
    from luzzu_spark.sources import read_warc_html

    text = _keeping_text(spark)
    body = f"<html><head></head><body><p>{text}</p></body></html>"
    warc = (
        _rec(0, body)
        + _rec(1, ('<html><head><meta name="robots" content="noindex">'
                   f"</head><body><p>{text}</p></body></html>"))
        + _rec(2, body, http_headers="X-Robots-Tag: noindex\r\n"))
    p = tmp_path / "crawl.warc"
    p.write_bytes(warc.encode("utf-8"))

    out_dir = str(tmp_path / "out")
    res = rf.run_job(spark, argparse.Namespace(
        input=str(p), output=out_dir, master=None, batch_size=8,
        repeat=1, as_webpages=False, input_format=None,
        input_schema=None, inject_pii=False, salt_buckets=0,
        seen_table=None, commit_bucket_table=None, bucket_path=None,
        n_buckets=4, json=False, bench=False, drop_noindex=True))
    assert res["complete"] and res["n_docs"] == 3
    assert res["noindex_flagged"] == 2
    out = spark.read.parquet(ResumableRun.output_glob(out_dir))
    urls = {r["url"] for r in out.select("url").collect()}
    assert urls == {"http://x.example/0"}

    # the drop is rule-counted: firing rates + daQ facet
    assessed = QualityPipeline(
        registry=extended_registry(robots_noindex_rule())
    ).assess(read_warc_html(spark, str(p)))
    rates = {r["rule"]: r["n_fired"]
             for r in rule_firing_rates(assessed).collect()}
    assert rates["robots_noindex"] == 2
    obs = {r["metric"]: (r["category"], r["dimension"])
           for r in observations(assessed).collect()}
    assert obs["robots_noindex"] == ("accessibility", "licensing")


def test_drop_noindex_requires_warc_column(spark, tmp_path):
    """--drop-noindex on an input without the robots_noindex column
    (e.g. parquet documents) must raise, not silently no-op."""
    import argparse

    import scripts.run_filter as rf
    from luzzu_spark.fixtures import load_table

    in_dir = str(tmp_path / "docs_in")
    load_table(spark, "/root/testdata/sf0.001", "documents") \
        .where("doc_id < 10").write.mode("overwrite").parquet(in_dir)
    with pytest.raises(ValueError, match="robots_noindex"):
        rf.run_job(spark, argparse.Namespace(
            input=in_dir, output=str(tmp_path / "o"), master=None,
            batch_size=8, repeat=1, as_webpages=True,
            input_format=None, input_schema=None, inject_pii=False,
            salt_buckets=0, seen_table=None, commit_bucket_table=None,
            bucket_path=None, n_buckets=4, json=False, bench=False,
            drop_noindex=True))


def test_build_corpus_drop_noindex_stage(spark, tmp_path):
    """build_corpus --drop-noindex: the funnel reports noindex_flagged
    and the written corpus excludes the opted-out pages."""
    import argparse

    import scripts.build_corpus as bc

    text = _keeping_text(spark)
    body = f"<html><head></head><body><p>{text}</p></body></html>"
    warc = (
        _rec(0, body)
        + _rec(1, ('<html><head><meta name="robots" content="noindex">'
                   f"</head><body><p>{text}</p></body></html>"))
        + _rec(2, body, http_headers="X-Robots-Tag: noindex\r\n"))
    p = tmp_path / "crawl.warc"
    p.write_bytes(warc.encode("utf-8"))
    out = str(tmp_path / "corpus")
    funnel = bc.build(spark, argparse.Namespace(
        input=str(p), output=out, master=None, as_webpages=False,
        inject_pii=False, bench_input=None, neardup_threshold=0.5,
        survivor_policy="first", dedup_spans=False, sample_rate=1.0,
        pack_budget=256, format="parquet", json=False,
        drop_noindex=True))
    assert funnel["noindex_flagged"] == 2
    assert funnel["quality_kept"] == 1
    urls = {r["url"] for r in
            spark.read.parquet(out).select("url").collect()}
    assert urls == {"http://x.example/0"}
