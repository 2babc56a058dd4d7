"""Extraction-quality evaluation (VERDICT r04 next #6): a planted
boilerplate corpus with KNOWN main text scores html_to_text_expr's
token precision/recall — the acceptance harness a trafilatura-tier
swap must pass. The deterministic heuristic extractor strips markup
but keeps boilerplate TEXT, so its contract is recall ≈ 1.0 (no main
text lost) at a measured precision floor (boilerplate share)."""

from __future__ import annotations

from pyspark.sql import functions as F

from luzzu_spark.rules.html import (extraction_precision_recall,
                                    html_to_text_expr)

_NAV = ('<nav><ul><li><a href="/">Home</a></li><li><a href="/about">'
        "About Us</a></li><li><a href=\"/contact\">Contact</a></li>"
        "<li><a href=\"/login\">Sign In</a></li></ul></nav>")
_COOKIE = ('<div class="cookie-banner">We use cookies to improve your '
           "experience. Accept All Cookies or Manage Preferences."
           "</div>")
_FOOTER = ("<footer><p>Copyright 2026 Example Corp. All rights "
           "reserved. Privacy Policy Terms of Service Sitemap</p>"
           "</footer>")


def _main_text(i: int) -> str:
    return (f"Article number {i} explains how a distributed query "
            f"engine schedules {i + 3} stages across the cluster and "
            "why the optimizer prefers a broadcast join when one side "
            "is small enough to replicate to every worker node in the "
            f"fleet. Section {i} also covers partition pruning and "
            "the cost model that decides between shuffle strategies.")


def _page(i: int) -> str:
    main = "".join(f"<p>{s.strip().rstrip('.')}.</p>"
                   for s in _main_text(i).split(". ") if s)
    return ("<html><head><title>Doc</title><script>track();</script>"
            f"</head><body>{_NAV}{_COOKIE}<article>{main}</article>"
            f"{_FOOTER}</body></html>")


def test_extraction_precision_recall_floors(spark):
    pages = spark.createDataFrame(
        [(i, _page(i), _main_text(i)) for i in range(20)],
        "doc_id long, html string, main_text string")
    extracted = pages.withColumn("text", html_to_text_expr("html"))
    row = extraction_precision_recall(extracted).collect()[0]
    # recall: the heuristic tier must not LOSE main text
    assert row["recall"] >= 0.99, row
    # precision: boilerplate text is retained by design — the measured
    # main-text share. Floor pinned BELOW the measured 0.616 so the
    # harness flags a regression that adds leakage (e.g. script/style
    # content) while documenting the honest gap a DOM extractor closes.
    assert 0.60 <= row["precision"] < 0.9, row
    assert row["truth_tokens"] > 0
    print(f"\n# measured extraction quality: precision="
          f"{row['precision']} recall={row['recall']} "
          f"({row['n_pages']} planted pages)")


def test_extraction_quality_detects_main_text_loss(spark):
    """The harness actually detects damage: an 'extractor' that drops
    half the article must show recall well below the floor."""
    pages = spark.createDataFrame(
        [(i, _main_text(i)) for i in range(10)],
        "doc_id long, main_text string")
    damaged = pages.withColumn(
        "text", F.substring("main_text", 1, 120))
    row = extraction_precision_recall(damaged).collect()[0]
    assert row["recall"] < 0.8, row
    assert row["precision"] >= 0.9, row  # what survives is all-main


def test_extraction_plus_c4_scrub_quality(spark):
    """Pipeline-effective extraction quality: the production path runs
    C4 line scrub AFTER html_to_text_expr (QualityPipeline
    line_scrub=True), so the number a corpus actually sees is the
    composed P/R, not the raw extractor's. The scrub drops the
    unpunctuated nav/footer lines (no terminal punctuation) while the
    cookie banner — a well-formed sentence — survives, so composed
    precision must land strictly ABOVE the raw 0.616 tier at unchanged
    recall (C4 keeps every main-text line: all end in '.')."""
    from luzzu_spark.rules.scrub import c4_line_scrub_expr

    pages = spark.createDataFrame(
        [(i, _page(i), _main_text(i)) for i in range(20)],
        "doc_id long, html string, main_text string")
    extracted = pages.withColumn("text", html_to_text_expr("html"))
    scrubbed = extracted.withColumn("text", c4_line_scrub_expr("text"))
    raw = extraction_precision_recall(extracted).collect()[0]
    row = extraction_precision_recall(scrubbed).collect()[0]
    assert row["recall"] >= 0.99, row            # no main text lost
    assert row["precision"] > raw["precision"], (row, raw)
    assert row["precision"] >= 0.75, row         # measured floor
    print(f"\n# composed extraction+C4 quality: precision="
          f"{row['precision']} recall={row['recall']} "
          f"(raw extractor precision={raw['precision']})")
