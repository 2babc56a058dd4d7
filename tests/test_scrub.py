"""Scrub-chain properties: byte-identity, idempotence, PII removal."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from luzzu_spark.rules.scrub import ALL_STEPS, scrub_expr, scrub_py

CASES = [
    ("mail me at jo.smith+x@sub.example.co.uk today",
     "mail me at <EMAIL> today"),
    ("call (555) 123-4567 or 555-123-4567 now",
     "call <PHONE> or <PHONE> now"),
    ("host 192.168.10.254 and 8.8.8.8 replied",
     "host <IP> and <IP> replied"),
    ("ssn is 123-45-6789 ok", "ssn is <SSN> ok"),
    ("a badword and a toxicterm here", "a <TOX> and a <TOX> here"),
    ("clean text stays clean", "clean text stays clean"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_scrub_py_cases(raw, expected):
    assert scrub_py(raw) == expected


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["text"])
    got = [r["s"] for r in
           df.select(scrub_expr("text").alias("s")).collect()]
    assert got == [scrub_py(r) for r, _ in CASES]


def test_idempotent_on_cases(spark):
    once = [scrub_py(r) for r, _ in CASES]
    assert [scrub_py(t) for t in once] == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_idempotent_property(text):
    once = scrub_py(text)
    assert scrub_py(once) == once


def test_replacement_tokens_inert():
    """No replacement token may match any later (or earlier) pattern —
    the confluence precondition for byte-identical chains."""
    for _, pat, _ in ALL_STEPS:
        rx = re.compile(pat)
        for _, _, repl in ALL_STEPS:
            assert not rx.search(repl), (pat, repl)


def test_pii_rows_scrubbed(assessed):
    hit = assessed.filter(
        F.col("text").rlike("@example\\.com")
        & ~F.col("text_scrubbed").contains("<EMAIL>")).count()
    assert hit == 0
    leftover = assessed.filter(
        F.col("text_scrubbed").rlike(
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")).count()
    assert leftover == 0
