"""URL canonicalization contracts (queries_web).

Properties: idempotence (canonicalizing twice changes nothing), case
handling confined to scheme+host, decoration stripping. Hypothesis
drives a pure-Python twin of the Spark expression; one Spark job then
pins the twin and the Catalyst expression byte-identical over a seeded
messy-URL corpus (per-example Spark jobs would be pathologically slow,
so the cross-impl check batches — the repo's fuzz-corpus pattern)."""

from __future__ import annotations

import random
import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from luzzu_spark.queries_web import canonicalize_url


def canon_py(u: str) -> str:
    """Pure-Python twin of queries_web.canonicalize_url — same regexes,
    same order (strip fragment, strip query, strip trailing slashes,
    lowercase the scheme://host prefix)."""
    u = re.sub(r"#.*$", "", u)
    u = re.sub(r"\?.*$", "", u)
    u = re.sub(r"/+$", "", u)
    m = re.match(r"(?i)^(https?://[^/]+)", u)
    host = m.group(1).lower() if m else ""
    rest = re.sub(r"(?i)^https?://[^/]+", "", u, count=1) if m else u
    return host + rest


_url_st = st.builds(
    lambda scheme, host, path, deco: scheme + host + path + deco,
    st.sampled_from(["http://", "https://", "HTTPS://".lower()]),
    st.from_regex(r"[A-Za-z][A-Za-z0-9.\-]{0,20}", fullmatch=True),
    st.from_regex(r"(/[A-Za-z0-9._\-]{0,10}){0,4}", fullmatch=True),
    st.sampled_from(["", "/", "?a=1&b=2", "#frag", "?q=x#frag", "#a#b"]),
)


@settings(max_examples=300, deadline=None)
@given(_url_st)
def test_canonicalize_idempotent(u):
    once = canon_py(u)
    assert canon_py(once) == once


@settings(max_examples=300, deadline=None)
@given(_url_st)
def test_canonicalize_strips_decoration(u):
    c = canon_py(u)
    assert "#" not in c
    assert "?" not in c
    assert not c.endswith("/")


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_canonicalize_host_case_insensitive(u):
    m = re.match(r"(?i)^(https?://[^/]+)(.*)$", u)
    if not m:
        return
    upper = m.group(1).upper() + m.group(2)
    # uppercasing ONLY the scheme+host never changes the canonical form
    assert canon_py(upper) == canon_py(u)


def test_spark_expr_matches_python_twin(spark):
    """The Catalyst expression and the Python twin agree byte-for-byte
    over a seeded messy-URL corpus (one Spark job, fuzz-corpus style)."""
    rng = random.Random(7)
    hosts = ["A.Example.COM", "b.example.com", "WWW.Site.ORG", "x.y"]
    paths = ["", "/p", "/p/q", "/Deep/Path/Here", "/trailing/"]
    decos = ["", "/", "?utm=1", "#top", "?a=b#c", "##", "?"]
    urls = ["http{}://{}{}{}".format("s" if rng.random() < 0.5 else "",
                                     rng.choice(hosts), rng.choice(paths),
                                     rng.choice(decos))
            for _ in range(300)]
    pdf = pd.DataFrame({"u": urls})
    got = (spark.createDataFrame(pdf)
           .select(canonicalize_url(F.col("u")).alias("c"))
           .toPandas()["c"].tolist())
    want = [canon_py(u) for u in urls]
    assert got == want
