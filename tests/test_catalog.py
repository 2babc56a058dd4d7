"""Catalog registration contract — the driver's verification window.

The driver hash-checks exactly the FIRST 50 entries of queries() in
iteration order (verified r01/r02: the CORRECTNESS key set equals
queries()[0:50]). queries.py pins that window explicitly (_WINDOW);
these tests keep the rotation from silently drifting when modules
add or reorder registrations.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from luzzu_spark.queries import _WINDOW

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_is_the_first_50():
    names = list(entrymod.queries())
    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    assert names[:50] == list(_WINDOW)


def test_window_covers_never_driver_checked_queries():
    """Every ORACLE-checkable query that never received a driver row in
    r01-r04 must sit inside the round-5 window — except a declared
    overflow list when first-timers outnumber the 50 slots (empty in
    r05). Rows-only ops are exempt: they'd occupy a hash-check slot
    for a weaker rows-count record (VERDICT r02 item 1), and their
    correctness contracts live in dedicated local tests instead."""
    checked = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
                  "CORRECTNESS_r03.json", "CORRECTNESS_r04.json"):
        path = os.path.join(_REPO, fname)
        with open(path) as f:
            checked |= set(json.load(f))
    from luzzu_spark.queries import _WINDOW_OVERFLOW

    oracles = set(entrymod.oracle_sql())
    must = [n for n in entrymod.queries()
            if n not in checked and n in oracles]
    missing = [n for n in must
               if n not in _WINDOW and n not in _WINDOW_OVERFLOW]
    assert not missing, f"never-driver-checked but outside window: {missing}"
    # the declared overflow must itself be honest: every entry is a
    # registered, oracle-matched query that genuinely sits past slot 50
    names = list(entrymod.queries())
    for n in _WINDOW_OVERFLOW:
        assert n in oracles, f"overflow entry {n} has no oracle"
        assert names.index(n) >= 50, f"overflow entry {n} is in-window"


def test_freshness_rule_changed_queries_reenter_window():
    """Freshness governance (VERDICT r04 next #4): a query whose
    implementation or oracle changed since its last green driver row
    may NOT coast on that stale row — every _CHANGED_SINCE_LAST_GREEN
    entry must (a) be a registered oracle query and (b) hold a window
    slot, so the next driver run re-verifies it under the new code.
    The declaration itself is maintained alongside the change (the
    commit that invalidates a row adds its queries here; the round
    close that lands fresh green rows clears them)."""
    from luzzu_spark.queries import _CHANGED_SINCE_LAST_GREEN, _WINDOW
    oracles = set(entrymod.oracle_sql())
    registered = set(entrymod.queries())
    for n in _CHANGED_SINCE_LAST_GREEN:
        assert n in registered, f"changed-set entry {n} not registered"
        assert n in oracles, f"changed-set entry {n} has no oracle"
        assert n in _WINDOW, \
            f"{n} changed since its last green row but sits OUTSIDE " \
            "the verification window (stale-green)"


def test_every_window_name_is_registered():
    registered = set(entrymod.queries())
    unknown = [n for n in _WINDOW if n not in registered]
    assert not unknown, f"window references unregistered queries: {unknown}"


def test_every_oracle_has_a_query():
    qs = set(entrymod.queries())
    orphans = [n for n in entrymod.oracle_sql() if n not in qs]
    assert not orphans, orphans


def test_text_key_audit_detects_offenders():
    """The fleet-wide text-shuffle-key audit must flag raw text keys at
    top level and pass digests that merely WRAP a text column."""
    from scripts.plan_audit import _text_shuffle_keys
    flagged = _text_shuffle_keys(
        "+- Exchange hashpartitioning(span#12, 32), ENSURE, [plan_id=1]")
    assert flagged == ["span#12"], flagged
    ok = _text_shuffle_keys(
        "+- Exchange hashpartitioning(md5(text#4)#9, 32), [plan_id=2]")
    assert ok == [], ok
    multi = _text_shuffle_keys(
        "Exchange hashpartitioning(doc_id#1, text#2, 32)")
    assert multi == ["text#2"], multi
    rng = _text_shuffle_keys(
        "Exchange rangepartitioning(gram#7 ASC NULLS FIRST, 32)")
    assert rng == ["gram#7"], rng


def test_hll_sketch_accuracy_and_partition_invariance(spark):
    """events_hll_distinct_users contract: every sketch estimate lands
    within 5% of exact distinct, and the estimates are EXACTLY
    invariant to input partitioning (HLL register updates are
    max-based -> order/duplication independent)."""
    from pyspark.sql import functions as F
    from luzzu_spark.fixtures import load_table
    from luzzu_spark.queries import _QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: (r["est_users"], r["est_total_users"])
           for r in _QUERIES["events_hll_distinct_users"](
               spark, sf).collect()}
    e = load_table(spark, sf, "events")
    exact = {r["event_type"]: r["n"]
             for r in e.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    exact_total = e.select("user_id").distinct().count()
    for et, n in exact.items():
        est, est_total = got[et]
        assert abs(est - n) / n < 0.05, (et, est, n)
        assert abs(est_total - exact_total) / exact_total < 0.05

    e2 = e.repartition(17, "value")  # reshard on an unrelated column
    re_got = {r["event_type"]: r["est"] for r in e2.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id")).cast("long")
                  .alias("est")).collect()}
    assert re_got == {et: v[0] for et, v in got.items()}
