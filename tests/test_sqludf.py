"""SQL-UDF rule surface (luzzu_spark/sqludf.py): the declarative
registry for SQL-only users must agree ROW-IDENTICALLY with the
DataFrame rule expressions, and must inline into the Catalyst plan
(no Python evaluation stage).

Note: the scalar parity check collects both sides and compares in
Python — joining a multi-SQL-UDF projection against a DataFrame-expr
projection trips a Spark 4.1 optimizer plan-validation bug
(RemoveRedundantAliases), which is a query-shape issue, not a result
issue (each side evaluates fine alone; the single-UDF join form in
test_keep_parity works)."""

from __future__ import annotations

from pyspark.sql import functions as F

from luzzu_spark.rules.heuristics import (heuristic_rules, max_word_len,
                                          mean_word_len, stopword_frac,
                                          symbol_ratio,
                                          with_token_columns)
from luzzu_spark.sqludf import register_sql_rules

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "   "),
         (9004, "the " * 50 + "x" * 300),
         (9005, "# @ $ % & " * 40)],
        "doc_id long, text string")
    return docs.unionByName(edge)


def test_keep_parity_with_dataframe_rules(spark):
    register_sql_rules(spark)
    corpus = _corpus(spark)
    corpus.createOrReplaceTempView("sqludf_corpus")
    d = with_token_columns(corpus)
    fires_any = None
    for r in heuristic_rules():
        f = r.fires(r.score())
        fires_any = f if fires_any is None else (fires_any | f)
    df_keep = d.select(
        "doc_id", (~F.coalesce(fires_any, F.lit(False))).alias("k_df"))
    sql_keep = spark.sql(
        "SELECT doc_id, luzzu_heuristic_keep(text) AS k_sql "
        "FROM sqludf_corpus")
    j = df_keep.join(sql_keep, "doc_id")
    assert j.count() == corpus.count()
    assert j.where(~F.col("k_df").eqNullSafe(F.col("k_sql"))).count() == 0


def test_scalar_rule_parity(spark):
    register_sql_rules(spark)
    corpus = _corpus(spark)
    corpus.createOrReplaceTempView("sqludf_corpus")
    # one SQL statement per scalar: several SQL UDFs in one projection
    # over a union view trips the same Spark 4.1 optimizer bug noted in
    # the module docstring (shape-only; values are unaffected)
    got: dict = {}
    for fn, alias in (("luzzu_mean_word_len", "m"),
                      ("luzzu_symbol_ratio", "sr"),
                      ("luzzu_stopword_frac", "sf"),
                      ("luzzu_max_word_len", "mx")):
        for r in spark.sql(f"SELECT doc_id, {fn}(text) v "
                           "FROM sqludf_corpus").collect():
            got.setdefault(r["doc_id"], []).append(r["v"])
    got = {k: tuple(v) for k, v in got.items()}
    want = {r["doc_id"]: (r["m"], r["sr"], r["sf"], r["mx"])
            for r in with_token_columns(corpus).select(
                "doc_id", mean_word_len().alias("m"),
                symbol_ratio().alias("sr"), stopword_frac().alias("sf"),
                max_word_len().cast("long").alias("mx")).collect()}
    assert got == want  # exact: identical expressions, identical floats


def test_sql_udf_inlines_no_python_stage(spark):
    """SQL UDFs must expand into the calling plan as pure Catalyst
    expressions — no BatchEvalPython/ArrowEvalPython node ever."""
    register_sql_rules(spark)
    _corpus(spark).createOrReplaceTempView("sqludf_corpus")
    plan = spark.sql(
        "SELECT luzzu_heuristic_keep(text) FROM sqludf_corpus") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Project" in plan


def test_sql_declared_rule_plugs_into_pipeline(spark):
    """sql_rule: a metric declared in SQL alone must score, fire, and
    report through the full pipeline exactly like a built-in rule —
    and leave the default verdict untouched for docs it doesn't hit."""
    from luzzu_spark.fixtures import as_webpages
    from luzzu_spark.pipeline import QualityPipeline
    from luzzu_spark.rules.registry import extended_registry, sql_rule

    stops = ("the and is of to in a for on with it as at by this "
             "that are was").split()
    clean = " ".join(f"word{i} {stops[i % len(stops)]} item{i}"
                     for i in range(12))
    digity = " ".join(f"12345 {stops[i % len(stops)]} 67890"
                      for i in range(12))
    docs = spark.createDataFrame(
        [(1, clean, "en", "srcA", len(clean)),
         (2, digity, "en", "srcA", len(digity))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")

    rule = sql_rule(
        "digit_heavy",
        "coalesce(try_divide(CAST(regexp_count(text, '[0-9]') "
        "AS DOUBLE), n_chars), 0.0)",
        "{score} > 0.3",
        description="digit-character fraction bound")
    pipe = QualityPipeline(registry=extended_registry(rule))
    got = {r["doc_id"]: r for r in
           pipe.assess(as_webpages(docs)).collect()}

    assert "digit_heavy" in got[2]["drop_reasons"]
    assert not got[2]["keep"]
    assert "digit_heavy" in got[2]["rule_scores"]
    assert got[2]["rule_scores"]["digit_heavy"] > 0.3
    assert "digit_heavy" not in got[1]["drop_reasons"]

    # the default registry stays byte-identical: same docs, no extras
    base = {r["doc_id"]: r for r in
            QualityPipeline().assess(as_webpages(docs)).collect()}
    assert base[1]["drop_reasons"] == got[1]["drop_reasons"]
    assert "digit_heavy" not in base[2]["rule_scores"]


def test_sql_rule_tolerates_literal_braces(spark):
    """Literal braces in the rule SQL (regex quantifiers in rlike)
    must survive {score} substitution — ADVICE r03: str.format raised
    KeyError on any brace that wasn't the placeholder."""
    from luzzu_spark.fixtures import as_webpages
    from luzzu_spark.pipeline import QualityPipeline
    from luzzu_spark.rules.registry import extended_registry, sql_rule

    docs = spark.createDataFrame(
        [(1, "AAAAAAA shouting run here", "en", "srcA", 25),
         (2, "quiet lowercase text", "en", "srcA", 20)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    rule = sql_rule(
        "shouty",
        "coalesce(CAST(text rlike '[A-Z]{5,}' AS DOUBLE), 0.0)",
        "{score} > 0.5 AND coalesce(text, '') NOT rlike 'z{99}'")
    pipe = QualityPipeline(registry=extended_registry(rule))
    got = {r["doc_id"]: r for r in
           pipe.assess(as_webpages(docs)).collect()}
    assert "shouty" in got[1]["drop_reasons"]
    assert "shouty" not in got[2]["drop_reasons"]


def test_cli_sql_rule_flag(spark, tmp_path):
    """run_filter --sql-rule: a SQL-declared rule from the production
    entry point drops its targets end-to-end."""
    import argparse

    import scripts.run_filter as rf

    stops = ("the and is of to in a for on with it as at by this "
             "that are was").split()
    clean = " ".join(f"word{i} {stops[i % len(stops)]} item{i}"
                     for i in range(12))
    digity = " ".join(f"12345 {stops[i % len(stops)]} 67890"
                      for i in range(12))
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, clean, "en", "srcA", len(clean)),
         (2, digity, "en", "srcA", len(digity))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long").write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "corpus")
    res = rf.run_job(spark, argparse.Namespace(
        input=inp, output=out, master=None, batch_size=2, repeat=1,
        as_webpages=True, input_format=None, input_schema=None,
        inject_pii=False, salt_buckets=0, seen_table=None,
        commit_bucket_table=None, bucket_path=None, n_buckets=4,
        json=False, bench=False,
        sql_rule=[["digit_heavy",
                   "coalesce(try_divide(CAST(regexp_count(text, "
                   "'[0-9]') AS DOUBLE), n_chars), 0.0)",
                   "{score} > 0.3"]]))
    assert res["complete"]
    from luzzu_spark.checkpoint import ResumableRun
    ids = {r["doc_id"]
           for r in spark.read.parquet(ResumableRun.output_glob(out))
           .select("doc_id").collect()}
    assert 1 in ids and 2 not in ids


def test_line_scrub_pipeline_stage(spark):
    """QualityPipeline(line_scrub=True) applies the C4 line scrub
    BEFORE assessment: nav/javascript lines vanish from text_scrubbed;
    the default pipeline keeps the raw lines (frozen contract)."""
    from pyspark.sql import functions as F

    from luzzu_spark.fixtures import as_webpages
    from luzzu_spark.pipeline import QualityPipeline

    stops = ("the and is of to in a for on with it as at by this "
             "that are was").split()
    body = " ".join(f"word{i} {stops[i % len(stops)]} item{i}."
                    for i in range(12))
    page = body + "\nClick here\nplease enable javascript to see this."
    docs = spark.createDataFrame(
        [(1, page, "en", "srcA", len(page))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")

    scrubbed = (QualityPipeline(line_scrub=True)
                .assess(as_webpages(docs))
                .select("text_scrubbed").first()[0])
    assert "Click here" not in scrubbed
    assert "javascript" not in scrubbed
    assert "word0" in scrubbed

    raw = (QualityPipeline().assess(as_webpages(docs))
           .select("text_scrubbed").first()[0])
    assert "Click here" in raw


def test_quality_score_sql_udf_parity(spark):
    """luzzu_quality_score (SQL) ≡ quality_score_expr (DataFrame)
    row-identically — 0.25-quantized doubles, exact comparison,
    including zero-token docs (both pin the ratio terms to 0)."""
    from luzzu_spark.queries_text import quality_score_expr

    register_sql_rules(spark)
    corpus = _corpus(spark)
    corpus.createOrReplaceTempView("sqludf_corpus")
    got = {r["doc_id"]: r["q"] for r in spark.sql(
        "SELECT doc_id, luzzu_quality_score(text) q "
        "FROM sqludf_corpus").collect()}
    want = {r["doc_id"]: r["q"]
            for r in with_token_columns(corpus)
            .select("doc_id", quality_score_expr().alias("q"))
            .collect()}
    assert got == want
