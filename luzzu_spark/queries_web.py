"""Web/URL-level operators over the synthesized page table.

A crawl pipeline filters and dedups on URL structure before it ever
touches text: domain blocklists (licensing/safety takedowns) and URL
canonicalization (tracking params, fragments, case-variant hosts all
alias the same page). These run over the SAME deterministic page
synthesis as the flagship pipeline (fixtures.as_webpages), with the
URL math mirrored in the DuckDB oracle from the same doc_id formulas.

Scale notes: the blocklist is a broadcast anti-join (the corpus never
shuffles for it — each task drops blocked hosts locally); URL
canonicalization is a regexp_replace chain (codegen, one pass) and the
dedup counts distinct CANONICAL strings — URLs are short, bounded keys,
unlike document text (cf. the md5-keying rule for text shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from luzzu_spark.fixtures import as_webpages, load_table, spread
from luzzu_spark.queries import register

# deterministic blocklist: these sources' hosts are banned
BLOCKED_SOURCES = ("src3", "src7", "src11")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_webpages(spread(load_table(spark, sf_dir, "documents")))


def _block_hosts_sql() -> str:
    return ", ".join(f"'{s}.example.com'" for s in BLOCKED_SOURCES)


@register("url_host_blocklist", oracle=f"""
WITH pages AS (
  SELECT source || '.example.com' AS host, n_chars FROM documents),
kept AS (
  SELECT * FROM pages WHERE host NOT IN ({_block_hosts_sql()}))
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept GROUP BY host ORDER BY host
""")
def url_host_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filter: hosts are parsed from the real url
    column with parse_url (the production path — the oracle derives
    the same host from the synthesis formula) and dropped via a
    BROADCAST anti-join against the blocklist dim, so the corpus never
    shuffles; surviving hosts report doc/char counts."""
    pages = _pages(spark, sf_dir)  # text passes through: len == n_chars
    blocked = spark.createDataFrame(
        [(f"{s}.example.com",) for s in BLOCKED_SOURCES], "host string")
    hosted = pages.withColumn(
        "host", F.parse_url(F.col("url"), F.lit("HOST")))
    kept = hosted.join(F.broadcast(blocked), "host", "left_anti")
    return (kept.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).cast("long")
                 .alias("total_chars"))
            .orderBy("host"))


# messy-URL synthesis: two docs share each base path (doc_id // 2) and
# each doc decorates it differently — canonicalization must collapse
# the variants while distinct raw forms stay distinct
_MESSY_SQL = """
  CASE WHEN doc_id % 5 = 0
       THEN 'https://' || upper(source) || '.EXAMPLE.COM/page/'
       ELSE 'https://' || source || '.example.com/page/' END
  || CAST(doc_id // 2 AS VARCHAR)
  || CASE doc_id % 4
       WHEN 0 THEN '?utm_source=feed&ref=rss'
       WHEN 1 THEN '#section-2'
       WHEN 2 THEN '/'
       ELSE '' END
"""


def messy_url_expr() -> F.Column:
    """Deterministic messy URL as a function of (source, doc_id) —
    mirrored by _MESSY_SQL in the oracle."""
    d = F.col("doc_id")
    base = F.when(
        d % 5 == 0,
        F.concat(F.lit("https://"), F.upper("source"),
                 F.lit(".EXAMPLE.COM/page/"))
    ).otherwise(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/page/")))
    suffix = (F.when(d % 4 == 0, F.lit("?utm_source=feed&ref=rss"))
              .when(d % 4 == 1, F.lit("#section-2"))
              .when(d % 4 == 2, F.lit("/"))
              .otherwise(F.lit("")))
    return F.concat(base, F.floor(d / 2).cast("string"), suffix)


def canonicalize_url(col: F.Column) -> F.Column:
    """URL canonicalization: strip fragment, strip query string, strip
    trailing slashes, lowercase the scheme://host prefix (paths stay
    case-sensitive per RFC 3986). Two hypothesis catches baked in
    (tests/test_url_ops): strip ALL trailing slashes (a single-slash
    strip is not idempotent on 'a//') and match the scheme
    case-insensitively ('HTTP://A' must canonicalize like
    'http://a'). Pure regexp_replace chain — codegen, one projection,
    identical regex subset (incl. the (?i) flag) in the DuckDB
    oracle."""
    u = F.regexp_replace(col, "#.*$", "")
    u = F.regexp_replace(u, r"\?.*$", "")
    u = F.regexp_replace(u, "/+$", "")
    host = F.lower(F.regexp_extract(u, "(?i)^(https?://[^/]+)", 1))
    rest = F.regexp_replace(u, "(?i)^https?://[^/]+", "")
    return F.concat(host, rest)


@register("dedup_url_normalized", oracle=f"""
WITH messy AS (SELECT source, {_MESSY_SQL} AS u FROM documents),
canon AS (
  SELECT source, u,
         lower(regexp_extract(
             regexp_replace(regexp_replace(regexp_replace(
                 u, '#.*$', ''), '\\?.*$', ''), '/+$', ''),
             '(?i)^(https?://[^/]+)', 1))
         || regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
                 u, '#.*$', ''), '\\?.*$', ''), '/+$', ''),
             '(?i)^https?://[^/]+', '') AS cu
  FROM messy)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT u) AS BIGINT) AS n_raw_urls,
       CAST(COUNT(DISTINCT cu) AS BIGINT) AS n_canonical_urls
FROM canon GROUP BY source ORDER BY source
""")
def dedup_url_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: tracking queries, fragments,
    trailing slashes and case-variant hosts collapse to one canonical
    URL before identity dedup — re-crawls of the same page under
    decorated URLs stop inflating the corpus. Per source: raw vs
    canonical distinct counts (canonical ≤ raw; the planted messy
    synthesis gives two docs per base path, so canonicalization must
    actually merge)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    m = d.select("source", messy_url_expr().alias("u"))
    c = m.withColumn("cu", canonicalize_url(F.col("u")))
    return (c.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("u").alias("n_raw_urls"),
                 F.countDistinct("cu").alias("n_canonical_urls"))
            .orderBy("source"))


@register("rank_sources_weighted", oracle="""
WITH toks AS (
  SELECT source, n_chars, text,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
  FROM documents),
scored AS (
  SELECT source,
         0.5   * CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
       + 0.25  * CASE WHEN len(t) >= 30 THEN 1 ELSE 0 END
       + 0.125 * CASE WHEN CAST(len(list_filter(t,
                    x -> list_contains(['the','and','is','of','to','in',
                                        'a','it','that','for'], x)))
                    AS DOUBLE) / NULLIF(len(t), 0) >= 0.05
                  THEN 1 ELSE 0 END
       + 0.125 * CASE WHEN CAST(len(replace(trim(text), ' ', ''))
                            AS DOUBLE) / NULLIF(len(t), 0)
                       BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END AS s
  FROM toks)
SELECT source,
       CAST(AVG(s) AS DOUBLE) AS mean_quality,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(RANK() OVER (ORDER BY AVG(s) DESC, source ASC) AS BIGINT)
         AS rnk
FROM scored GROUP BY source ORDER BY rnk, source
""")
def rank_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luzzu's user-weighted dataset ranking
    (/root/reference/README.md:15) as an ORACLE-CHECKED query: each
    source's quality is the mean of a user-weighted rule-pass sum, and
    sources rank by it. Weights are DYADIC (0.5/0.25/0.125/0.125) on
    purpose: every per-doc score is an exact multiple of 0.125, so the
    per-source mean is bit-identical across engines and partitionings
    and the RANK can never flip on a float tie. Post-aggregation
    window over #sources rows only (empty-frame-window rule)."""
    from pyspark.sql import Window

    from luzzu_spark.rules.heuristics import with_token_columns
    d = with_token_columns(spread(load_table(spark, sf_dir, "documents")))
    sw = F.array(*[F.lit(w) for w in
                   ("the", "and", "is", "of", "to", "in",
                    "a", "it", "that", "for")])
    hits = F.size(F.filter("tokens", lambda t: F.array_contains(sw, t)))
    stop_frac = F.try_divide(hits.cast("double"), F.col("n_tokens"))
    total_len = F.length(F.regexp_replace(F.trim(F.col("text")),
                                          r"\s+", ""))
    mwl = F.try_divide(total_len.cast("double"), F.col("n_tokens"))
    s = (0.5 * (F.col("n_chars") >= 200).cast("double")
         + 0.25 * (F.col("n_tokens") >= 30).cast("double")
         + 0.125 * F.coalesce((stop_frac >= 0.05).cast("double"),
                              F.lit(0.0))
         + 0.125 * F.coalesce(((mwl >= 3.0) & (mwl <= 12.0))
                              .cast("double"), F.lit(0.0)))
    agg = (d.withColumn("s", s).groupBy("source")
           .agg(F.avg("s").alias("mean_quality"),
                F.count(F.lit(1)).alias("n_docs")))
    w = Window.orderBy(F.desc("mean_quality"), F.asc("source"))
    return (agg.withColumn("rnk", F.rank().over(w).cast("long"))
            .orderBy("rnk", "source"))


# deterministic page-with-lines synthesis: body text plus two
# boilerplate lines every page of a host shares — mirrored verbatim in
# the oracle CTEs below
_FOOTER_SQL = ("text || chr(10) || 'copyright (c) ' || source "
               "|| ' - all rights reserved' || chr(10) "
               "|| 'home | about | contact'")


def page_with_lines_expr() -> F.Column:
    """Body + per-host footer + global nav line, newline-separated —
    the deterministic multi-line page the line-level ops run over
    (mirrored by _FOOTER_SQL)."""
    return F.concat(
        F.col("text"), F.lit("\ncopyright (c) "), F.col("source"),
        F.lit(" - all rights reserved\nhome | about | contact"))


@register("text_boilerplate_lines", oracle=f"""
WITH pages AS (
  SELECT doc_id, source, {_FOOTER_SQL} AS page FROM documents),
lines AS (
  SELECT doc_id, source,
         unnest(string_split(page, chr(10))) AS line
  FROM pages),
keyed AS (
  SELECT doc_id, source, md5(line) AS lh, len(line) AS ln FROM lines),
freq AS (
  SELECT source, lh, COUNT(DISTINCT doc_id) AS ndocs
  FROM keyed GROUP BY source, lh)
SELECT k.source,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN f.ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate_lines,
       CAST(SUM(CASE WHEN f.ndocs < 3 THEN k.ln ELSE 0 END) AS BIGINT)
         AS n_chars_kept
FROM keyed k JOIN freq f ON k.source = f.source AND k.lh = f.lh
GROUP BY k.source ORDER BY k.source
""")
def text_boilerplate_lines(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """C4-style boilerplate-line removal: a line occurring in >= 3
    distinct documents of the SAME host is boilerplate (nav bars,
    copyright footers, cookie banners) and is dropped corpus-wide;
    per host: total lines, boilerplate instances removed, characters
    surviving. The planted synthesis gives every page two shared
    footer lines, so the rule must fire on exactly those (plus any
    >= 3-way duplicated bodies).

    Scale: lines explode where the text lives and immediately reduce
    to (source, md5(line)) hash-agg keys — fixed width, never the
    line text (the md5-keying rule from the cross-doc span rewrite).
    The obvious freq-then-join form scans and explodes the corpus
    TWICE and (at fixture scale) broadcast a corpus-sized per-line
    frame; instead a two-level aggregation — (source, lh, doc_id)
    folds intra-doc repeats with a map-side partial, (source, lh)
    yields the distinct-doc frequency AND the instance count in the
    same row — computes identical values with one scan, no join, and
    per-line rows bounded by distinct lines, not line instances."""
    pages = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", page_with_lines_expr().alias("page"))
    lines = pages.select(
        "doc_id", "source",
        F.explode(F.split("page", "\n")).alias("line"))
    keyed = lines.select(
        "doc_id", "source", F.md5("line").alias("lh"),
        F.length("line").alias("ln"))
    per_doc_line = (keyed.groupBy("source", "lh", "doc_id")
                    .agg(F.count(F.lit(1)).alias("c"),
                         F.first("ln").alias("ln")))
    per_line = (per_doc_line.groupBy("source", "lh")
                .agg(F.count(F.lit(1)).alias("ndocs"),
                     F.sum("c").alias("cnt"),
                     F.first("ln").alias("ln")))
    boiler = F.col("ndocs") >= 3
    return (per_line.groupBy("source")
            .agg(F.sum("cnt").alias("n_lines"),
                 F.sum(F.when(boiler, F.col("cnt")).otherwise(0))
                 .alias("n_boilerplate_lines"),
                 F.sum(F.when(~boiler, F.col("cnt") * F.col("ln"))
                       .otherwise(0))
                 .cast("long").alias("n_chars_kept"))
            .orderBy("source"))


@register("text_top_word_dominance", oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(trim(text), ' '),
                            x -> x <> '')) AS w
  FROM documents),
cnt AS (
  SELECT doc_id, lang, md5(w) AS wh, COUNT(*) AS c
  FROM toks GROUP BY doc_id, lang, wh),
per_doc AS (
  SELECT doc_id, lang, MAX(c) AS top_cnt, SUM(c) AS n_toks
  FROM cnt GROUP BY doc_id, lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN top_cnt * 5 > n_toks THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dominated,
       CAST(ROUND(CAST(SUM(top_cnt) AS DOUBLE) / SUM(n_toks), 6)
            AS DOUBLE) AS micro_top_frac
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_top_word_dominance(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Gopher most-common-word rule: per document, how much of the
    token stream is ONE word (keyword stuffing / template spam fires
    it). Per language: docs whose top word exceeds 20% of tokens —
    tested as the exact INTEGER comparison top_cnt * 5 > n_toks, no
    float ever — and the micro-averaged top-word fraction computed as
    a ratio of exact BIGINT sums rounded once (rule-12 discipline:
    never average per-doc floats across engines).

    Scale: explode -> hash-agg on (doc_id, md5(word)) — fixed-width
    keys, word text never shuffles; the per-doc fold then runs over
    distinct-word counts (bounded by vocabulary, not corpus size)."""
    from luzzu_spark.rules.heuristics import tokens_expr
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", "lang",
                   F.explode(tokens_expr("text")).alias("w"))
    cnt = (tok.groupBy("doc_id", "lang", F.md5("w").alias("wh"))
           .agg(F.count(F.lit(1)).alias("c")))
    per_doc = (cnt.groupBy("doc_id", "lang")
               .agg(F.max("c").alias("top_cnt"),
                    F.sum("c").alias("n_toks")))
    dominated = F.col("top_cnt") * 5 > F.col("n_toks")
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(dominated.cast("long")).alias("n_dominated"),
                 F.round(F.sum("top_cnt").cast("double")
                         / F.sum("n_toks"), 6)
                 .alias("micro_top_frac"))
            .orderBy("lang"))


@register("text_top_ngram_coverage", oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, lang, n_chars, 2 AS n,
         unnest(list_transform(range(1, len(toks)),
                i -> array_to_string(toks[i:i+1], ' '))) AS gr
  FROM t WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id, lang, n_chars, 3 AS n,
         unnest(list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' '))) AS gr
  FROM t WHERE len(toks) >= 3),
cnt AS (
  SELECT doc_id, lang, n_chars, n, md5(gr) AS gh, len(gr) AS gl,
         COUNT(*) AS c
  FROM g GROUP BY doc_id, lang, n_chars, n, gh, gl),
per_doc AS (
  SELECT doc_id, lang, n_chars, n, MAX(c * gl) AS cov
  FROM cnt GROUP BY doc_id, lang, n_chars, n)
SELECT lang, CAST(n AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN (n = 2 AND cov * 5 > n_chars)
                       OR (n = 3 AND cov * 50 > 9 * n_chars)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(ROUND(CAST(SUM(cov) AS DOUBLE) / SUM(n_chars), 6)
            AS DOUBLE) AS micro_coverage
FROM per_doc GROUP BY lang, n ORDER BY lang, n
""")
def text_top_ngram_coverage(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Gopher duplicated-n-gram rule, n = 2 and 3: per document, the
    character coverage of the single most-repeated n-gram
    (occurrences x gram chars — overlaps may exceed the doc length,
    as in the published rule), flagged past the Gopher thresholds
    (20% for 2-grams, 18% for 3-grams) via exact integer
    cross-multiplication (cov*5 > chars; cov*50 > 9*chars) — no float
    ever crosses engines. max(c*gl) replaces "the most common gram"
    to stay deterministic under count ties. Micro coverage is a ratio
    of exact BIGINT sums rounded once (rule-12 discipline).

    Scale: both gram sizes are generated in ONE pass over the corpus
    (a tagged struct array concat, then one explode) and immediately
    reduce to (doc_id, n, md5(gram)) hash-agg keys — gram text never
    shuffles; the per-doc fold then runs over distinct-gram counts,
    bounded by vocabulary not corpus size. The per-row gram HOF runs
    once per doc outside any join (the accepted
    dedup_ngram_jaccard_exact trade: string grams keep the math
    bit-identical to the oracle; dedup.py owns the vectorized hashed
    shingler for the blocking paths)."""
    from luzzu_spark.rules.heuristics import tokens_expr
    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", "lang", "n_chars",
                 tokens_expr("text").alias("toks")))
    empty = "CAST(array() AS array<struct<n:int,g:string>>)"
    grams = F.expr(f"""
      concat(
        CASE WHEN size(toks) >= 2 THEN
          transform(sequence(1, size(toks) - 1),
            i -> struct(2 AS n, array_join(slice(toks, i, 2), ' ') AS g))
        ELSE {empty} END,
        CASE WHEN size(toks) >= 3 THEN
          transform(sequence(1, size(toks) - 2),
            i -> struct(3 AS n, array_join(slice(toks, i, 3), ' ') AS g))
        ELSE {empty} END)""")
    ex = (d.select("doc_id", "lang", "n_chars",
                   F.explode(grams).alias("t"))
          .select("doc_id", "lang", "n_chars", F.col("t.n").alias("n"),
                  F.md5("t.g").alias("gh"),
                  F.length("t.g").alias("gl")))
    cnt = (ex.groupBy("doc_id", "lang", "n_chars", "n", "gh", "gl")
           .agg(F.count(F.lit(1)).alias("c")))
    per_doc = (cnt.groupBy("doc_id", "lang", "n_chars", "n")
               .agg(F.max(F.col("c") * F.col("gl")).alias("cov")))
    flagged = (((F.col("n") == 2) & (F.col("cov") * 5 > F.col("n_chars")))
               | ((F.col("n") == 3)
                  & (F.col("cov") * 50 > 9 * F.col("n_chars"))))
    return (per_doc.groupBy("lang", F.col("n").cast("long").alias("n"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(flagged.cast("long")).alias("n_flagged"),
                 F.round(F.sum("cov").cast("double")
                         / F.sum("n_chars"), 6).alias("micro_coverage"))
            .orderBy("lang", "n"))


# ---------------------------------------------------------------------
# Gopher line-format rules (bullets / ellipses) and C4 content-marker
# rules, over deterministically decorated pages (the fixture corpus is
# clean prose, so the conditions are planted as doc_id-keyed wrappers,
# mirrored exactly in the oracle SQL — same discipline as the
# boilerplate footer synthesis above).
# ---------------------------------------------------------------------

_BULLET_PAGE_SQL = """
  CASE WHEN doc_id % 7 = 0
       THEN '- intro point' || chr(10) || '- ' || text
            || chr(10) || '- closing point'
       ELSE text END
  || CASE WHEN doc_id % 9 = 0
       THEN chr(10) || 'continued...' || chr(10) || 'read more...'
       ELSE '' END
"""


def bullet_page_expr() -> F.Column:
    """Deterministic multi-line page for the line-format rules: docs
    with doc_id % 7 == 0 become pure bullet lists (fires the 90%
    bullet rule), docs with doc_id % 9 == 0 gain two trailing
    ellipsis lines (fires the 30% ellipsis rule); % 63 hits both.
    Mirrored by _BULLET_PAGE_SQL."""
    d = F.col("doc_id")
    body = F.when(
        d % 7 == 0,
        F.concat(F.lit("- intro point\n- "), F.col("text"),
                 F.lit("\n- closing point"))).otherwise(F.col("text"))
    tail = F.when(
        d % 9 == 0,
        F.lit("\ncontinued...\nread more...")).otherwise(F.lit(""))
    return F.concat(body, tail)


@register("text_bullet_ellipsis_lines", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_BULLET_PAGE_SQL} AS page FROM documents),
per_doc AS (
  SELECT doc_id, lang,
         len(string_split(page, chr(10))) AS n_lines,
         len(regexp_split_to_array(page, '(?m)^- ')) - 1 AS n_bullet,
         len(regexp_split_to_array(page, '(?m)\\.\\.\\.$')) - 1
           AS n_ellipsis
  FROM pages)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_bullet * 10 > 9 * n_lines
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_flagged,
       CAST(SUM(CASE WHEN n_ellipsis * 10 > 3 * n_lines
                THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_flagged,
       CAST(SUM(n_bullet) AS BIGINT) AS total_bullet_lines,
       CAST(SUM(n_lines) AS BIGINT) AS total_lines
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_bullet_ellipsis_lines(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Gopher line-format rules: flag documents where > 90% of lines
    start with a bullet marker, or > 30% of lines end with an
    ellipsis. Both tested as exact integer cross-multiplications
    (n*10 > 9*lines, n*10 > 3*lines) — no float crosses engines.

    Scale: NO explode and no shuffle of text — the three line counts
    are one-pass multiline-regex counts evaluated where the text
    lives (regexp_count is codegen, rule 1's preferred form); only
    (lang, 3 longs) per doc reaches the final hash-agg."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang", bullet_page_expr().alias("page")))
    per_doc = pages.select(
        "lang",
        F.size(F.split("page", "\n")).alias("n_lines"),
        F.regexp_count("page", F.lit("(?m)^- ")).alias("n_bullet"),
        F.regexp_count("page", F.lit(r"(?m)\.\.\.$")).alias("n_ellipsis"))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_bullet") * 10 > 9 * F.col("n_lines"))
                       .cast("long")).alias("n_bullet_flagged"),
                 F.sum((F.col("n_ellipsis") * 10 > 3 * F.col("n_lines"))
                       .cast("long")).alias("n_ellipsis_flagged"),
                 F.sum("n_bullet").cast("long")
                 .alias("total_bullet_lines"),
                 F.sum("n_lines").cast("long").alias("total_lines"))
            .orderBy("lang"))


_MARKED_PAGE_SQL = """
  text
  || CASE WHEN doc_id % 11 = 0
       THEN chr(10) || 'function() {{ return 1; }}' ELSE '' END
  || CASE WHEN doc_id % 13 = 0
       THEN chr(10) || 'lorem ipsum dolor sit amet' ELSE '' END
  || CASE WHEN doc_id % 17 = 0
       THEN chr(10) || 'please enable javascript to continue'
       ELSE '' END
"""


def marked_page_expr() -> F.Column:
    """Deterministic C4 content markers: code braces (% 11), lorem
    ipsum filler (% 13), javascript-wall text (% 17). Mirrored by
    _MARKED_PAGE_SQL (whose braces are doubled for str.format)."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 11 == 0,
               F.lit("\nfunction() { return 1; }")).otherwise(F.lit("")),
        F.when(d % 13 == 0,
               F.lit("\nlorem ipsum dolor sit amet")).otherwise(F.lit("")),
        F.when(d % 17 == 0,
               F.lit("\nplease enable javascript to continue"))
        .otherwise(F.lit("")))


@register("text_code_markers", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_MARKED_PAGE_SQL.format()} AS page
  FROM documents),
per_doc AS (
  SELECT lang,
         CASE WHEN strpos(page, '{{') > 0 THEN 1 ELSE 0 END AS has_curly,
         CASE WHEN strpos(page, 'lorem ipsum') > 0 THEN 1 ELSE 0 END
           AS has_lorem,
         CASE WHEN strpos(page, 'javascript') > 0 THEN 1 ELSE 0 END
           AS has_js
  FROM pages)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(has_curly) AS BIGINT) AS n_curly,
       CAST(SUM(has_lorem) AS BIGINT) AS n_lorem,
       CAST(SUM(has_js) AS BIGINT) AS n_js,
       CAST(SUM(CASE WHEN has_curly + has_lorem + has_js > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_code_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 content-marker rules: drop pages containing a curly brace
    (code), the phrase 'lorem ipsum' (template filler), or the word
    'javascript' (JS-disabled walls). Counts per marker and the
    union drop count per language.

    Scale: three substring probes (contains → codegen instr, no
    regex engine) in ONE projection where the text lives; only
    (lang, 3 bits) per doc reaches the hash-agg."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang", marked_page_expr().alias("page")))
    per_doc = pages.select(
        "lang",
        F.col("page").contains("{").cast("long").alias("has_curly"),
        F.col("page").contains("lorem ipsum").cast("long")
        .alias("has_lorem"),
        F.col("page").contains("javascript").cast("long").alias("has_js"))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("has_curly").alias("n_curly"),
                 F.sum("has_lorem").alias("n_lorem"),
                 F.sum("has_js").alias("n_js"),
                 F.sum(((F.col("has_curly") + F.col("has_lorem")
                         + F.col("has_js")) > 0).cast("long"))
                 .alias("n_dropped"))
            .orderBy("lang"))


_NUMERIC_PAD_SQL = """
  text || CASE WHEN doc_id % 8 = 0
       THEN ' ' || repeat('7 42 ', GREATEST(n_chars // 10, 1))
       ELSE '' END
"""


def numeric_pad_expr() -> F.Column:
    """Docs with doc_id % 8 == 0 gain a numeric-token tail sized to
    the document (~2 numeric tokens per 10 chars ≈ one per word), so
    their alphabetic-word fraction drops to ~1/2 and the 80% Gopher
    rule fires on exactly that cohort. Mirrored by _NUMERIC_PAD_SQL."""
    pad = F.repeat(F.lit("7 42 "),
                   F.greatest(F.floor(F.col("n_chars") / 10),
                              F.lit(1)).cast("int"))
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 8 == 0,
               F.concat(F.lit(" "), pad)).otherwise(F.lit("")))


@register("text_alpha_word_fraction", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_NUMERIC_PAD_SQL} AS page FROM documents),
toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(trim(page), '[ \\t\\n\\x0b\\f\\r]+'),
                            x -> x <> '')) AS w
  FROM pages),
per_doc AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_toks,
         CAST(SUM(CASE WHEN regexp_matches(w, '[A-Za-z]')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha
  FROM toks GROUP BY doc_id, lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_alpha * 5 < 4 * n_toks
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(ROUND(CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_toks), 6)
            AS DOUBLE) AS micro_alpha_frac
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_alpha_word_fraction(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Gopher alphabetic-word rule: flag documents where fewer than
    80% of tokens contain at least one alphabetic character (tested
    as the exact integer cross-multiplication n_alpha*5 < 4*n_toks).
    The micro fraction is a ratio of exact BIGINT sums rounded once
    (rule-12 discipline).

    Scale: the per-token alpha probe runs as explode → per-doc
    hash-agg on doc_id (the dominance-query shape) — token text
    never shuffles past the map-side partial agg, and the per-doc
    frame is two longs per document."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang", numeric_pad_expr().alias("page")))
    tok = pages.select(
        "doc_id", "lang",
        F.explode(F.array_remove(
            F.split(F.trim("page"), r"\s+"), "")).alias("w"))
    per_doc = (tok.groupBy("doc_id", "lang")
               .agg(F.count(F.lit(1)).alias("n_toks"),
                    F.sum(F.col("w").rlike("[A-Za-z]").cast("long"))
                    .alias("n_alpha")))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_alpha") * 5 < 4 * F.col("n_toks"))
                       .cast("long")).alias("n_flagged"),
                 F.round(F.sum("n_alpha").cast("double")
                         / F.sum("n_toks"), 6).alias("micro_alpha_frac"))
            .orderBy("lang"))


# ---------------------------------------------------------------------
# Encoding-damage rule, token-budget sequence packing, and DSIR-style
# importance weighting - training-data pipeline ops over the same
# planted-decoration discipline (fixture text is clean, so conditions
# are synthesized as doc_id-keyed wrappers mirrored in the oracle).
# ---------------------------------------------------------------------

_DAMAGED_PAGE_SQL = """
  text
  || CASE WHEN doc_id % 7 = 0
       THEN ' ' || repeat(chr(65533), GREATEST(n_chars // 100, 1))
       ELSE '' END
  || CASE WHEN doc_id % 19 = 0
       THEN repeat(chr(1) || chr(2), 3) ELSE '' END
"""


def damaged_page_expr() -> F.Column:
    """Deterministic encoding damage: docs with doc_id % 7 == 0 gain a
    U+FFFD replacement-char tail sized to ~1% of the document
    (mojibake from a bad charset transcode); doc_id % 19 == 0 gain six
    C0 control bytes (binary bleed-through). Control bytes are built
    with chr() so no literal control characters sit in source.
    Mirrored by _DAMAGED_PAGE_SQL."""
    d = F.col("doc_id")
    moji = F.repeat(F.expr("chr(65533)"),
                    F.greatest(F.floor(F.col("n_chars") / 100),
                               F.lit(1)).cast("int"))
    return F.concat(
        F.col("text"),
        F.when(d % 7 == 0, F.concat(F.lit(" "), moji)).otherwise(F.lit("")),
        F.when(d % 19 == 0,
               F.expr("repeat(chr(1) || chr(2), 3)")).otherwise(F.lit("")))


@register("text_encoding_quality", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_DAMAGED_PAGE_SQL} AS page FROM documents),
per_doc AS (
  SELECT lang, length(page) AS n_all,
         length(page) - length(replace(page, chr(65533), ''))
           AS n_moji,
         length(page) - length(replace(replace(page, chr(1), ''),
                                       chr(2), '')) AS n_ctrl
  FROM pages)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_moji * 200 > n_all THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mojibake,
       CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ctrl_docs,
       CAST(ROUND(CAST(SUM(n_moji + n_ctrl) AS DOUBLE) / SUM(n_all), 6)
            AS DOUBLE) AS micro_bad_frac
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage rule (a real Common-Crawl filter: charset
    mis-detection leaves U+FFFD runs; binary bleed-through leaves C0
    control bytes): flag docs whose replacement-char fraction exceeds
    0.5% (exact integer cross-multiplication n_moji*200 > len) and
    docs containing ANY control byte. Micro bad-char fraction is a
    ratio of exact BIGINT sums rounded once (rule-12 discipline).

    Scale: occurrence counts via the length-difference idiom - two
    `replace` + `length` codegen expressions in ONE projection where
    the text lives, no regex engine, no explode; only (lang, 3 longs)
    per doc reaches the hash-agg."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang", damaged_page_expr().alias("page")))
    n_all = F.length("page")
    n_moji = n_all - F.length(F.expr("replace(page, chr(65533), '')"))
    n_ctrl = n_all - F.length(
        F.expr("replace(replace(page, chr(1), ''), chr(2), '')"))
    per_doc = pages.select(
        "lang", n_all.alias("n_all"), n_moji.alias("n_moji"),
        n_ctrl.alias("n_ctrl"))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_moji") * 200 > F.col("n_all"))
                       .cast("long")).alias("n_mojibake"),
                 F.sum((F.col("n_ctrl") > 0).cast("long"))
                 .alias("n_ctrl_docs"),
                 F.round(F.sum(F.col("n_moji") + F.col("n_ctrl"))
                         .cast("double") / F.sum("n_all"), 6)
                 .alias("micro_bad_frac"))
            .orderBy("lang"))


PACK_BUDGET = 256  # tokens per training sequence (fixture scale)


@register("pack_token_sequences", oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           AS n_toks
  FROM documents),
packed AS (
  SELECT source, n_toks,
         COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST((SUM(n_toks) + {PACK_BUDGET} - 1) // {PACK_BUDGET} AS BIGINT)
         AS n_seqs,
       CAST(SUM(CASE WHEN n_toks > 0 AND
                  (cum_before + n_toks - 1) // {PACK_BUDGET}
                   > cum_before // {PACK_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
       CASE WHEN SUM(n_toks) = 0 THEN 0.0
            ELSE CAST(ROUND(CAST(SUM(n_toks) AS DOUBLE)
                 / (((SUM(n_toks) + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                    * {PACK_BUDGET}), 6) AS DOUBLE) END AS fill_frac
FROM packed GROUP BY source ORDER BY source
""")
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: documents fill
    fixed-budget token sequences contiguously (deterministic doc_id
    order within source), so the packer's plan - how many sequences
    each source yields, how many documents straddle a sequence
    boundary, and the fill fraction - is a pure function of the
    corpus. All boundary math is exact BIGINT integer division on
    running sums; the only float is the final fill ratio, rounded
    once from exact sums (rule-12 discipline).

    Scale: ordered packing is inherently sequential WITHIN a pack
    unit, so the unit is (source) here and (source, shard) at 100 TB
    - one shuffle on the pack key, a running-sum window per unit over
    (doc_id, n_toks) pairs only (text never enters the window), then
    a hash-agg. Zero-token docs are pinned on both engines: they pack
    nowhere (never straddle) but still count in n_docs."""
    from luzzu_spark.rules.heuristics import tokens_expr
    b = PACK_BUDGET
    t = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", "source",
                 F.size(tokens_expr("text")).cast("long").alias("n_toks")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)))
    straddles = ((F.col("n_toks") > 0)
                 & (F.expr(f"(cum_before + n_toks - 1) DIV {b}")
                    > F.expr(f"cum_before DIV {b}")))
    total = F.sum("n_toks")
    n_seqs = F.expr(f"(sum(n_toks) + {b} - 1) DIV {b}")
    return (packed.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 total.cast("long").alias("total_tokens"),
                 n_seqs.cast("long").alias("n_seqs"),
                 F.sum(straddles.cast("long")).alias("n_straddlers"),
                 F.when(total == F.lit(0), F.lit(0.0))
                 .otherwise(F.round(total.cast("double")
                                    / (n_seqs * F.lit(b)), 6))
                 .alias("fill_frac"))
            .orderBy("source"))


@register("dsir_importance_weights", oracle="""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents),
bg AS (
  SELECT doc_id, lang,
         substr(md5(unnest(list_transform(range(1, len(toks)),
                i -> array_to_string(toks[i:i+1], ' ')))), 1, 3) AS bh
  FROM t WHERE len(toks) >= 2),
wt AS (
  SELECT bh,
         (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1000000
           // (COUNT(*) + 1) AS w
  FROM bg GROUP BY bh),
per_doc AS (
  SELECT bg.doc_id, bg.lang,
         CAST(SUM(wt.w) AS BIGINT) AS total_w,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams
  FROM bg JOIN wt USING (bh) GROUP BY bg.doc_id, bg.lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN total_w > n_bigrams * 450000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like,
       CAST(ROUND(CAST(SUM(total_w) AS DOUBLE) / SUM(n_bigrams), 6)
            AS DOUBLE) AS mean_bucket_weight
FROM per_doc GROUP BY lang ORDER BY lang
""")
def dsir_importance_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, public
    method): score every document by how target-like its
    hashed-bigram profile is. The target distribution here is the
    corpus's English slice; bucket weight = smoothed integer ratio
    (target_count+1)*1e6 // (raw_count+1) over 4096 md5-prefix
    buckets, per-doc score = exact BIGINT sum of its bigram
    instances' bucket weights. Flag docs whose mean bucket weight
    clears 0.45x parity — just above the corpus-wide expected
    bucket weight, so it actually separates (measured at sf0.01: 92%
    of English docs flag vs ~20% of the rest; integer
    cross-multiplication total_w > n_bigrams * 450000); the per-lang mean is a ratio of exact BIGINT
    sums rounded once - no float crosses engines.

    Scale: two corpus passes, inherent to importance estimation
    (estimate the bucket table, then score) - at 100 TB pass 1 runs
    on a hash-sample (sample_stable_hash's reshard-invariant
    predicate composes directly). Bigrams reduce to 3-hex-char md5
    prefixes BEFORE any shuffle (fixed-width keys, TEXT-KEY audit
    discipline); the 4096-row weight table broadcasts, so scoring
    shuffles only (doc_id, lang) partial sums."""
    from luzzu_spark.rules.heuristics import tokens_expr
    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", "lang", tokens_expr("text").alias("toks")))
    grams = F.expr("""
      CASE WHEN size(toks) >= 2 THEN
        transform(sequence(1, size(toks) - 1),
          i -> substring(md5(array_join(slice(toks, i, 2), ' ')), 1, 3))
      ELSE CAST(array() AS array<string>) END""")
    bg = (d.select("doc_id", "lang", F.explode(grams).alias("bh")))
    wt = (bg.groupBy("bh")
          .agg(F.expr("(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)"
                      " + 1) * 1000000 DIV (count(*) + 1)").alias("w")))
    per_doc = (bg.join(F.broadcast(wt), "bh")
               .groupBy("doc_id", "lang")
               .agg(F.sum("w").cast("long").alias("total_w"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("total_w")
                        > F.col("n_bigrams") * 450000).cast("long"))
                 .alias("n_target_like"),
                 F.round(F.sum("total_w").cast("double")
                         / F.sum("n_bigrams"), 6)
                 .alias("mean_bucket_weight"))
            .orderBy("lang"))


_DUPLINE_PAGE_SQL = """
  text
  || CASE WHEN doc_id % 6 = 0
       THEN repeat(chr(10) || 'subscribe now', 3) ELSE '' END
  || CASE WHEN doc_id % 15 = 0 THEN chr(10) || text ELSE '' END
"""


def dupline_page_expr() -> F.Column:
    """Deterministic within-doc line repetition: docs with doc_id % 6
    == 0 gain the same short footer line 3× (fires the 30% dup-LINE
    rule but not the char rule); doc_id % 15 == 0 duplicates the whole
    body line (fires the 20% dup-CHAR rule). Mirrored by
    _DUPLINE_PAGE_SQL."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 6 == 0,
               F.expr("repeat(chr(10) || 'subscribe now', 3)"))
        .otherwise(F.lit("")),
        F.when(d % 15 == 0,
               F.concat(F.expr("chr(10)"), F.col("text")))
        .otherwise(F.lit("")))


@register("text_dup_line_fraction", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_DUPLINE_PAGE_SQL} AS page FROM documents),
lines AS (
  SELECT doc_id, lang, md5(unnest(string_split(page, chr(10)))) AS lh,
         length(unnest(string_split(page, chr(10)))) AS ll
  FROM pages),
cnt AS (
  SELECT doc_id, lang, lh, ll, COUNT(*) AS c
  FROM lines GROUP BY doc_id, lang, lh, ll),
per_doc AS (
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_lines,
         CAST(SUM(c - 1) AS BIGINT) AS dup_lines,
         CAST(SUM(c * ll) AS BIGINT) AS total_lc,
         CAST(SUM((c - 1) * ll) AS BIGINT) AS dup_lc
  FROM cnt GROUP BY doc_id, lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dup_lines * 10 > 3 * n_lines
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_lines,
       CAST(SUM(CASE WHEN dup_lc * 5 > total_lc
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_chars,
       CAST(ROUND(CAST(SUM(dup_lines) AS DOUBLE) / SUM(n_lines), 6)
            AS DOUBLE) AS micro_dup_line_frac,
       CAST(ROUND(CAST(SUM(dup_lc) AS DOUBLE) / SUM(total_lc), 6)
            AS DOUBLE) AS micro_dup_char_frac
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_dup_line_fraction(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Gopher within-document repetition rules: flag docs whose
    duplicate-LINE fraction exceeds 30% (instances beyond each line's
    first) or whose duplicate-line CHAR fraction exceeds 20% — both as
    exact integer cross-multiplications; micro fractions are ratios of
    exact BIGINT sums rounded once (rule-12 discipline).

    Scale: explode lines → hash-agg on (doc_id, md5(line)) — line text
    reduces to a fixed-width digest before the shuffle (TEXT-KEY
    discipline); the per-doc fold runs over distinct-line counts."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang", dupline_page_expr().alias("page")))
    lines = pages.select(
        "doc_id", "lang",
        F.explode(F.split("page", "\n")).alias("line"))
    cnt = (lines.select("doc_id", "lang", F.md5("line").alias("lh"),
                        F.length("line").alias("ll"))
           .groupBy("doc_id", "lang", "lh", "ll")
           .agg(F.count(F.lit(1)).alias("c")))
    per_doc = (cnt.groupBy("doc_id", "lang")
               .agg(F.sum("c").alias("n_lines"),
                    F.sum(F.col("c") - 1).alias("dup_lines"),
                    F.sum(F.col("c") * F.col("ll")).alias("total_lc"),
                    F.sum((F.col("c") - 1) * F.col("ll"))
                    .alias("dup_lc")))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("dup_lines") * 10 > 3 * F.col("n_lines"))
                       .cast("long")).alias("n_flag_dup_lines"),
                 F.sum((F.col("dup_lc") * 5 > F.col("total_lc"))
                       .cast("long")).alias("n_flag_dup_chars"),
                 F.round(F.sum("dup_lines").cast("double")
                         / F.sum("n_lines"), 6)
                 .alias("micro_dup_line_frac"),
                 F.round(F.sum("dup_lc").cast("double")
                         / F.sum("total_lc"), 6)
                 .alias("micro_dup_char_frac"))
            .orderBy("lang"))


_C4_PAGE_SQL = """
  CASE WHEN doc_id % 5 = 0
       THEN 'Welcome to our site' || chr(10) ELSE '' END
  || text || '.'
  || CASE WHEN doc_id % 3 = 0
       THEN chr(10) || 'Click here' ELSE '' END
  || CASE WHEN doc_id % 17 = 0
       THEN chr(10) || 'Please enable javascript to continue.'
       ELSE '' END
  || CASE WHEN doc_id % 4 = 0
       THEN chr(10) || 'All rights reserved worldwide.' ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN chr(10) || 'Buy this now.' ELSE '' END
  || CASE WHEN doc_id % 8 = 0
       THEN chr(10) || 'Buy now.' ELSE '' END
"""


def c4_page_expr() -> F.Column:
    """Deterministic multi-line page exercising every branch of the C4
    line scrub: a no-punctuation header (% 5), the prose body with a
    terminal period (always kept when ≥3 words), a 2-word
    no-punctuation nav line (% 3), a javascript wall WITH punctuation
    (% 17 — dropped only by the javascript probe), a 4-word footer
    (% 4, kept), and the 3-word / 2-word word-count boundary pair
    (% 7 kept, % 8 dropped). Mirrored by _C4_PAGE_SQL."""
    d = F.col("doc_id")

    def when_mod(m: int, s: str) -> F.Column:
        return F.when(d % m == 0, F.lit(s)).otherwise(F.lit(""))

    return F.concat(
        F.when(d % 5 == 0,
               F.lit("Welcome to our site\n")).otherwise(F.lit("")),
        F.col("text"), F.lit("."),
        when_mod(3, "\nClick here"),
        when_mod(17, "\nPlease enable javascript to continue."),
        when_mod(4, "\nAll rights reserved worldwide."),
        when_mod(7, "\nBuy this now."),
        when_mod(8, "\nBuy now."))


@register("text_c4_line_scrub", oracle=f"""
WITH pages AS (
  SELECT doc_id, {_C4_PAGE_SQL} AS page FROM documents),
split AS (
  SELECT doc_id, string_split(page, chr(10)) AS ls FROM pages),
scrubbed AS (
  SELECT doc_id, ls,
         list_filter(ls, x ->
             regexp_matches(trim(x), '[.!?"]$')
             AND len(list_filter(string_split(trim(x), ' '),
                                 w -> w <> '')) >= 3
             AND NOT contains(lower(x), 'javascript')) AS kept
  FROM split)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       md5(coalesce(array_to_string(kept, chr(10)), ''))
         AS scrub_md5
FROM scrubbed ORDER BY doc_id
""")
def text_c4_line_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line-level scrub (Raffel et al. 2020 §2.2) with the
    REBUILT text verified byte-identically cross-engine: keep only
    lines that (a) end in terminal punctuation, (b) have ≥3 words,
    (c) don't contain 'javascript' (case-insensitive); the surviving
    lines re-join with newlines and the md5 of every rebuilt document
    is hash-checked against the DuckDB replay — so the scrub output
    itself, not just its counts, is the verified artifact (same
    discipline as scrub_pii_identity). Pages are the deterministic
    c4_page_expr decoration (the clean fixture prose plants every
    rule branch, mirrored in SQL like the other line rules).

    Scale: pure string ops in one projection — split, per-line
    predicate, array_join; no explode, no shuffle before the final
    presentation sort; at 100 TB this runs entirely map-side. The
    per-line HOF predicate is interpreted (CLAUDE.md rule 1) but runs
    ONCE per document outside any join/agg hot path — the same
    documented trade as the shingle builders."""
    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", c4_page_expr().alias("page")))
    lines = F.split(F.col("page"), "\n")
    kept = F.filter(lines, lambda x: (
        F.trim(x).rlike('[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(x), " "),
                           lambda w: w != "")) >= 3)
        & ~F.lower(x).contains("javascript")))
    return (d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.array_join(kept, "\n")).alias("scrub_md5"))
        .orderBy("doc_id"))


_K6_SQL = ("(CAST(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(d.text), {i + 1}, 1)) - 1)"
    f" * {16 ** i}" for i in range(6)) + " AS BIGINT))")


@register("dsir_weighted_sample", oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents),
bg AS (
  SELECT doc_id, lang,
         substr(md5(unnest(list_transform(range(1, len(toks)),
                i -> array_to_string(toks[i:i+1], ' ')))), 1, 3) AS bh
  FROM t WHERE len(toks) >= 2),
wt AS (
  SELECT bh,
         (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1000000
           // (COUNT(*) + 1) AS w
  FROM bg GROUP BY bh),
per_doc AS (
  SELECT bg.doc_id,
         CAST(SUM(wt.w) AS BIGINT) AS total_w,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams
  FROM bg JOIN wt USING (bh) GROUP BY bg.doc_id),
marked AS (
  SELECT d.lang,
         {_K6_SQL} * 1000000
           - (p.total_w // p.n_bigrams) * 16777216 AS lt,
         p.total_w % p.n_bigrams AS rem,
         p.n_bigrams AS nb
  FROM documents d JOIN per_doc p ON p.doc_id = d.doc_id)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN lt < 0 THEN 1
                     WHEN lt >= 16777216 THEN 0
                     WHEN lt * nb < rem * 16777216 THEN 1
                     ELSE 0 END) AS BIGINT) AS n_sampled
FROM marked GROUP BY lang ORDER BY lang
""")
def dsir_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance SAMPLING — the second half of Xie et al. 2023
    (dsir_importance_weights estimates the weights; this query
    executes the resampling): accept each doc with probability
    min(1, mean_bucket_weight / 1e6), evaluated ENTIRELY in BIGINTs —
    accept iff k * n * 1e6 < W * 2^24 where k is the 24-bit md5
    prefix (the exact dyadic uniform), n = n_bigrams, W = total_w.
    The naive cross-multiplication overflows int64 once n ≳ 5.5e5
    (ADVICE r03), so both engines evaluate the EXACT algebraic split
    W = a*n + r (a = W DIV n, r = W MOD n, both engines floor on
    positives): with L = k*1e6 - a*2^24,
      L < 0        ⇒ accept   (|L| < 1.7e13 — no product needed)
      L ≥ 2^24     ⇒ reject   (L*n ≥ 2^24*n > r*2^24 since r < n)
      else accept iff L*n < r*2^24   (both sides < 2^24 * n: safe
                                      for any n < 2^38 tokens/doc).
    Bit-identical to the naive form wherever that form is defined,
    and defined everywhere. Docs with <2 tokens carry no bigram
    weight and don't participate — pinned identically by the inner
    join on both engines.

    Scale: same two passes as the weight estimate (pass 1 on a hash
    sample at 100 TB); sampling itself is a broadcast-join predicate —
    reshard-invariant, deterministic, pushdown-composable like
    sample_stable_hash."""
    from luzzu_spark.rules.heuristics import tokens_expr
    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", "lang", "text",
                 tokens_expr("text").alias("toks")))
    grams = F.expr("""
      CASE WHEN size(toks) >= 2 THEN
        transform(sequence(1, size(toks) - 1),
          i -> substring(md5(array_join(slice(toks, i, 2), ' ')), 1, 3))
      ELSE CAST(array() AS array<string>) END""")
    bg = d.select("doc_id", "lang", F.explode(grams).alias("bh"))
    wt = (bg.groupBy("bh")
          .agg(F.expr("(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)"
                      " + 1) * 1000000 DIV (count(*) + 1)").alias("w")))
    per_doc = (bg.join(F.broadcast(wt), "bh")
               .groupBy("doc_id")
               .agg(F.sum("w").cast("long").alias("total_w"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    m = F.md5("text")
    k = sum((F.instr(F.lit("0123456789abcdef"),
                     F.substring(m, i + 1, 1)) - 1) * (16 ** i)
            for i in range(6)).cast("long")
    lt = (F.col("k") * 1000000
          - F.expr("total_w DIV n_bigrams") * 16777216)
    rem = F.col("total_w") % F.col("n_bigrams")
    marked = (d.select("doc_id", "lang", k.alias("k"))
              .join(per_doc, "doc_id")
              .withColumn("kept",
                          F.when(lt < 0, F.lit(1))
                          .when(lt >= 16777216, F.lit(0))
                          .when(lt * F.col("n_bigrams")
                                < rem * 16777216, F.lit(1))
                          .otherwise(F.lit(0)).cast("long")))
    return (marked.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("kept").cast("long").alias("n_sampled"))
            .orderBy("lang"))


# content-hash split constants: first md5 byte out of 256 —
# train < 204 (~80%), val < 230 (~10%), else test (~10%). ONE source
# of truth for both engines and every query that keys on the split
# (split_train_val_test, split_leakage_audit — review r04 found four
# drifting copies of these thresholds).
SPLIT_TRAIN_LT = 204
SPLIT_VAL_LT = 230


def content_split_expr():
    """Spark column: 'train'/'val'/'test' from md5(text)'s first byte."""
    m = F.md5("text")
    k2 = ((F.instr(F.lit("0123456789abcdef"), F.substring(m, 1, 1)) - 1)
          * 16
          + (F.instr(F.lit("0123456789abcdef"),
                     F.substring(m, 2, 1)) - 1))
    return (F.when(k2 < SPLIT_TRAIN_LT, F.lit("train"))
            .when(k2 < SPLIT_VAL_LT, F.lit("val"))
            .otherwise(F.lit("test")))


def content_split_sql() -> str:
    """The identical split as a DuckDB scalar expression over `text`."""
    return f"""CASE WHEN
  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
  + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
  < {SPLIT_TRAIN_LT} THEN 'train' WHEN
  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
  + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
  < {SPLIT_VAL_LT} THEN 'val' ELSE 'test' END"""


@register("split_train_val_test", oracle=f"""
SELECT lang,
       {content_split_sql()} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, split ORDER BY lang, split
""")
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-way corpus split on the content hash —
    train ~80% / val ~10% / test ~10% via the first byte of md5(text)
    (k2 < 204 / < 230 / else, exact integer thresholds out of 256).
    Content-keyed, so the same document lands in the same split on
    any cluster, any resharding, forever — duplicates can never
    straddle train/test (the leakage failure mode of random splits).

    Scale: a pushdown-able predicate + one hash-agg, zero joins."""
    return (spread(load_table(spark, sf_dir, "documents"))
            .select("lang", "n_chars",
                    content_split_expr().alias("split"))
            .groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"))
            .orderBy("lang", "split"))


def _leakage_oracle() -> str:
    from luzzu_spark import dedup as _dd
    return f"""
WITH {_dd._minhash_pairs_ctes(0.5, _dd.LSH_BANDS)},
splits AS (
  SELECT doc_id, {content_split_sql()} AS split FROM documents)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p JOIN splits sa ON sa.doc_id = p.id_a
             JOIN splits sb ON sb.doc_id = p.id_b
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("split_leakage_audit", oracle=_leakage_oracle())
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit the benchmark decontamination cannot
    see: NEAR-duplicate pairs (MinHash est_jaccard ≥ 0.5, the
    production blocking) whose members landed in different splits of
    the content-hash train/val/test split. Exact duplicates can never
    straddle a content-keyed split (same text → same md5 → same
    split — split_train_val_test's guarantee); near-duplicates CAN,
    and each cross-split pair is an eval document whose sibling is in
    training. The count per (split, split) cell quantifies the
    residual risk — and running near-dup removal BEFORE splitting
    (build_corpus stage order) drives the off-diagonal cells to zero.

    Oracle: the replayable MinHash family recomputes the exact
    signatures/banding/pairs; the split replays the md5-byte
    thresholds — the full audit is hash-verified end to end.

    Scale: the pairs side is the banded LSH self-join (ids only); the
    splits side is a map-side projection joined twice on doc_id."""
    from luzzu_spark.dedup import minhash_dedup_pairs
    docs = spread(load_table(spark, sf_dir, "documents"))
    splits = docs.select("doc_id", content_split_expr().alias("split"))
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    sa = splits.select(F.col("doc_id").alias("id_a"),
                       F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"),
                       F.col("split").alias("split_b"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select(F.least("split_a", "split_b").alias("split_lo"),
                    F.greatest("split_a", "split_b").alias("split_hi"))
            .groupBy("split_lo", "split_hi")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("split_lo", "split_hi"))


def _sqludf_oracle() -> str:
    from luzzu_spark.rules import spec as s
    from luzzu_spark.rules.stopwords import STOPWORDS
    sw = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"
    return f"""
WITH t AS (
  SELECT lang,
         length(coalesce(text, '')) AS n_chars,
         list_filter(string_split(trim(coalesce(text, '')), ' '),
                     x -> x <> '') AS toks,
         length(regexp_replace(coalesce(text, ''),
                               '[ \\t\\n\\x0b\\f\\r]+', '', 'g')) AS nonws,
         len(regexp_extract_all(coalesce(text, ''),
                                '[{s.SYMBOL_CHARS}]')) AS n_sym
  FROM documents),
m AS (
  SELECT lang, n_chars, len(toks) AS n_toks,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(nonws AS DOUBLE) / len(toks) END AS mwl,
         coalesce(list_max(list_transform(toks, x -> length(x))), 0)
           AS maxw,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(n_sym AS DOUBLE) / len(toks) END AS symr,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(len(list_filter(toks,
                     x -> list_contains({sw}, x))) AS DOUBLE)
                   / len(toks) END AS stopf
  FROM t)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN NOT (n_chars < {s.MIN_DOC_CHARS}
                  OR n_toks < {s.MIN_WORDS} OR n_toks > {s.MAX_WORDS}
                  OR mwl < {s.MEAN_WORD_LEN_LO}
                  OR mwl > {s.MEAN_WORD_LEN_HI}
                  OR maxw > {s.MAX_WORD_LEN}
                  OR symr > {s.MAX_SYMBOL_WORD_RATIO}
                  OR stopf < {s.MIN_STOPWORD_FRAC})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM m GROUP BY lang ORDER BY lang
"""


@register("docs_sql_udf_keep_counts", oracle=_sqludf_oracle())
def docs_sql_udf_keep_counts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The declarative SQL-UDF rule surface (luzzu_spark/sqludf.py)
    exercised END TO END as a hash-checked query: register the rule
    functions, then compute per-lang keep counts in PURE SQL —
    `SELECT lang, count(*), sum(luzzu_heuristic_keep(text)) ...` is
    the entire engine integration a SQL-only team needs. The oracle
    re-derives every threshold from rules/spec.py independently in
    DuckDB (list-based stopword count, since RE2 lacks the lookahead
    the Spark regex form uses — the two stopword counters are
    equivalent on whitespace-delimited tokens).

    Scale: SQL UDFs inline into the Catalyst plan (pinned: no
    EvalPython node, tests/test_sqludf.py) — identical physics to the
    DataFrame rule expressions; one projection + one hash-agg."""
    from luzzu_spark.sqludf import register_sql_rules
    register_sql_rules(spark)
    view = "luzzu_sqludf_docs"
    spread(load_table(spark, sf_dir, "documents")) \
        .createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN luzzu_heuristic_keep(text)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        FROM {view} GROUP BY lang ORDER BY lang""")


_NFD_PAGE_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
       THEN ' cafe' || chr(769) ELSE '' END
  || CASE WHEN doc_id % 4 = 0
       THEN ' u' || chr(776) || 'ber' ELSE '' END
"""


def nfd_page_expr() -> F.Column:
    """Deterministic NFD decorations: combining acute (U+0301) after
    'cafe' (% 3) and combining diaeresis (U+0308) inside 'uber' (% 4)
    — decomposed sequences a crawler actually emits, which NFC folds
    to the composed forms. Mirrored by _NFD_PAGE_SQL."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0,
               F.lit(" cafe\u0301")).otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.lit(" u\u0308ber")).otherwise(F.lit("")))


@register("text_nfc_normalize", oracle=f"""
WITH pages AS (
  SELECT doc_id, {_NFD_PAGE_SQL} AS page FROM documents)
SELECT doc_id,
       CAST(CASE WHEN nfc_normalize(page) <> page
            THEN 1 ELSE 0 END AS BIGINT) AS changed,
       md5(nfc_normalize(page)) AS norm_md5
FROM pages ORDER BY doc_id
""")
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the canonicalization every CC
    pipeline runs BEFORE hashing/dedup (decomposed 'e'+U+0301 and
    composed 'é' are different bytes, so un-normalized corpora
    under-dedup and double-count vocabulary). md5 of every normalized
    document is hash-checked against DuckDB's nfc_normalize — two
    independent NFC implementations (Python unicodedata vs utf8proc)
    agreeing byte-for-byte. Planted NFD decorations guarantee real
    composition work on every third/fourth doc.

    Scale: Spark has no JVM-side normalizer, so this is an honest
    Arrow-vectorized pandas UDF (Series.str.normalize) — ONE
    ArrowEvalPython stage, plain Series→Series per CLAUDE.md rule 2;
    at 100 TB it composes into the existing fused Python-worker stage
    alongside langid/perplexity."""
    from pyspark.sql.functions import pandas_udf

    # lambda form: module-level `from __future__ import annotations`
    # stringifies hints, and pyspark can't resolve 'pd.Series' against
    # a function-local pandas import
    nfc = pandas_udf(lambda texts: texts.str.normalize("NFC"),
                     "string")

    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", nfd_page_expr().alias("page")))
    return (d.select(
        "doc_id",
        (F.col("page") != nfc(F.col("page"))).cast("long")
        .alias("changed"),
        F.md5(nfc(F.col("page"))).alias("norm_md5"))
        .orderBy("doc_id"))


@register("corpus_datasheet", oracle="""
WITH t AS (SELECT lang, n_chars,
                  len(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')) AS n_toks,
                  source
           FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS en_ppm,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM t
""")
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card row every corpus release ships (Datasheets for
    Datasets, Gebru et al.): doc/token/char totals, language and
    source cardinalities, English ppm (integer cross-multiplied — no
    float ratio crosses engines), char bounds — ONE corpus pass, one
    global agg. At 100 TB this is the cheapest full-scan query in the
    catalog: partial aggs fold map-side, a single row leaves each
    executor."""
    from luzzu_spark.rules.heuristics import tokens_expr
    d = (spread(load_table(spark, sf_dir, "documents"))
         .select("lang", "source", "n_chars",
                 F.size(tokens_expr("text")).cast("long")
                 .alias("n_toks")))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.expr("sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) "
               "* 1000000 DIV count(*)").cast("long").alias("en_ppm"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"))


@register("corpus_shuffle_order", oracle="""
SELECT doc_id, md5('seed42|' || text) AS shuffle_key
FROM documents ORDER BY doc_id
""")
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every doc gets
    shuffle_key = md5(seed || text) — a reproducible global permutation
    (ORDER BY shuffle_key) that is reshard-invariant (same corpus +
    seed -> same order on any cluster, forever) and changes wholesale
    with the seed. The standard trick for shuffling a 10^12-doc corpus
    without RNG state: the sort key is content-derived, so re-runs and
    backfills agree.

    Scale: a pure projection — the consumer materializes the order as
    a range-partitioned SORT on the fixed-width 32-char key (Spark
    samples key ranges, so it balances regardless of doc order).
    Deliberately NOT a row_number() over a global window: an
    empty-frame window collapses the raw corpus onto one partition
    (CLAUDE.md rule 9); the KEY is the artifact, the rank is implied
    by it."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return (d.select("doc_id",
                     F.md5(F.concat(F.lit("seed42|"), F.col("text")))
                     .alias("shuffle_key"))
            .orderBy("doc_id"))


_GOPHER_REQ_STOPS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


@register("text_stopword_presence", oracle=f"""
WITH t AS (
  SELECT lang,
         list_filter(string_split(trim(text), ' '), x -> x <> '')
           AS toks
  FROM documents),
m AS (
  SELECT lang,
         len(list_filter({str(list(_GOPHER_REQ_STOPS))},
             s -> list_contains(toks, s))) AS n_present
  FROM t)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_present >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass,
       CAST(SUM(n_present) AS BIGINT) AS total_present
FROM m GROUP BY lang ORDER BY lang
""")
def text_stopword_presence(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Gopher's required-stop-word rule (Rae et al. 2021 §A1.1, the
    presence twin of the FRACTION rule already in the pipeline): a doc
    must contain ≥2 DISTINCT words from a fixed 8-word English stop
    list — catching keyword-stuffed pages whose stopword FRACTION can
    be gamed by repeating one 'the'. Integer-exact: per doc, the count
    of required words present, per lang the docs passing the ≥2 bar.

    Scale: the 8-word probe is a constant-size array membership per
    doc — one projection, no explode, no shuffle of text; the HOF runs
    over the fixed 8-element list, not the token array."""
    toks = F.filter(F.split(F.trim(F.col("text")), " "),
                    lambda x: x != "")
    req = F.array(*[F.lit(w) for w in _GOPHER_REQ_STOPS])
    n_present = F.size(F.filter(
        req, lambda s: F.array_contains(toks, s)))
    return (spread(load_table(spark, sf_dir, "documents"))
            .select("lang", n_present.alias("np"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("np") >= 2).cast("long")).alias("n_pass"),
                 F.sum("np").cast("long").alias("total_present"))
            .orderBy("lang"))


_DUPPARA_PAGE_SQL = """
  'Intro paragraph number one for page ' || doc_id || '.'
  || chr(10) || chr(10) || text
  || CASE WHEN doc_id % 6 = 0
       THEN repeat(chr(10) || chr(10) || 'Subscribe to our list.', 2)
       ELSE '' END
  || CASE WHEN doc_id % 9 = 0
       THEN chr(10) || chr(10) || text ELSE '' END
"""


def duppara_page_expr() -> F.Column:
    """Deterministic multi-paragraph page: every doc gets a unique
    intro paragraph + its body; doc_id % 6 adds the same short CTA
    paragraph twice (fires the 30% dup-PARAGRAPH rule, not the char
    rule); doc_id % 9 repeats the whole body paragraph (fires the 20%
    dup-paragraph-CHAR rule). Mirrored by _DUPPARA_PAGE_SQL."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("Intro paragraph number one for page "),
        d.cast("string"), F.lit("."),
        F.lit("\n\n"), F.col("text"),
        F.when(d % 6 == 0,
               F.lit("\n\nSubscribe to our list."
                     "\n\nSubscribe to our list."))
        .otherwise(F.lit("")),
        F.when(d % 9 == 0,
               F.concat(F.lit("\n\n"), F.col("text")))
        .otherwise(F.lit("")))


@register("text_dup_para_fraction", oracle=f"""
WITH pages AS (
  SELECT doc_id, lang, {_DUPPARA_PAGE_SQL} AS page FROM documents),
paras AS (
  SELECT doc_id, lang,
         md5(unnest(string_split(page, chr(10) || chr(10)))) AS ph,
         length(unnest(string_split(page, chr(10) || chr(10)))) AS pl
  FROM pages),
cnt AS (
  SELECT doc_id, lang, ph, pl, COUNT(*) AS c
  FROM paras GROUP BY doc_id, lang, ph, pl),
per_doc AS (
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_paras,
         CAST(SUM(c - 1) AS BIGINT) AS dup_paras,
         CAST(SUM(c * pl) AS BIGINT) AS total_pc,
         CAST(SUM((c - 1) * pl) AS BIGINT) AS dup_pc
  FROM cnt GROUP BY doc_id, lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dup_paras * 10 > 3 * n_paras
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_paras,
       CAST(SUM(CASE WHEN dup_pc * 5 > total_pc
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_chars,
       CAST(ROUND(CAST(SUM(dup_paras) AS DOUBLE) / SUM(n_paras), 6)
            AS DOUBLE) AS micro_dup_para_frac
FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_dup_para_fraction(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Gopher's duplicate-PARAGRAPH rules (Rae et al. §A1.1 — the
    paragraph twins of the dup-line rules, completing the repetition
    family: lines/chars/n-grams/top-word/paragraphs): flag docs whose
    duplicate-paragraph fraction exceeds 30% (instances beyond first)
    or whose duplicate-paragraph CHAR fraction exceeds 20% — exact
    integer cross-multiplications over planted multi-paragraph pages
    mirrored in SQL.

    Scale: explode paragraphs → hash-agg on (doc_id, md5(para)) —
    paragraph text reduces to a fixed-width digest before the shuffle
    (TEXT-KEY discipline), identical plan shape to the line rule."""
    pages = (spread(load_table(spark, sf_dir, "documents"))
             .select("doc_id", "lang",
                     duppara_page_expr().alias("page")))
    paras = pages.select(
        "doc_id", "lang",
        F.explode(F.split("page", "\n\n")).alias("para"))
    cnt = (paras.select("doc_id", "lang", F.md5("para").alias("ph"),
                        F.length("para").alias("pl"))
           .groupBy("doc_id", "lang", "ph", "pl")
           .agg(F.count(F.lit(1)).alias("c")))
    per_doc = (cnt.groupBy("doc_id", "lang")
               .agg(F.sum("c").alias("n_paras"),
                    F.sum(F.col("c") - 1).alias("dup_paras"),
                    F.sum(F.col("c") * F.col("pl")).alias("total_pc"),
                    F.sum((F.col("c") - 1) * F.col("pl"))
                    .alias("dup_pc")))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("dup_paras") * 10 > 3 * F.col("n_paras"))
                       .cast("long")).alias("n_flag_dup_paras"),
                 F.sum((F.col("dup_pc") * 5 > F.col("total_pc"))
                       .cast("long")).alias("n_flag_dup_chars"),
                 F.round(F.sum("dup_paras").cast("double")
                         / F.sum("n_paras"), 6)
                 .alias("micro_dup_para_frac"))
            .orderBy("lang"))


# daQ recast taxonomy (/root/reference/README.md:6 — results organized
# Category → Dimension → Metric): each heuristic rule mapped onto the
# daQ-style hierarchy the reference's quality-metadata graph uses.
_DAQ_MAP = (
    ("intrinsic", "completeness", "min_chars"),
    ("intrinsic", "completeness", "word_count"),
    ("representational", "understandability", "mean_word_len"),
    ("representational", "understandability", "max_word_len"),
    ("intrinsic", "accuracy", "symbol_ratio"),
    ("contextual", "relevancy", "stopword_frac"),
)


def _daq_oracle() -> str:
    from luzzu_spark.rules import spec as s
    from luzzu_spark.rules.stopwords import STOPWORDS
    sw = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"
    rows = ", ".join(f"('{c}', '{d}', '{r}')" for c, d, r in _DAQ_MAP)
    return f"""
WITH t AS (
  SELECT length(coalesce(text, '')) AS n_chars,
         list_filter(string_split(trim(coalesce(text, '')), ' '),
                     x -> x <> '') AS toks,
         length(regexp_replace(coalesce(text, ''),
                               '[ \\t\\n\\x0b\\f\\r]+', '', 'g')) AS nonws,
         len(regexp_extract_all(coalesce(text, ''),
                                '[{s.SYMBOL_CHARS}]')) AS n_sym
  FROM documents),
m AS (
  SELECT n_chars, len(toks) AS n_toks,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(nonws AS DOUBLE) / len(toks) END AS mwl,
         coalesce(list_max(list_transform(toks, x -> length(x))), 0)
           AS maxw,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(n_sym AS DOUBLE) / len(toks) END AS symr,
         CASE WHEN len(toks) = 0 THEN NULL
              ELSE CAST(len(list_filter(toks,
                     x -> list_contains({sw}, x))) AS DOUBLE)
                   / len(toks) END AS stopf
  FROM t),
fired AS (
  SELECT 'min_chars' AS rule, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_chars < {s.MIN_DOC_CHARS}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_fired FROM m
  UNION ALL SELECT 'word_count', COUNT(*),
         CAST(SUM(CASE WHEN n_toks < {s.MIN_WORDS}
                  OR n_toks > {s.MAX_WORDS}
                  THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'mean_word_len', COUNT(*),
         CAST(SUM(CASE WHEN mwl < {s.MEAN_WORD_LEN_LO}
                  OR mwl > {s.MEAN_WORD_LEN_HI}
                  THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'max_word_len', COUNT(*),
         CAST(SUM(CASE WHEN maxw > {s.MAX_WORD_LEN}
                  THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'symbol_ratio', COUNT(*),
         CAST(SUM(CASE WHEN symr > {s.MAX_SYMBOL_WORD_RATIO}
                  THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'stopword_frac', COUNT(*),
         CAST(SUM(CASE WHEN stopf < {s.MIN_STOPWORD_FRAC}
                  THEN 1 ELSE 0 END) AS BIGINT) FROM m),
map AS (SELECT * FROM (VALUES {rows}) v(category, dimension, rule))
SELECT map.category, map.dimension, map.rule, f.n_docs, f.n_fired
FROM fired f JOIN map ON map.rule = f.rule
ORDER BY 1, 2, 3
"""


@register("metrics_daq_hierarchy", oracle=_daq_oracle())
def metrics_daq_hierarchy(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Luzzu's daQ quality-metadata graph as a hash-checked query
    (/root/reference/README.md:6,8 — observations organized Category →
    Dimension → Metric): per-rule firing counts joined to the recast
    daQ taxonomy, so 'queryable quality metadata' means literally
    SELECT category, dimension, rule, n_fired. The oracle re-derives
    every rule firing independently in DuckDB from rules/spec.py
    thresholds — NULL ratio semantics pinned as in the keep-counts
    twin (a zero-token doc fires word_count, never the NULL ratios).

    Scale: ONE corpus pass computes all six flags in a single
    projection (integer sums, map-side partials); the 6-row taxonomy
    broadcasts."""
    from luzzu_spark.rules.heuristics import (heuristic_rules,
                                              with_token_columns)
    d = with_token_columns(
        spread(load_table(spark, sf_dir, "documents")))
    rules = {r.name: r for r in heuristic_rules()}
    flags = d.select(*[
        F.coalesce(rules[name].fires(rules[name].score())
                   .cast("long"), F.lit(0)).alias(name)
        for _, _, name in _DAQ_MAP])
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(name).alias(f"f_{name}") for _, _, name in _DAQ_MAP])
    stack = ", ".join(f"'{name}', f_{name}" for _, _, name in _DAQ_MAP)
    fired = agg.select(
        "n_docs",
        F.expr(f"stack({len(_DAQ_MAP)}, {stack}) AS (rule, n_fired)"))
    mapping = spark.createDataFrame(
        list(_DAQ_MAP), "category string, dimension string, rule string")
    return (fired.join(F.broadcast(mapping), "rule")
            .select("category", "dimension", "rule",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_fired").cast("long").alias("n_fired"))
            .orderBy("category", "dimension", "rule"))


# ---------------------------------------------------------------------
# Data-mixing plan (round 4): temperature-smoothed source weights and
# the epoch/repetition budget they imply. The exponent is fixed at
# α = 1/2 (square-root smoothing, the standard multilingual-sampling
# temperature, e.g. XLM-R's exponent-smoothed rates) because IEEE-754
# sqrt is EXACTLY rounded — unlike pow(x, 0.3), whose last-ulp value
# is libm-dependent — so the smoothed masses are bit-identical across
# Spark and DuckDB. Each mass is then quantized to an integer grid
# (floor(sqrt·1e6) as BIGINT) BEFORE the normalizing sum, making the
# denominator an order-independent exact integer (CLAUDE.md rule 12);
# every emitted double is a single division of exact integers.
# ---------------------------------------------------------------------

_SQRT_MASS_SQL = "CAST(FLOOR(SQRT(CAST(sum_chars AS DOUBLE)) * 1e6) AS BIGINT)"


@register("mix_temperature_weights", oracle=f"""
WITH per_src AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
mass AS (
  SELECT source, n_docs, sum_chars, {_SQRT_MASS_SQL} AS m
  FROM per_src)
SELECT source, n_docs, sum_chars,
       CAST(ROUND(CAST(m AS DOUBLE) / SUM(m) OVER (), 6) AS DOUBLE)
         AS mix_weight,
       CAST(ROUND(CAST(sum_chars AS DOUBLE)
                  / SUM(sum_chars) OVER (), 6) AS DOUBLE)
         AS natural_share
FROM mass ORDER BY source
""")
def mix_temperature_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Temperature-smoothed (α = 0.5) source sampling weights for the
    training mix, beside each source's natural share — the knob that
    up-samples small high-value sources without letting one giant
    crawl dominate (square-root smoothing per multilingual-LM
    practice). Exact cross-engine: sqrt is IEEE-exact, masses quantize
    to BIGINT before the sum, and each weight is one division of
    exact integers (see the block comment above).

    Scale: one map-side partial agg over the corpus to ~#sources
    rows; the empty-frame normalizing window runs post-aggregation
    only (CLAUDE.md rule 9)."""
    per_src = (spread(load_table(spark, sf_dir, "documents"))
               .groupBy("source")
               .agg(F.sum("n_chars").cast("long").alias("sum_chars"),
                    F.count(F.lit(1)).cast("long").alias("n_docs")))
    m = F.floor(F.sqrt(F.col("sum_chars").cast("double")) * 1e6) \
         .cast("long")
    w = Window.partitionBy()
    return (per_src.withColumn("m", m)
            .select("source", "n_docs", "sum_chars",
                    F.round(F.col("m").cast("double")
                            / F.sum("m").over(w), 6).alias("mix_weight"),
                    F.round(F.col("sum_chars").cast("double")
                            / F.sum("sum_chars").over(w), 6)
                    .alias("natural_share"))
            .orderBy("source"))


# token budget for the epoch plan: ~2× the sf0.01 corpus so the plan
# exercises both branches (up-sampled sources hit the epoch cap,
# giants stay under one epoch). A deployment passes its real budget.
_MIX_BUDGET_CHARS = 10_000_000
_MIX_EPOCH_CAP_X1000 = 4_000  # ≤4 epochs (data-constrained scaling)


@register("mix_epoch_plan", oracle=f"""
WITH per_src AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source),
mass AS (
  SELECT source, sum_chars, {_SQRT_MASS_SQL} AS m FROM per_src),
plan AS (
  SELECT source, sum_chars,
         CAST(FLOOR({_MIX_BUDGET_CHARS} *
                    (CAST(m AS DOUBLE) / SUM(m) OVER ())) AS BIGINT)
           AS target_chars
  FROM mass)
SELECT source, sum_chars, target_chars,
       CAST(LEAST({_MIX_EPOCH_CAP_X1000},
                  FLOOR(1000.0 * target_chars / sum_chars))
            AS BIGINT) AS epochs_x1000,
       CASE WHEN 1000.0 * target_chars / sum_chars
                 > {_MIX_EPOCH_CAP_X1000} THEN
         CAST(target_chars
              - (sum_chars * {_MIX_EPOCH_CAP_X1000}) // 1000 AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS unfilled_chars
FROM plan ORDER BY source
""")
def mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch/repetition plan for a fixed token budget: each
    source's target volume under the α=0.5 smoothed mix, the implied
    repetition factor in milli-epochs, capped at 4 epochs (past ~4
    repetitions additional epochs of the same data stop helping —
    data-constrained scaling), and the budget shortfall the cap
    leaves unfilled (to be re-allocated or backfilled by the next
    crawl). Integer-exact cross-engine: targets floor to BIGINT off
    one deterministic double expression over exact integer inputs,
    milli-epochs floor a single division of those BIGINTs.

    Scale: identical one-pass shape as mix_temperature_weights; the
    budget constant is fixture-sized here and a CLI argument in a
    real run (the double product stays exact-input/deterministic at
    any scale — no int64 overflow path since the product is computed
    in double and floored once)."""
    per_src = (spread(load_table(spark, sf_dir, "documents"))
               .groupBy("source")
               .agg(F.sum("n_chars").cast("long").alias("sum_chars")))
    m = F.floor(F.sqrt(F.col("sum_chars").cast("double")) * 1e6) \
         .cast("long")
    w = Window.partitionBy()
    target = F.floor(
        F.lit(float(_MIX_BUDGET_CHARS))
        * (F.col("m").cast("double") / F.sum("m").over(w))
    ).cast("long")
    ratio_x1000 = F.lit(1000.0) * F.col("target_chars") \
        / F.col("sum_chars")
    return (per_src.withColumn("m", m)
            .withColumn("target_chars", target)
            .select("source", "sum_chars", "target_chars",
                    F.least(F.lit(_MIX_EPOCH_CAP_X1000),
                            F.floor(ratio_x1000)).cast("long")
                    .alias("epochs_x1000"),
                    # capped volume derives from the cap constant —
                    # BIGINT-exact (x*cap DIV 1000; Spark DIV truncates
                    # toward zero ≡ DuckDB // floor on nonneg), so the
                    # epochs_x1000 and unfilled_chars columns can never
                    # drift if the cap changes (ADVICE r04)
                    F.when(ratio_x1000 > _MIX_EPOCH_CAP_X1000,
                           F.col("target_chars")
                           - F.expr(f"sum_chars * {_MIX_EPOCH_CAP_X1000}"
                                    " DIV 1000").cast("long"))
                    .otherwise(F.lit(0).cast("long"))
                    .alias("unfilled_chars"))
            .orderBy("source"))


# ---- per-language rule profiles (VERDICT r04 Missing #5) ----------------

def _lang_profile_oracle() -> str:
    """Generated from the SAME profile constants the rule loads
    (rules/stopwords.RULE_PROFILES + the langid LANG_PROFILES argmax)
    — one source of truth, two engines. Counting: the Spark rule uses
    one codegen'd whole-token regex per profile; the oracle counts
    with list_contains over the split tokens (RE2 lacks the
    lookahead) — equivalent on whitespace-delimited tokens, the same
    argument docs_sql_udf_keep_counts pins. All output columns are
    BIGINT (integer hits/counts), so the hash check is exact."""
    from luzzu_spark.rules.stopwords import LANG_PROFILES, RULE_PROFILES

    def sql_list(words) -> str:
        return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"

    langs = sorted(LANG_PROFILES)
    non_en = [lg for lg in sorted(RULE_PROFILES) if lg != "en"]
    score_cols = ",\n  ".join(
        f"CAST(len(list_filter(toks, x -> list_contains("
        f"{sql_list(LANG_PROFILES[lg])}, x))) AS DOUBLE)"
        f" / GREATEST(len(toks), 1) AS s_{lg}" for lg in langs)
    best = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred = ("CASE " + " ".join(f"WHEN s_{lg} = {best} THEN '{lg}'"
                               for lg in langs) + " END")
    key = ("CASE WHEN lang_pred IN ("
           + ", ".join(f"'{lg}'" for lg in non_en)
           + ") THEN lang_pred ELSE 'en' END")
    hits = ("CASE lang_key " + " ".join(
        f"WHEN '{lg}' THEN len(list_filter(toks, x -> list_contains("
        f"{sql_list(RULE_PROFILES[lg]['stopwords'])}, x)))"
        for lg in non_en)
        + " ELSE len(list_filter(toks, x -> list_contains("
        + sql_list(RULE_PROFILES["en"]["stopwords"]) + ", x))) END")
    thr = ("CASE lang_key " + " ".join(
        f"WHEN '{lg}' THEN {RULE_PROFILES[lg]['min_stopword_frac']}"
        for lg in non_en)
        + f" ELSE {RULE_PROFILES['en']['min_stopword_frac']} END")
    return f"""
WITH t AS (SELECT list_filter(string_split(trim(coalesce(text, '')), ' '),
                              x -> x <> '') AS toks FROM documents),
s AS (SELECT toks,
  {score_cols}
  FROM t),
p AS (SELECT toks, {pred} AS lang_pred FROM s),
k AS (SELECT toks, {key} AS lang_key FROM p),
r AS (SELECT lang_key, len(toks) AS n_toks, {hits} AS hits, {thr} AS thr
      FROM k)
SELECT lang_key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_toks > 0
                      AND CAST(hits AS DOUBLE) / n_toks < thr
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
       CAST(SUM(hits) AS BIGINT) AS sum_hits,
       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens
FROM r GROUP BY lang_key ORDER BY lang_key
"""


@register("docs_lang_profile_rates", oracle=_lang_profile_oracle())
def docs_lang_profile_rates(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Per-LANGUAGE stopword-profile firing rates — the multilingual
    rule surface (registry.multilingual_registry) exercised as an
    oracle-checked query: each document's language is predicted with
    the replayable langid argmax, the PRODUCT rule expressions
    (rules/heuristics.per_lang_stopword_rule — the exact score/fires
    Columns the pipeline compiles) select that language's stopword
    list + threshold, and the query reports per-profile doc counts,
    fire counts and integer hit/token sums.

    Scale: one codegen'd projection (regex counts + CASE) and one
    hash-agg on a ≤|profiles| key — no joins, no Python, no text in
    the shuffle (the grouping key is a 2-char lang code)."""
    from luzzu_spark.rules.heuristics import (per_lang_stopword_rule,
                                              stopword_token_re,
                                              with_token_columns)
    from luzzu_spark.rules.stopwords import LANG_PROFILES, RULE_PROFILES
    d = with_token_columns(spread(load_table(spark, sf_dir,
                                             "documents")))
    langs = sorted(LANG_PROFILES)

    def list_hits(words) -> F.Column:
        arr = F.array(*[F.lit(w) for w in sorted(words)])
        return F.size(F.filter("tokens",
                               lambda t: F.array_contains(arr, t)))

    d = d.withColumns({
        f"s_{lg}": list_hits(LANG_PROFILES[lg]).cast("double")
        / F.greatest(F.col("n_tokens"), F.lit(1)) for lg in langs})
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.when(F.col(f"s_{langs[0]}") == best, F.lit(langs[0]))
    for lg in langs[1:]:
        pred = pred.when(F.col(f"s_{lg}") == best, F.lit(lg))
    d = d.withColumn("lang_pred", pred)

    # the PRODUCT rule expressions, compiled over the attached columns
    rule = per_lang_stopword_rule(tuple(sorted(RULE_PROFILES)))
    non_en = [lg for lg in sorted(RULE_PROFILES) if lg != "en"]
    key = F.when(F.col("lang_pred").isin(non_en),
                 F.col("lang_pred")).otherwise(F.lit("en"))
    hits = F.regexp_count(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(stopword_token_re(RULE_PROFILES["en"]["stopwords"])))
    for lg in non_en:
        hits = F.when(key == lg, F.regexp_count(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(stopword_token_re(RULE_PROFILES[lg]["stopwords"])))
        ).otherwise(hits)
    d = (d.withColumn("lang_key", key)
         .withColumn("hits", hits.cast("long"))
         .withColumn("fired", rule.fires(rule.score())))
    return (d.groupBy("lang_key")
            # coalesce: zero-token docs score NULL (try_divide) so
            # fired is NULL; a group of ONLY such docs must sum to 0,
            # matching the oracle's CASE … ELSE 0 (CLAUDE.md rule 15)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce(F.col("fired").cast("long"),
                                  F.lit(0))).alias("n_fired"),
                 F.sum("hits").alias("sum_hits"),
                 F.sum(F.col("n_tokens").cast("long"))
                 .alias("sum_tokens"))
            .orderBy("lang_key"))


# BPE pre-tokenizer pattern (text_bpe_token_counts' lookahead-free
# GPT-2 family subset — identical in Java regex and RE2): the token
# BUDGET real training packs against, vs the whitespace-word proxy.
_BPE_PACK_PAT = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s"
_BPE_PACK_PAT_SQL = (
    r"'''(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s'")


@register("pack_bpe_sequences", oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(coalesce(text, ''),
             {_BPE_PACK_PAT_SQL})) AS n_toks
  FROM documents),
packed AS (
  SELECT source, n_toks,
         COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_bpe_tokens,
       CAST((SUM(n_toks) + {PACK_BUDGET} - 1) // {PACK_BUDGET} AS BIGINT)
         AS n_seqs,
       CAST(SUM(CASE WHEN n_toks > 0 AND
                  (cum_before + n_toks - 1) // {PACK_BUDGET}
                   > cum_before // {PACK_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
       CASE WHEN SUM(n_toks) = 0 THEN 0.0
            ELSE CAST(ROUND(CAST(SUM(n_toks) AS DOUBLE)
                 / (((SUM(n_toks) + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                    * {PACK_BUDGET}), 6) AS DOUBLE) END AS fill_frac
FROM packed GROUP BY source ORDER BY source
""")
def pack_bpe_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing on the BPE-token budget (VERDICT r04 next #7):
    identical packing math to pack_token_sequences, but the per-doc
    token count is the BPE pre-tokenizer count — the budget a real
    training loader packs against (whitespace words undercount
    punctuation-heavy web text by 20-40%, so a whitespace-packed
    corpus silently overfills real sequences). Boundary math stays
    exact BIGINT; the only float is one final rounded ratio.

    Scale: one codegen'd regexp_count projection, one shuffle on the
    pack unit (source; (source, shard) at 100 TB), a (doc_id, n_toks)
    window — text never enters the window or the shuffle."""
    b = PACK_BUDGET
    n = F.regexp_count(F.coalesce(F.col("text"), F.lit("")),
                       F.lit(_BPE_PACK_PAT))
    t = (spread(load_table(spark, sf_dir, "documents"))
         .select("doc_id", "source", n.cast("long").alias("n_toks")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)))
    straddles = ((F.col("n_toks") > 0)
                 & (F.expr(f"(cum_before + n_toks - 1) DIV {b}")
                    > F.expr(f"cum_before DIV {b}")))
    total = F.sum("n_toks")
    n_seqs = F.expr(f"(sum(n_toks) + {b} - 1) DIV {b}")
    return (packed.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 total.cast("long").alias("total_bpe_tokens"),
                 n_seqs.cast("long").alias("n_seqs"),
                 F.sum(straddles.cast("long")).alias("n_straddlers"),
                 F.when(total == F.lit(0), F.lit(0.0))
                 .otherwise(F.round(total.cast("double")
                                    / (n_seqs * F.lit(b)), 6))
                 .alias("fill_frac"))
            .orderBy("source"))
