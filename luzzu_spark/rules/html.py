"""Declarative HTML→text extraction — the step between a raw WARC
``response`` record and the WET-style plain text the quality rules
consume (C4/Gopher pipelines run exactly this before filtering).

The extractor is a pure Catalyst expression chain (one projection, no
UDFs, whole-stage codegen) restricted to the regex subset Java and RE2
share — no backreferences, no lookaround — so the DuckDB oracle replays
the chain verbatim and the output is hash-verifiable cross-engine (the
same discipline as the PII scrub and the C4 line scrub).

Honesty note: this is the deterministic heuristic tier (drop
script/style blocks, break on block-level tags, strip tags, decode the
six common entities, normalize whitespace). Production boilerplate
removal (jusText/trafilatura DOM analysis, JS rendering) is a model
slot like fastText/KenLM: swap `html_to_text_expr` for a pandas-UDF
extractor behind the same column contract; everything downstream is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tags whose CONTENT must not leak into text
_DROP_CONTENT_TAGS = ("script", "style", "noscript")
# comments vanish as a unit BEFORE tag stripping: a comment containing
# '>' would otherwise leak its tail into the text (review r04)
_COMMENT_RE = r"(?s)<!--.*?-->"
# tag boundaries that imply a line break (block-level closers + br/li).
# `(?:[\s/][^>]*)?>` after the name is a lookahead-free (Java∩RE2)
# name boundary: `<li>`/`<li class=x>`/`<br/>` match, `<link>` does NOT
# (review r04: prefix matching turned <link>/<pre>/<track> into breaks)
_BLOCK_BREAK_RE = (r"(?i)<(?:br|li|tr|p|div|/p|/div|/h[1-6]|/li|/tr"
                   r"|/ul|/ol|/table|/blockquote|/section|/article)"
                   r"(?:[\s/][^>]*)?>")
# entity → character, applied in this order; &amp; LAST so a literal
# "&amp;lt;" decodes once to "&lt;", never twice to "<"
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
)


def html_to_text_expr(col: str | Column) -> Column:
    """Extract readable text from an HTML string column.

    Steps (each a global regexp/replace both engines implement
    identically):
      1. drop <!-- comments --> as a unit
      2. drop <script>/<style>/<noscript> elements with their content
      3. block-level boundaries → newline
      4. strip every remaining tag → space
      5. decode the six common entities (&amp; last)
      6. collapse horizontal whitespace; tidy newline spacing; trim
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    for tag in _DROP_CONTENT_TAGS:
        c = F.regexp_replace(c, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    c = F.regexp_replace(c, _BLOCK_BREAK_RE, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t\f]+", " ")
    c = F.regexp_replace(c, r" ?\r?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def html_to_text_oracle(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` (an HTML string
    expression) — regexp_replace needs the explicit global flag in
    DuckDB ('g'; Spark is always-global), and the flag string carries
    the inline (?is) modifiers' job for the tag rules."""
    c = expr
    c = f"regexp_replace({c}, '{_COMMENT_RE}', ' ', 'g')"
    for tag in _DROP_CONTENT_TAGS:
        c = (f"regexp_replace({c}, '(?is)<{tag}[^>]*>.*?</{tag}>',"
             f" ' ', 'g')")
    c = f"regexp_replace({c}, '{_BLOCK_BREAK_RE}', chr(10), 'g')"
    c = f"regexp_replace({c}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    c = f"regexp_replace({c}, '[ \\t\\f]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\r?\\n ?', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({c})"


def extraction_precision_recall(pages, extracted_col: str = "text",
                                truth_col: str = "main_text"):
    """Extraction-quality harness (VERDICT r04 next #6): token-level
    precision/recall of an HTML→text extractor against known main
    text — the acceptance gate any extractor swap (trafilatura/jusText
    pandas-UDF tier) must pass before replacing html_to_text_expr.

    Token-MULTISET scoring: matched = Σ_token min(count_extracted,
    count_truth) per page; precision = matched / |extracted|, recall =
    matched / |truth|. The deterministic heuristic tier keeps nav/
    footer/cookie boilerplate TEXT (it only strips markup), so its
    signature is recall ≈ 1.0 with precision = main-text share — a DOM
    extractor raises precision; a regression that eats main text shows
    up as recall loss.

    Returns one row: (n_pages, precision, recall) with exact BIGINT
    token sums and the two ratios rounded from them.

    Scale shape: explode → per-(page, token) counts → one equi-join of
    the two count frames → hash-agg; token strings shuffle once with
    ~(pages × distinct tokens) rows. An evaluation harness runs over a
    labeled sample (10²-10⁵ pages), never the corpus."""
    from pyspark.sql import functions as F

    def counts(col, out):
        toks = F.array_remove(
            F.split(F.trim(F.coalesce(F.col(col), F.lit(""))),
                    r"\s+"), "")
        return (pages.select("doc_id", F.explode(toks).alias("tok"))
                .groupBy("doc_id", "tok")
                .agg(F.count(F.lit(1)).alias(out)))
    e = counts(extracted_col, "n_ext")
    t = counts(truth_col, "n_tru")
    m = (e.join(t, ["doc_id", "tok"], "full_outer")
         .select(F.coalesce("n_ext", F.lit(0)).alias("n_ext"),
                 F.coalesce("n_tru", F.lit(0)).alias("n_tru"))
         .agg(F.sum(F.least("n_ext", "n_tru")).alias("matched"),
              F.sum("n_ext").alias("total_ext"),
              F.sum("n_tru").alias("total_tru")))
    n_pages = pages.select(F.countDistinct("doc_id").alias("n"))
    return (m.crossJoin(n_pages)
            .select(F.col("n").cast("long").alias("n_pages"),
                    F.col("matched").cast("long").alias("matched_tokens"),
                    F.col("total_ext").cast("long")
                    .alias("extracted_tokens"),
                    F.col("total_tru").cast("long").alias("truth_tokens"),
                    F.round(F.try_divide(F.col("matched"),
                                         F.col("total_ext")), 6)
                    .alias("precision"),
                    F.round(F.try_divide(F.col("matched"),
                                         F.col("total_tru")), 6)
                    .alias("recall")))
