"""Declarative rule registry — Luzzu's metric registry, Spark-first.

Luzzu registers metrics as pluggable observers, each folding the quad
stream into a value plus a problem list (/root/reference/README.md:7,13).
Here a :class:`Rule` declares

- ``deps``: the input columns it reads (drives column pruning: the
  pipeline selects only the union of deps before any UDF stage, so
  Parquet ReadSchema stays minimal even across the Arrow boundary);
- ``score``: a builder returning a Catalyst ``Column`` (declarative
  rules) — or ``None`` for plugin rules whose score column is produced
  by a vectorized pandas UDF stage;
- ``fires``: drop-predicate builder over the score column.

The registry compiles to ONE chained ``select`` — no per-rule passes, no
per-row Python for declarative rules; Catalyst sees a flat expression
tree and whole-stage-codegens it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from luzzu_spark.rules import spec


@dataclass(frozen=True)
class Rule:
    name: str
    deps: tuple[str, ...]
    fires: Callable[[Column], Column]       # score col -> drop predicate
    score: Callable[[], Column] | None = None  # None → plugin (UDF) rule
    description: str = ""
    # late rules compile their score AFTER the plugin-UDF stage (they
    # may reference plugin outputs like lang_pred); declarative order
    # in drop_reasons is still RULE_ORDER-by-name, unchanged
    late: bool = False

    @property
    def is_plugin(self) -> bool:
        return self.score is None

    @property
    def score_col(self) -> str:
        return f"score_{self.name}"

    @property
    def fired_col(self) -> str:
        return f"fired_{self.name}"


@dataclass
class RuleRegistry:
    rules: list[Rule] = field(default_factory=list)

    def register(self, rule: Rule) -> Rule:
        if any(r.name == rule.name for r in self.rules):
            raise ValueError(f"duplicate rule: {rule.name}")
        self.rules.append(rule)
        return rule

    def ordered(self) -> list[Rule]:
        order = {n: i for i, n in enumerate(spec.RULE_ORDER)}
        return sorted(self.rules, key=lambda r: order.get(r.name, 10_000))

    def deps(self) -> list[str]:
        seen: list[str] = []
        for r in self.rules:
            for d in r.deps:
                if d not in seen:
                    seen.append(d)
        return seen

    # -- compilation -------------------------------------------------------

    def with_scores(self, df: DataFrame) -> DataFrame:
        """Attach score_* columns for declarative rules (one select).
        Late rules wait for :meth:`with_late_scores` (their expressions
        read plugin outputs such as lang_pred)."""
        cols = {r.score_col: r.score() for r in self.ordered()
                if not r.is_plugin and not r.late}
        return df.withColumns(cols)

    def with_late_scores(self, df: DataFrame) -> DataFrame:
        """Attach score_* columns for LATE declarative rules — called
        by the pipeline after the plugin-UDF stage, so these
        expressions can reference plugin outputs (lang_pred). A no-op
        select for registries without late rules (the default)."""
        cols = {r.score_col: r.score() for r in self.ordered()
                if not r.is_plugin and r.late}
        return df.withColumns(cols) if cols else df

    def with_verdict(self, df: DataFrame) -> DataFrame:
        """Attach fired_*, drop_reasons, keep, rule_scores.

        Expects every rule's score column present (plugin scores attached
        by the pipeline's UDF stage before this).
        """
        fired = {r.fired_col: r.fires(F.col(r.score_col))
                 for r in self.ordered()}
        df = df.withColumns(fired)
        reason_arrays = [
            F.when(F.col(r.fired_col), F.array(F.lit(r.name)))
            .otherwise(F.array().cast("array<string>"))
            for r in self.ordered()
        ]
        names = F.array(*[F.lit(r.name) for r in self.ordered()])
        scores = F.array(*[F.col(r.score_col).cast("double")
                           for r in self.ordered()])
        return df.withColumns({
            "drop_reasons": F.concat(*reason_arrays),
            "rule_scores": F.map_from_arrays(names, scores),
        }).withColumn("keep", F.size("drop_reasons") == F.lit(0))


def default_registry() -> RuleRegistry:
    """The frozen RULESPEC rule-set (rules/spec.py)."""
    from luzzu_spark.rules import heuristics  # late import: avoids cycle

    reg = RuleRegistry()
    for rule in heuristics.heuristic_rules():
        reg.register(rule)
    reg.register(Rule(
        name="dup_ngram_frac", deps=("text",),
        fires=lambda s: s > F.lit(spec.MAX_DUP_NGRAM_FRAC),
        description="within-doc 13-gram duplicate fraction (plugin "
                    "rule, vectorized rolling-hash pandas UDF)"))
    reg.register(Rule(
        name="langid_conf", deps=("text",),
        fires=lambda s: s < F.lit(spec.MIN_LANGID_CONF),
        description="deterministic stop-word-profile language-ID "
                    "confidence (plugin rule, pandas UDF)"))
    reg.register(Rule(
        name="perplexity", deps=("text",),
        fires=lambda s: s > F.lit(spec.MAX_PERPLEXITY),
        description="char-trigram LM perplexity (plugin rule, pandas "
                    "UDF, embedded deterministic model)"))
    return reg


def sql_rule(name: str, score_sql: str, fire_when_sql: str,
             deps: tuple[str, ...] = ("text",),
             description: str = "") -> Rule:
    """Declare a quality metric in SQL ALONE — the executable LQML
    recast (/root/reference/README.md:11-13: Luzzu users declare
    metrics without touching engine code).

    ``score_sql``: any SQL expression over the rule's dep columns and
    the derived helpers (``tokens``/``n_tokens``/``n_chars``) —
    compiled via F.expr, so it whole-stage-codegens exactly like the
    built-in rules. ``fire_when_sql``: a boolean SQL template over
    ``{score}`` (substituted with the attached score column).

        sql_rule("digit_heavy",
                 "coalesce(try_divide("
                 "  regexp_count(text, '[0-9]'), n_chars), 0.0)",
                 "{score} > 0.3")

    Plug into the pipeline with ``extended_registry``:
    ``QualityPipeline(registry=extended_registry(rule))``. User rules
    sort AFTER the frozen RULESPEC order, so default drop_reasons /
    scrub byte-identity is untouched when no extras are registered.
    Mind ANSI mode: ratios over possibly-empty docs need try_divide
    (+ coalesce to pin the fire decision for zero-token docs,
    CLAUDE.md rule 15)."""
    return Rule(
        name=name, deps=tuple(deps),
        score=lambda: F.expr(score_sql),
        fires=lambda _c: F.expr(
            # plain substring replace, NOT str.format: rule SQL may
            # legitimately contain braces (regex quantifiers in rlike,
            # map literals) that .format would choke on (ADVICE r03)
            fire_when_sql.replace("{score}", f"score_{name}")),
        description=description or f"user SQL rule: {score_sql}")


def robots_noindex_rule() -> Rule:
    """Crawl-compliance rule over the ``robots_noindex`` column the
    raw-WARC reader computes (sources.read_warc_html): pages whose
    markup opts out of indexing (meta robots noindex / X-Robots-Tag)
    DROP, with the drop funnel-counted like any other rule —
    drop_reasons gains 'robots_noindex', the firing rate lands in the
    daQ observations, and the problem report carries one row per
    opted-out page. Registered only when the caller asks
    (run_filter.py --drop-noindex / build_corpus.py --drop-noindex):
    the frozen RULESPEC byte-identity contract is untouched by
    default, and non-WARC inputs have no such column."""
    return Rule(
        name="robots_noindex", deps=("robots_noindex",),
        score=lambda: F.coalesce(
            F.col("robots_noindex").cast("double"), F.lit(0.0)),
        fires=lambda s: s >= F.lit(1.0),
        description="publisher opt-out: meta robots noindex in <head> "
                    "or X-Robots-Tag: noindex HTTP header")


def extended_registry(*extra: Rule) -> RuleRegistry:
    """The frozen default rule-set plus user-declared rules (e.g. from
    :func:`sql_rule`)."""
    reg = default_registry()
    for r in extra:
        reg.register(r)
    return reg


def multilingual_registry(langs: tuple[str, ...] | None = None
                          ) -> RuleRegistry:
    """The default rule-set with PER-LANGUAGE stopword profiles
    (VERDICT r04 Missing #5): the stopword_frac rule scores each
    document against the stopword list + threshold of its predicted
    language (rules/stopwords.RULE_PROFILES; EN fallback for
    everything else — including zh, whose whitespace tokenization has
    no meaningful profile). All other rules are byte-identical to the
    default registry, and ``multilingual_registry(("en",))`` returns
    the default registry itself — the frozen RULESPEC contract holds
    exactly when only EN is registered (tested)."""
    from luzzu_spark.rules.stopwords import RULE_PROFILES
    langs = tuple(langs) if langs else tuple(sorted(RULE_PROFILES))
    unknown = set(langs) - set(RULE_PROFILES)
    if unknown:
        raise ValueError(f"no rule profile for languages "
                         f"{sorted(unknown)} (registered: "
                         f"{sorted(RULE_PROFILES)})")
    if set(langs) == {"en"}:
        return default_registry()
    from luzzu_spark.rules.heuristics import per_lang_stopword_rule
    reg = RuleRegistry()
    for r in default_registry().rules:
        reg.register(per_lang_stopword_rule(langs)
                     if r.name == "stopword_frac" else r)
    return reg
