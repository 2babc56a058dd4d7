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
        """Attach score_* columns for declarative rules (one select)."""
        cols = {r.score_col: r.score() for r in self.ordered()
                if not r.is_plugin}
        return df.withColumns(cols)

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
