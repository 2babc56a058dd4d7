"""Pure-pandas oracle: the second, independent implementation of RULESPEC.

SURVEY.md §0 item 3: the archived reference ships no runnable code, so
"match the reference's keep/drop decision" (BASELINE.json:14) is
evidenced by implementing the frozen rule spec twice — this module in
plain pandas/Python (no Spark imports in the hot path) and the Spark
pipeline — and requiring F1 ≥ 0.99 + byte-identical scrubbed text.

Deliberately written row-at-a-time and dependency-light: the point is
independence from the Spark expression tree, not speed.
"""

from __future__ import annotations

import pandas as pd

from luzzu_spark.rules import spec
from luzzu_spark.rules.langid import langid_py
from luzzu_spark.rules.perplexity import ppl_py
from luzzu_spark.rules.scrub import scrub_py
from luzzu_spark.rules.stopwords import STOPWORDS

_STOP = frozenset(STOPWORDS)


def pii_suffix(doc_id: int) -> str:
    """Twin of fixtures.pii_suffix_expr — keep in lockstep."""
    m = doc_id % 7
    if m == 0:
        return f" contact user{doc_id}@example.com for details"
    if m == 1:
        return f" call 555-{doc_id % 10000:04d} x{doc_id % 100}"
    if m == 2:
        return f" served from 10.{doc_id % 256}.0.{(doc_id * 7) % 256}"
    if m == 3:
        return f" ssn 123-45-{doc_id % 10000:04d}"
    return ""


def assess_row(text: str | None) -> dict:
    text = text or ""   # null doc ≡ empty doc (mirrors tokens_expr)
    toks = text.strip().split()
    n_tokens = len(toks)
    n_chars = len(text)
    mean_wl = (sum(len(t) for t in toks) / n_tokens) if n_tokens else None
    max_wl = max((len(t) for t in toks), default=0)
    symbols = sum(text.count(c) for c in spec.SYMBOL_CHARS)
    symbol_ratio = symbols / n_tokens if n_tokens else None
    stop_frac = (sum(1 for t in toks if t in _STOP) / n_tokens
                 if n_tokens else None)
    n = spec.NGRAM_N
    grams = [" ".join(toks[i:i + n]) for i in range(n_tokens - n + 1)]
    dup_frac = ((len(grams) - len(set(grams))) / len(grams)
                if grams else 0.0)
    lang_pred, lang_conf = langid_py(text)
    ppl = ppl_py(text)

    fired = {
        "min_chars": n_chars < spec.MIN_DOC_CHARS,
        "word_count": (n_tokens < spec.MIN_WORDS
                       or n_tokens > spec.MAX_WORDS),
        # None-scored rules do NOT fire — mirrors SQL three-valued logic
        # (Spark: WHEN null THEN ... is not taken), so both impls agree
        # on degenerate docs; word_count already drops empty docs.
        "mean_word_len": (mean_wl is not None
                          and (mean_wl < spec.MEAN_WORD_LEN_LO
                               or mean_wl > spec.MEAN_WORD_LEN_HI)),
        "max_word_len": max_wl > spec.MAX_WORD_LEN,
        "symbol_ratio": (symbol_ratio is not None
                         and symbol_ratio > spec.MAX_SYMBOL_WORD_RATIO),
        "stopword_frac": (stop_frac is not None
                          and stop_frac < spec.MIN_STOPWORD_FRAC),
        "dup_ngram_frac": dup_frac > spec.MAX_DUP_NGRAM_FRAC,
        "langid_conf": lang_conf < spec.MIN_LANGID_CONF,
        "perplexity": ppl > spec.MAX_PERPLEXITY,
    }
    reasons = [r for r in spec.RULE_ORDER if fired[r]]
    return {
        "drop_reasons": reasons,
        "keep": not reasons,
        "lang_pred": lang_pred,
        "score_langid_conf": lang_conf,
        "score_perplexity": ppl,
        "text_scrubbed": scrub_py(text),
    }


def assess_frame(docs: pd.DataFrame, text_col: str = "text",
                 inject_pii: bool = False) -> pd.DataFrame:
    """Assess a documents frame; returns input + verdict columns."""
    out = docs.copy()
    if inject_pii:
        out[text_col] = [
            t + pii_suffix(int(d))
            for t, d in zip(out[text_col], out["doc_id"])]
    verdicts = [assess_row(t) for t in out[text_col]]
    for k in ("drop_reasons", "keep", "lang_pred", "score_langid_conf",
              "score_perplexity", "text_scrubbed"):
        out[k] = [v[k] for v in verdicts]
    return out
