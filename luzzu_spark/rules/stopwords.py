"""Stop-word tables per language — small broadcast-side reference data.

Luzzu metrics attach external reference data (vocabularies/ontologies)
to the assessment (/root/reference/README.md:7); here that is a tiny
in-process table, shipped to executors via literal arrays / broadcast
joins — never a shuffle side.

Lists are frozen (part of RULESPEC): English function words plus the
high-frequency words of the synthetic fixture vocabulary, and small
fr/es/de/zh profiles used by the deterministic language-ID scorer.
"""

from __future__ import annotations

STOPWORDS_EN: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be",
    "from", "have", "has", "not", "but", "they", "you", "we", "his",
    "her", "its", "their", "which", "will", "would", "can", "could",
    "all", "there", "what", "when", "who", "how", "if", "no", "so",
)

# Per-language stop-word profiles for the deterministic langid scorer.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": STOPWORDS_EN,
    "fr": ("le", "la", "les", "de", "des", "du", "et", "en", "un", "une",
           "est", "que", "qui", "dans", "pour", "pas", "sur", "avec",
           "son", "au", "plus", "par", "il", "elle", "nous", "vous"),
    "es": ("el", "la", "los", "las", "de", "del", "y", "en", "un", "una",
           "es", "que", "se", "no", "por", "con", "para", "su", "al",
           "lo", "como", "más", "pero", "sus", "le", "ya"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht",
           "ein", "eine", "als", "auch", "es", "an", "werden", "aus"),
    "zh": ("的", "了", "和", "是", "在", "我", "有", "他", "这", "中",
           "大", "来", "上", "国", "个", "到", "说", "们", "为", "子"),
}

STOPWORDS: tuple[str, ...] = STOPWORDS_EN
