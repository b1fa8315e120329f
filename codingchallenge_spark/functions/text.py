"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side built-ins (no Python crossing): language-ID via stopword-lexicon
scoring, quality scoring (length/alpha/stopword ratios), token counting
(whitespace + BPE-ish regex), and document fingerprinting. Each has an exact
ANSI-SQL twin in plans/query_pack.py, checked against DuckDB by the driver.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the n-gram/stopword langid heuristic.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": "the of and to in is that for with as on by this".split(),
    "es": "el la de que en los se del las por un con una".split(),
    "de": "der die und in den von zu das mit sich des auf".split(),
    "fr": "le la de et les des en un du une que est pour".split(),
}


def ws_token_count(text: Column | str = "text") -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, " "))


def bpe_ish_token_count(text: Column | str = "text") -> Column:
    """BPE-ish token count: alpha runs, digit runs, single other non-space."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def _lexicon_hits(text: Column, lex: list[str]) -> Column:
    toks = F.split(F.lower(text), " ")
    return F.size(F.filter(toks, lambda t: t.isin(*lex)))


def langid_scores(text: Column | str = "text") -> dict[str, Column]:
    """Stopword-lexicon hit count per language (the langid signal)."""
    c = F.col(text) if isinstance(text, str) else text
    return {lang: _lexicon_hits(c, lex) for lang, lex in LANG_LEXICONS.items()}


def langid(text: Column | str = "text") -> Column:
    """Predicted language: argmax lexicon hits, deterministic tie-break by
    language code order; 'und' when nothing hits."""
    scores = langid_scores(text)
    scores_sorted = sorted(scores.items())
    best_expr = None
    best_score = None
    for lang, s in scores_sorted:
        if best_expr is None:
            best_expr, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best_expr = F.when(cond, F.lit(lang)).otherwise(best_expr)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best_expr).otherwise(F.lit("und"))


def quality_metrics(text: Column | str = "text") -> dict[str, Column]:
    """Quality-scoring signals: all exact integer/double arithmetic."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = ws_token_count(c)
    alpha_chars = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", ""))
    stop_hits = _lexicon_hits(c, LANG_LEXICONS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": n_chars / F.greatest(n_tokens, F.lit(1)),
        "alpha_ratio": alpha_chars / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stop_hits / F.greatest(n_tokens, F.lit(1)),
    }


def quality_score(text: Column | str = "text") -> Column:
    """Composite quality score in [0,1]: favors mid-length, alphabetic,
    stopword-bearing documents (heuristic, deterministic)."""
    m = quality_metrics(text)
    len_ok = F.when((m["n_tokens"] >= 10) & (m["n_tokens"] <= 10000), 1.0).otherwise(
        0.5
    )
    return (
        len_ok * 0.4 + m["alpha_ratio"] * 0.4
        + F.least(m["stopword_ratio"] * F.lit(4.0), F.lit(1.0)) * 0.2
    )


def fingerprint(text: Column | str = "text") -> Column:
    """Document fingerprint: sha256 over the sorted distinct token set of the
    lowercased text — invariant to token order and duplication (the classic
    'bag fingerprint' used for shuffled-near-dup detection)."""
    c = F.col(text) if isinstance(text, str) else text
    canon = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.lower(c), " ")))
    )
    return F.sha2(canon, 256)
