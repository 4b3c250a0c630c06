"""Text-analysis expression builders — the LLM-data-pipeline layer.

The reference has no string functions at all (SURVEY.md §2: "no
string/date/math scalar functions beyond sqrt/pow"); these are the
north-star extension operators (BASELINE.json) implemented entirely with
built-in `pyspark.sql.functions` so they run JVM-side inside whole-stage
codegen — no Python UDFs.

Every builder here has a DuckDB-expressible twin in contract.py; all
arithmetic is integer-or-single-division so Spark and the oracle agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal per-language stopword lists for the lang-id heuristic.
#: Deterministic demo sets — small on purpose so the heuristic is a
#: transparent, oracle-checkable scoring rule.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}

#: English stopwords for the quality score's stopword-ratio component.
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (lowercase).

    Empty tokens are filtered out, so empty/whitespace-only text yields
    ``[]`` (not ``['']``) and ``token_count`` is 0 — the round-1 ADVICE
    fix; mirrored in the oracle fragment ``_sql_text.sql_tokens``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: split on word boundaries AND count
    ~4-char chunks of long words, approximating a BPE tokenizer's output
    length with pure SQL arithmetic: sum over words of ceil(len/4)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    return F.when(F.size(toks) == 0, F.lit(0)).otherwise(
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
        )
    )


def stopword_count(col: Column | str, stopwords: list[str]) -> Column:
    """Occurrences (with repeats) of any stopword among the tokens."""
    lit = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(lit, t)))


def mean_token_len(col: Column | str) -> Column:
    """Mean token length = sum(lengths)/count, single division.
    NULL for token-less text (explicit guard so the oracle's
    ``list_reduce`` — which errors on empty lists — can mirror it)."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return F.when(F.size(toks) == 0, F.lit(None).cast("double")).otherwise(
        total / F.size(toks)
    )


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ascii letters or space; defined
    as 0.0 for empty text (guarded division, round-1 ADVICE fix)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), "[^a-z ]", "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(c)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic document quality in [0,1]:
    0.5·min(1, n_tokens/50) + 0.3·min(1, 5·stopword_ratio) + 0.2·alpha_ratio.

    Mirrors the heuristics large-scale pipeline filters use (length,
    function-word presence, symbol noise) with exactly reproducible
    arithmetic.
    """
    n = token_count(col).cast("double")
    sw = stopword_count(col, QUALITY_STOPWORDS).cast("double")
    stop_component = F.when(n == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.lit(5.0) * sw / n)
    )
    return (
        F.least(F.lit(1.0), n / F.lit(50.0)) * 0.5
        + stop_component * 0.3
        + alpha_ratio(col) * 0.2
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-id signal)."""
    return {
        lang: stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; ties and zero-hit rows →
    'unknown'. Deterministic tie-break: a language wins only with a
    strictly greater score than every other (matching the oracle SQL's
    CASE chain)."""
    scores = lang_scores(col)
    langs = list(scores)
    expr = F.lit("unknown")
    # build reversed CASE chain: first lang checked last => priority order
    for lang in reversed(langs):
        others = [scores[o] for o in langs if o != lang]
        cond = scores[lang] > F.lit(0)
        for o in others:
            cond = cond & (scores[lang] > o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def normalized_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics to
    spaces, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (hex string)."""
    return F.md5(normalized_text(col))


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles from an already-computed token-array
    column. Prefer this over :func:`shingles` whenever the tokens can
    be projected as a real column first (see
    ``operators/dedup.py::shingle_rows``): Catalyst does not CSE
    higher-order functions, so the inline form re-evaluates the token
    split once per reference — ~8× slower at sf0.1."""
    make = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        F.when(F.size(toks) >= n, make)
        .when(F.size(toks) > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as strings: tokens joined by single spaces,
    one shingle per window position. Documents shorter than n tokens
    yield a single shingle of the whole (normalized) text."""
    return shingles_of(tokens(col), n)


def syllable_estimate(col: Column | str) -> Column:
    """Syllable count heuristic: vowel-group runs (``[aeiouy]+``) in
    the lowercased text — the standard cheap estimator (each vowel
    cluster ≈ one syllable nucleus). Mirrored by
    contracts/_sql_text.py::sql_syllables."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"), 0))


def sentence_count(col: Column | str) -> Column:
    """Sentence-count heuristic: terminal-punctuation runs
    (``[.!?]+``), floored at 1 on non-empty text so the readability
    ratio is always defined."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(
        F.size(F.regexp_extract_all(c, F.lit("[.!?]+"), 0)), F.lit(1)
    )


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading-ease score (Flesch 1948): ``206.835 - 1.015 ·
    words/sentences - 84.6 · syllables/words`` from the house
    tokenizer + the vowel-group/terminal-punctuation heuristics.
    NULL on token-less text (no words → no score). Higher = easier;
    ~90 conversational English, ~30 academic prose. Pure codegen
    expressions — usable as a quality-filter column at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(c).cast("double")
    sents = sentence_count(c).cast("double")
    syl = syllable_estimate(c).cast("double")
    return F.when(
        words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (words / sents)
        - F.lit(84.6) * (syl / words),
    )
