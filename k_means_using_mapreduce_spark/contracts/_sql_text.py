"""Shared DuckDB SQL fragments mirroring functions/text.py expression
builders. Every fragment is written so its floating/integer arithmetic
is bit-identical to the Spark twin (same operation order)."""

from __future__ import annotations

from ..functions.text import LANG_STOPWORDS, QUALITY_STOPWORDS


def sql_tokens(col: str) -> str:
    # empty tokens filtered — mirrors functions/text.py::tokens
    return (
        f"list_filter(string_split_regex(lower(trim({col})), '\\s+'), "
        "t -> t <> '')"
    )


def sql_token_count(col: str) -> str:
    return f"len({sql_tokens(col)})"


def sql_stopword_count(col: str, words: list[str]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({sql_tokens(col)}, t -> list_contains({lit}, t)))"


def sql_mean_token_len(col: str) -> str:
    # NULL on token-less text — list_reduce errors on empty lists
    toks = sql_tokens(col)
    total = f"list_reduce(list_transform({toks}, t -> len(t)), (a, b) -> a + b)"
    return (
        f"(CASE WHEN len({toks}) = 0 THEN NULL "
        f"ELSE ({total} / len({toks})) END)"
    )


def sql_alpha_ratio(col: str) -> str:
    return (
        f"(CASE WHEN len({col}) = 0 THEN 0.0 ELSE "
        f"(len(regexp_replace(lower({col}), '[^a-z ]', '', 'g')) / len({col})) "
        "END)"
    )


def sql_bpe_ish_token_count(col: str) -> str:
    # integer addition is exactly associative — no init-accumulator
    # mismatch vs Spark's aggregate(0, ...)
    reduced = (
        f"list_reduce(list_transform({sql_tokens(col)}, "
        f"w -> CAST(ceil(len(w) / 4.0) AS INTEGER)), (a, b) -> a + b)"
    )
    return f"(CASE WHEN len({sql_tokens(col)}) = 0 THEN 0 ELSE {reduced} END)"


def sql_quality_score(col: str) -> str:
    n = f"CAST({sql_token_count(col)} AS DOUBLE)"
    sw = f"CAST({sql_stopword_count(col, QUALITY_STOPWORDS)} AS DOUBLE)"
    stop_component = (
        f"(CASE WHEN {n} = 0 THEN 0.0 "
        f"ELSE least(1.0, 5.0 * {sw} / {n}) END)"
    )
    return (
        f"(least(1.0, {n} / 50.0) * 0.5"
        f" + {stop_component} * 0.3"
        f" + {sql_alpha_ratio(col)} * 0.2)"
    )


def sql_lang_hits(col: str) -> dict[str, str]:
    return {
        lang: sql_stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()
    }


def sql_normalized_text(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'), "
        f"' +', ' ', 'g'))"
    )


def sql_fingerprint(col: str) -> str:
    return f"md5({sql_normalized_text(col)})"


def sql_shingles(col: str, n: int = 3) -> str:
    toks = sql_tokens(col)
    make = (
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    whole = f"[array_to_string({toks}, ' ')]"
    return (
        f"(CASE WHEN len({toks}) >= {n} THEN {make} "
        f"WHEN len({toks}) > 0 THEN {whole} "
        "ELSE CAST([] AS VARCHAR[]) END)"
    )


def sql_syllables(col: str) -> str:
    return f"len(regexp_extract_all(lower({col}), '[aeiouy]+'))"


def sql_sentences(col: str) -> str:
    return f"greatest(len(regexp_extract_all({col}, '[.!?]+')), 1)"


def sql_flesch(col: str) -> str:
    words = f"CAST({sql_token_count(col)} AS DOUBLE)"
    sents = f"CAST({sql_sentences(col)} AS DOUBLE)"
    syl = f"CAST({sql_syllables(col)} AS DOUBLE)"
    return (
        f"(CASE WHEN {words} > 0 THEN "
        f"206.835 - 1.015 * ({words} / {sents}) - 84.6 * ({syl} / {words}) "
        "END)"
    )
