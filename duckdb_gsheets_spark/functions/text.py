"""Text-analysis column builders for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` (no
Python UDFs): tokenization via ``split``/``regexp_extract_all``,
language-ID via marker-word intersection, fingerprinting via ``md5``.
Whole-stage codegen keeps these in the JVM at 100 TB; there is no
Python in the hot path.

Each builder documents the DuckDB-SQL equivalent used by the oracle so
the two stay in lockstep (operators/text.py assembles them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/stopword language-ID
#: heuristic. Deliberately tiny: the heuristic (not a model) is the
#: operator under test.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "et", "les", "des", "est", "une", "dans", "pour", "ce", "pas"),
}

#: Word-ish lexer for the BPE-style token count: runs of letters, runs
#: of digits, or single non-space symbols. Kept RE2-compatible so the
#: same pattern runs in Spark (Java regex) and DuckDB (RE2).
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

PUNCT_PATTERN = "[^A-Za-z0-9 \\t\\n\\r]"

WHITESPACE_SPLIT = "\\s+"

#: PII detectors for corpus scrubbing — deliberately RE2-compatible
#: (no backreferences/lookaround) so the SAME pattern runs in Spark
#: (Java regex) and the DuckDB oracle. Heuristic recall like every
#: regex PII pass; the operator contract is detect+mask, not legal
#: completeness.
PII_EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
PII_IP_PATTERN = (
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
)
PII_MASK = "<pii>"


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrences of one PII pattern.

    DuckDB: ``len(regexp_extract_all(x, pattern))``.
    """
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_scrubbed(col: Column) -> Column:
    """Text with all three PII patterns masked (email first so its
    host part can't later half-match the IP pattern).

    DuckDB: nested ``REGEXP_REPLACE(..., pattern, mask, 'g')`` in the
    same order.
    """
    out = col
    for pat in (PII_EMAIL_PATTERN, PII_PHONE_PATTERN, PII_IP_PATTERN):
        out = F.regexp_replace(out, pat, PII_MASK)
    return out


def oracle_pii_scrubbed(expr: str = "text") -> str:
    out = expr
    for pat in (PII_EMAIL_PATTERN, PII_PHONE_PATTERN, PII_IP_PATTERN):
        out = f"REGEXP_REPLACE({out}, '{pat}', '{PII_MASK}', 'g')"
    return out


def normalized(col: Column) -> Column:
    """Lowercased, whitespace-collapsed, trimmed text.

    DuckDB: ``TRIM(REGEXP_REPLACE(LOWER(x), '\\s+', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(col), WHITESPACE_SPLIT, " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (no empty tokens).

    DuckDB: ``regexp_split_to_array(TRIM(x), '\\s+')``.
    """
    return F.split(F.trim(col), WHITESPACE_SPLIT)


def token_count(col: Column) -> Column:
    """Whitespace token count. DuckDB: ``len(regexp_split_to_array(...))``."""
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count via the lexer regex.

    DuckDB: ``len(regexp_extract_all(x, BPE_TOKEN_PATTERN))``.
    """
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


def punct_count(col: Column) -> Column:
    """Count of non-alphanumeric, non-space chars."""
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_PATTERN), 0))


def marker_hits_distinct(col: Column, lang: str) -> Column:
    """Distinct marker-word hits for ``lang`` (the language-ID score).

    DuckDB: ``len(list_filter(list_distinct(toks), t -> list_contains([...], t)))``.
    """
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(tokens(F.lower(col)), markers))


def stopword_hits_total(col: Column, lang: str = "en") -> Column:
    """Total (non-distinct) stopword occurrences.

    DuckDB: ``len(list_filter(toks, t -> list_contains([...], t)))``.
    """
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(
        F.filter(tokens(F.lower(col)), lambda t: F.array_contains(markers, t))
    )


def language_id(col: Column) -> Column:
    """Pick the language whose marker score wins (en ≥ es ≥ de ≥ fr
    precedence on ties, 'unknown' when all scores are zero).

    The same CASE ladder is emitted in the oracle SQL — decision logic
    identical by construction.
    """
    s = {lang: marker_hits_distinct(col, lang) for lang in LANG_MARKERS}
    return (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("unknown")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    DuckDB: ``md5(TRIM(REGEXP_REPLACE(LOWER(x), '\\s+', ' ', 'g')))`` —
    identical hex in both engines.
    """
    return F.md5(normalized(col).cast("binary"))


def quality_score(col: Column) -> Column:
    """Heuristic quality score in [0,1]: length, punctuation,
    stopword density and mean word length, equally weighted.

    Written with the exact operation order mirrored in the oracle SQL;
    rounded to 6 decimals on both sides.
    """
    toks = token_count(col).cast("double")
    chars = F.length(col).cast("double")
    punct = punct_count(col).cast("double")
    stops = stopword_hits_total(col).cast("double")
    nonspace = F.length(F.regexp_replace(col, WHITESPACE_SPLIT, "")).cast("double")
    len_component = F.least(F.lit(1.0), toks / F.lit(100.0))
    punct_component = F.lit(1.0) - punct / chars
    stop_component = stops / toks
    wordlen_component = F.least(F.lit(1.0), (nonspace / toks) / F.lit(10.0))
    return F.round(
        F.lit(0.25) * len_component
        + F.lit(0.25) * punct_component
        + F.lit(0.25) * stop_component
        + F.lit(0.25) * wordlen_component,
        6,
    )


def oracle_tokens(expr: str = "text") -> str:
    """DuckDB fragment matching :func:`tokens`."""
    return f"regexp_split_to_array(TRIM({expr}), '\\s+')"


def oracle_marker_hits_distinct(lang: str, expr: str = "text") -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    toks = f"regexp_split_to_array(TRIM(LOWER({expr})), '\\s+')"
    return (
        f"len(list_filter(list_distinct({toks}), t -> list_contains([{markers}], t)))"
    )


def oracle_stopword_hits_total(lang: str = "en", expr: str = "text") -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    toks = f"regexp_split_to_array(TRIM(LOWER({expr})), '\\s+')"
    return f"len(list_filter({toks}, t -> list_contains([{markers}], t)))"


def oracle_language_id(expr: str = "text") -> str:
    s = {lang: oracle_marker_hits_distinct(lang, expr) for lang in LANG_MARKERS}
    return f"""CASE
      WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} > 0 THEN 'en'
      WHEN {s['es']} >= {s['de']} AND {s['es']} >= {s['fr']} AND {s['es']} > 0 THEN 'es'
      WHEN {s['de']} >= {s['fr']} AND {s['de']} > 0 THEN 'de'
      WHEN {s['fr']} > 0 THEN 'fr'
      ELSE 'unknown' END"""


def oracle_quality_score(expr: str = "text") -> str:
    """DuckDB expression matching :func:`quality_score` term-for-term."""
    toks = f"CAST(len({oracle_tokens(expr)}) AS DOUBLE)"
    return f"""ROUND(
    0.25 * LEAST(1.0, {toks} / 100.0)
    + 0.25 * (1.0 - CAST(len(regexp_extract_all({expr}, '{PUNCT_PATTERN}')) AS DOUBLE)
                    / CAST(LENGTH({expr}) AS DOUBLE))
    + 0.25 * (CAST({oracle_stopword_hits_total('en', expr)} AS DOUBLE) / {toks})
    + 0.25 * LEAST(1.0, (CAST(LENGTH(REGEXP_REPLACE({expr}, '\\s+', '', 'g')) AS DOUBLE)
                         / {toks}) / 10.0)
  , 6)"""


def oracle_normalized(expr: str = "text") -> str:
    return f"TRIM(REGEXP_REPLACE(LOWER({expr}), '\\s+', ' ', 'g'))"


def oracle_fingerprint(expr: str = "text") -> str:
    return f"md5({oracle_normalized(expr)})"
