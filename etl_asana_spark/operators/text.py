"""Text-analysis operators for training-data pipelines (SURVEY §2.12 #72–#74
plus language-ID / quality / fingerprinting from the north-star mandate).

Everything here is built-in Catalyst expressions (split/filter/transform/
aggregate/xxhash64) — no Python in the hot path, so these run at full scan
speed over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword seeds for the n-gram/stopword heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(_c(col), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenization approximating BPE input segmentation."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def shingles(tokens_col: str, n: int = 3) -> Column:
    """Word n-gram shingles from an array column named ``tokens_col``.

    SQL-expression form (0-based subscripts) so it stays in codegen:
    one output element per window position, empty array for short docs.

    The short-doc case needs an explicit CASE: Spark's ``sequence(1, 0)``
    is the DESCENDING [1, 0], not empty, so the previous
    ``greatest(size - {n-1}, 0)`` bound made every document with fewer
    than ``n`` tokens index out of bounds — an ANSI crash that took every
    shingle-based key down with it (found by the round-4
    unicode-adversarial corpus sweep, whose single-token emoji doc was the
    first sub-``n``-token text any fixture ever contained).
    """
    parts = ", ".join(f"{tokens_col}[i - 1 + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_col}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})) END"
    )


def stopword_hits(tokens: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits across languages.

    Deterministic ties: struct max compares (score, lang) lexicographically.
    Returns 'und' when no stopword matches at all.
    """
    toks = ws_tokens(col)
    scored = F.array(
        *[
            F.struct(stopword_hits(toks, lang).alias("s"), F.lit(lang).alias("l"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("und"))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, word stats, punctuation and
    stopword ratios. Ratios are double divisions of exact ints (portable)."""
    text = _c(col)
    toks = ws_tokens(col)
    n_chars = F.length(text)
    n_words = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[w for ws in STOPWORDS.values() for w in ws]))
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "avg_word_len": F.try_divide(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)),
            n_words,
        ),
        "punct_ratio": F.try_divide(n_punct.cast("double"), n_chars),
        "stopword_ratio": F.try_divide(n_stop.cast("double"), n_words),
    }


def shingle_hashes(tokens_col: str, n: int = 3) -> Column:
    """xxhash64 of each word n-gram (array<long>) — rolling-hash stream."""
    return F.transform(shingles(tokens_col, n), lambda s: F.xxhash64(s))


def poly_hash(col: Column | str, base: int = 131, mod: int = 1 << 40) -> Column:
    """Engine-neutral polynomial rolling hash over the string's code points
    (``h → (h·base + codepoint) mod 2⁴⁰``), the textbook Rabin-Karp form.

    Stays in whole-stage codegen via the ``aggregate`` HOF, and — unlike
    ``xxhash64`` — is exactly reproducible in DuckDB (``list_reduce`` +
    ``unicode``), which is what lets the fingerprint key carry a full SQL
    oracle. The modulus keeps every intermediate below 2⁴⁷ so ANSI
    overflow checks can never fire. Prefer :func:`doc_fingerprint`'s
    JVM-native ``xxhash64`` when cross-engine equality is not required —
    it is one codegen call per value instead of a per-character fold."""
    return F.aggregate(
        F.split(_c(col), ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * F.lit(base) + F.ascii(c)) % F.lit(mod),
    )


def doc_fingerprint(text_col: Column | str, tokens_col: str, n: int = 3) -> dict[str, Column]:
    """Document fingerprints (rolling-hash family): full-text 64-bit hash,
    plus min/max over the shingle-hash stream (1-permutation MinHash)."""
    hashes = shingle_hashes(tokens_col, n)
    return {
        "text_hash": F.xxhash64(_c(text_col)),
        "min_shingle_hash": F.array_min(hashes),
        "max_shingle_hash": F.array_max(hashes),
    }
