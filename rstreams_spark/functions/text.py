"""Text analysis column expressions (JVM-side, no Python UDFs).

Everything here is a Catalyst expression built from
``pyspark.sql.functions`` — whole-stage-codegen friendly, scales with
the scan. Each helper has an exactly-equivalent DuckDB SQL form in
``rstreams_spark/queries`` so the driver's oracle can replay it.

The word-count/normalization pipeline mirrors the reference's
shakespeare examples (reference example/tpipe.rs:75-99: strip
punctuation, lowercase, split on whitespace, fold counts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "norm_text", "tokens", "hash64", "md5_fingerprint",
    "bpe_ish_tokens", "token_chunks", "STOPWORDS",
]

# small per-language stopword lists for the lang-id heuristic; kept
# short + lowercase so the same literals inline into DuckDB SQL
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "por", "para"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai", "you"],
}


# İ (U+0130) is the ONE cased BMP codepoint whose lowercase DIVERGES
# between the JVM and utf8proc/DuckDB in a token-affecting way: JVM
# lower('İ') = 'i' + combining dot (U+0307, a symbol that splits the
# token), DuckDB = plain 'i'. Folding İ→I before lower() makes both
# engines produce 'i'. (A full 6,009-codepoint BMP scan found exactly
# one other divergence, U+2C2F, which both normalizers strip as a
# non-[a-z0-9] run — benign. Full Unicode casefold parity between the
# JVM and utf8proc is otherwise out of contract; normalize upstream
# for non-Latin corpora.)
def _fold_i(col: Column) -> Column:
    # guarded: translate builds a full copy of every string, and the
    # normalizers run it on every tokenize call — a contains() scan
    # skips the copy for the (overwhelmingly İ-free) common case.
    # Callers pass plain attribute refs, so the triple reference is
    # free. Semantically identical to an unconditional translate (the
    # DuckDB twins keep that form — oracle runtime doesn't matter).
    return F.when(
        col.contains("İ"), F.translate(col, "İ", "I")
    ).otherwise(col)


def norm_text(col: Column) -> Column:
    """lowercase, collapse every non-alphanumeric run to one space."""
    return F.trim(F.regexp_replace(F.lower(_fold_i(col)), "[^a-z0-9]+", " "))


def tokens(col: Column) -> Column:
    """whitespace tokens of the normalized text (no empties)."""
    return F.filter(F.split(norm_text(col), " "), lambda x: x != F.lit(""))


# explicit whitespace class, not \s: Java's \s includes vertical tab
# (\x0B) while RE2/DuckDB's does not, so a bare \s inside the negated
# class would count \x0B as a symbol token in the oracle but not in
# Spark (CLAUDE.md invariant 14)
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish lexer: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(
        F.lower(_fold_i(col)), F.lit(BPE_ISH_PATTERN), 0
    )


def token_chunks(tok_col: Column, size: int, overlap: int = 0) -> Column:
    """Sliding token windows for training-data chunking: chunk i
    covers tokens [i·stride, i·stride+size) with stride=size−overlap;
    every token is covered, the tail chunk may be short. Returns
    array<struct<chunk_idx int, chunk_text string, n_tokens int>>.

    The per-chunk lambda re-evaluates ``tok_col`` per chunk (not per
    token) — O(n·n_chunks) worst case; pass a materialized token
    column for very long documents.
    """
    stride = size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than size")
    n = F.size(tok_col)
    last = F.floor((n - 1) / stride).cast("int")
    idx = F.sequence(F.lit(0), last)
    chunk = lambda i: F.struct(  # noqa: E731
        i.alias("chunk_idx"),
        F.concat_ws(" ", F.slice(tok_col, i * stride + 1, size)).alias("chunk_text"),
        F.least(n - i * stride, F.lit(size)).alias("n_tokens"),
    )
    empty = F.array().cast(
        "array<struct<chunk_idx:int,chunk_text:string,n_tokens:int>>"
    )
    return F.when(n > 0, F.transform(idx, chunk)).otherwise(empty)


def hash64(col: Column, salt: int = 0) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB:
    first 15 hex chars of md5('<salt>:'||s) parsed base-16."""
    payload = F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def md5_fingerprint(col: Column) -> Column:
    """Content fingerprint of the normalized text."""
    return F.md5(norm_text(col))
