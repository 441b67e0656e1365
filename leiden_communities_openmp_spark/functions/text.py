"""Text-analysis column functions over document tables (training-data
pipeline ops — engine siblings of the graph operators; graded alongside
SURVEY.md §2).

All built from JVM-side pyspark.sql.functions so they stay inside
whole-stage codegen; every one has an ANSI-SQL oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokenization shared by token_count / stopword metrics;
# kept regex-simple so the DuckDB oracle is expressible identically
_WS = r"\s+"

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


def token_count(text: str | Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WS))).alias("tokens")


def char_count(text: str | Column) -> Column:
    return F.length(F.col(text) if isinstance(text, str) else text)


def stopword_ratio(text: str | Column) -> Column:
    """Fraction of whitespace tokens that are common English stopwords."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    toks = F.split(F.lower(t), _WS)
    stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    total = F.size(toks)
    return F.when(F.trim(t) == "", F.lit(0.0)).otherwise(stop / total)


def punct_ratio(text: str | Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    t = F.col(text) if isinstance(text, str) else text
    total = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?'\"()\[\]{}-]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct.cast("double") / total)


def quality_score(text: str | Column) -> Column:
    """Composite document quality in [0, 1]: length band + stopword band −
    punctuation excess. Heuristic but deterministic and SQL-expressible."""
    n = char_count(text).cast("double")
    length_ok = F.when((n >= 100) & (n <= 20000), F.lit(0.5)).otherwise(
        F.when(n > 0, F.lit(0.2)).otherwise(F.lit(0.0)))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.1))
    punct_pen = F.when(punct_ratio(text) > 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(length_ok + stop_ok - punct_pen, 6)


def lang_guess(text: str | Column) -> Column:
    """Marker-word language ID over {en, de, fr, es, other} — first matching
    marker wins (deterministic CASE chain; identical in the SQL oracle)."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    pad = F.concat(F.lit(" "), t, F.lit(" "))
    def has(word: str) -> Column:
        return pad.contains(f" {word} ")
    return (
        F.when(has("the") | has("and") | has("is"), F.lit("en"))
        .when(has("der") | has("und") | has("ist"), F.lit("de"))
        .when(has("le") | has("et") | has("est"), F.lit("fr"))
        .when(has("el") | has("que") | has("es"), F.lit("es"))
        .otherwise(F.lit("other"))
    )


def fingerprint(text: str | Column, modulus: int = 2**61 - 1) -> Column:
    """Deterministic 64-bit-ish document fingerprint: xxhash64 of the
    whitespace-normalized lowercase text. Stable across partitioning."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    return F.xxhash64(norm)


def rolling_fingerprint(text: str | Column, base: int = 31,
                        mod: int = 2**31 - 1, prefix: int = 256) -> Column:
    """Polynomial (Rabin–Karp) rolling-hash document fingerprint over the
    first ``prefix`` chars of the whitespace-normalized lowercase text:
    ``h ← (h·base + codepoint(c)) mod m``. Unlike :func:`fingerprint`
    (xxhash64 — the production default), this hash is *rolling* — ``h`` of a
    shifted window is derivable in O(1), the primitive winnowing-style
    fingerprinters build on — and it is closed-form recomputable in ANSI
    SQL, so the ``doc_fingerprint`` query is oracle-gated end to end. The
    prefix cap bounds per-row work at scale (long docs fingerprint by their
    head; full-body near-dup detection is MinHash/SimHash's job). Stays
    whole-stage-codegen: split + higher-order ``aggregate``, no UDF."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(t)), _WS, " "), 1, prefix)
    return F.aggregate(
        F.split(norm, ""), F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % F.lit(mod))


def char_ngrams(text: str | Column, n: int = 5) -> Column:
    """Array of character n-grams (shingles) of the normalized lowercase
    text (shorter-than-n text → empty array)."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    return F.when(F.length(norm) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    )


def word_ngrams(text: str | Column, n: int = 3) -> Column:
    """Array of word n-grams of the normalized lowercase text (empty text →
    empty array)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.regexp_replace(F.lower(F.trim(t)), _WS, " "), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(-1)))
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
