"""Text-analysis column expressions (LLM-training-data pipeline surface).

Everything here is built-in `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, no Python in the hot path.  Each helper has an
exactly-equivalent DuckDB SQL fragment used by the oracle (plans/text.py,
plans/dedup.py); keep both in sync.

Tokenization contract (shared with the oracle):
    tokens(text)     = regexp_extract_all(lower(text), '[a-z0-9]+')
    bpe-ish pieces   = regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Small cross-language stopword/marker lists (public common-words lists).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "les", "et", "une"),
}
# CJK presence is its own signal (zh marker) — char-class count.
CJK_RE_SPARK = "[\\u4e00-\\u9fff]"
CJK_RE_DUCK = "[\\x{4e00}-\\x{9fff}]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def bpe_pieces(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_RE), 0)


def count_in_list(arr: Column, words: tuple[str, ...]) -> Column:
    """Number of array elements contained in a literal word list."""
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr, lambda x: F.array_contains(lit_arr, x)))


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def duck_tokens(expr: str = "text") -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"


def duck_normalized(expr: str = "text") -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
