"""Deterministic, versioned tokenizer.

The reference delegates text analysis to OpenSearch core (the plugin maps
only `knn_vector` fields — see SURVEY.md §2.8); for our full-text engine the
tokenizer IS part of the index contract, so it is frozen here and its version
is recorded in every segment manifest:

    token   := maximal run of [a-z0-9] over lower(fold(text))

where fold maps the only two Unicode codepoints whose lowercase contains
ASCII [a-z0-9] to their ASCII form: U+212A KELVIN SIGN -> 'k' and U+0130
LATIN CAPITAL I WITH DOT -> 'i' (enumerated exhaustively over all of
Unicode). Folding BEFORE lower makes every implementation independent of
its engine's locale/full-vs-simple case-mapping for these chars: Python/Java
lower('İ') is 'i' + U+0307 while DuckDB (utf8proc simple mapping) gives 'i'
— without the fold the five pinned implementations cannot agree.

Implemented several ways that must agree exactly (test-enforced):
  1. Spark built-ins (`translate` + `lower` + `regexp_extract_all`) —
     JVM-side, codegen'd, zero Python in the hot path (build pipeline).
  2. pandas `str.findall` — for inside Arrow UDF kernels.
  3. ANSI-SQL (DuckDB) — the oracle path. DuckDB's own lower() already
     folds both chars (simple case mapping), so plain
     `regexp_extract_all(lower(x), '[a-z0-9]+')` is contract-identical;
     tokenize_sql() emits the explicit translate anyway for robustness.
  4. Pure Python (oracle.py).
  5. Byte-level NumPy scanner (operators/segment.py) — folds the two
     codepoints' UTF-8 sequences before the ASCII scan.

ASCII-only token classes keep Java/Python/DuckDB regex semantics identical;
all other non-ASCII characters are separators in every path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENIZER_VERSION = 1
TOKEN_PATTERN = "[a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)

# The exhaustive set of codepoints whose str.lower() introduces [a-z0-9].
FOLD_FROM = "Kİ"  # KELVIN SIGN, LATIN CAPITAL I WITH DOT ABOVE
FOLD_TO = "ki"
_FOLD_TABLE = str.maketrans(FOLD_FROM, FOLD_TO)


def tokenize_col(col: Column | str) -> Column:
    """Spark column expression: text -> array<string> of tokens (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(F.coalesce(c, F.lit("")), FOLD_FROM, FOLD_TO)
    return F.regexp_extract_all(
        F.lower(folded), F.lit(TOKEN_PATTERN), 0
    )


def tokenize_text(text: str | None) -> list[str]:
    """Pure-Python tokenizer — used by the oracle; must match tokenize_col."""
    if text is None:
        return []
    return _PY_TOKEN_RE.findall(text.translate(_FOLD_TABLE).lower())


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer for Arrow UDF kernels (no Python loop)."""
    return (
        s.fillna("")
        .str.translate(_FOLD_TABLE)
        .str.lower()
        .str.findall(_PY_TOKEN_RE)
    )


def tokenize_sql(expr: str) -> str:
    """ANSI-SQL fragment (DuckDB-compatible) matching tokenize_col.

    DuckDB's lower() uses Unicode simple mappings, so the translate is a
    no-op there today — kept explicit so the contract survives engine
    version changes."""
    folded = f"translate(coalesce({expr}, ''), '{FOLD_FROM}', '{FOLD_TO}')"
    return f"regexp_extract_all(lower({folded}), '{TOKEN_PATTERN}')"
