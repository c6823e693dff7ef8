"""Deterministic, versioned tokenizer.

The reference delegates text analysis to OpenSearch core (the plugin maps
only `knn_vector` fields — see SURVEY.md §2.8); for our full-text engine the
tokenizer IS part of the index contract, so it is frozen here and its version
is recorded in every segment manifest:

    token   := maximal run of [a-z0-9] over the lowercased text

Implemented three ways that must agree exactly (test-enforced):
  1. Spark built-ins (`lower` + `regexp_extract_all`) — JVM-side, codegen'd,
     zero Python in the hot path. This is the build-pipeline path.
  2. pandas `str.findall` — for inside Arrow UDF kernels.
  3. ANSI-SQL (`regexp_extract_all(lower(text), '[a-z0-9]+')`) — the DuckDB
     oracle path.

ASCII-only classes keep Java/Python/DuckDB regex semantics identical.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENIZER_VERSION = 1
TOKEN_PATTERN = "[a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_col(col: Column | str) -> Column:
    """Spark column expression: text -> array<string> of tokens (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit(TOKEN_PATTERN), 0
    )


def tokenize_text(text: str | None) -> list[str]:
    """Pure-Python tokenizer — used by the oracle; must match tokenize_col."""
    if text is None:
        return []
    return _PY_TOKEN_RE.findall(text.lower())


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer for Arrow UDF kernels (no Python loop)."""
    return s.fillna("").str.lower().str.findall(_PY_TOKEN_RE)


def tokenize_sql(expr: str) -> str:
    """ANSI-SQL fragment (DuckDB-compatible) matching tokenize_col."""
    return f"regexp_extract_all(lower(coalesce({expr}, '')), '{TOKEN_PATTERN}')"
