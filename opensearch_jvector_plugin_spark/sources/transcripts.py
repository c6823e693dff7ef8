"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

Schema is the authoritative input shape from BASELINE.json:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
 ts:timestamp).

Generation is a pure function of the global turn index — NO stateful RNG —
so the corpus is identical regardless of Spark partitioning, parallelism, or
batch boundaries (the property that makes the local[8]-vs-local[32] scaling
benchmark apples-to-apples). Content: a Zipf-ish token stream over a ~5,000
term vocabulary with planted hot terms (df ~ 1/3 and 1/5 of the corpus, the
skew-test terms), planted rare terms (df = 1..3), and deterministic
casing/punctuation noise to exercise the tokenizer.

Distributed path: ``spark.range(n) -> mapInPandas`` with NumPy kernels (the
same kernel serves the driver-side pandas generator used in unit tests), so
synthesis itself scales with executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

VOCAB_SIZE = 5000
_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["", "bash", "search", "editor"])
_SEPS = np.array([" ", ", ", " ", "; ", " ", ". ", " ", "  "])
_EPOCH = np.int64(1_704_067_200)  # 2024-01-01T00:00:00Z

# Planted terms (FIXTURES.md §1): hot -> skew tests, rare -> df edge cases.
HOT_TERMS = {"hotcommon": 3, "hotfive": 5}  # term -> appears when i % mod == 0
RARE_TERMS = {"raretermaaa": (7,), "raretermbbb": (11, 23), "raretermccc": (13, 29, 31)}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the corpus's only source of pseudo-randomness."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _hash2(i: np.ndarray, j: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        mixed = i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + j.astype(
            np.uint64
        ) + np.uint64(seed) * np.uint64(0xD1B54A32D192ED03)
    return _splitmix64(mixed)


_VOCAB = None
_VOCAB_NOISY = None


def _vocab_arrays() -> tuple[np.ndarray, np.ndarray]:
    global _VOCAB, _VOCAB_NOISY
    if _VOCAB is None:
        _VOCAB = np.array([f"term{r:04d}" for r in range(VOCAB_SIZE + 1)], dtype=object)
        # Casing noise variant: tokenizer must fold it to the same term.
        _VOCAB_NOISY = np.array(
            [f"Term{r:04d}" for r in range(VOCAB_SIZE + 1)], dtype=object
        )
    return _VOCAB, _VOCAB_NOISY


def synthesize_transcripts_pdf(
    ids: np.ndarray, n_convs: int, turns_per_conv: int, seed: int = 42
) -> pd.DataFrame:
    """Generate transcript rows for the given global turn indices (vectorized)."""
    i = np.asarray(ids, dtype=np.int64)
    n = len(i)
    conv = i // turns_per_conv
    turn = (i % turns_per_conv).astype(np.int32)

    # Per-turn token count in [5, 120] (FIXTURES.md: 5-120 tokens/turn).
    dl = (5 + (_hash2(i, np.zeros_like(i), seed + 1) % np.uint64(116))).astype(np.int64)
    total = int(dl.sum())
    doc_of_tok = np.repeat(np.arange(n), dl)
    # Position of each token within its document.
    starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, dl)

    h = _hash2(i[doc_of_tok], j + 1, seed)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # Log-uniform rank over the vocabulary ~ Zipf(1) frequencies.
    ranks = np.minimum(
        np.floor(np.power(float(VOCAB_SIZE), u)).astype(np.int64), VOCAB_SIZE
    )
    vocab, vocab_noisy = _vocab_arrays()
    noisy = (h & np.uint64(0xF)) == np.uint64(0)  # ~1/16 tokens get casing noise
    toks = np.where(noisy, vocab_noisy[ranks], vocab[ranks])
    seps = _SEPS[(h >> np.uint64(4)).astype(np.int64) % len(_SEPS)]
    toks = pd.Series(toks, dtype=object).str.cat(pd.Series(seps, dtype=object))

    body = toks.groupby(doc_of_tok).agg("".join)
    text = pd.Series([""] * n, dtype=object)
    text.iloc[body.index] = body.values

    # Planted hot + rare terms appended after the stream.
    suffix = np.full(n, "", dtype=object)
    for term, mod in HOT_TERMS.items():
        mask = (i % mod) == 0
        suffix[mask] = suffix[mask] + f" {term}"
    for term, planted in RARE_TERMS.items():
        mask = np.isin(i, np.array(planted, dtype=np.int64))
        suffix[mask] = suffix[mask] + f" {term}"
    text = text.str.cat(pd.Series(suffix, dtype=object))

    ts = pd.to_datetime(_EPOCH + conv * 3600 + turn * 60, unit="s")
    tool = pd.Series(_TOOLS[(i % 7) % len(_TOOLS)], dtype=object)
    tool[tool == ""] = None

    return pd.DataFrame(
        {
            "conv_id": pd.Series([f"conv{c:08d}" for c in conv], dtype=object),
            "turn_idx": turn,
            "role": pd.Series(_ROLES[i % len(_ROLES)], dtype=object),
            "text": text.astype(object),
            "tool": tool,
            "ts": ts,
        }
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: spark.range -> mapInPandas kernel."""
    n = n_convs * turns_per_conv
    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield synthesize_transcripts_pdf(
                pdf["id"].to_numpy(), n_convs, turns_per_conv, seed
            )

    return rng.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def reference_queries(corpus_size: int) -> pd.DataFrame:
    """The reference query set (FIXTURES.md §2): single-term common/rare/hot/
    OOV, multi-term 2-6 term queries, a zero-match query, a duplicate-term
    query; k defaults 10 with edge cases 1, 100, k > corpus size."""
    rows = [
        (0, "term0001", 10),
        (1, "raretermaaa", 10),
        (2, "hotcommon", 10),
        (3, "zzzunknownterm", 10),  # OOV -> zero matches
        (4, "term0002 term0010", 10),
        (5, "term0001 term0003 term0007 raretermbbb", 10),
        (6, "term0004 term0005 term0006 term0011 term0012 term0013", 10),
        (7, "term0002 term0002", 10),  # duplicate-term query
        (8, "term0001", 1),
        (9, "hotfive term0008", 100),
        (10, "term0009", corpus_size * 2),  # k > corpus
        (11, "zzzalpha zzzbeta", 10),  # multi-term, zero matches
    ]
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"]).astype(
        {"query_id": np.int32, "k": np.int64}
    )
