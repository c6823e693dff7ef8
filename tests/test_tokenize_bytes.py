"""tokenize_batch_bytes (the build kernel's byte-level tokenizer) must agree
with functions.tokenizer.tokenize_text token-for-token, including counts and
per-document assignment. Property-tested over adversarial ASCII and checked
on UTF-8 (non-ASCII chars are separators in both implementations)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_text
from opensearch_jvector_plugin_spark.operators.segment import (
    tokenize_batch_bytes,
)


def reconstruct(texts):
    codes, doc_of_tok, dl, terms = tokenize_batch_bytes(texts, len(texts))
    per_doc = [[] for _ in texts]
    for c, d in zip(codes, doc_of_tok):
        per_doc[int(d)].append(terms[int(c)])
    return per_doc, dl


def check(texts):
    per_doc, dl = reconstruct(texts)
    for i, t in enumerate(texts):
        want = tokenize_text(t)
        # Byte path yields tokens in doc order? No — codes/doc pairs come in
        # text order, so per_doc preserves order.
        assert per_doc[i] == want, (t, per_doc[i], want)
        assert dl[i] == len(want)


ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=200
)

# Beyond ASCII: arbitrary BMP chars plus a boosted dose of the two
# fold-relevant codepoints (U+212A, U+0130) and near-miss case-mapping
# chars (ſ U+017F, İ's friends) — the byte scanner must stay in lockstep
# with tokenize_text on all of them.
UNICODE_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        st.sampled_from("KİẛKiIÅßΩé9 z"),
    ),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8))
def test_matches_reference_tokenizer_ascii(texts):
    check(texts)


@settings(max_examples=300, deadline=None)
@given(st.lists(UNICODE_TEXT, min_size=1, max_size=6))
def test_matches_reference_tokenizer_unicode(texts):
    check(texts)


def test_hash_collision_falls_back_to_exact_keys(monkeypatch):
    """With a degenerate hash1 base (sum-of-bytes), long anagrams collide;
    the independent hash2 check must detect it and the exact-byte-key
    fallback must keep term identity correct. (Tokens <= PACK_MAX chars are
    injectively packed — collisions are impossible there by construction —
    so the colliding pair must be longer than PACK_MAX.)"""
    from opensearch_jvector_plugin_spark.operators import segment as seg

    monkeypatch.setattr(seg, "_HASH_B", np.uint64(1))
    # 12-char anagrams now share hash1 (same byte sum, same length).
    check(["abcdefghijkl lkjihgfedcba", "lkjihgfedcba abcdefghijkl zz"])


def test_short_tokens_injective_no_hash_path():
    """Every token <= PACK_MAX chars gets an injective packed code: a batch
    of all-distinct short tokens must produce exactly that many terms."""
    toks = [f"t{i:04d}" for i in range(2000)]
    per_doc, dl = reconstruct([" ".join(toks)])
    assert per_doc[0] == toks
    assert dl[0] == 2000


def test_unicode_fold_lockstep():
    # U+212A KELVIN SIGN folds to 'k' mid-token; U+0130 folds to 'i'.
    check(["Kelvin temp", "İstanbul", "noİk", "aKb"])


def test_edge_inputs():
    check(["", "   ", "\x00\x00", "a", "A", "0", "aA0zZ9"])
    check(["a" * 500])            # token longer than typical
    check(["nul\x00inside", "tab\tsep", "7bit!@#$%^&*()"])
    check([None, "x"])            # None -> empty


def test_non_ascii_is_separator():
    # é, Ω, emoji: separators in both the regex path (not [a-z0-9]) and the
    # byte path (bytes >= 0x80). ASCII-only contract documented in
    # functions/tokenizer.py.
    check(["café bar", "Ωmega42", "e\U0001f600moji"])


def test_token_order_within_doc_is_text_order():
    per_doc, _ = reconstruct(["zebra apple zebra 42 apple"])
    assert per_doc[0] == ["zebra", "apple", "zebra", "42", "apple"]
