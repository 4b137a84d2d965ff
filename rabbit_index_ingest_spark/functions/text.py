"""Text-analysis column functions for training-data pipelines.

All pure built-in Column expressions (JVM codegen, no UDFs): language-ID
heuristic, quality scoring, token counting, shingling, fingerprinting.
Every function has an ANSI-SQL twin runnable in DuckDB (see
__spark_entry__.oracle_sql) — the generalization of the reference's only
content-bearing operator, the 00README text scrub (A13,
path_tools.py:221-235).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analysis import tokens_expr

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (no model).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
}


def token_count_expr(text: Column | str) -> Column:
    """Analyzer token count (≡ BM25 doc length)."""
    return F.size(tokens_expr(text))


def ws_token_count_expr(text: Column | str) -> Column:
    """Whitespace-split token count (the cheap 'word count')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit("")))


# BPE-ish pre-tokenization pattern (GPT-2-style, minus the \s+(?!\S)
# lookahead so the same pattern runs in Java regex AND DuckDB's RE2):
# a leading-space word, a leading-space number run, or a leading-space
# punctuation run. Counts approximate LLM token counts for budgeting.
BPE_ISH_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_token_count_expr(text: Column | str) -> Column:
    """Approximate LLM-token count via the BPE-ish pre-tokenizer regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio_expr(text: Column | str) -> Column:
    """Fraction of non-alnum-non-space chars — a quality feature."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(0.0)


def stopword_ratio_expr(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens_expr(text)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def quality_score_expr(text: Column | str) -> Column:
    """Composite document-quality score in [0,1]: favors mid-length docs,
    low punctuation density, some stopword mass (prose-likeness).
    Formula is deliberately simple + SQL-twin-able."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count_expr(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio_expr(c) * 4.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio_expr(c, "en") * 5.0, F.lit(1.0))
    return F.round((len_score + punct_pen + sw_score) / 3.0, 6)


def lang_scores_expr(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    toks = tokens_expr(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id_expr(text: Column | str) -> Column:
    """Predicted language = argmax stopword hits, ties → lexicographically
    first language code, zero hits → 'und' (BCP-47 undetermined)."""
    scores = lang_scores_expr(text)
    # struct max compares fields in order: hits, then -rank (so ties pick
    # the lexicographically-first language code), then the code itself.
    best = F.greatest(
        *[
            F.struct(
                scores[lang].alias("hits"),
                F.lit(-i).alias("neg_rank"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_STOPWORDS))
        ]
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def scrub_text_expr(text: Column | str) -> Column:
    """Content scrub (reference A13 — get_readme, path_tools.py:221-235):
    the reference decodes file bytes with errors='replace' then re-encodes
    with errors='ignore'. Note the re-encode is a near no-op in Python 3 —
    U+FFFD is valid UTF-8, so the reference golden value
    (tests/test_path_tools.py:117-125) *retains* its replacement chars.
    This engine's scrub deliberately generalizes beyond that round-trip:
    strip U+FFFD (the visible residue of invalid bytes) and all control
    characters except newline/tab — stricter normalization appropriate
    for an index over transcript text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, "[�\\p{Cc}&&[^\n\t]]", "")


def shingles_expr(text: Column | str, k: int = 3) -> Column:
    """Token k-gram shingles (space-joined strings). Empty/short docs →
    empty array."""
    toks = tokens_expr(text)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint_expr(text: Column | str, k: int = 3) -> Column:
    """Document fingerprint: the minimum md5 of its k-gram shingles
    (winnowing-style representative hash; md5-on-string so the DuckDB twin
    is bit-identical). Null for docs with < k tokens."""
    return F.array_min(F.transform(shingles_expr(text, k), F.md5))


def highlight_expr(
    text: Column | str, terms: list[str], width: int = 5
) -> Column:
    """Search-hit snippet (the ES ``highlight`` analogue), pure JVM
    codegen: the window of ``2·width+1`` analyzer tokens centred on the
    FIRST occurrence of any query term, matched tokens wrapped in
    ``<em>…</em>``, joined by single spaces. NULL when no term matches.

    Deterministic, analyzer-space semantics (lowercased tokens, original
    punctuation dropped) so the DuckDB twin is value-identical; ES's own
    highlighter works on the raw text, which no SQL twin could reproduce
    byte-for-byte.
    """
    toks = tokens_expr(text)
    lit_terms = F.array(*[F.lit(t) for t in terms])
    # two-arg transform lambda: (element, 0-based index) BY CONVENTION —
    # here the index is exactly what we want (first match position)
    idxs = F.transform(
        toks,
        lambda x, i: F.when(F.array_contains(lit_terms, x), i),
    )
    j = F.array_min(idxs)  # nulls skipped; NULL iff no match
    start0 = F.greatest(F.lit(0), j - width)
    snip = F.slice(toks, start0 + 1, 2 * width + 1)  # slice is 1-based
    wrapped = F.transform(
        snip,
        lambda x: F.when(
            F.array_contains(lit_terms, x),
            F.concat(F.lit("<em>"), x, F.lit("</em>")),
        ).otherwise(x),
    )
    return F.when(j.isNotNull(), F.array_join(wrapped, " "))


def phrase_highlight_expr(text: Column | str, phrase_tokens: list[str]) -> Column:
    """Char-level phrase highlighting over the ORIGINAL text (ES wraps
    the matched phrase SPAN, not stray single-term hits): every exact
    occurrence of the analyzed phrase — tokens separated by any run of
    non-token characters, each token a FULL token (guarded by zero-width
    lookarounds, which Java regex has and RE2 does not — hence no DuckDB
    twin; the oracle-checked path is the token-space
    ``functions.spans.phrase_spans``) — is wrapped in ``<em>…</em>``.
    Pure JVM ``regexp_replace``, whole-stage codegen.

    Matching is (?iu) case-insensitive over the raw text; exotic case
    folds that the analyzer's lower() collapses but Java's case-
    insensitive match does not (ß→ss) are a documented deviation —
    ASCII-safe by contract, pinned by tests."""
    import re as _re

    if not phrase_tokens or any(not t for t in phrase_tokens):
        raise ValueError(f"need non-empty phrase tokens, got {phrase_tokens!r}")
    c = F.col(text) if isinstance(text, str) else text
    sep = r"[^\p{L}\p{N}]+"
    body = sep.join(_re.escape(t) for t in phrase_tokens)
    pat = r"(?iu)(?<![\p{L}\p{N}])" + body + r"(?![\p{L}\p{N}])"
    return F.regexp_replace(c, pat, "<em>$0</em>")


# PII scrub patterns — ONE dialect-neutral regex set shared verbatim by
# the Spark expression (Java regex) and the DuckDB oracle twin (RE2):
# no lookarounds (RE2 has none), no backreferences, only \d/\s/\b and
# plain classes, which the two engines interpret identically. Order
# matters and is part of the contract: URLs first (they may embed
# emails/hosts), then emails, then IPs, then phone-like runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<url>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<ip>"),
    (r"\+?\d[\d\-\s()]{6,}\d", "<phone>"),
)


def pii_scrub_expr(text: Column | str) -> Column:
    """Mask common PII shapes (URLs, emails, IPv4s, phone-like digit
    runs) — the standard pre-training redaction pass, as a pure-JVM
    chained ``regexp_replace`` (whole-stage codegen; no Python in the
    hot path). Heuristic by design: the contract is the exact
    ``PII_PATTERNS`` list, applied in order, global replacement — the
    DuckDB twin applies the same list with the same flags, so the two
    engines agree byte-for-byte on any input, false positives included.
    At 100 TB this is a narrow projection fused into whatever scan or
    write surrounds it."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_scrub_sql(col: str) -> str:
    """DuckDB twin of ``pii_scrub_expr`` — same patterns, same order,
    global ('g') replacement."""
    expr = col
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
