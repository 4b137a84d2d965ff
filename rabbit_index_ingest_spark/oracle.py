"""Pure-Python BM25 oracle — the golden-output twin of the Spark engine.

Mirrors the reference's golden-output test style (exact expected payloads
against a mocked sink, /root/reference/tests/test_directory_updates.py:70-91)
upgraded to ranking: the engine's top-k must be rank- and score-identical
(6 dp) to this oracle on the fixture query set.

Formula (SURVEY.md §2.2 B5): ES 7.9.1 default similarity constants
k1=1.2, b=0.75; Lucene idf = ln(1 + (N − df + 0.5)/(df + 0.5)); classic
(k1+1) tf numerator (documented choice — Lucene ≥8 drops it, which is
rank-neutral). Scores in float64, per-doc accumulation in sorted-term order
so summation order is deterministic and matches the engine's discipline.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from .analysis import py_tokenize

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_key → text)."""

    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict = field(default_factory=dict)  # doc_key -> int
    postings: dict = field(default_factory=dict)  # term -> {doc_key: tf}

    @classmethod
    def build(cls, docs: list[tuple]) -> "OracleIndex":
        """docs: list of (doc_key, text). doc_key must be orderable."""
        idx = cls()
        total = 0
        for key, text in docs:
            toks = py_tokenize(text)
            idx.doc_len[key] = len(toks)
            total += len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[key] = tf
        idx.n_docs = len(docs)
        idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def idf(self, term: str) -> float:
        import math

        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query: str) -> dict:
        """doc_key -> float64 BM25 score; terms accumulated in sorted order."""
        terms = sorted(set(py_tokenize(query)))
        scores: dict = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for key, tf in plist.items():
                dl = self.doc_len[key]
                denom = tf + K1 * (1.0 - B + B * dl / self.avgdl)
                scores[key] = scores.get(key, 0.0) + idf * tf * (K1 + 1.0) / denom
        return scores

    def topk(self, query: str, k: int = 10) -> list[tuple]:
        """[(doc_key, score)] — ties broken by ascending doc_key."""
        scored = self.score(query)
        return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
