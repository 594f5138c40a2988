"""Pure-Python reference implementation of the engine semantics
(SURVEY.md §2) — the rank-identity oracle.

Replays: analysis chain -> docid assignment (ORDER BY pid, 1-based,
empty-token docs skipped) -> doc_len incl. blank tokens -> postings
excl. blank tokens -> df/idf/lexicon stats -> DAAT scoring (sum in
query-term order) -> top-k by (score DESC, docid ASC).

Tie note: the reference's k-heap evicts among equal-min scores in
JVM-heap order (QueryProcesserTest's tfidf golden pins one such case);
we standardize (score DESC, docid ASC) — identical whenever the
boundary score is untied, which holds for all BM25 goldens.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchengine_spark.functions.analysis import process_text
from searchengine_spark.functions.jmath import jlog10 as _log10

K1 = 1.5
B = 0.75


@dataclass
class PyIndex:
    stem_stop: bool = True
    n_docs: int = 0
    total_doc_len: int = 0
    doc_len: dict[int, int] = field(default_factory=dict)
    pid_of: dict[int, str] = field(default_factory=dict)
    # term -> list[(docid, tf)] sorted by docid
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    idf: dict[str, float] = field(default_factory=dict)

    @classmethod
    def from_docs(cls, docs: list[tuple[str, str]], stem_stop: bool = True) -> "PyIndex":
        idx = cls(stem_stop=stem_stop)
        docid = 0
        for pid, content in sorted(docs, key=lambda x: x[0]):
            tokens = process_text(content, stem_stop)
            if not tokens:  # empty-doc skip (Spimi.java:260-261)
                continue
            docid += 1
            idx.doc_len[docid] = len(tokens)  # blanks count (Spimi.java:264)
            idx.pid_of[docid] = pid
            idx.total_doc_len += len(tokens)
            tf: dict[str, int] = {}
            for t in tokens:
                if t != "":  # blanks: no postings (Spimi.java:282-286)
                    tf[t] = tf.get(t, 0) + 1
            for t, f in tf.items():
                idx.postings.setdefault(t, []).append((docid, f))
        idx.n_docs = docid
        for t, pl in idx.postings.items():
            idx.idf[t] = _log10(idx.n_docs / float(len(pl)))
        return idx

    @classmethod
    def from_state(
        cls,
        postings: dict[str, list[tuple[int, int]]],
        doc_len: dict[int, int],
        n_docs: int,
        total_doc_len: int,
        idf: dict[str, float] | None = None,
        pid_of: dict[int, str] | None = None,
        stem_stop: bool = False,
    ) -> "PyIndex":
        idx = cls(
            stem_stop=stem_stop,
            n_docs=n_docs,
            total_doc_len=total_doc_len,
            doc_len=dict(doc_len),
            pid_of=pid_of or {d: str(d) for d in doc_len},
            postings={t: sorted(pl) for t, pl in postings.items()},
        )
        idx.idf = idf or {
            t: _log10(n_docs / float(len(pl))) for t, pl in idx.postings.items()
        }
        return idx

    # -- scoring (Scorer.java:40-64, bit-exact operation order) ----------

    def _partial(self, scoring: str, term: str, docid: int, tf: int) -> float:
        idf = self.idf[term]
        ltf = 1 + _log10(tf)
        if scoring == "bm25":
            doc_len = self.doc_len[docid]
            avgdl = self.total_doc_len / self.n_docs
            return idf * ltf / (ltf + K1 * (1 - B + B * doc_len / avgdl))
        return idf * ltf

    def query_terms(self, text: str) -> list[str]:
        seen: dict[str, None] = {}
        for t in process_text(text, self.stem_stop):
            seen.setdefault(t, None)
        return list(seen)

    def top_k(
        self,
        text: str,
        k: int = 10,
        conjunctive: bool = False,
        scoring: str = "bm25",
        terms: list[str] | None = None,
    ) -> list[tuple[int, str, float]]:
        """Returns [(docid, pid, score)] ordered score DESC, docid ASC.
        ``terms`` bypasses the analysis chain (fixture tests)."""
        if terms is None:
            terms = self.query_terms(text)
        if not terms:
            return []
        missing = [t for t in terms if t not in self.postings]
        if conjunctive and missing:
            return []
        present = [t for t in terms if t in self.postings]
        if not present:
            return []
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for t in present:  # query-term order = DAAT list order
            for docid, tf in self.postings[t]:
                scores[docid] = scores.get(docid, 0.0) + self._partial(
                    scoring, t, docid, tf
                )
                hits[docid] = hits.get(docid, 0) + 1
        if conjunctive:
            scores = {d: s for d, s in scores.items() if hits[d] == len(present)}
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        return [(d, self.pid_of.get(d, str(d)), s) for d, s in ranked]

    # -- lexicon stats (VocabularyEntry semantics) ------------------------

    def lexicon_entry(self, term: str) -> dict:
        pl = self.postings[term]
        df = len(pl)
        idf = self.idf[term]
        max_tf = max(tf for _, tf in pl)
        # streaming strict-> argmax of tf/(tf+dl), first maximizer wins
        bm25_tf, bm25_dl = 0, 1
        for docid, tf in pl:
            dl = self.doc_len[docid]
            cur = bm25_tf / float(bm25_dl + bm25_tf)
            new = tf / float(dl + tf)
            if new > cur:
                bm25_tf, bm25_dl = tf, dl
        avgdl = self.total_doc_len / self.n_docs
        return {
            "term": term,
            "df": df,
            "idf": idf,
            "max_tf": max_tf,
            "bm25_tf": bm25_tf,
            "bm25_dl": bm25_dl,
            "tub_tfidf": (1 + _log10(max_tf)) * idf,
            "tub_bm25": (idf * bm25_tf)
            / (bm25_tf + K1 * (1 - B + B * bm25_dl / avgdl)),
        }
