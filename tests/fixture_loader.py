"""Parser for the reference's binary query-test fixtures
(/root/reference/queryHandler/src/test/data/): 140-byte vocabulary
records (VocabularyEntry.java:213-259), 72-byte document-index records
(DocumentIndexEntry.java:106-145), 32-byte block descriptors
(BlockDescriptor.java:108-130), VB-compressed docids and unary tfs.
All big-endian (Java NIO). Read-only consumption of public test data —
lets pytest assert our engine against the reference's own goldens.
"""

from __future__ import annotations

import struct
from pathlib import Path

from searchengine_spark.functions.codecs import unary_decode, vb_decode

FIXTURE_DIR = Path("/root/reference/queryHandler/src/test/data")


def load_fixture_index() -> dict:
    vocab = (FIXTURE_DIR / "vocabulary").read_bytes()
    blocks = (FIXTURE_DIR / "blockDescriptors").read_bytes()
    docs_bin = (FIXTURE_DIR / "invertedIndexDocs").read_bytes()
    freqs_bin = (FIXTURE_DIR / "invertedIndexFreqs").read_bytes()
    docidx = (FIXTURE_DIR / "documentIndex").read_bytes()

    doc_len: dict[int, int] = {}
    pid_of: dict[int, str] = {}
    for i in range(len(docidx) // 72):
        off = i * 72
        pid = docidx[off : off + 64].split(b"\0")[0].decode()
        docid, dl = struct.unpack_from(">ii", docidx, off + 64)
        doc_len[docid] = dl
        pid_of[docid] = pid

    postings: dict[str, list[tuple[int, int]]] = {}
    lexicon: dict[str, dict] = {}
    for i in range(len(vocab) // 140):
        off = i * 140
        term = vocab[off : off + 64].split(b"\0")[0].decode()
        df, idf = struct.unpack_from(">id", vocab, off + 64)
        max_tf, bm25_dl, bm25_tf = struct.unpack_from(">iii", vocab, off + 76)
        tub_tfidf, tub_bm25 = struct.unpack_from(">dd", vocab, off + 88)
        num_blocks, = struct.unpack_from(">i", vocab, off + 128)
        block_off, = struct.unpack_from(">q", vocab, off + 132)
        lexicon[term] = {
            "df": df, "idf": idf, "max_tf": max_tf,
            "bm25_dl": bm25_dl, "bm25_tf": bm25_tf,
            "tub_tfidf": tub_tfidf, "tub_bm25": tub_bm25,
        }
        pl: list[tuple[int, int]] = []
        for b in range(num_blocks):
            boff = block_off + b * 32
            (docid_off, docid_size, freq_off, freq_size,
             _max_docid, n_post) = struct.unpack_from(">qiqiii", blocks, boff)
            docids = vb_decode(docs_bin[docid_off : docid_off + docid_size], n_post)
            tfs = unary_decode(freqs_bin[freq_off : freq_off + freq_size], n_post)
            pl.extend(zip(docids.tolist(), tfs.tolist()))
        postings[term] = pl

    return {
        "postings": postings,
        "lexicon": lexicon,
        "doc_len": doc_len,
        "pid_of": pid_of,
        "n_docs": 8,          # QueryProcesserTest.java:31-32
        "total_doc_len": 61,
    }
