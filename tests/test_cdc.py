"""Content-defined chunking semantics (operators/textdedup.cdc_chunks).

Beyond the cross-engine oracle pair (cdc_chunk_dedup in
test_oracle_pairs), these pin the properties that make CDC the right
dedup modality for a crawl archive:

- tiling: chunks partition [1, n] exactly — disjoint, gap-free, in
  order — and rebuilding the text from chunk ranges is the identity;
- boundary locality (the FastCDC/LBFS property): prepending tokens to
  a document realigns at most the chunks up to the first content
  boundary after the edit — every boundary whose window lies fully
  inside the shared suffix survives, so the shared suffix re-chunks
  identically and dedups against the old snapshot;
- fixed-width chunking fails that same test (the control).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import cdc_chunks, cdc_duplicate_chunks

W, MASK = 4, 2


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _words(i):
    return f"w{i * 7919 % 1000}"


@pytest.fixture(scope="module")
def corpus(spark):
    long_text = " ".join(_words(i) for i in range(400))
    return _mkdocs(
        spark,
        [
            ("a", long_text),
            ("b", "alpha beta " + long_text),  # 2-token prepend, shared suffix
            ("tiny", "one two"),  # shorter than the window
            ("empty", ""),
        ],
    )


def test_chunks_tile_documents(spark, corpus):
    ch = cdc_chunks(corpus, w=W, mask_bits=MASK, hash_kind="md5").orderBy(
        "doc_id", "s"
    )
    rows = ch.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert set(by_doc) == set(n_tokens)
    for doc, cl in by_doc.items():
        assert cl[0].s == 1
        assert cl[-1].e == n_tokens[doc]
        for prev, cur in zip(cl, cl[1:]):
            assert cur.s == prev.e + 1  # gap-free and disjoint
        assert all(c.tok_len == c.e - c.s + 1 for c in cl)


def test_rebuild_is_identity(spark, corpus):
    ch = cdc_chunks(corpus, w=W, mask_bits=MASK, hash_kind="md5")
    toks = corpus.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("ws")
    )
    rebuilt = (
        ch.join(toks, "doc_id")
        .select(
            "doc_id", "s",
            F.array_join(
                F.slice("ws", F.col("s"), F.col("e") - F.col("s") + 1), " "
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("s", "part"))).getField("part"), " ").alias("txt"))
    )
    got = {r.doc_id: r.txt for r in rebuilt.collect()}
    want = {r.doc_id: " ".join(r.text.strip().split()) for r in corpus.collect()}
    assert got == want


def test_boundary_locality_on_prepend(spark, corpus):
    """Docs a and b share a 400-token suffix; after the first shared
    content boundary their chunk-hash streams must coincide — the
    property that makes a re-crawled page store only changed chunks."""
    ch = cdc_chunks(corpus, w=W, mask_bits=MASK, hash_kind="md5")
    seq = {
        doc: [r.chunk_hash for r in ch.filter(F.col("doc_id") == doc)
              .orderBy("s").collect()]
        for doc in ("a", "b")
    }
    assert len(seq["a"]) > 10  # mask_bits=2 → expected chunk ~8 tokens
    # drop leading chunks until the streams align, then demand a long
    # identical tail (>= all but the first few chunks realigned)
    tail_a, tail_b = seq["a"], seq["b"]
    for skip in range(4):
        if tail_a[skip:] and tail_a[skip] in tail_b:
            j = tail_b.index(tail_a[skip])
            if tail_a[skip:] == tail_b[j:]:
                realigned = skip
                break
    else:
        pytest.fail(f"chunk streams never realigned: {seq}")
    assert realigned <= 2, f"CDC realigned only after {realigned} chunks"

    # control: fixed-width chunking of the same two token streams never
    # realigns after a 2-token prepend (2 % width != 0)
    width = (1 << MASK) + W
    toks_a = corpus.filter("doc_id = 'a'").collect()[0].text.split()
    toks_b = corpus.filter("doc_id = 'b'").collect()[0].text.split()
    fixed_a = [" ".join(toks_a[i:i + width]) for i in range(0, len(toks_a), width)]
    fixed_b = [" ".join(toks_b[i:i + width]) for i in range(0, len(toks_b), width)]
    assert not set(fixed_a[1:]) & set(fixed_b[1:])


def test_duplicate_chunks_counts(spark):
    shared = " ".join(_words(i) for i in range(200))
    docs = _mkdocs(
        spark,
        [("x", shared), ("y", shared), ("z", "pre1 pre2 pre3 " + shared)],
    )
    dup = cdc_duplicate_chunks(docs, w=W, mask_bits=MASK, hash_kind="md5")
    rows = {r.chunk_hash: r for r in dup.collect()}
    assert rows, "identical docs must share chunks"
    # x and y chunk identically: every duplicated chunk occurs in >= 2 docs
    assert all(r.n_docs >= 2 for r in rows.values())
    assert all(r.occ >= r.n_docs for r in rows.values())
    # z shares the aligned tail too: some chunk reaches all 3 docs
    assert any(r.n_docs == 3 for r in rows.values())


def test_plan_shape_two_scans_no_broadcast(spark):
    """Scale audit: cdc_duplicate_chunks reads its input exactly twice
    (window hashing + range re-slice; doc-end rows ride the boundary
    pass) and never broadcasts the corpus-sized token-array side of
    the re-slice join (shuffle_hash pinned — the bloom-gate rule)."""
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        cdc_duplicate_chunks(docs, w=W, mask_bits=MASK, hash_kind="md5")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"FileScan", plan)) == 2
    assert "BroadcastExchange" not in plan
