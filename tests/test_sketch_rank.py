"""Semantic pins for the sketch/LM/retrieval batch: Count-Min heavy
hitters (one-sided error, planted-skew detection, cell-wise merge),
the CCNet bigram-LM perplexity gate (hand replay of LM training +
smoothed costs + the percentile cut), and integer BM25 (hand replay of
the exact rational arithmetic, query-band selection, tie-break)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _events(spark, n=3000):
    """The planted-skew host stream from q_cms_heavy_hitters, inline:
    30% of events on 3 hot hosts, the rest spread over 97 cold."""
    return spark.range(n).select(
        F.when(
            F.pmod("id", F.lit(100)) < 30,
            F.concat(F.lit("hot"), F.pmod("id", F.lit(3)).cast("string")),
        )
        .otherwise(F.concat(F.lit("h"), F.pmod("id", F.lit(97)).cast("string")))
        .alias("host")
    )


class TestCMS:
    def test_one_sided_and_planted_heavy(self, spark):
        from cola_spark.operators.cardinality import cms_cells, cms_estimate

        ev = _events(spark)
        cells = cms_cells(ev, "host")
        cand = ev.select("host").distinct()
        est = {r["host"]: r["est"] for r in cms_estimate(cells, cand, "host").collect()}
        exact = {
            r["host"]: r["cnt"]
            for r in ev.groupBy("host").agg(F.count("*").alias("cnt")).collect()
        }
        total = sum(exact.values())
        # CMS guarantee: never under-estimates
        for h, e in exact.items():
            assert est[h] >= e, (h, est[h], e)
        heavy = {h for h, e in est.items() if e * 1000 >= 50 * total}
        assert heavy == {"hot0", "hot1", "hot2"}

    def test_cells_merge_is_union(self, spark):
        from cola_spark.operators.cardinality import cms_cells, cms_merge

        ev = _events(spark, 2000).withColumn("_i", F.monotonically_increasing_id())
        # deterministic disjoint split on the source id, union == full
        base = spark.range(2000)
        mk = lambda df: df.select(  # noqa: E731
            F.when(
                F.pmod("id", F.lit(100)) < 30,
                F.concat(F.lit("hot"), F.pmod("id", F.lit(3)).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("h"), F.pmod("id", F.lit(97)).cast("string"))
            )
            .alias("host")
        )
        a = mk(base.filter("id % 5 < 2"))
        b = mk(base.filter("id % 5 >= 2"))
        ev = mk(base)
        merged = {
            (r["r"], r["p"]): r["cnt"]
            for r in cms_merge(cms_cells(a, "host"), cms_cells(b, "host")).collect()
        }
        full = {
            (r["r"], r["p"]): r["cnt"] for r in cms_cells(ev, "host").collect()
        }
        assert merged == full

    def test_spine_is_complete(self, spark):
        from cola_spark.operators.cardinality import cms_cells

        cells = cms_cells(_events(spark, 100), "host", depth=2, width=16)
        rows = cells.collect()
        assert len(rows) == 32
        assert {(r["r"], r["p"]) for r in rows} == {
            (r, p) for r in range(2) for p in range(16)
        }


def _bucket(doc_id: str, seed: str = "lmref") -> int:
    return int(
        hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16
    ) % 1000


class TestPerplexityGate:
    def _corpus(self, spark):
        # deterministically pick ids so the ref slice (bucket < 250) and
        # the scored side are BOTH populated
        ref_ids = [i for i in range(200) if _bucket(str(i)) < 250][:3]
        raw_ids = [i for i in range(200) if _bucket(str(i)) >= 250][:4]
        texts = {
            ref_ids[0]: "a b c a b",
            ref_ids[1]: "a b a b",
            ref_ids[2]: "c c c",
            raw_ids[0]: "a b c",        # all bigrams in-LM: cheap
            raw_ids[1]: "x y z",        # nothing in-LM: expensive
            raw_ids[2]: "a b x",        # mixed
            raw_ids[3]: "b a",          # seen words, unseen bigram
        }
        rows = [(str(i), t) for i, t in texts.items()]
        return (
            spark.createDataFrame(rows, "doc_id string, text string"),
            {str(i): t for i, t in texts.items()},
            [str(i) for i in ref_ids],
        )

    def _replay(self, texts, ref_ids):
        """Pure-Python bigram LM replay: add-one costs in fl2 bits."""
        def grams(t):
            w = t.split()
            return [(w[i], w[i + 1]) for i in range(len(w) - 1)]

        c12, c1, w2s = {}, {}, set()
        for i in ref_ids:
            for g in grams(texts[i]):
                c12[g] = c12.get(g, 0) + 1
                c1[g[0]] = c1.get(g[0], 0) + 1
                w2s.add(g[1])
        v = len(w2s) + 1
        fl2 = lambda x: x.bit_length() - 1  # noqa: E731
        out = {}
        for i, t in texts.items():
            gs = grams(t)
            if not gs:
                continue
            bits = [
                fl2(c1.get(g[0], 0) + v) - fl2(c12.get(g, 0) + 1) for g in gs
            ]
            out[i] = (len(gs), sum(bits), 1000 * sum(bits) // len(gs))
        return out

    def test_hand_replay_and_percentile_cut(self, spark):
        from cola_spark.operators.textstats import ngram_lm_perplexity

        docs, texts, ref_ids = self._corpus(spark)
        got = {
            r["doc_id"]: r
            for r in ngram_lm_perplexity(docs, keep_permille=300).collect()
        }
        want = self._replay(texts, ref_ids)
        assert set(got) == set(want)
        for i, (nb, sb, ppl) in want.items():
            r = got[i]
            assert (r["n_bigrams"], r["sum_bits"], r["ppl_millibits"]) == (
                nb, sb, ppl,
            ), i
            assert r["is_ref"] == (i in ref_ids)
            assert r["sum_bits"] >= 0
        # percentile cut: bottom 300 permille by (ppl, doc_id)
        order = sorted(got.values(), key=lambda r: (r["ppl_millibits"], r["doc_id"]))
        tot = len(order)
        for rank, r in enumerate(order, start=1):
            assert r["ppl_rank"] == rank
            assert r["is_kept"] == (rank * 1000 <= 300 * tot)
        # the all-unseen doc must cost strictly more per bigram than the
        # all-seen doc (the gate discriminates)
        unseen = [r for r in got.values() if texts[r["doc_id"]] == "x y z"][0]
        seen = [r for r in got.values() if texts[r["doc_id"]] == "a b c"][0]
        assert unseen["ppl_millibits"] > seen["ppl_millibits"]


class TestBM25:
    def _corpus(self, spark):
        rows = [
            ("d1", "apple banana apple cherry"),
            ("d2", "apple banana banana"),
            ("d3", "cherry cherry cherry cherry"),
            ("d4", "apple date elderberry fig grape"),
            ("d5", "banana date"),
        ]
        return spark.createDataFrame(rows, "doc_id string, text string"), rows

    def _replay(self, rows, skip, take, k):
        tf, dl, dfq = {}, {}, {}
        for d, t in rows:
            ws = t.split()
            dl[d] = len(ws)
            for w in ws:
                tf[(d, w)] = tf.get((d, w), 0) + 1
        for (d, w) in tf:
            dfq[w] = dfq.get(w, 0) + 1
        n_docs = len(dl)
        avgdl = sum(dl.values()) // n_docs
        band = sorted(dfq.items(), key=lambda x: (-x[1], x[0]))[skip: skip + take]
        qt = dict(band)
        scores = {}
        for (d, w), f in tf.items():
            if w not in qt:
                continue
            term = (44000 * avgdl * f) // (20 * avgdl * f + 6 * avgdl + 18 * dl[d])
            idf = (1000 * n_docs) // qt[w]
            s, n = scores.get(d, (0, 0))
            scores[d] = (s + idf * term, n + 1)
        ranked = sorted(scores.items(), key=lambda x: (-x[1][0], x[0]))[:k]
        return [
            (d, dl[d], n, s, i + 1)
            for i, (d, (s, n)) in enumerate(ranked)
        ], avgdl

    def test_hand_replay(self, spark):
        from cola_spark.operators.textstats import bm25_topk

        docs, rows = self._corpus(spark)
        got = [
            (r["doc_id"], r["dl"], r["n_q_terms"], r["score"], r["rnk"])
            for r in bm25_topk(docs, skip=1, take=2, k=4)
            .orderBy("rnk")
            .collect()
        ]
        want, _ = self._replay(rows, skip=1, take=2, k=4)
        assert got == want

    def test_saturation_monotone_in_tf(self, spark):
        # same dl, higher tf of a query term => never scores lower
        avgdl, dl = 4, 4
        term = lambda f: (44000 * avgdl * f) // (  # noqa: E731
            20 * avgdl * f + 6 * avgdl + 18 * dl
        )
        vals = [term(f) for f in range(1, 12)]
        assert vals == sorted(vals)
        # and saturates below (k1+1) = 2.2 => 2200 permille
        assert vals[-1] < 2200


@pytest.mark.parametrize("parts", [3, 16])
def test_cms_partition_invariance(spark, parts):
    from cola_spark.operators.cardinality import cms_cells

    ev = _events(spark).repartition(parts)
    cells = {
        (r["r"], r["p"]): r["cnt"] for r in cms_cells(ev, "host").collect()
    }
    base = {
        (r["r"], r["p"]): r["cnt"] for r in cms_cells(_events(spark), "host").collect()
    }
    assert cells == base


class TestGopherRules:
    def test_each_rule_fires(self, spark):
        from cola_spark.operators.textstats import gopher_rules

        fluent = " ".join(["word alpha beta gamma delta"] * 12)  # 60 words
        rows = [
            ("ok", fluent + " the of"),                      # passes all
            ("short", "just nine little words here now ok a b"),  # words_lo
            ("bullets", "- one\n- two\n" + fluent + " the of"),   # bullet
            ("ellip", fluent + " the of\nfoo...\nbar..."),        # ellipsis
            ("symbols", fluent + " the of ##########"),          # symbol
            ("numeric", fluent + " the of " + " ".join("7" * 1 for _ in range(40))),  # alpha
            ("nostop", fluent + " the"),                      # only 1 stopword
        ]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
        assert got["ok"]["keep"]
        assert not got["short"]["r_words_lo"] and not got["short"]["keep"]
        assert not got["bullets"]["r_bullet"] and got["bullets"]["r_words_lo"]
        assert not got["ellip"]["r_ellipsis"] and got["ellip"]["r_bullet"]
        assert not got["symbols"]["r_symbol"]
        assert not got["numeric"]["r_alpha"]
        assert not got["nostop"]["r_stop"] and got["nostop"]["r_symbol"]
        # integer cross-multiplication replay for one doc
        b = got["bullets"]
        assert b["n_lines"] == 3 and b["n_bullet"] == 2
        assert (b["n_bullet"] * 1000 <= b["n_lines"] * 100) == b["r_bullet"]

    def test_counts_replay(self, spark):
        from cola_spark.operators.textstats import (
            GOPHER_STOPWORDS,
            gopher_rules,
        )

        text = "the cat... sat # on the of mat...\n- b one\nplain line"
        docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
        r = gopher_rules(docs).collect()[0]
        toks = text.split()
        assert r["n_words"] == len(toks)
        assert r["mean_len_milli"] == 1000 * sum(len(t) for t in toks) // len(toks)
        assert r["n_stop"] == len(
            {t for t in toks if t in GOPHER_STOPWORDS}
        )
        assert r["n_symbol"] == text.count("#") + text.count("...")
        lines = text.split("\n")
        assert r["n_lines"] == len(lines)
        assert r["n_bullet"] == sum(1 for l in lines if l.startswith("- "))
        assert r["n_ellip_line"] == sum(1 for l in lines if l.endswith("..."))
