"""Golden/property tests for the corpus-curation operators (duplicate-n-gram
coverage, repetition ratios, contamination), the prefix-filtered exact
similarity join, and triangle counting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.curation import (
    dup_ngram_coverage,
    ngram_contamination,
    ngram_stream,
    repetition_ratios,
)
from big_data_analytics_mini_projects_spark.operators.graphs import triangle_count
from big_data_analytics_mini_projects_spark.operators.similarity import (
    jaccard_prefix_pairs,
    ngram_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t.split()) for i, t in rows], "doc_id long, toks array<string>"
    )


def test_ngram_stream_keeps_multiplicity(spark):
    docs = _docs(spark, [(1, "a b a b a")])
    grams = sorted(r["gram"] for r in ngram_stream(docs, 2).collect())
    # positional bigrams: a b, b a, a b, b a — duplicates preserved
    assert grams == ["a b", "a b", "b a", "b a"]
    assert ngram_stream(_docs(spark, [(2, "only one tok".split()[0])]), 2).count() == 0


def test_dup_ngram_coverage_golden(spark):
    # doc1 and doc2 share the bigram "x y"; doc3 shares nothing.
    docs = _docs(spark, [(1, "x y z"), (2, "w x y"), (3, "p q r")])
    cov = {
        r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_frac"])
        for r in dup_ngram_coverage(ngram_stream(docs, 2)).collect()
    }
    assert cov[1] == (2, 1, 0.5)
    assert cov[2] == (2, 1, 0.5)
    assert cov[3] == (2, 0, 0.0)


def test_repetition_ratios_golden(spark):
    docs = _docs(spark, [(1, "a a a b"), (2, "u v w x")])
    rep = {
        r["doc_id"]: (r["n_tokens"], r["top_token_frac"], r["top_bigram_frac"])
        for r in repetition_ratios(docs).collect()
    }
    # doc1: top token a (3/4); top bigram "a a" twice -> 2*2/4 = 1.0
    assert rep[1] == (4, 0.75, 1.0)
    # doc2: all distinct -> 1/4 and 2*1/4
    assert rep[2] == (4, 0.25, 0.5)


def test_ngram_contamination_only_cross_split(spark):
    # doc 20 is held out (20 % 20 == 0); docs 1,2 share grams with it,
    # doc 3 only shares with another TRAIN doc -> must not appear.
    sh = spark.createDataFrame(
        [
            (20, "g1"),
            (20, "g2"),
            (1, "g1"),
            (2, "g1"),
            (2, "g2"),
            (3, "g9"),
            (4, "g9"),
        ],
        "doc_id long, shingle string",
    )
    out = {
        r["doc_id"]: (r["n_test_docs"], r["n_shared_shingles"])
        for r in ngram_contamination(sh, test_mod=20).collect()
    }
    assert out == {1: (1, 1), 2: (1, 2)}


def test_jaccard_prefix_exact_recall_vs_all_pairs(spark):
    """The prefix join must equal the naive all-pairs join exactly — the
    AllPairs prefix theorem promises zero dropped pairs."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today ok"),
        (2, "the quick brown fox jumps over the lazy dog today no"),  # near-dup of 1
        (3, "a completely different document about spark and scale"),
        (4, "a completely different document about spark and speed"),  # near-dup of 3
        (5, "nothing in common with anything else at all here now"),
    ]
    docs = _docs(spark, rows)
    sh = ngram_shingles(docs, n=3).persist()
    got = {
        (r["ka"], r["kb"]): (r["n_common"], round(r["jaccard"], 6))
        for r in jaccard_prefix_pairs(sh, tau_tenths=3).collect()
    }
    # brute-force truth
    a = sh.select(F.col("doc_id").alias("ka"), "shingle")
    b = sh.select(F.col("doc_id").alias("kb"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        a.join(b, "shingle")
        .filter(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = {}
    nsz = {r["doc_id"]: r["n"] for r in sizes.collect()}
    for r in common.collect():
        u = nsz[r["ka"]] + nsz[r["kb"]] - r["c"]
        if 10 * r["c"] >= 3 * u:
            truth[(r["ka"], r["kb"])] = (r["c"], round(r["c"] / u, 6))
    assert got == truth
    assert (1, 2) in got and (3, 4) in got and (1, 5) not in got


def test_triangle_count_golden(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5; edges given
    # with duplicates, reversals and a self-loop to exercise canonicalization.
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (5, 7, 4)


def test_triangle_count_triangle_free(spark):
    # star graph: no triangles regardless of hub degree
    df = spark.createDataFrame([(0, i) for i in range(1, 8)], "u long, v long")
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (8, 7, 0)


def test_pack_sequences_golden(spark):
    docs = spark.createDataFrame(
        [(0, ["w"] * 3), (1, ["w"] * 4), (2, ["w"] * 2), (3, ["w"] * 6)],
        "doc_id long, toks array<string>",
    )
    from big_data_analytics_mini_projects_spark.operators.curation import (
        pack_sequences,
    )
    # shard_size=2 -> shards {0,1}; ctx=3: doc1 starts at offset 3 -> bin 1;
    # doc3 starts at offset 2 -> bin 0.
    out = {
        (r["shard"], r["seq_bin"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(docs, ctx=3, shard_size=2).collect()
    }
    assert out == {(0, 0): (1, 3), (0, 1): (1, 4), (1, 0): (2, 8)}


def test_diversity_closed_form_matches_pairs(spark):
    from big_data_analytics_mini_projects_spark.operators.vector import (
        diversity_by_group,
    )
    rows = [
        ("a", [1.0, 0.0]), ("a", [0.0, 1.0]), ("a", [1.0, 1.0]),
        ("b", [2.0, 0.0]), ("b", [0.0, 0.0]),
        ("c", [5.0, 5.0]),  # n=1 -> excluded
    ]
    df = spark.createDataFrame(rows, "label string, v array<double>")
    out = {
        r["label"]: (r["n"], r["avg_sq_norm"], r["mean_pair_sqdist"])
        for r in diversity_by_group(df, key="label").collect()
    }
    assert out["a"][0] == 3
    assert out["a"][2] == pytest.approx(4 / 3, abs=1e-9)  # (2+1+1)/3
    assert out["b"] == (2, 2.0, 4.0)
    assert "c" not in out


def test_multiprobe_finds_duplicate_vector(spark):
    from big_data_analytics_mini_projects_spark.operators.vector import (
        EMB_DIM,
        cosine_topk_multiprobe,
        prepare_vectors,
    )
    base = [float((i * 7) % 5 - 2) or 1.0 for i in range(EMB_DIM)]
    anti = [-x for x in base]
    rows = [(0, base), (1, base), (2, anti)]
    emb = prepare_vectors(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    out = cosine_topk_multiprobe(emb, emb.filter(F.col("vec_id") == 0), k=1)
    r = out.collect()
    assert len(r) == 1 and r[0]["neighbor_id"] == 1
    assert r[0]["cos"] == pytest.approx(1.0, abs=1e-12)


def test_merge_snapshot_one_sided_keys(spark):
    from big_data_analytics_mini_projects_spark.operators.relational import (
        merge_snapshot,
    )
    schema = "user_id long, n_events long, first_ts long, last_ts long"
    base = spark.createDataFrame(
        [(1, 3, 100, 300), (2, 1, 50, 50)], schema
    )
    delta = spark.createDataFrame(
        [(2, 2, 400, 500), (3, 4, 10, 20)], schema
    )
    out = {
        r["user_id"]: (r["n_events"], r["first_ts"], r["last_ts"])
        for r in merge_snapshot(base, delta).collect()
    }
    assert out == {
        1: (3, 100, 300),   # only in base -> unchanged
        2: (3, 50, 500),    # both -> counts add, min/max span
        3: (4, 10, 20),     # only in delta -> inserted
    }


def test_normalize_url_canonical_forms(spark):
    """URL canonicalization (round-6 curation stage): scheme, leading www.,
    query string, fragment, trailing slashes, and case all collapse; path
    structure and non-leading 'www' substrings survive."""
    from big_data_analytics_mini_projects_spark.operators.curation import normalize_url

    cases = [
        ("https://www.Example.COM/A/B?q=1#frag", "example.com/a/b"),
        ("http://example.com/a/b/", "example.com/a/b"),
        ("example.com/a/b///", "example.com/a/b"),
        ("https://example.com", "example.com"),
        ("http://www.example.com/?utm=x", "example.com"),
        ("https://sub.wwwhost.com/x", "sub.wwwhost.com/x"),  # non-leading www kept
        ("https://example.com/path#a?b", "example.com/path"),  # frag stripped first
    ]
    df = spark.createDataFrame(cases, "url string, want string").select(
        "want", normalize_url("url").alias("got")
    )
    for r in df.collect():
        assert r["got"] == r["want"], (r["got"], r["want"])
