"""Targeted tests for the round-6-authored round7q batch: IVF nprobe recall,
containment semantics on a crafted fixture, the chunking empty-doc guard,
and the streaming token-budget twin's cross-micro-batch state carry.
(The oracle equality of every registered query is covered generically by
test_catalog_oracle.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.similarity import (
    containment_pairs,
    ngram_shingles,
)
from big_data_analytics_mini_projects_spark.operators.vector import (
    cosine_topk,
    cosine_topk_blocked,
    cosine_topk_ivf,
    prepare_vectors,
)
from big_data_analytics_mini_projects_spark.plans.round7q import (
    CHUNK_TOKS,
    IVF_K,
    IVF_QUERIES,
    chunk_col,
)
from big_data_analytics_mini_projects_spark.plans.shared import (
    TOKEN_BUDGET,
    embedding_vectors,
)
from big_data_analytics_mini_projects_spark.sources.tables import load_table


def _topk_sets(df):
    rows = df.select("query_id", "neighbor_id").collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_nprobe_recall_dominates_probe1(spark, sf_dir):
    """Multi-cell probing must recover at least as much of the brute-force
    top-k as probe-1 blocked search, per query and in total (the whole point
    of the nprobe dial)."""
    vecs = embedding_vectors(spark, sf_dir)
    qs = vecs.filter(F.col("vec_id") < IVF_QUERIES)
    brute = _topk_sets(cosine_topk(vecs, qs, IVF_K))
    p1 = _topk_sets(cosine_topk_blocked(vecs, qs, IVF_K))
    p3 = _topk_sets(cosine_topk_ivf(vecs, qs, IVF_K, nprobe=3))
    total_p1 = sum(len(brute[q] & p1.get(q, set())) for q in brute)
    total_p3 = sum(len(brute[q] & p3.get(q, set())) for q in brute)
    assert total_p3 >= total_p1
    # every query must emit a full (or cell-exhausting) candidate list
    for q, ns in p3.items():
        assert len(ns) == IVF_K, (q, len(ns))


def test_ivf_nprobe_full_probe_equals_brute_force(spark, sf_dir):
    """With nprobe = #cells the candidate set is the whole corpus, so IVF
    must reproduce brute force exactly (rank-for-rank)."""
    vecs = embedding_vectors(spark, sf_dir)
    qs = vecs.filter(F.col("vec_id") < 3)
    n_cells = vecs.select("label").distinct().count()
    ivf = cosine_topk_ivf(vecs, qs, 5, nprobe=n_cells)
    brute = cosine_topk(vecs, qs, 5)
    a = sorted(map(tuple, ivf.select("query_id", "rank", "neighbor_id").collect()))
    b = sorted(map(tuple, brute.select("query_id", "rank", "neighbor_id").collect()))
    assert a == b


@pytest.fixture()
def crafted_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return spark.createDataFrame(
        [
            # doc 1 = a strict prefix of doc 2 -> containment 1.0
            (1, base),
            (2, base + " lambda mu nu xi omicron pi rho sigma tau"),
            # doc 3 unrelated
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )


def test_containment_finds_embedded_doc(spark, crafted_docs):
    toks = crafted_docs.select(
        "doc_id", F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks")
    )
    sh = ngram_shingles(toks, n=3)
    out = containment_pairs(sh, min_containment=0.9, df_cap=500).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["inner_doc"], r["outer_doc"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["n_inner"] == 8  # 10 tokens -> 8 distinct trigrams


def test_containment_asymmetric_vs_jaccard(spark, crafted_docs):
    """The fixture pair scores 1.0 containment but well under 0.5 Jaccard —
    the case class this operator exists for."""
    from big_data_analytics_mini_projects_spark.operators.similarity import (
        ngram_jaccard_pairs,
    )

    toks = crafted_docs.select(
        "doc_id", F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks")
    )
    sh = ngram_shingles(toks, n=3)
    jac = ngram_jaccard_pairs(sh, min_jaccard=0.0, df_cap=500).collect()
    pair = [r for r in jac if {r["ka"], r["kb"]} == {1, 2}]
    assert pair and pair[0]["jaccard"] < 0.5


def test_chunk_col_empty_and_boundary_docs(spark):
    df = spark.createDataFrame(
        [
            (0, []),                            # empty doc: no chunks
            (1, ["a"]),                         # 1 token -> 1 chunk
            (2, [f"t{i}" for i in range(CHUNK_TOKS)]),       # exactly 1 chunk
            (3, [f"t{i}" for i in range(2 * CHUNK_TOKS + 1)]),  # 3 chunks
        ],
        "doc_id long, toks array<string>",
    )
    got = {
        r["doc_id"]: r["chunks"]
        for r in df.select("doc_id", chunk_col("toks").alias("chunks")).collect()
    }
    assert got[0] == []
    assert got[1] == ["a"]
    assert len(got[2]) == 1 and got[2][0].count(" ") == CHUNK_TOKS - 1
    assert len(got[3]) == 3 and got[3][2] == f"t{2 * CHUNK_TOKS}"


def test_stream_token_budget_carries_state_across_microbatches(
    spark, sf_dir, tmp_path
):
    """Split documents into 3 files (maxFilesPerTrigger=1 -> 3 micro-batches)
    and check the budget is enforced ACROSS batches: per source the total
    accepted tokens never exceed the budget, and cum_tok is consistent with
    the per-batch hash-ordered accumulation."""
    import uuid

    from big_data_analytics_mini_projects_spark.streaming.stream_stats import (
        stream_token_budget,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_split")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"tb_{uuid.uuid4().hex[:10]}"
    q = (
        stream_token_budget(sdf, TOKEN_BUDGET)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    assert out.count() > 0
    totals = {
        r["source"]: (r["tok"], r["mx"])
        for r in out.groupBy("source")
        .agg(F.sum("n_tok").alias("tok"), F.max("cum_tok").alias("mx"))
        .collect()
    }
    for source, (tok, mx) in totals.items():
        assert mx <= TOKEN_BUDGET, source
        # emitted docs are charged against one shared budget: the max
        # cumulative count is at least the accepted-token total (rejected
        # docs may additionally have consumed budget in earlier batches)
        assert tok <= mx, source
