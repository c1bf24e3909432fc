"""The COMPOSED streaming curation-to-retrieval pipeline: documents flow
through the near-dup ingest, the survivors embed (hashed-count, the text→
vector bridge), the embeddings flow through the semantic-dedup ingest, and
the semantic survivors build the searchable IVF-PQ ANN index — four
independently-tested stages, here pinned as one end-to-end composition the
way a production stream would wire them (each stage's survivors are the
next stage's micro-batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import pq
from vmware_sd_wan_velocloud_bi_intake_spark.operators.embedding import (
    hashed_doc_embedding,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.annindex import (
    make_ann_index_ingest,
    needs_retrain,
    read_ann_index,
)
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.neardup import (
    make_near_dup_ingest,
    read_survivors,
)
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
    make_semantic_dedup_ingest,
    read_semantic_survivors,
)


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "documents").cache()
    df.count()
    yield df
    df.unpersist()


# slow tier (r14 re-tier, VERDICT r13 #2): streaming composition replication: the per-ingest stream oracles + the batch pipeline e2e keep the class default
@pytest.mark.slow
def test_streaming_curation_to_retrieval(spark, docs, tmp_path):
    n_docs = docs.count()
    # ---- stage 1: near-dup ingest over two document micro-batches ------
    nd_idx = str(tmp_path / "nd_idx")
    nd_surv = str(tmp_path / "nd_surv")
    nd = make_near_dup_ingest(
        nd_idx, nd_surv, threshold=0.5, num_hashes=8, bands=4, shingle_n=3
    )
    nd(docs.where("doc_id % 2 = 0"), 0)
    nd(docs.where("doc_id % 2 = 1"), 1)
    text_survivors = read_survivors(spark, nd_surv)
    n_text = text_survivors.count()
    assert 0 < n_text <= n_docs
    # ---- stage 2: text → vector bridge over the SAME batch boundaries --
    emb0 = hashed_doc_embedding(text_survivors.where("doc_id % 2 = 0"))
    emb1 = hashed_doc_embedding(text_survivors.where("doc_id % 2 = 1"))
    # ---- stage 3: semantic-dedup ingest over the embedded batches ------
    sd_idx = str(tmp_path / "sd_idx")
    sd_surv = str(tmp_path / "sd_surv")
    sd = make_semantic_dedup_ingest(
        sd_idx, sd_surv, threshold=0.95, n_cells=8, train_iters=4
    )
    sd(emb0, 0)
    sd(emb1, 1)
    sem_survivors = read_semantic_survivors(spark, sd_surv)
    n_sem = sem_survivors.count()
    assert 0 < n_sem <= n_text  # each stage only ever removes
    # ---- stage 4: ANN index over the curated vectors, then query -------
    ann_idx = str(tmp_path / "ann_idx")
    ann = make_ann_index_ingest(ann_idx, n_cells=8, m=8, ksub=16, train_iters=4)
    ann(sem_survivors.where("vec_id % 2 = 0"), 0)
    ann(sem_survivors.where("vec_id % 2 = 1"), 1)
    assert not needs_retrain(spark, ann_idx)
    cents, members, books = read_ann_index(spark, ann_idx)
    assert members.count() == n_sem
    queries = sem_survivors.orderBy("vec_id").limit(3)
    hits = pq.ann_ivf_pq_topk(
        queries, cents, members, books, k=2, nprobe=8
    )
    got = {r["query_id"] for r in hits.select("query_id").distinct().collect()}
    want = {r["vec_id"] for r in queries.select("vec_id").collect()}
    assert got == want  # every curated doc is findable in the index
    # retrieval only ever returns curated ids
    neighbor_ids = {r["neighbor_id"] for r in hits.collect()}
    curated = {r["vec_id"] for r in sem_survivors.select("vec_id").collect()}
    assert neighbor_ids <= curated
    # lineage: every ANN id traces back to a near-dup survivor document
    assert curated <= {
        r["doc_id"] for r in text_survivors.select("doc_id").collect()
    }


# slow tier (r14 re-tier, VERDICT r13 #2): end-to-end replication: test_streaming_curation_to_retrieval keeps the pipeline class default
@pytest.mark.slow
def test_curated_corpus_balances_and_enriches_on_export(spark, docs, tmp_path):
    """The round-10 tail of the composed story: the curated corpus
    (near-dup → embed → semantic dedup, as above) feeds (5) a
    topic-BALANCED export draw reusing the semantic index's own trained
    quantizer — no second training pass — and (6) a streamed export
    enriched against a VERSIONED dimension through streaming_enrich_dim,
    with a dim publish between micro-batches changing the very next
    batch's enrichment (the SCD contract, inside the composition)."""
    import os

    from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
        cluster_balanced_sample,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks.versioned import (
        write_version,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.jobs import (
        streaming_enrich_dim,
    )

    # stages 1-3 (compressed): curate into a semantic survivor corpus
    nd_idx, nd_surv = str(tmp_path / "nd_idx"), str(tmp_path / "nd_surv")
    nd = make_near_dup_ingest(
        nd_idx, nd_surv, threshold=0.5, num_hashes=8, bands=4, shingle_n=3
    )
    nd(docs.where("doc_id % 2 = 0"), 0)
    nd(docs.where("doc_id % 2 = 1"), 1)
    text_survivors = read_survivors(spark, nd_surv)
    sd_idx, sd_surv = str(tmp_path / "sd_idx"), str(tmp_path / "sd_surv")
    sd = make_semantic_dedup_ingest(
        sd_idx, sd_surv, threshold=0.95, n_cells=8, train_iters=4
    )
    sd(hashed_doc_embedding(text_survivors.where("doc_id % 2 = 0")), 0)
    sd(hashed_doc_embedding(text_survivors.where("doc_id % 2 = 1")), 1)
    sem_survivors = read_semantic_survivors(spark, sd_surv)
    n_sem = sem_survivors.count()
    # ---- stage 5: balanced draw at the INDEX's quantizer ---------------
    cents = spark.read.parquet(os.path.join(sd_idx, "centroids"))
    target = min(32, n_sem)
    emb_all = hashed_doc_embedding(text_survivors).join(
        sem_survivors.select("vec_id"), "vec_id", "left_semi"
    )
    draw = cluster_balanced_sample(emb_all, cents, total_rows=target, alpha=0.0)
    drawn = draw.select("vec_id", "cell").collect()
    assert len(drawn) == target
    cells = {}
    for r in drawn:
        cells[r["cell"]] = cells.get(r["cell"], 0) + 1
    # every drawn row is a curated survivor; no cell exceeds the equal
    # share by more than the capacity-redistribution allowance
    assert {r["vec_id"] for r in drawn} <= {
        r["vec_id"] for r in sem_survivors.select("vec_id").collect()
    }
    assert max(cells.values()) <= target  # sanity; shares sum exactly
    # ---- stage 6: streamed export through a versioned SCD dim ----------
    dim_root = str(tmp_path / "dim_root")
    write_version(
        spark.createDataFrame([("v1",)], "tag string").crossJoin(
            draw.select(F.col("vec_id").alias("k"))
        ).select("k", "tag"),
        dim_root,
    )
    exp_src = tmp_path / "exp_src"
    exp_src.mkdir()
    half = target // 2
    ordered = sorted(r["vec_id"] for r in drawn)
    first, second = ordered[:half], ordered[half:]
    spark.createDataFrame([(i,) for i in first], "k long").coalesce(
        1
    ).write.parquet(str(exp_src / "b0.parquet"))
    seen = []

    def apply_fn(enriched, batch_id):
        seen.append({(r["k"], r["tag"]) for r in enriched.collect()})

    body = streaming_enrich_dim(dim_root, "k", apply_fn)
    ckpt = str(tmp_path / "exp_ckpt")

    def run():
        q = (
            spark.readStream.schema("k long")
            .parquet(str(exp_src / "*.parquet"))
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "export stream did not drain"

    run()
    assert seen[-1] == {(i, "v1") for i in first}
    # dim publish between triggers: the next batch enriches against v2
    write_version(
        spark.createDataFrame([(int(i), "v2") for i in second], "k long, tag string"),
        dim_root,
    )
    spark.createDataFrame([(i,) for i in second], "k long").coalesce(
        1
    ).write.parquet(str(exp_src / "b1.parquet"))
    run()
    assert seen[-1] == {(i, "v2") for i in second}
