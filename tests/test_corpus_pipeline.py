"""End-to-end corpus-pipeline composition (the training-data twin of
test_pipeline_e2e's weather flow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.corpus_pipeline import run_corpus_pipeline
from data_mastery_pipeline_spark.functions import text as textfn
from data_mastery_pipeline_spark.operators import sampling
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_corpus_pipeline_stage_monotonicity_and_outputs(spark, tmp_path):
    res = run_corpus_pipeline(spark, SF_SMOKE, str(tmp_path))
    r = res.stage_rows
    # every filtering stage can only shrink the corpus
    assert r["raw"] >= r["quality_gate"] >= r["exact_dedup"] >= r["near_dedup"]
    assert r["near_dedup"] >= r["decontaminated"]
    assert r["raw"] > 0 and r["decontaminated"] > 0
    # chunking re-expands: every surviving doc yields ≥1 chunk, so the
    # chunk count can never fall below the doc count (tight bound —
    # 'decontaminated' already counts only post-eval-split train docs)
    assert r["train_chunks"] >= r["decontaminated"]

    out = spark.read.parquet(res.train_path)
    # packing well-formed: offsets non-negative, bins start at 0 per source
    assert out.filter(F.col("start_offset") < 0).count() == 0
    assert out.filter(F.col("bin_id") < 0).count() == 0
    assert out.filter(F.col("n_chunk_tokens") <= 0).count() == 0

    # no eval-slice doc leaked into train
    gate = sampling.affine_gate("doc_id", salt=7)
    leaked = out.select("doc_id").distinct().filter(
        gate < int(0.1 * sampling.GATE_BUCKETS)
    )
    assert leaked.count() == 0

    # decontamination really held: no train doc shares an 8-gram with
    # the eval slice (recomputed independently from the raw table)
    docs = load_table(spark, "documents", SF_SMOKE)
    gram = F.explode(
        F.transform(textfn.word_ngram_structs("text", 8), lambda s: F.xxhash64(s))
    )
    eval_grams = (
        docs.filter(gate < int(0.1 * sampling.GATE_BUCKETS))
        .select(gram.alias("gh"))
        .distinct()
    )
    train_ids = out.select("doc_id").distinct()
    train_grams = docs.join(train_ids, "doc_id").select(
        "doc_id", gram.alias("gh")
    )
    assert train_grams.join(eval_grams, "gh").count() == 0


def test_sharded_output_has_exactly_n_files_and_same_rows(spark, tmp_path):
    import glob

    res = run_corpus_pipeline(spark, SF_SMOKE, str(tmp_path / "a"), n_shards=4)
    files = glob.glob(f"{res.train_path}/part-*.parquet")
    assert len(files) == 4
    # sharding is a layout choice only: identical rows vs the unsharded run
    res2 = run_corpus_pipeline(spark, SF_SMOKE, str(tmp_path / "b"))
    a = spark.read.parquet(res.train_path)
    b = spark.read.parquet(res2.train_path)
    key = ["doc_id", "chunk_idx"]
    # FULL-ROW equality, not just key membership: sharding happens AFTER
    # packing, so every value column (chunk_text, n_chunk_tokens, bin_id,
    # offsets) must be identical too — key-only comparison would pass a
    # regression where sharding alters packed values (review r6, 9th pass)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # deterministic row→shard mapping: re-running shards identically
    res3 = run_corpus_pipeline(spark, SF_SMOKE, str(tmp_path / "c"), n_shards=4)
    c = spark.read.parquet(res3.train_path)
    fa = {tuple(r) for r in a.select(*key, F.spark_partition_id().alias("p")).collect()}
    fc = {tuple(r) for r in c.select(*key, F.spark_partition_id().alias("p")).collect()}
    assert fa == fc
