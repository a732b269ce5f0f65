"""End-to-end LLM training-corpus pipeline — the flagship composition.

One Spark job chain running the full corpus lifecycle the individual
operators implement piecewise:

    raw documents
      → quality gate        (token count + quality score + language)
      → exact dedup         (content fingerprint, keep min doc_id)
      → near-dedup          (MinHash→LSH→verify→connected components,
                             keep the cluster canonical)
      → decontamination     (drop docs sharing an 8-gram with the
                             held-out eval slice — test-set leakage)
      → chunk               (token windows with overlap)
      → pack                (concat-and-split into fixed-capacity bins,
                             total (doc_id, chunk_idx) order so offsets
                             are layout-independent)
      → train split written to parquet

Execution/accounting model: each stage boundary is materialized ONCE
(``truncate_lineage`` — the near-dedup and CC operators need their
inputs materialized anyway), per-stage counts read those materialized
blocks (a cached-scan count, never a recompute of the prefix), and the
final packed count rides ``observe()`` on the one real write. The
reference's count()-per-stage anti-pattern (SURVEY §3.2) re-executes
the full prefix per stage; this runs each stage exactly once.

This is SURVEY §3's lifecycle re-expressed for the training-data
domain: where run_weather_pipeline replaces the reference's 7-task DAG,
run_corpus_pipeline is the pipeline a user actually points at 100 TB of
crawl text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpointing import truncate_lineage
from .dedup import components as dedup_components
from .dedup import exact as dedup_exact
from .dedup import minhash as dedup_minhash
from .functions import text as textfn
from .operators import packing, quality, sampling
from .tables import load_table


@dataclass
class CorpusResult:
    train_path: str
    stage_rows: dict = field(default_factory=dict)


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 5,
    min_quality: float = 0.2,
    languages: tuple[str, ...] = (),
    jaccard_threshold: float = 0.35,
    chunk_size: int = 50,
    overlap: int = 10,
    pack_capacity: int = 256,
    eval_fraction: float = 0.1,
    n_shards: int | None = None,
    checkpoint_dir: str | None = None,
) -> CorpusResult:
    """Run the corpus lifecycle over ``documents`` at ``sf_dir``; write
    the packed train split to ``out_dir``/train and return per-stage
    row counts. ``checkpoint_dir``: DFS path for the stage
    materializations on a real cluster (None = fast local blocks)."""
    # every stage frame IS the (filtered) corpus — data-sized, so the
    # blocks must be serialized + disk-spillable or heap scales with
    # input (ADVICE r10: the footprint='data' rollout missed this site)
    ckpt = lambda df: truncate_lineage(df, checkpoint_dir, footprint="data")  # noqa: E731

    # every stage below is CPU-heavy narrow work over this scan —
    # load_table's CPU_HEAVY_TABLES policy fans it out once if the
    # source arrives under-split (no-op otherwise)
    docs = load_table(spark, "documents", sf_dir)
    stage_rows: dict[str, int] = {}

    # --- quality gate (narrow, one pass; materialized once) ------------
    # the raw count rides an observation BELOW the gate filter — it
    # fills during the checkpoint job that runs anyway, instead of a
    # dedicated full pass over the source (review r6: a docs.count()
    # here contradicted this module's each-stage-exactly-once model)
    toks = textfn.tokens("text")
    docs_obs, raw_obs = quality.with_observed_metrics(docs, "corpus_raw")
    gated = docs_obs.withColumn("n_tokens", F.size(toks)).withColumn(
        "quality", textfn.quality_score("text")
    )
    cond = (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    if languages:
        gated = gated.withColumn("lang_pred", textfn.lang_guess("text"))
        cond = cond & F.col("lang_pred").isin(*languages)
    gated = ckpt(gated.filter(cond))
    stage_rows["raw"] = int(raw_obs.get["n_rows"])
    stage_rows["quality_gate"] = gated.count()

    # --- exact dedup (dedup_exact owns the keep rule) -------------------
    exact = ckpt(dedup_exact.exact_dedup(gated))
    stage_rows["exact_dedup"] = exact.count()

    # --- near-dedup (LSH + verify + CC, keep canonical) -----------------
    pairs = dedup_minhash.verified_near_dups(
        exact,
        k=3,
        jaccard_threshold=jaccard_threshold,
        checkpoint_dir=checkpoint_dir,
    ).select("id_a", "id_b")
    members = dedup_components.connected_components(
        pairs, id_alias="doc_id", checkpoint_dir=checkpoint_dir
    )
    near = ckpt(dedup_components.canonical_per_component(members, exact, "doc_id"))
    stage_rows["near_dedup"] = near.count()

    # --- decontamination vs the held-out eval slice ---------------------
    # the eval slice is carved by the deterministic hash gate BEFORE
    # decontamination, then every train doc sharing an 8-gram with eval
    # is dropped — the leakage direction that actually poisons evals.
    # No broadcast hint on the gram index: it grows with the eval slice
    # (data-sized at 100 TB) — AQE picks broadcast while it fits and
    # shuffle-join beyond.
    # the library split (not an inline copy): train_test_split owns the
    # cut rounding — int(round(...)) vs int(...) differ by one bucket
    # for some fractions, and every split in the repo must agree
    gate = sampling.affine_gate("doc_id", salt=7)
    train_docs, eval_docs = sampling.train_test_split(near, eval_fraction, gate)
    gram = lambda c: F.explode(  # noqa: E731
        F.transform(textfn.word_ngram_structs(c, 8), lambda s: F.xxhash64(s))
    )
    eval_grams = eval_docs.select(gram("text").alias("gh")).distinct()
    train_grams = train_docs.select("doc_id", gram("text").alias("gh"))
    contaminated = (
        train_grams.join(eval_grams, "gh").select("doc_id").distinct()
    )
    clean = ckpt(train_docs.join(contaminated, "doc_id", "left_anti"))
    stage_rows["decontaminated"] = clean.count()

    # --- chunk + pack (total order → layout-independent offsets) --------
    chunks = clean.select(
        "doc_id",
        "source",
        F.explode(
            textfn.chunk_spans("text", chunk_size=chunk_size, overlap=overlap)
        ).alias("c"),
    ).select(
        "doc_id", "source", "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens"
    )
    packed = packing.pack_greedy(
        chunks,
        size_col="n_chunk_tokens",
        order_col=["doc_id", "chunk_idx"],
        partition_cols=["source"],
        capacity=pack_capacity,
    )

    # --- the single real write carries the final observation -------------
    # n_shards: hash-repartition on the pack keys → exactly n output
    # files with a deterministic row→shard mapping (what a training
    # dataloader wants; repartitionByRange would sample boundaries
    # nondeterministically)
    if n_shards is not None:
        packed = packed.repartition(n_shards, F.col("source"), F.col("bin_id"))
    packed_obs, obs = quality.with_observed_metrics(packed, "corpus_final")
    train_path = f"{out_dir}/train"
    packed_obs.write.mode("overwrite").parquet(train_path)
    stage_rows["train_chunks"] = int(obs.get["n_rows"])
    return CorpusResult(train_path=train_path, stage_rows=stage_rows)
