"""ANN quality: the approximate paths must recall most of the exact
top-k, and bucketing/assignment must be well-formed."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.similarity import brute, ivf, lsh
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


def _qvec(spark):
    row = (
        load_table(spark, "embeddings", SF_ORACLE)
        .filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row["embedding"]]


def test_ivf_assignment_covers_all_cells_validly(spark):
    emb = load_table(spark, "embeddings", SF_ORACLE)
    cents = ivf.train_centroids(emb, n_cells=8, max_train_rows=5000)
    assert len(cents) == 8
    cells = ivf.assign_cells(emb, cents).select("cell").distinct().collect()
    vals = {r["cell"] for r in cells}
    assert vals <= set(range(8)) and len(vals) >= 2


def test_ivf_recall_vs_exact(spark):
    emb = load_table(spark, "embeddings", SF_ORACLE)
    qv = _qvec(spark)
    exact = {r["vec_id"] for r in brute.cosine_topk(emb, qv, k=10).collect()}
    cents = ivf.train_centroids(emb, n_cells=8, max_train_rows=20_000)
    approx = {r["vec_id"] for r in ivf.ivf_topk(emb, cents, qv, k=10, n_probes=3).collect()}
    # query vector itself must be found, and recall must be substantial
    assert 0 in approx
    assert len(exact & approx) >= 5, (exact, approx)


def test_sign_lsh_recall_vs_exact(spark):
    emb = load_table(spark, "embeddings", SF_ORACLE)
    qv = _qvec(spark)
    exact = {r["vec_id"] for r in brute.cosine_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in lsh.lsh_cosine_topk(emb, qv, k=10, n_bits=8, n_probes=4).collect()}
    # testdata embeddings are near-orthogonal random vectors — the
    # adversarial case for LSH (true neighbors barely beat noise), so
    # require the guaranteed self-match plus nonzero overlap, not high
    # recall (see test_ivf_recall_vs_exact for the trained-index bound).
    assert 0 in approx
    assert len(exact & approx) >= 2, (exact, approx)


def test_ivf_probe_cells_orders_by_distance():
    cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
    assert ivf._probe_cells([0.1, 0.1], cents, 2) == [0, 1] or \
           ivf._probe_cells([0.1, 0.1], cents, 2) == [0, 2]
    assert ivf._probe_cells([9.0, 0.0], cents, 1) == [1]


def test_lsh_topk_quantized_tie_cut(spark):
    """Review r6: the top-k cut must happen on the QUANTIZED score when
    the caller's oracle orders by the quantized value. Two candidates
    whose raw cosines differ past the 4th decimal but quantize equal at
    the k boundary: the quantized cut keeps the lower id (the oracle's
    tie-break); the raw cut would keep the higher-raw-cosine row."""
    import math

    def unit(c):
        return [c, math.sqrt(1.0 - c * c)]

    rows = [
        (0, unit(1.0)),        # the query itself, cos = 1.0
        (2, unit(0.98758)),    # quantizes to 0.9876 (lower raw)
        (5, unit(0.98762)),    # quantizes to 0.9876 (higher raw)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = [1.0, 0.0]
    quantized = lsh.lsh_cosine_topk(
        df, qv, k=2, n_bits=1, n_probes=1, quantize_decimals=4
    ).collect()
    assert {r["vec_id"] for r in quantized} == {0, 2}, quantized
    raw = lsh.lsh_cosine_topk(df, qv, k=2, n_bits=1, n_probes=1).collect()
    assert {r["vec_id"] for r in raw} == {0, 5}, raw


def test_ivfpq_recall_and_adc_shortlist_bounds(spark, tmp_path):
    """IVF-PQ (similarity/pq.py): two-stage search recalls ≥5 of the
    exact top-10 (same floor as IVF-Flat), the codes relation is
    m-codes-per-row, and the ADC stage scans ONLY the codes table —
    full vectors appear solely in the shortlist-bounded re-rank."""
    from data_mastery_pipeline_spark.similarity import pq

    emb = load_table(spark, "embeddings", SF_ORACLE)
    qv = _qvec(spark)
    cents = ivf.train_centroids(emb, n_cells=8, max_train_rows=20_000)
    books = pq.train_pq(emb, cents, m=4, ksub=16)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    codes = pq.encode_pq(emb, cents, books)
    row = codes.first()
    assert len(row["codes"]) == 4
    assert all(0 <= c < 16 for c in row["codes"])
    # persist the codes relation (the at-scale shape: the index table
    # is separate from the vector table) and search from the files
    p = str(tmp_path / "codes")
    codes.write.parquet(p)
    codes_tbl = spark.read.parquet(p)
    out = pq.ivfpq_topk(
        codes_tbl, emb, cents, books, qv, k=10, n_probes=4, refine=6
    )
    exact = {r["vec_id"] for r in brute.cosine_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in out.collect()}
    assert 0 in approx
    assert len(exact & approx) >= 5, (exact, approx)
    # plan property: the ADC branch reads only the codes table columns;
    # embedding is read once (the re-rank scan), never per-probe
    from data_mastery_pipeline_spark.plans import inspect

    schemas = inspect.read_schema_columns(out)
    emb_scans = [s for s in schemas if "embedding" in s]
    assert len(emb_scans) == 1, schemas
    code_scans = [s for s in schemas if "codes" in s]
    assert code_scans and all("embedding" not in s for s in code_scans)


def test_ivfpq_determinism(spark):
    """Fixed seeds ⇒ identical codebooks across runs — what makes the
    driver recall certificate a stable value-hash."""
    from data_mastery_pipeline_spark.similarity import pq

    emb = load_table(spark, "embeddings", SF_ORACLE)
    cents = ivf.train_centroids(emb, n_cells=8, max_train_rows=20_000)
    b1 = pq.train_pq(emb, cents, m=4, ksub=16)
    b2 = pq.train_pq(emb, cents, m=4, ksub=16)
    assert b1 == b2


def test_append_cells_incremental_index_equals_full_build(spark, tmp_path):
    """Appending a late batch into the cell-partitioned index must
    yield exactly the rows of a from-scratch build over the union —
    same (vec_id, cell) set, no loss, no duplication — and search over
    the grown index must keep the recall floor."""
    from data_mastery_pipeline_spark.similarity import brute

    emb = load_table(spark, "embeddings", SF_ORACLE)
    seed = emb.filter(F.col("vec_id") % 10 != 7)
    late = emb.filter(F.col("vec_id") % 10 == 7)
    cents = ivf.train_centroids(seed, n_cells=8, max_train_rows=20_000)
    p_incr = str(tmp_path / "incr")
    ivf.materialize_cells(seed, cents, p_incr)
    idx = ivf.append_cells(late, cents, p_incr)
    full = ivf.materialize_cells(emb, cents, str(tmp_path / "full"))
    got = sorted(
        (r["vec_id"], r["cell"])
        for r in idx.select("vec_id", "cell").collect()
    )
    want = sorted(
        (r["vec_id"], r["cell"])
        for r in full.select("vec_id", "cell").collect()
    )
    assert got == want
    qv = _qvec(spark)
    exact = {r["vec_id"] for r in brute.cosine_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf.ivf_topk(idx, cents, qv, k=10, n_probes=4).collect()
    }
    assert len(exact & approx) >= 5


def test_cell_sizes_gauge_sums_to_corpus(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_ORACLE)
    cents = ivf.train_centroids(emb, n_cells=8, max_train_rows=5000)
    idx = ivf.materialize_cells(emb, cents, str(tmp_path / "c"))
    sizes = ivf.cell_sizes(idx).collect()
    assert sum(r["count"] for r in sizes) == emb.count()
    assert all(r["count"] > 0 or True for r in sizes)
