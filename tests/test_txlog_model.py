"""Model-based test for the transaction log (sources/txlog.py): a
random DML sequence — append / delete (copy-on-write AND merge-on-read)
/ update (both modes) / merge / optimize — runs against BOTH the real
TxTable and a trivial in-memory row model; after every op the table's
visible rows must equal the model, and at the end the change feed must
replay from empty to the final state.

This is the cross-cutting net the example-based tests can't weave: it
exercises arbitrary INTERLEAVINGS of copy-on-write and merge-on-read
commits (a DV landing on a file a later rewrite compacts, an update of
a row a previous update already moved to a new file, ...), where the
bookkeeping bugs live. Sequences are short (Spark jobs per op) but
hypothesis shrinks failures to minimal op lists.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "k long, grp string, v double"

SET = settings(
    # TXLOG_MODEL_EXAMPLES raises the sweep for one-off stress runs
    # (each example is several Spark jobs; 8 keeps the suite honest)
    max_examples=int(os.environ.get("TXLOG_MODEL_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

# Ops reference a bounded value domain so predicates actually hit rows.
_V = st.integers(0, 20)

_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(_V, min_size=1, max_size=4)),
    st.tuples(st.just("delete"), _V, st.integers(0, 6), st.booleans()),
    st.tuples(st.just("update"), _V, st.integers(0, 6), st.booleans()),
    st.tuples(st.just("merge"), st.lists(_V, min_size=1, max_size=3)),
    st.tuples(st.just("optimize")),
    # checkpoint + zero-retention vacuum: must not change ANY visible
    # state (a vacuumed live DV sidecar or data file would diverge the
    # next read; a bad checkpoint would diverge every later replay)
    st.tuples(st.just("maintain")),
    # restore to a random reachable version: visible state must equal
    # what the model held THEN, and the feed must replay across it
    st.tuples(st.just("restore"), st.integers(0, 10)),
    # metadata-only RENAME of the value column (column mapping, r8):
    # toggles v <-> v2; every later op addresses the CURRENT name and
    # all visible state / CDF replay must be unaffected
    st.tuples(st.just("rename")),
    # advisory bloom index on k (r8): must never change ANY visible
    # state or the CDF, while later point scans stay exact across
    # whatever rewrites/restores/renames follow
    st.tuples(st.just("bloom")),
    # atomic predicate overwrite (r8 replace_where): delete the value
    # slice AND insert fresh in-slice rows in one commit; interleaves
    # with DV state like delete/update, so it joins the soak
    st.tuples(
        st.just("replace"),
        _V,
        st.integers(0, 6),
        st.lists(st.integers(0, 6), max_size=3),
    ),
)


def _apply_model(model: dict, op) -> None:
    """The oracle: {k: (grp, v)} under the same op semantics."""
    kind = op[0]
    if kind == "append":
        for v in op[1]:
            k = max(model, default=-1) + 1
            model[k] = ("g%d" % (v % 3), float(v))
    elif kind == "delete":
        lo, hi = float(op[1]), float(op[1] + op[2])
        for k in [k for k, (_, v) in model.items() if lo <= v <= hi]:
            del model[k]
    elif kind == "update":
        lo, hi = float(op[1]), float(op[1] + op[2])
        for k, (g, v) in list(model.items()):
            if lo <= v <= hi:
                model[k] = (g, v + 100.0)
    elif kind == "merge":
        keys = sorted(model)
        for i, v in enumerate(op[1]):
            # alternate update-existing / insert-new, deterministically
            if i % 2 == 0 and keys:
                k = keys[i // 2 % len(keys)]
                model[k] = ("m", float(v))
            else:
                k = max(model, default=-1) + 1000 + i
                model[k] = ("m", float(v))
    elif kind == "replace":
        lo, hi = float(op[1]), float(op[1] + op[2])
        base = max(model, default=-1)  # BEFORE the delete: mirrors
        # _apply_table's model_before key generation
        for k in [k for k, (_, v) in model.items() if lo <= v <= hi]:
            del model[k]
        for i, d in enumerate(op[3]):
            model[base + 2001 + i] = ("r", min(hi, lo + float(d)))
    # optimize / maintain: no visible change


def _apply_table(spark, t: TxTable, model_before: dict, op, vname: str) -> None:
    ddl = f"k long, grp string, {vname} double"
    kind = op[0]
    if kind == "append":
        rows = []
        mk = max(model_before, default=-1)
        for v in op[1]:
            mk += 1
            rows.append((mk, "g%d" % (v % 3), float(v)))
        t.append(spark.createDataFrame(rows, ddl))
    elif kind == "delete":
        mode = "dv" if op[3] else "rewrite"
        t.delete_where(vname, float(op[1]), float(op[1] + op[2]), mode=mode)
    elif kind == "update":
        mode = "dv" if op[3] else "rewrite"
        t.update_where(
            vname,
            float(op[1]),
            float(op[1] + op[2]),
            {vname: F.col(vname) + 100.0},
            mode=mode,
        )
    elif kind == "merge":
        keys = sorted(model_before)
        rows = {}
        for i, v in enumerate(op[1]):
            if i % 2 == 0 and keys:
                k = keys[i // 2 % len(keys)]
            else:
                k = max(model_before, default=-1) + 1000 + i
            rows[k] = (k, "m", float(v))
        t.merge_upsert(spark.createDataFrame(sorted(rows.values()), ddl), "k")
    elif kind == "replace":
        lo, hi = float(op[1]), float(op[1] + op[2])
        base = max(model_before, default=-1)
        rows = [
            (base + 2001 + i, "r", min(hi, lo + float(d)))
            for i, d in enumerate(op[3])
        ]
        t.replace_where(vname, lo, hi, spark.createDataFrame(rows, ddl))
    elif kind == "optimize":
        t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    elif kind == "maintain":
        t._write_checkpoint(t.version())
        t.vacuum(retention_sec=0.0)
    elif kind == "bloom":
        t.build_bloom_index("k", fpp=0.01)


@SET
@given(
    seed=st.lists(_V, min_size=2, max_size=5),
    ops=st.lists(_OP, min_size=1, max_size=5),
)
def test_random_dml_sequence_matches_model_and_replays(
    spark, tmp_path_factory, seed, ops
):
    root = str(tmp_path_factory.mktemp("txmodel") / "tbl")
    model: dict = {}
    rows = []
    for v in seed:
        k = len(rows)
        rows.append((k, "g%d" % (v % 3), float(v)))
        model[k] = ("g%d" % (v % 3), float(v))
    t = TxTable.create(
        spark, root, spark.createDataFrame(rows, DDL).repartition(2)
    )
    vname = "v"
    history = {t.version(): (dict(model), vname)}
    for op in ops:
        if op[0] == "restore":
            tgt = sorted(history)[op[1] % len(history)]
            t.restore(tgt)
            model, vname = dict(history[tgt][0]), history[tgt][1]
        elif op[0] == "rename":
            new = "v2" if vname == "v" else "v"
            t.alter_rename_column(vname, new)
            vname = new
        else:
            before = dict(model)
            _apply_table(spark, t, before, op, vname)
            _apply_model(model, op)
        history[t.version()] = (dict(model), vname)
        got = sorted(
            (r["k"], r["grp"], r[vname]) for r in t.read().collect()
        )
        want = sorted((k, g, v) for k, (g, v) in model.items())
        assert got == want, (op, got, want)
    # the change feed replays from empty to the final state
    feed = t.changes(-1)
    net = feed.groupBy("k", "grp", vname).agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n")
    )
    assert net.filter(~F.col("n").isin(0, 1)).count() == 0
    recon = sorted(
        (r["k"], r["grp"], r[vname])
        for r in net.filter("n = 1").drop("n").collect()
    )
    assert recon == sorted((k, g, v) for k, (g, v) in model.items())
