"""Connected components over a pair graph — near-dup pairs → dedup GROUPS.

Pair detection (minhash.py / ngram.py / simhash.py) yields edges; the
deduplication step a training-data pipeline actually executes needs the
transitive closure of those edges — "these 5 docs are all one document,
keep one". This operator assigns every node the minimum node id of its
component via iterative min-label propagation:

    label(n) ← min(label(n), min_{(m,n) ∈ E} label(m))      until fixpoint

Each iteration is one join + one min-aggregate — both plain shuffles on
the node id — followed by POINTER DOUBLING TO FIXPOINT (Wyllie '79):
the round's pointer forest ``lab`` is composed with itself
(``lab ← lab∘lab``) until idempotent, so a depth-d forest collapses in
⌈log₂ d⌉ node-sized self-joins and total convergence is O(log diameter)
ROUNDS — not O(diameter). (Round 5 measured the single-jump variant at
exactly 2 edges removed per round on a path graph: linear. A chain of
33 nodes now converges in ONE round, 6 doublings.) Contraction then
rewrites the edge set in representative space (Kiveris et al., SoCC'14
style), so dense near-dup cliques vanish after round 1 and later rounds
shuffle thousands of rows, not the full edge set. `localCheckpoint`
per materialization truncates lineage (the classic iterative-DataFrame
trap: unchecked, round k replays rounds 1..k-1; a doubling self-join
unchecked DOUBLES the plan per jump).

Scale shape at 100 TB: per round, one edge-sized shuffle (propagation +
contraction) plus O(log d) node-sized shuffles (doubling) — against the
O(d) edge-sized rounds of plain propagation. Near-dup graphs are
shallow so doubling stops after 1-2 jumps there; the log bound is what
makes the operator safe on ADVERSARIAL graphs (long chains of
pairwise-similar docs — exactly what boilerplate families produce).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..checkpointing import release, truncate_lineage

# Per-round attribution of the MOST RECENT connected_components run:
# [{"round": k, "wall_sec": s, "edges_after": n}, ...]. Benchmarks read
# this after running a CC-backed query so an anomalous wall time is
# explainable (rounds? edge volume? one slow round?) instead of a bare
# number — three rounds of unexplained bench variance on this operator
# is what bought the instrumentation.
LAST_RUN_STATS: list[dict] = []


def _driver_union_find(edge_list: list[tuple]) -> dict:
    """Min-label union-find over a small edge list (the bounded local
    finish). Roots are always the minimum of the merged roots, so after
    full path compression every node maps to its component's min id."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent.get(x, x)
        return r

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for e in edge_list for n in e}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_alias: str = "id",
    comp_alias: str = "component",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    finish_threshold: int = 10_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id of the component. Deterministic
    regardless of partitioning (min is order-insensitive).

    ``checkpoint_dir``: None → localCheckpoint per round (fast; right for
    local runs). On a real cluster pass a DFS path — local checkpoint
    blocks die with their executor, and a lost block aborts the whole
    iteration (see checkpointing.truncate_lineage).

    ``finish_threshold``: once the (contracted) edge set has ≤ this many
    edges it is collected and finished with a driver-side union-find,
    and the labels rejoin as one broadcast pointer map — the standard
    two-phase shape (GraphX/GraphFrames finish small remainders the same
    way): distributed rounds do the data-sized work, the driver does the
    O(threshold) tail that would otherwise cost whole extra rounds of
    fixed job overhead. The collect is bounded by the threshold (default
    10k edges ≈ 160 KB), NEVER data-sized; 0 disables the local finish
    entirely (pure distributed iteration, used by the worst-case tests)."""
    ckpt = lambda df: truncate_lineage(df, checkpoint_dir, footprint="data")  # noqa: E731
    # checkpoint the DIRECTED edges first, then mirror: union-then-
    # checkpoint would evaluate the (possibly expensive) edge plan twice
    # d holds each undirected edge ONCE (a<b normalized); propagation
    # mirrors it lazily, contraction only ever rewrites the half-size set.
    d = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    d = d.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    )
    d = ckpt(d)

    # mapping: original node → current representative. Starts as identity
    # (a lazy plan over the edge checkpoint — round 0's materialization
    # below computes it as part of its one job; no separate init job).
    mirrored = d.union(d.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mapping = (
        mirrored.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
    )

    # Per-round job budget matters as much as per-round data volume:
    # every materialization pays fixed driver cost (analysis + codegen +
    # job scheduling) that dwarfs the actual work once contraction has
    # shrunk the graph. The loop therefore materializes exactly TWICE per
    # round: `prop` (needed anyway to break the pointer-jump self-join's
    # plan identity) and a tagged union holding the new edge set AND the
    # new mapping in ONE checkpoint (tag 1 = edge (a,b), tag 0 = mapping
    # (id,lab)); the two frames are cheap filter-views over its blocks.
    LAST_RUN_STATS.clear()

    def _local_finish(cur_map: DataFrame, cur_d: DataFrame, n_rem: int, round_no: int):
        """Collect the ≤ finish_threshold remaining edges, union-find on
        the driver, rejoin as ONE broadcast pointer map."""
        from pyspark.sql import types as T

        _t0 = time.time()
        labels = _driver_union_find([(r[0], r[1]) for r in cur_d.collect()])
        id_type = cur_d.schema.fields[0].dataType
        # JVM LocalRelation, not createDataFrame: the pointer map is
        # driver-side literals, and re-parallelizing it as a Python RDD
        # makes every downstream action pay a Python-worker round trip
        # (localrel.py; bounded here by finish_threshold edges)
        from ..localrel import local_frame

        lmap = local_frame(
            cur_d.sparkSession,
            list(labels.items()),
            T.StructType(
                [T.StructField("f_id", id_type), T.StructField("f_lab", id_type)]
            ),
        )
        out = cur_map.join(
            F.broadcast(lmap), F.col("lab") == F.col("f_id"), "left"
        ).select("id", F.coalesce("f_lab", "lab").alias("lab"))
        LAST_RUN_STATS.append(
            {
                "round": round_no,
                "wall_sec": round(time.time() - _t0, 3),
                "edges_after": 0,
                "finish": "driver_union_find",
                "finish_edges": n_rem,
            }
        )
        return out

    # Bounded local finish BEFORE any distributed round: the count is one
    # cheap job over the edge checkpoint's blocks; small pair graphs (the
    # common near-dup case) skip the whole prop/jump/contract machinery.
    if finish_threshold:
        n_start = d.count()
        if n_start <= finish_threshold:
            if n_start > 0:
                mapping = _local_finish(mapping, d, n_start, 0)
            return mapping.select(
                F.col("id").alias(id_alias), F.col("lab").alias(comp_alias)
            )

    prev_combined: DataFrame | None = None
    for _round in range(max_iter):
        _t0 = time.time()
        # One min-propagation round over the CURRENT (contracted) graph:
        # lab(r) = min(r, min of r's neighbors).
        mirrored = d.union(d.select(F.col("b").alias("a"), F.col("a").alias("b")))
        prop = (
            mirrored.groupBy(F.col("b").alias("id"))
            .agg(F.min("a").alias("lab"))
            .withColumn("lab", F.least("id", "lab"))
        )
        prop = ckpt(prop)  # also breaks the self-join plan identity below
        # Pointer doubling to FIXPOINT (lab ← lab∘lab, repeated): each
        # jump squares the compression, so a depth-d pointer chain fully
        # collapses in ⌈log₂ d⌉ jumps — a single jump only composes
        # i→i-1 into i→i-2 and leaves convergence linear in diameter.
        # Idempotence probe: each jump carries a per-row `moved` flag
        # (did this label change?); a jump with zero moved rows is the
        # fixpoint. On the local path the moved count is observe()d
        # during the checkpoint's own materialization job; on the
        # reliable path (RDD-level checkpoint, which doesn't fire
        # observations) it is a count over the just-materialized blocks.
        # Each jump is checkpointed — an unchecked doubling self-join
        # doubles the PLAN per jump (2^k nodes by jump k).
        jumped = prop
        jump_ckpt = None  # checkpointed frame backing `jumped`
        n_jumps = 0
        while True:
            ptr = jumped.select(
                F.col("id").alias("p_id"), F.col("lab").alias("p_lab")
            )
            jump = jumped.join(ptr, F.col("lab") == F.col("p_id")).select(
                "id",
                F.col("p_lab").alias("lab"),
                (F.col("p_lab") != F.col("lab")).alias("moved"),
            )
            if checkpoint_dir is None:
                # observe() piggybacks the idempotence probe on the
                # checkpoint's own materialization job — zero extra jobs
                # per jump (localCheckpoint fires the observation;
                # RDD-level reliable checkpoint() does not, hence the
                # fallback below)
                obs = Observation()
                nxt = ckpt(
                    jump.observe(
                        obs, F.sum(F.col("moved").cast("long")).alias("m")
                    )
                )
                n_moved = obs.get["m"] or 0
            else:
                nxt = ckpt(jump)
                # count over just-materialized blocks — cheap, no rejoin
                n_moved = nxt.filter("moved").count()
            n_jumps += 1
            if jump_ckpt is not None:
                release(jump_ckpt, checkpoint_dir)
            jump_ckpt = nxt
            jumped = nxt.drop("moved")
            if n_moved == 0 or n_jumps >= 40:  # 2^40 depth: unreachable
                break
        # Compose into the full mapping (original node space).
        new_mapping = (
            mapping.alias("m")
            .join(jumped.alias("j"), F.col("m.lab") == F.col("j.id"), "left")
            .select(
                F.col("m.id").alias("id"),
                F.coalesce(F.col("j.lab"), F.col("m.lab")).alias("lab"),
            )
        )
        # CONTRACT: rewrite edges in representative space and drop
        # self-loops + duplicates. Dense clusters collapse to a point
        # after one round, so |e| shrinks geometrically — later rounds
        # shuffle thousands of rows, not the full edge set (the
        # alternating-contraction idea of Kiveris et al. SoCC'14).
        ja = jumped.select(F.col("id").alias("a"), F.col("lab").alias("la"))
        jb = jumped.select(F.col("id").alias("b"), F.col("lab").alias("lb"))
        new_d = (
            d.join(ja, "a")
            .join(jb, "b")
            .select(
                F.least("la", "lb").alias("a"), F.greatest("la", "lb").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # Materialize new_d + new_mapping together (edges first, so the
        # emptiness probe below touches the leading blocks only).
        combined = ckpt(
            new_d.select(F.lit(1).alias("tag"), F.col("a").alias("x"), F.col("b").alias("y"))
            .unionAll(
                new_mapping.select(
                    F.lit(0).alias("tag"), F.col("id").alias("x"), F.col("lab").alias("y")
                )
            )
        )
        prev_d = d
        d = combined.filter(F.col("tag") == 1).select(
            F.col("x").alias("a"), F.col("y").alias("b")
        )
        mapping = combined.filter(F.col("tag") == 0).select(
            F.col("x").alias("id"), F.col("y").alias("lab")
        )
        # count over the already-materialized blocks (cheap) doubles as
        # the convergence probe AND the per-round attribution record
        n_edges = d.count()
        # free superseded checkpoint blocks — an unbounded loop would
        # otherwise accumulate every round's materialization in storage.
        # prev_d is only its OWN checkpoint on round 0 (the caller's
        # initial edge materialization); from round 1 it is a filter
        # view over prev_combined, whose blocks release() below frees —
        # releasing the view would be a silent no-op (review r6)
        release(prop, checkpoint_dir)
        if jump_ckpt is not None:
            release(jump_ckpt, checkpoint_dir)
        if prev_combined is None:
            release(prev_d, checkpoint_dir)
        else:
            release(prev_combined, checkpoint_dir)
        prev_combined = combined
        LAST_RUN_STATS.append(
            {
                "round": _round,
                "wall_sec": round(time.time() - _t0, 3),
                "edges_after": n_edges,
                "jumps": n_jumps,
            }
        )
        if n_edges == 0:
            break
        if finish_threshold and n_edges <= finish_threshold:
            # remainder fits the bounded collect — driver union-find
            # beats whole extra rounds of fixed job overhead
            mapping = _local_finish(mapping, d, n_edges, _round + 1)
            break
    labels = mapping
    return labels.select(F.col("id").alias(id_alias), F.col("lab").alias(comp_alias))


def canonical_per_component(
    members: DataFrame,
    df: DataFrame,
    id_col: str,
    comp_col: str = "component",
) -> DataFrame:
    """Keep ONE row of ``df`` per component (the minimum id — the
    component label itself): the "drop near-duplicates" action. Rows of
    ``df`` not in any component (singletons) are kept as-is."""
    dups = members.filter(F.col(id_col) != F.col(comp_col)).select(id_col)
    return df.join(dups, id_col, "left_anti")
