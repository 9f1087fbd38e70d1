"""Connected components over a pair graph — duplicate-cluster assembly.

The dedup family (``dedup_minhash_lsh``, ``dedup_simhash_pairs``,
``embedding_near_dup_lsh``) emits *pairs*; a training-data pipeline needs
*clusters* — "keep one document per duplicate group" is a component-level
decision, not a pair-level one. This operator closes that gap: every node
gets labeled with the smallest node id reachable through the pair graph
(the canonical representative), entirely in DataFrame ops.

Algorithm: min-label propagation with path halving (pointer jumping).
Each round does two narrow self-equi-joins over the (id, lbl) table:

1. neighbor step — ``lbl(x) <- min(lbl(x), min over neighbors y of
   lbl(y))``: one join of the symmetric edge table against labels plus a
   map-side-combined ``min`` aggregate;
2. jump step — ``lbl(x) <- lbl(lbl(x))``: labels are themselves node ids,
   so the label table joins itself (path halving).

Soundness: labels are always ids of nodes in the SAME component (init =
self; neighbor-min and label-of-label both stay inside the component) and
monotonically non-increasing, so the fixpoint has every label equal on a
component — and equal specifically to the component minimum, which is a
member. Determinism: ``min`` has no float or ordering ambiguity, and any
iteration count at-or-past convergence yields the identical table, so the
early-stop test cannot change the result.

Convergence: the neighbor step alone needs O(diameter) rounds (a chain of
n near-dup docs — the adversarial template-drift case — would need n);
path halving compresses label chains geometrically, giving O(log n)
rounds on any graph (Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14 — this is the two-phase star-contraction idea in its
simplest deterministic DataFrame form).

Scale shape (the 100 TB story):

- state per round is ONE narrow (id:long, lbl:long) table — 16 bytes a
  node before encoding, shuffled on ``id``/``lbl`` hash keys; the heavy
  edge table is loop-invariant and reused as-is each round;
- each round is two shuffle joins + one partial-aggregating ``min`` —
  no row amplification anywhere; AQE handles the skew of a giant
  component's label key (all-equal keys only arise AFTER that component
  has already converged, at which point its rows stop changing);
- ``localCheckpoint(eager=True)`` truncates lineage each round so the
  Catalyst plan (and task closure) stays O(1) across iterations instead
  of O(rounds) — on a real cluster with an HDFS checkpoint dir,
  ``checkpoint()`` gives the same truncation with executor-loss safety;
- the convergence probe is the exact label-column sum (labels are
  monotonically non-increasing, so the sum strictly decreases iff any
  row changed) — a map-side-combined aggregate that rides the same job
  that materializes the round's checkpoint; the driver sees one decimal
  per round, never the labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Driver-side small-graph cutover (same bounded-driver-object pattern as
# index.wand.DRIVER_CAND_CAP): the component DECISION needs only the edge
# list — never the nodes, whose untouched members keep their own id as the
# label. Up to this many symmetric edge rows (16 B each -> ~16 MB) the
# labels are computed with an exact union-find on the driver and attached
# to the (still fully distributed) node table via one broadcast join; past
# the cap the O(log n)-round distributed loop below runs unchanged. The
# result is identical by construction (both compute min-reachable-id).
DRIVER_EDGE_CAP = 1_000_000


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 60,
    driver_edge_cap: int = DRIVER_EDGE_CAP,
) -> DataFrame:
    """Label every node with the min node id of its connected component.

    ``nodes``: one row per node (``id_col``). ``edges``: undirected pairs
    (``src_col``, ``dst_col``); endpoints must appear in ``nodes`` and
    self-loops are harmless. Returns (``id_col``, ``component``).

    ``driver_edge_cap``: symmetric-edge-row bound below which the labels
    come from a driver-side union-find + broadcast join instead of the
    iterative distributed loop (pass 0 to force the loop — the
    convergence tests do). Identical output either way.

    Raises after ``max_iter`` rounds without convergence — with path
    halving that means > ~2^(max_iter/2) chained nodes, i.e. never; a
    loud error beats silently-wrong clusters.
    """
    # materialize the loop-invariant edge table ONCE: edges often derive
    # from an expensive pipeline (minhash-LSH verify), and without this
    # every iteration's neighbor join would re-execute that whole lineage
    # (measured: 22s -> ~8s on the dedup_components bench entry)
    # symmetrize via explode, NOT a self-union: a union's two branches
    # would each re-execute the whole upstream edge pipeline within the
    # materializing job (measured 2x the minhash-LSH verify cost on
    # dedup_components); the explode reads each edge row once
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("e_src"),
                        F.col(dst_col).alias("e_dst"),
                    ),
                    F.struct(
                        F.col(dst_col).alias("e_src"),
                        F.col(src_col).alias("e_dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.e_src", "e.e_dst")
        .distinct()
        # eager=False: materializes inside the first consuming job
        # (the cap probe's count) instead of costing a standalone job
        .localCheckpoint(eager=False)
    )
    # one count over the checkpointed edges decides the path; the edge
    # pipeline itself runs exactly once either way
    if sym.count() <= driver_edge_cap:
        return _driver_union_find(nodes, sym, id_col)
    # init labels: a bare column scan — nothing worth checkpointing
    lbl = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lbl")
    )

    # convergence probe: labels are per-row monotonically NON-INCREASING
    # across a round (least() in the neighbor step; the jump assigns
    # lbl(lbl(x)) <= lbl(x) by the labels-are-member-ids invariant), so
    # the label-column SUM strictly decreases iff ANY row changed — one
    # map-side-combined aggregate per round, riding the SAME job that
    # materializes the round's checkpoint (eager=False), replacing the
    # previous separate changed-row join + limit(1) count job.
    # decimal(38,0) keeps the sum exact for arbitrary 64-bit id spaces.
    def _lbl_sum(df):
        return df.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _lbl_sum(lbl)
    for _ in range(max_iter):
        nbr = (
            sym.join(
                lbl.select(F.col("id").alias("e_dst"), F.col("lbl").alias("dlbl")),
                "e_dst",
            )
            .groupBy("e_src")
            .agg(F.min("dlbl").alias("nlbl"))
        )
        stepped = (
            lbl.join(nbr, lbl["id"] == nbr["e_src"], "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
            )
        )
        jump = stepped.select(
            F.col("id").alias("jid"), F.col("lbl").alias("jlbl")
        )
        new = (
            stepped.join(jump, stepped["lbl"] == jump["jid"], "left")
            .select("id", F.coalesce("jlbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        cur_sum = _lbl_sum(new)  # one job: materializes new + probes
        lbl = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return lbl.select(F.col("id").alias(id_col), F.col("lbl").alias("component"))


def _driver_union_find(nodes: DataFrame, sym: DataFrame, id_col: str) -> DataFrame:
    """Small-graph path: exact union-find (union-by-min-root + path
    compression, so every root IS its component's minimum id) over the
    collected symmetric edge rows, then one broadcast left join onto the
    distributed node table; nodes not touched by any edge label
    themselves. Bit-identical to the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in sym.collect():
        a, b = r["e_src"], r["e_dst"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    labels = [(x, find(x)) for x in parent]
    if not labels:
        return nodes.select(
            F.col(id_col), F.col(id_col).alias("component")
        )
    spark = nodes.sparkSession
    dt = nodes.schema[id_col].dataType.simpleString()
    lbl_df = spark.createDataFrame(labels, f"_cc_id {dt}, _cc_lbl {dt}")
    return (
        nodes.select(id_col)
        .join(F.broadcast(lbl_df), F.col(id_col) == F.col("_cc_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce("_cc_lbl", F.col(id_col)).alias("component"),
        )
    )
