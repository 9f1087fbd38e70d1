"""ToParentBlockJoinQuery twin (index/blockjoin.py): conversation-level
rollup of turn scores must equal a pandas recomputation from the engine's
own full child match set, for every ScoreMode."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.blockjoin import parent_search
from parser_indexer_py_spark.index.boolean import boolean_search
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index

N_CONVS = 40


@pytest.fixture(scope="module")
def pindex(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pjidx"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(spark, df, out, n_partitions=4, n_chunks=1)
    return load_index(spark, out)


def _child_scores(pindex, q, **kw) -> pd.DataFrame:
    """The engine's own FULL child match set (conv_id, score)."""
    rows = boolean_search(
        pindex, q, k=10_000_000, with_meta=True, **kw
    ).collect()
    return pd.DataFrame(
        [(r["conv_id"], r["score"]) for r in rows],
        columns=["parent", "score"],
    )


def _oracle(children: pd.DataFrame, mode: str, k: int, min_children=1):
    agg = {
        "max": "max", "total": "sum", "avg": "mean", "min": "min",
    }
    g = children.groupby("parent")["score"]
    s = g.max() * 0 + 1.0 if mode == "none" else getattr(g, agg[mode])()
    out = pd.DataFrame(
        {"parent": s.index, "score": s.values, "n_matched": g.count().values}
    )
    out = out[out.n_matched >= min_children]
    out = out.sort_values(
        ["score", "parent"], ascending=[False, True]
    ).head(k)
    return list(out.itertuples(index=False, name=None))


@pytest.mark.parametrize("mode", ["max", "min", "none"])
def test_parent_rollup_exact_modes(pindex, mode):
    """max/min/none are order-independent extremes of exact per-child
    scores: engine == oracle bit-for-bit."""
    q = "bace cedi"
    exp = _oracle(_child_scores(pindex, q), mode, 10)
    got = [
        (r["parent"], r["score"], r["n_matched"])
        for r in parent_search(pindex, q, k=10, score_mode=mode).collect()
    ]
    assert got == exp


@pytest.mark.parametrize("mode", ["total", "avg"])
def test_parent_rollup_float_modes(pindex, mode):
    """total/avg are float folds: same ranking keys, scores to 1e-9."""
    q = "bace cedi wedi"
    exp = _oracle(_child_scores(pindex, q), mode, 10)
    got = [
        (r["parent"], r["score"], r["n_matched"])
        for r in parent_search(pindex, q, k=10, score_mode=mode).collect()
    ]
    assert [(g[0], g[2]) for g in got] == [(e[0], e[2]) for e in exp]
    for g, e in zip(got, exp):
        assert math.isclose(g[1], e[1], rel_tol=1e-9), (g, e)


def test_parent_rollup_fq_and_min_children(pindex):
    q = "bace"
    fq = "role:assistant"
    children = _child_scores(pindex, q, fq=fq)
    exp = _oracle(children, "max", 10, min_children=2)
    got = [
        (r["parent"], r["score"], r["n_matched"])
        for r in parent_search(
            pindex, q, k=10, score_mode="max", fq=fq, min_children=2
        ).collect()
    ]
    assert got == exp
    assert all(n >= 2 for _, _, n in got)


def test_parent_rollup_expression_key(pindex):
    """parent_field accepts a Column expression (bucketed parent for a
    corpus with no natural block key — the driver-query shape)."""
    expr = F.pmod(F.crc32(F.col("conv_id")), F.lit(7)).cast("long")
    children = boolean_search(
        pindex, "bace", k=10_000_000, with_meta=True
    ).select(
        F.pmod(F.crc32(F.col("conv_id")), F.lit(7))
        .cast("long")
        .alias("parent"),
        "score",
    ).toPandas()
    exp = _oracle(children, "max", 5)
    got = [
        (r["parent"], r["score"], r["n_matched"])
        for r in parent_search(
            pindex, "bace", k=5, score_mode="max", parent_field=expr
        ).collect()
    ]
    assert got == exp


def test_parent_rollup_errors(pindex):
    with pytest.raises(ValueError, match="score_mode"):
        parent_search(pindex, "bace", score_mode="sumsq")


def test_parent_pruned_identity(pindex):
    """mode='pruned' (ScoreMode=Max delegation): same (parent, score)
    ranking as the full rollup; counts exact when the match set was
    exhausted, NULL otherwise; loud contracts for unsupported shapes."""
    for q in ["bace cedi", "bace", "bace +cedi -wedi"]:
        full = parent_search(pindex, q, k=10, score_mode="max").collect()
        pruned = parent_search(
            pindex, q, k=10, score_mode="max", mode="pruned"
        ).collect()
        assert [(r["parent"], r["score"]) for r in pruned] == [
            (r["parent"], r["score"]) for r in full
        ], q
        for pr, fu in zip(pruned, full):
            assert pr["n_matched"] is None or (
                pr["n_matched"] == fu["n_matched"]
            )
    # fq composes on the pruned path too
    a = parent_search(
        pindex, "bace", k=5, fq="role:assistant", mode="pruned"
    ).collect()
    b = parent_search(pindex, "bace", k=5, fq="role:assistant").collect()
    assert [(r["parent"], r["score"]) for r in a] == [
        (r["parent"], r["score"]) for r in b
    ]
    with pytest.raises(ValueError, match="ScoreMode=Max"):
        parent_search(pindex, "bace", score_mode="total", mode="pruned")
    with pytest.raises(ValueError, match="min_children"):
        parent_search(pindex, "bace", mode="pruned", min_children=2)
    with pytest.raises(ValueError, match="mode"):
        parent_search(pindex, "bace", mode="turbo")
