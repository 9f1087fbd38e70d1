"""Round-6 optimization internals: the Python fast-path hashes must equal
the JVM expression formulas they replaced bit-for-bit.

- minhash signatures: ``int.from_bytes(md5(f"{i}#{g}").digest()[:8]) >> 4``
  (the mapInPandas hasher in ``_minhash_sig_wide``) vs the original
  ``conv(substr(md5(concat_ws('#', i, g)), 1, 15), 16, 10)`` JVM chain;
- docmap dl: the ``_fold_series(...).str.count`` token count vs
  ``size(tokens_expr(text))`` on adversarial strings, including the
  NULL-text case (Spark 4 returns NULL, and so must the build's masked
  Int32 column) and a build-level null round-trip.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_minhash_python_hasher_equals_jvm_formula(spark):
    from parser_indexer_py_spark.entry_queries import _md5_long

    grams = [
        "alpha beta gamma",
        "",
        "unicode “quoted” – text",
        "tab\tand nl\n inside",
        "x" * 500,
    ]
    df = spark.createDataFrame([(g,) for g in grams], "g string")
    for i in (0, 7, 15):
        jvm = [
            r["h"]
            for r in df.select(
                _md5_long(
                    F.concat_ws("#", F.lit(str(i)), F.col("g"))
                ).alias("h")
            ).collect()
        ]
        py = [
            int.from_bytes(
                hashlib.md5(f"{i}#".encode() + g.encode("utf-8")).digest()[:8],
                "big",
            )
            >> 4
            for g in grams
        ]
        assert jvm == py, f"hash {i} diverged"


def test_dl_count_equals_jvm_tokens_size(spark):
    from parser_indexer_py_spark.functions.analyzer import (
        _TOKEN_RE_PY,
        _fold_series,
        tokens_expr,
    )
    import pandas as pd

    texts = [
        "plain words here",
        "",
        "   ",
        "hy-\nphenated line\nwraps",
        "don't u.s.a 3.14 “curly” –dash… a b",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [
        r["n"]
        for r in df.select(
            F.size(tokens_expr(F.col("text"))).alias("n")
        ).collect()
    ]
    s = pd.Series(texts, dtype=object)
    py = _fold_series(s).str.count(_TOKEN_RE_PY).astype(int).tolist()
    # Spark 4: size(tokens_expr(NULL)) is NULL — the build's dl pass
    # mirrors that with a masked Int32 column
    py = [None if t is None else c for t, c in zip(texts, py)]
    assert jvm == py


def test_build_null_text_dl_is_null(spark, tmp_path):
    from parser_indexer_py_spark.index.build import build_index

    rows = [
        ("c-0", 0, "user", "bace cedi wedi", None, "2025-01-01 00:00:00"),
        ("c-0", 1, "assistant", None, None, "2025-01-01 00:00:07"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "nulltext_idx")
    build_index(spark, df, out, n_chunks=1)
    dm = {
        r["turn_idx"]: r["dl"]
        for r in spark.read.parquet(out + "/docmap").collect()
    }
    assert dm[0] == 3 and dm[1] is None
