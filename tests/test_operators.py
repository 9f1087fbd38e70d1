"""Operator-library tests: enrichment (P1/P2), adjacent-span merge (J7 —
including the reference's own doctest cases from json2brat.py:23-51),
multimodal plumbing, reference scalar functions (F-family), grouped-map
carry logic, catalog, sources."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# enrich: P1 / P2
# ---------------------------------------------------------------------------


def test_enrich_turn_metadata(spark, corpus_pdf):
    from parser_indexer_py_spark.operators.enrich import enrich_turn_metadata

    df = spark.createDataFrame(corpus_pdf.head(50))
    out = enrich_turn_metadata(df)
    row = out.filter("turn_idx = 0").head()
    assert row["id"] == f"{row['conv_id']}_0"
    assert row["content"] == row["text"]
    assert row["role_s_md"] == row["role"]
    assert row["p_id"] == row["conv_id"]
    assert row["type"] == "turn"


def test_suffix_type_columns(spark):
    from parser_indexer_py_spark.operators.enrich import suffix_type_columns

    df = spark.createDataFrame(
        [(1, "x", 2.5, True, ["a", "b"])],
        "num long, s string, d double, b boolean, tags array<string>",
    )
    out = suffix_type_columns(df, ["num", "s", "d", "b", "tags"])
    assert set(out.columns) == {
        "num_l_md", "s_t_md", "d_d_md", "b_b_md", "tags_ts_md"
    }


def test_explode_parent_child(spark):
    from parser_indexer_py_spark.operators.enrich import explode_parent_child

    df = spark.createDataFrame(
        [
            Row(
                id="doc1",
                anns=[
                    Row(label="target", begin=5, end=9, text="Adiri"),
                    Row(label="element", begin=12, end=14, text="Fe"),
                ],
            )
        ]
    )
    out = explode_parent_child(df, "anns").orderBy("_depth", "id").collect()
    assert [r["_depth"] for r in out] == [0, 1, 1]
    parent = out[0]
    assert parent["id"] == "doc1" and parent["_path"] == "/"
    child = [r for r in out if r["id"] == "doc1_target_5_9"][0]
    assert child["p_id"] == "doc1" and child["_path"] == "/target"
    assert child["name"] == "Adiri" and child["span_start"] == 5


# ---------------------------------------------------------------------------
# J7: adjacent merge — reference doctest cases (json2brat.py:23-51)
# ---------------------------------------------------------------------------

MERGE_CASES = [
    # (spans, expected merged (begin, end, n_merged)) with max_gap=1
    ([(0, 5, "a"), (6, 10, "b")], [(0, 10, 2)]),
    ([(0, 5, "a"), (7, 10, "b")], [(0, 5, 1), (7, 10, 1)]),
    ([(0, 5, "a")], [(0, 5, 1)]),
    ([(0, 5, "a"), (6, 10, "b"), (11, 12, "c"), (20, 25, "d")],
     [(0, 12, 3), (20, 25, 1)]),
]


@pytest.mark.parametrize("spans,want", MERGE_CASES)
def test_merge_adjacent_spans(spark, spans, want):
    from parser_indexer_py_spark.operators.enrich import merge_adjacent_spans

    df = spark.createDataFrame(
        [("d1", b, e, t) for b, e, t in spans],
        "doc string, begin int, end int, text string",
    )
    out = (
        merge_adjacent_spans(df, ["doc"], "begin", "end", "text")
        .orderBy("begin")
        .collect()
    )
    assert [(r["begin"], r["end"], r["n_merged"]) for r in out] == want


def test_merge_adjacent_concatenates_text(spark):
    from parser_indexer_py_spark.operators.enrich import merge_adjacent_spans

    df = spark.createDataFrame(
        [("d", 0, 4, "Mars"), ("d", 5, 10, "Rover")],
        "doc string, begin int, end int, text string",
    )
    out = merge_adjacent_spans(df, ["doc"]).head()
    assert out["text"] == "Mars Rover"


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_decode_fake(spark):
    from parser_indexer_py_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_media,
        fake_decoder,
        frame_sample,
        generate_fake_media,
    )

    media = generate_fake_media(spark, 30)
    out = decode_media(media, decoder=fake_decoder)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5
        assert r["n_bytes"] > 0
    # deterministic
    rows2 = decode_media(media, decoder=fake_decoder).collect()
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]
    # frame sampling expands video rows
    vids = out.filter("kind = 'video'")
    sampled = frame_sample(vids, every_n=5)
    assert sampled.count() >= vids.count()


def test_numpy_decoder_golden():
    """Round-4: REAL pure-numpy decode of uncompressed formats — golden
    pixel/sample values, no Spark needed."""
    import numpy as np

    from parser_indexer_py_spark.operators.multimodal import (
        FEATURE_DIM,
        encode_bmp,
        encode_ppm,
        encode_wav,
        numpy_decoder,
    )

    # 2x2 PPM: black, white, mid-gray, red — thumbnail (4x4 block-mean of
    # a 2x2 image = each pixel repeated) carries the exact gray values
    rgb = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[128, 128, 128], [255, 0, 0]]],
        dtype=np.uint8,
    )
    out = numpy_decoder("image", encode_ppm(rgb))
    thumb = np.frombuffer(out["thumb"], np.uint8).reshape(4, 4)
    assert thumb[0, 0] == 0 and thumb[0, 2] == 255  # black / white
    assert thumb[2, 0] == 128  # gray: luminance of (128,128,128)
    assert thumb[2, 2] == round(255 * 0.299)  # red -> 76
    assert out["n_frames"] == 1
    assert abs(float((np.asarray(out["feature"], float) ** 2).sum()) - 1.0) < 1e-6
    # black pixel lands in bin 0; white in the top bin
    assert out["feature"][0] > 0 and out["feature"][FEATURE_DIM - 1] > 0

    # BMP roundtrip decodes to the SAME grayscale as the PPM of the
    # same pixels (bottom-up + BGR handled)
    out_bmp = numpy_decoder("image", encode_bmp(rgb))
    assert out_bmp["thumb"] == out["thumb"]

    # WAV: constant 0.5 amplitude -> every envelope segment 0.5; golden
    # sample count; feature is the L2-normalized flat envelope
    s = np.full(800, 0.5)
    out_w = numpy_decoder("audio", encode_wav(s, rate=8000))
    assert out_w["n_frames"] == 800
    env = np.frombuffer(out_w["thumb"], np.uint8)
    assert len(env) == 16 and all(abs(int(v) - 128) <= 1 for v in env)
    f = np.asarray(out_w["feature"], float)
    assert abs(float((f**2).sum()) - 1.0) < 1e-6
    assert np.allclose(f, f[0])  # flat envelope

    # compressed/unknown payloads still refuse honestly
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="codec"):
        numpy_decoder("image", b"\x89PNG\r\n\x1a\n....")


def test_multimodal_decode_real(spark):
    """The real-decode branch end-to-end through decode_media over the
    PPM/BMP/WAV fixture table."""
    from parser_indexer_py_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_media,
        generate_real_media,
        numpy_decoder,
    )

    media = generate_real_media(spark, 18)
    rows = decode_media(media, decoder=numpy_decoder).collect()
    assert len(rows) == 18
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5
        if r["kind"] == "audio":
            assert r["n_frames"] > 100  # real sample counts
        else:
            assert r["n_frames"] == 1


def test_multimodal_stub_raises(spark):
    from parser_indexer_py_spark.operators.multimodal import (
        decode_media,
        generate_fake_media,
    )

    media = generate_fake_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(media).collect()


# ---------------------------------------------------------------------------
# F-family scalar functions
# ---------------------------------------------------------------------------


def test_reference_funcs(spark):
    from parser_indexer_py_spark.functions import reference_funcs as RF

    df = spark.createDataFrame(
        [("Fe",), ("olivine ridge",), ("  K ",), ("multi word-name",)],
        "name string",
    )
    got = df.select(RF.canonical_name(F.col("name")).alias("c")).collect()
    # capwords semantics: capitalizes after whitespace only (so the char
    # after a hyphen stays lower — matches utils.py:174-184)
    assert [r["c"] for r in got] == [
        "Iron", "Olivine_Ridge", "Potassium", "Multi_Word_name",
    ]

    q = spark.createDataFrame([("What is 5+3? . K",)], "q string")
    assert (
        q.select(RF.normalize_query(F.col("q")).alias("n")).head()["n"]
        == "what is 5+3"
    )

    esc = spark.createDataFrame([("a+b:c",)], "s string")
    assert (
        esc.select(RF.escape_query_chars(F.col("s")).alias("e")).head()["e"]
        == "a\\+b\\:c"
    )

    refs = spark.createDataFrame(
        [("[1] Smith et al. 2001. [2] Jones 1999.",)], "t string"
    )
    out = refs.select(RF.extract_references(F.col("t")).alias("r")).head()["r"]
    assert [x["ref_id"] for x in out] == [1, 2]
    assert out[0]["ref_text"].startswith("Smith")

    ct = spark.createDataFrame([("application/pdf",)], "c string")
    m, s = RF.split_content_type(F.col("c"))
    row = ct.select(m, s).head()
    assert (row["mainType"], row["subType"]) == ("application", "pdf")


def test_old_canonical_target_name_parity(spark):
    """F4 parity (VERDICT r1 #10): the Catalyst expression reproduces the
    reference's old_canonical_target_name (unary_parser.py:277-295) —
    verified against a pure-Python twin of the reference code over aliased,
    non-aliased, and messy-whitespace inputs."""
    import re
    import string

    import pandas as pd
    from pyspark.sql import functions as F

    from parser_indexer_py_spark.functions.reference_funcs import (
        TARGETTAB,
        old_canonical_target_name,
    )

    def reference_twin(name: str) -> str:
        # direct Python-3 transcription of the reference function
        strip_ws = re.sub(r"[\s_-]+", " ", name.strip())
        nm = string.capwords(strip_ws).replace(" ", "_")
        return TARGETTAB.get(nm, nm)

    cases = [
        "b. bill",            # -> B._Bill -> Barnacle_Bill
        "bears lodge",        # -> Bears_Lodge -> Bear's_Lodge
        "bear's lodge",       # apostrophe survives capwords -> Bear's_Lodge
        "d_g",                # -> D_G -> Dodo_Goldilocks
        "RR1",                # capwords lowercases the tail -> Rosy_Red
        "dodo   trench",      # whitespace runs fold -> Dodo_Goldilocks_Trench
        "half-dome",          # dash folds to space -> Half_Dome (no alias)
        "souffle",            # -> Soufflé (unicode canonical)
        "Gale Crater",        # not in table: identity after capwords
        "  mm  ",             # strip + alias -> Mini_Matterhorn
    ]
    want = [reference_twin(c) for c in cases]
    assert want[0] == "Barnacle_Bill" and want[1] == "Bear's_Lodge"
    df = spark.createDataFrame(pd.DataFrame({"name": cases}))
    got = [
        r["c"]
        for r in df.select(
            old_canonical_target_name(F.col("name")).alias("c")
        ).collect()
    ]
    assert got == want


def test_alias_resolution_broadcast_join(spark):
    from parser_indexer_py_spark.functions.reference_funcs import resolve_aliases

    names = spark.createDataFrame(
        [("Windjana",), ("WJ",), ("Fe",)], "name string"
    )
    aliases = spark.createDataFrame(
        [("wj", "Windjana")], "alias string, canonical string"
    )
    out = {r["name"]: r["canonical"] for r in resolve_aliases(names, "name", aliases).collect()}
    assert out == {"Windjana": "Windjana", "WJ": "Windjana", "Fe": "Iron"}


# ---------------------------------------------------------------------------
# grouped-map carry logic
# ---------------------------------------------------------------------------


def test_grouped_map_batched_carry(spark):
    from parser_indexer_py_spark.operators.grouped import grouped_map_batched

    n = 25_000  # > arrow batch size (10k) so groups span batches
    pdf = pd.DataFrame(
        {"k": np.arange(n) // 1000, "v": np.arange(n, dtype=np.int64)}
    )
    df = spark.createDataFrame(pdf)

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("k", sort=True)["v"].agg(["count", "sum"]).reset_index()
        return g.rename(columns={"count": "cnt", "sum": "s"})

    out = grouped_map_batched(
        df, ["k"], agg, "k long, cnt long, s long", num_partitions=3
    ).toPandas()
    # every group must appear exactly once with the full count
    assert len(out) == 25
    assert (out["cnt"] == 1000).all()
    want = pdf.groupby("k")["v"].sum()
    got = out.set_index("k")["s"]
    assert (got.sort_index() == want.sort_index()).all()


# ---------------------------------------------------------------------------
# catalog + sources
# ---------------------------------------------------------------------------


def test_catalog_parquet_fallback(spark, tmp_path):
    from parser_indexer_py_spark.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path))
    assert not cat.use_iceberg  # no jar in this sandbox
    df = spark.range(5).withColumnRenamed("id", "x")
    s1 = cat.append(df, "t")
    s2 = cat.append(df, "t")
    assert (s1, s2) == (1, 2)
    assert cat.read("t").count() == 10
    assert cat.snapshot_id("t") == 2
    # snapshot ids stay MONOTONIC through truncation (Iceberg parity:
    # DELETE creates a new, higher snapshot) and a truncated table reads
    # as an empty, correctly-typed DataFrame
    cat.delete_all("t")
    assert cat.snapshot_id("t") == 3
    empty = cat.read("t")
    assert empty.count() == 0 and empty.columns == ["x"]
    assert cat.append(df, "t") == 4
    assert cat.read("t").count() == 5


def test_sources(spark, tmp_path):
    from parser_indexer_py_spark.sources.readers import (
        paged_scan,
        point_lookup,
        read_brat_ann,
        read_list_file,
    )

    lst = tmp_path / "files.list"
    lst.write_text("# comment\n/a/b.pdf\n\n/c/d.pdf\n")
    got = [r["path"] for r in read_list_file(spark, str(lst)).collect()]
    assert got == ["/a/b.pdf", "/c/d.pdf"]

    ann = tmp_path / "doc.ann"
    ann.write_text(
        "T1\tTarget 5 10\tAdiri\nT2\tElement 12 14\tFe\nR1\tcontains Arg1:T1 Arg2:T2\n"
    )
    rows = read_brat_ann(spark, str(ann)).orderBy("ann_id").collect()
    assert [r["kind"] for r in rows] == ["R", "T", "T"]
    t1 = [r for r in rows if r["ann_id"] == "T1"][0]
    assert (t1["label"], t1["span_start"], t1["span_end"], t1["text"]) == (
        "Target", 5, 10, "Adiri",
    )

    df = spark.range(100).withColumnRenamed("id", "k")
    assert point_lookup(df, "k", 42).head()["k"] == 42
    page = [r["k"] for r in paged_scan(df, ["k"], 10, 5).collect()]
    assert page == [10, 11, 12, 13, 14]


def test_merge_adjacent_spans_overlapping(spark):
    """Round-2 review: a span nested in / overlapping an earlier long span
    must join its island — the gap compares against the running max of
    ends, not lag(end)."""
    from parser_indexer_py_spark.operators.enrich import merge_adjacent_spans

    pdf = pd.DataFrame(
        {
            "doc": ["d"] * 4,
            "begin": [0, 5, 20, 205],
            "end": [100, 10, 30, 210],
            "text": ["long", "nested", "inside", "far"],
        }
    )
    out = (
        merge_adjacent_spans(spark.createDataFrame(pdf), ["doc"])
        .orderBy("begin")
        .collect()
    )
    assert [(r["begin"], r["end"], r["n_merged"]) for r in out] == [
        (0, 100, 3),
        (205, 210, 1),
    ]


def test_carry_split_null_group_keys():
    """Round-2 review: a null-keyed group must be CARRIED across batch
    boundaries, not emitted as complete (== against NaN is all-False)."""
    from parser_indexer_py_spark.operators.grouped import _carry_split

    pdf = pd.DataFrame({"k": [None, None, None], "v": [1, 2, 3]})
    head, carry = _carry_split(pdf, ["k"])
    assert len(head) == 0 and len(carry) == 3
    pdf2 = pd.DataFrame({"k": ["a", "a", None], "v": [1, 2, 3]})
    head2, carry2 = _carry_split(pdf2, ["k"])
    assert list(head2["k"]) == ["a", "a"] and len(carry2) == 1


def test_datagen_empty_and_media_repartition(spark):
    from parser_indexer_py_spark.datagen import generate_transcripts_pandas
    from parser_indexer_py_spark.operators.multimodal import (
        generate_fake_media,
        repartition_for_media,
    )

    empty = generate_transcripts_pandas(0)
    assert len(empty) == 0
    assert list(empty.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # default sizing works on the RAW media table (round-2 review: the old
    # default named a column only the decoded output carries)
    media = generate_fake_media(spark, 12)
    out = repartition_for_media(media, target_bytes=1 << 10)
    assert out.count() == 12 and out.rdd.getNumPartitions() >= 1


def test_gram_slide_matches_naive_shingles(spark, tmp_path):
    """The zero-shuffle array-slide 3-gram derivation (entry_text_queries.
    _grams) must equal naive Python shingling over the non-empty token
    sequence — including messy whitespace, short docs, and case folding."""
    from parser_indexer_py_spark.entry_text_queries import _grams

    texts = [
        "a b c d e",
        "one  two   three four",   # runs of spaces do not break adjacency
        "short one",                # < 3 tokens: no grams
        "x",
        "",
        "  leading and trailing  ",
        "CASE Folded TOKENS here",
        "rep rep rep rep",          # duplicate grams collapse (distinct)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        (r["doc_id"], r["g"]) for r in _grams(spark, sf_dir).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split(" ") if w]
        for j in range(len(toks) - 2):
            want.add((i, " ".join(toks[j : j + 3])))
    assert got == want


def test_sinks_roundtrip(spark, tmp_path):
    """S12 CSV sink and S13 brat sink: write -> read back equals source."""
    from parser_indexer_py_spark.sources.readers import (
        read_brat_ann,
        write_brat,
        write_csv,
    )

    # S13: brat roundtrip (T + relation records)
    ann = tmp_path / "src.ann"
    ann.write_text(
        "T1\tTarget 5 10\tAdiri\nT2\tElement 12 14\tFe\nR1\tcontains Arg1:T1 Arg2:T2\n"
    )
    src = read_brat_ann(spark, str(ann))
    out_dir = str(tmp_path / "out_ann")
    write_brat(src, out_dir)
    back = read_brat_ann(spark, out_dir)
    key = ["ann_id", "kind", "label", "span_start", "span_end", "text"]
    assert sorted(map(tuple, src.select(key).collect())) == sorted(
        map(tuple, back.select(key).collect())
    )

    # S12: CSV roundtrip with header
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    )
    csv_dir = str(tmp_path / "out_csv")
    write_csv(df, csv_dir)
    back_csv = spark.read.csv(csv_dir, header=True, inferSchema=True)
    assert sorted(map(tuple, back_csv.collect())) == [(1, "x"), (2, "y"), (3, "z")]


def test_sample_hash_gate_deterministic(spark):
    """Hash-gate sampling is a property of the row: the kept set is
    identical at any partitioning (what Spark's RNG samplers do NOT
    guarantee), nested samples are monotone, and different salts give
    independent gates."""
    from parser_indexer_py_spark.operators.sampling import (
        sample_hash_gate,
        sample_stratified,
    )

    df = spark.range(0, 2000).withColumn(
        "grp", (F.col("id") % 3).cast("string")
    )

    def kept(d, **kw):
        return {r["id"] for r in sample_hash_gate(d, "id", **kw).collect()}

    a = kept(df.repartition(1), fraction=0.3)
    b = kept(df.repartition(7), fraction=0.3)
    assert a == b and 0.2 < len(a) / 2000 < 0.4
    # monotone nesting: the 10% sample is a subset of the 30% sample
    s10 = kept(df, fraction=0.1)
    assert s10 <= a and len(s10) < len(a)
    # a different salt draws an (almost surely) different set
    assert kept(df, fraction=0.3, salt="other") != a
    # stratified: per-stratum fractions + default, same determinism
    st = sample_stratified(
        df, "id", "grp", {"0": 0.5, "1": 0.05}, default=0.2
    )
    got = {r["id"] for r in st.collect()}
    per = {
        g: sum(1 for i in got if i % 3 == int(g)) / (2000 / 3)
        for g in ("0", "1", "2")
    }
    assert 0.4 < per["0"] < 0.6 and per["1"] < 0.12 and 0.12 < per["2"] < 0.3
    # stratum rows ride their own fraction of the SAME gate: stratum-0's
    # kept ids at 0.5 contain every stratum-0 id from the flat 30% sample
    assert {i for i in a if i % 3 == 0} <= got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside"):
        sample_hash_gate(df, "id", 1.5)


def test_pack_offsets_partition_invariant(spark):
    """Concat-and-chunk packing: the distributed range-partition +
    broadcast-base prefix sum equals the serial cumsum at every
    partition count, with exact DIV sequence spans."""
    import numpy as np

    from parser_indexer_py_spark.operators.packing import pack_offsets

    n = 500
    df = spark.range(0, n).withColumn(
        "ln", (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).cast("long")
    )
    pdf = df.orderBy("id").toPandas()
    lens = pdf["ln"].to_numpy()
    off = np.concatenate(([0], np.cumsum(lens)[:-1]))
    B = 256
    exp = [
        (int(i), int(l), int(o), int(o // B), int((o + l - 1) // B),
         bool(o // B != (o + l - 1) // B))
        for i, l, o in zip(pdf["id"], lens, off)
    ]
    for parts in (1, 3, 16):
        got = [
            (r["id"], r["len"], r["offset"], r["seq_first"], r["seq_last"],
             r["crosses"])
            for r in pack_offsets(df, "id", "ln", B, n_partitions=parts)
            .orderBy("id")
            .collect()
        ]
        assert got == exp, parts
    # every budget window is fully covered: consecutive rows tile the
    # stream with no gaps or overlaps
    assert exp[-1][2] + exp[-1][1] == int(lens.sum())
    with pytest.raises(ValueError, match="budget"):
        pack_offsets(df, "id", "ln", 0)


def test_assign_splits_disjoint_exhaustive(spark):
    """Every row gets exactly one split; fractions land near targets;
    assignment is invariant to partitioning; fractions must sum to 1."""
    from parser_indexer_py_spark.operators.sampling import assign_splits

    df = spark.range(0, 3000)
    out = assign_splits(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["id"]: r["split"] for r in out.collect()}
    assert len(got) == 3000  # one label per row, none dropped
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 3000 < 0.85
    # partitioning-invariant
    got7 = {
        r["id"]: r["split"]
        for r in assign_splits(
            df.repartition(7), "id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert got7 == got
    with pytest.raises(ValueError, match="sum"):
        assign_splits(df, "id", {"train": 0.9, "val": 0.2})


def test_sample_by_column(spark):
    """Per-row keep probability: same gate as the flat sampler, so a
    constant column equals sample_hash_gate exactly; clamping works."""
    from parser_indexer_py_spark.operators.sampling import (
        sample_by_column,
        sample_hash_gate,
    )

    df = spark.range(0, 1000).withColumn(
        "q", (F.col("id") % 100) / F.lit(100.0)
    )
    flat = {r["id"] for r in sample_hash_gate(df, "id", 0.3).collect()}
    const = {
        r["id"]
        for r in sample_by_column(df, "id", F.lit(0.3)).collect()
    }
    assert const == flat
    # keep rate rises with the per-row probability column
    kept = {r["id"] for r in sample_by_column(df, "id", "q").collect()}
    lo = sum(1 for i in kept if i % 100 < 20) / (1000 * 0.2)
    hi = sum(1 for i in kept if i % 100 >= 80) / (1000 * 0.2)
    assert lo < 0.25 and hi > 0.7
    # clamp: fractions > 1 keep everything, < 0 keep nothing
    assert sample_by_column(df, "id", F.lit(2.0)).count() == 1000
    assert sample_by_column(df, "id", F.lit(-1.0)).count() == 0
