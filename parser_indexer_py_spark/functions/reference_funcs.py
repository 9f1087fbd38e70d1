"""Scalar functions from the reference (SURVEY.md §2.8), as Catalyst
expressions — the F-family. Each cites its reference twin; all are pure
column expressions (whole-stage codegen, no Python)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 symbol table (utils.py:52-171 has the full chemistry table; a
# representative subset here — callers pass their own map for full coverage)
DEFAULT_SYMTAB = {
    "H": "Hydrogen", "He": "Helium", "Li": "Lithium", "C": "Carbon",
    "N": "Nitrogen", "O": "Oxygen", "Na": "Sodium", "Mg": "Magnesium",
    "Al": "Aluminum", "Si": "Silicon", "P": "Phosphorus", "S": "Sulfur",
    "Cl": "Chlorine", "K": "Potassium", "Ca": "Calcium", "Ti": "Titanium",
    "Mn": "Manganese", "Fe": "Iron", "Ni": "Nickel", "Zn": "Zinc",
}


def _map_literal(d: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in d.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def canonical_name(col: Column, symtab: dict[str, str] | None = None) -> Column:
    """F1 (utils.py:174-184): <=3-char element symbol -> full name via the
    symbol table; else title-case with [\\s_-]+ collapsed to '_'."""
    m = _map_literal(symtab or DEFAULT_SYMTAB)
    trimmed = F.trim(col)
    sym = F.element_at(m, F.initcap(F.lower(trimmed)))
    fallback = F.regexp_replace(F.initcap(trimmed), r"[\s_\-]+", "_")
    return F.when(
        (F.length(trimmed) <= 3) & sym.isNotNull(), sym
    ).otherwise(fallback)


def canonical_component_name(col: Column, symtab: dict[str, str] | None = None) -> Column:
    """F3 (utils.py:212-219): de-hyphenate, canonicalize per word, re-join."""
    words = F.split(F.regexp_replace(col, "-", " "), r"\s+")
    return F.array_join(
        F.transform(words, lambda w: canonical_name(w, symtab)), "_"
    )


# F4 alias table, verbatim from the reference (utils.py:10-49 targettab):
# MPF / PHX target-name aliases -> canonical names.
TARGETTAB = {
    # MPF
    "B._Bill": "Barnacle_Bill",
    "Bakers_Bench": "Baker's_Bench",
    "Bambam": "Bam_Bam",
    "Bamm_Bamm": "Bam_Bam",
    "Fat_Top": "Flat_Top",
    "Garak": "Garrak",
    "Ga_Rrak": "Garrak",
    "H._Dome": "Half_Dome",
    "Hobbs": "Hobbes",
    "Mini-Matterhorn": "Mini_Matterhorn",
    "Mm": "Mini_Matterhorn",
    "Poohbear": "Pooh_Bear",
    "Scooby": "Scooby_Doo",
    "Souffl": "Soufflé",
    "Souffle": "Soufflé",
    "Souffle'": "Soufflé",
    "Soufle": "Soufflé",
    # PHX
    "Bb": "Baby_Bear",
    "Bc": "Burning_Coals",
    "Bears_Lodge": "Bear's_Lodge",
    "Dg": "Dodo_Goldilocks",
    "D_G": "Dodo_Goldilocks",
    "Dodo": "Dodo_Goldilocks",
    "Dodogoldilocks": "Dodo_Goldilocks",
    "Dodo-goldilocks": "Dodo_Goldilocks",
    "Dodo-Goldilocks": "Dodo_Goldilocks",
    "Dodogoldilocks_Trench": "Dodo_Goldilocks_Trench",
    "Dodo-goldilocks_Trench": "Dodo_Goldilocks_Trench",
    "Dodo-Goldilocks_Trench": "Dodo_Goldilocks_Trench",
    "Dodo_Trench": "Dodo_Goldilocks_Trench",
    "Lamancha": "La_Mancha",
    "Mamma_Bear": "Mama_Bear",
    "Mancha": "La_Mancha",
    "Rr": "Rosy_Red",
    "Rr1": "Rosy_Red",
    "Rr2": "Rosy_Red",
    "Ww": "Wicked_Witch",
}


def old_canonical_target_name(col: Column) -> Column:
    """F4 (unary_parser.py:277-295 old_canonical_target_name): strip, fold
    [\\s_-]+ runs to one space, string.capwords (== initcap: first letter of
    each whitespace-word uppercased, rest lowercased — so "Bear's Lodge"
    does NOT become "Bear'S Lodge"), spaces -> underscores, then targettab
    alias expansion with identity fallback."""
    strip_ws = F.regexp_replace(F.trim(col), r"[\s_\-]+", " ")
    name = F.regexp_replace(F.initcap(strip_ws), " ", "_")
    return F.coalesce(F.element_at(_map_literal(TARGETTAB), name), name)


def resolve_aliases(df, name_col: str, alias_df, out_col: str = "canonical"):
    """F2/J4 (utils.py:187-210): alias resolution as a broadcast left join
    against an (alias, canonical) dimension table, falling back to F1."""
    joined = df.join(
        F.broadcast(alias_df),
        F.lower(F.col(name_col)) == F.lower(alias_df["alias"]),
        "left",
    )
    return joined.withColumn(
        out_col,
        F.coalesce(alias_df["canonical"], canonical_name(F.col(name_col))),
    ).drop("alias")


_SOLR_METACHARS = r'([+\-!(){}\[\]^"~*?:\\/]|&&|\|\|)'


def escape_query_chars(col: Column) -> Column:
    """F5 (ads_parser.py:30-54): escape Lucene query metacharacters — kept
    for query-string compatibility with reference clients."""
    return F.regexp_replace(col, _SOLR_METACHARS, r"\\$1")


def normalize_query(col: Column) -> Column:
    """F6 (ads_parser.py:56-87 special_rules): drop '?', lowercase, strip a
    trailing '. K' sentence tail and LPSC abstract headers."""
    c = F.regexp_replace(col, r"\?", "")
    c = F.lower(c)
    c = F.regexp_replace(c, r"\.\s*k$", "")
    c = F.regexp_replace(
        c, r"^(lunar and planetary science [xvi]+[^:]*:?\s*)", ""
    )
    return F.trim(c)


def strip_lpsc_boilerplate(col: Column) -> Column:
    """F9 (lpsc_parser.py:30-41): abstract-id + conference-header removal."""
    c = F.regexp_replace(col, r"(?m)^\s*\d{4}\.pdf\s*$", "")
    c = F.regexp_replace(
        c,
        r"(?i)\d+(st|nd|rd|th)\s+lunar and planetary science conference\s*"
        r"\(\s*\d{4}\s*\)",
        "",
    )
    return F.regexp_replace(c, r"(?m)^\s*lpsc\s+[xvi]+\s*$", "")


def extract_references(col: Column) -> Column:
    """F10 (brat_ann_indexer.py:12-40): '[N] ...' bibliography entries ->
    array of structs (ref_id, ref_text)."""
    raw = F.regexp_extract_all(col, F.lit(r"\[(\d+)\][^\[]+"), 0)
    return F.transform(
        raw,
        lambda s: F.struct(
            F.regexp_extract(s, r"\[(\d+)\]", 1).cast("int").alias("ref_id"),
            F.trim(F.regexp_replace(s, r"^\[\d+\]", "")).alias("ref_text"),
        ),
    )


def primary_author(col: Column) -> Column:
    """F12 (indexer.py:166-184): first multi-char word phrase before a
    digit/punct boundary, title-cased."""
    return F.initcap(
        F.trim(F.regexp_extract(col, r"^([A-Za-z][A-Za-z .\-']{2,}?)[,0-9(]", 1))
    )


def lpsc_id_from_path(col: Column) -> Column:
    """F13 (indexer.py:32-44): path -> (doc_id, year, url) struct; 2-digit
    years are 2000-based."""
    yy = F.regexp_extract(col, r"lpsc(\d{2})", 1).cast("int")
    num = F.regexp_extract(col, r"(\d{4})\.pdf$", 1)
    return F.struct(
        F.concat(F.lit("lpsc"), yy.cast("string"), F.lit("-"), num).alias("doc_id"),
        (yy + 2000).alias("year"),
        F.concat(
            F.lit("https://www.hou.usra.edu/meetings/lpsc"),
            (yy + 2000).cast("string"), F.lit("/pdf/"), num, F.lit(".pdf"),
        ).alias("url"),
    )


def split_content_type(col: Column) -> tuple[Column, Column]:
    """F15 (indexer.py:81-83): 'main/sub' -> (mainType, subType)."""
    parts = F.split(col, "/")
    return parts.getItem(0).alias("mainType"), parts.getItem(1).alias("subType")


def capwords_title(col: Column) -> Column:
    """F14 (indexer.py:156-159): string.capwords ≙ initcap."""
    return F.initcap(col)
