"""Deterministic synthetic transcript corpus generator.

Schema (BASELINE.json input_hint):
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Design requirements it satisfies:
- **Deterministic at any parallelism.** Every value is a pure function of
  (SEED, conv number, turn index, token position) via a splitmix64
  counter-based hash — no RNG state crosses rows, so local[8] and local[32]
  produce byte-identical corpora (needed for the N-vs-4N scaling bench and
  the docID-stability test).
- **Zipfian vocabulary (s≈1.1, 50k terms)** so hot-term skew is real and the
  salted posting build is actually exercised (SURVEY.md §7.2 risk register).
- **Unicode punctuation cases** (curly quotes, unicode hyphens, nbsp —
  /root/reference/src/parserindexer/paper_parser.py:36-52) injected into a
  deterministic subset of turns to exercise normalization.

Generation is distributed: ``spark.range(n_convs)`` -> ``mapInPandas`` where
each conversation expands to its turns with numpy-vectorized token draws.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = np.uint64(0x5EED_CAFE_F00D_2026)
VOCAB_SIZE = 50_000
ZIPF_S = 1.1
MAX_TURNS_PER_CONV = 64
MIN_TOKENS, MAX_TOKENS = 5, 48
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "ri", "so", "tu", "va", "we", "xi", "yo", "zu",
]


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche hash."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _h(*parts: np.ndarray) -> np.ndarray:
    acc = np.asarray(SEED, dtype=np.uint64)
    for p in parts:
        acc = _mix(acc ^ np.asarray(p, dtype=np.uint64))
    return acc


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> np.uint64(11)).astype(np.float64) * 2.0**-53


def make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Pseudo-word vocabulary: base-20 syllable expansion of the term id
    (unique, pronounceable-ish, stable)."""
    words = []
    for i in range(size):
        n, parts = i + 20, []  # +20 guarantees >=2 syllables, no collisions
        while n:
            n, d = divmod(n, 20)
            parts.append(_SYLLABLES[d])
        words.append("".join(parts))
    return words


def zipf_cdf(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), s)
    return np.cumsum(p / p.sum())


def _gen_convs(
    conv_nums: np.ndarray,
    vocab: np.ndarray,
    cdf: np.ndarray,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    topical: float = 0.0,
    n_topics: int = 8,
    topic_ranks: tuple = (20, 2000),
) -> pd.DataFrame:
    """Expand an array of conversation numbers into their turn rows.
    ``max_tokens`` is an EXCLUSIVE bound (turns carry min..max-1 tokens) —
    documented rather than changed: the generator is the deterministic
    twin for every golden corpus already recorded.

    ``topical`` > 0 switches on the SKEWED corpus mode (round-4 verdict
    task 2): each token draws, with probability ``topical``, from the
    conversation's ``n_topics`` topic slots instead of the global zipf.
    Topic terms are uniform over the ``topic_ranks`` vocabulary band
    (default ranks [20, 2000): mid-frequency terms — hot enough that a
    topic-term query carries real postings volume, rare enough that a
    term is topical in only a sliver of conversations) and fixed per
    (conversation, slot); the slot pick is quadratically biased toward
    slot 0, so each doc gets one dominant topic term at tf ~4-8 plus a
    tail. Two corpus properties the flat mode lacks, both needed to
    exercise block-max pruning the way real text does:

    - heavy-tailed within-doc tf (bursty terms -> high per-doc BM25),
    - docID clustering: topics are per CONVERSATION and docIDs follow
      (conv_id, turn_idx) order, so a term's topical postings sit in a
      few consecutive runs of its posting list — most blocks keep low
      tf<=2 bounds while the topical blocks carry high ones, which is
      exactly the variance WAND's theta_k > R check needs to certify
      pruning (on the flat corpus every hot-term block bound is equal
      and the check always falls back — BENCH/BASELINE.md round 4).

    ``topical=0`` (the default) is byte-identical to the original
    generator — every recorded golden corpus stays valid."""
    conv_nums = conv_nums.astype(np.uint64)
    if len(conv_nums) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=str),
                "turn_idx": pd.Series([], dtype=np.int32),
                "role": pd.Series([], dtype=str),
                "text": pd.Series([], dtype=str),
                "tool": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[s]"),
            }
        )
    n_turns = 1 + (
        _u01(_h(conv_nums, np.uint64(1))) * MAX_TURNS_PER_CONV
    ).astype(np.int64)
    conv_per_turn = np.repeat(conv_nums, n_turns)
    # vectorized "concat of aranges": global index minus each group's start
    turn_starts = np.concatenate([[0], np.cumsum(n_turns[:-1])])
    turn_idx = (
        np.arange(int(n_turns.sum()), dtype=np.int64)
        - np.repeat(turn_starts, n_turns)
    )

    h_turn = _h(conv_per_turn, turn_idx.astype(np.uint64), np.uint64(2))
    n_tok = min_tokens + (
        _u01(h_turn) * (max_tokens - min_tokens)
    ).astype(np.int64)

    # roles: turn 0 is system ~20% of convs; else alternate user/assistant
    # with ~8% tool turns — mirrors agent-transcript shape.
    r = _u01(_h(conv_per_turn, turn_idx.astype(np.uint64), np.uint64(3)))
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where((turn_idx == 0) & (r < 0.2), "system", role)
    role = np.where((turn_idx > 0) & (r > 0.92), "tool", role)
    tool_pick = (r * 1e6).astype(np.int64) % (len(TOOLS) - 1)
    tool = np.where(role == "tool", TOOLS[tool_pick], None)

    # tokens: one flat draw for every token position in the batch
    total_tok = int(n_tok.sum())
    tok_conv = np.repeat(conv_per_turn, n_tok)
    tok_turn = np.repeat(turn_idx, n_tok).astype(np.uint64)
    tok_starts = np.concatenate([[0], np.cumsum(n_tok[:-1])])
    tok_pos = (
        np.arange(total_tok, dtype=np.int64) - np.repeat(tok_starts, n_tok)
    ).astype(np.uint64)
    u = _u01(_h(tok_conv, tok_turn * np.uint64(1_000_003), tok_pos, np.uint64(4)))
    term_ids = np.searchsorted(cdf, u, side="left")
    if topical > 0.0:
        u_sel = _u01(
            _h(tok_conv, tok_turn * np.uint64(1_000_003), tok_pos, np.uint64(7))
        )
        u_slot = _u01(
            _h(tok_conv, tok_turn * np.uint64(1_000_003), tok_pos, np.uint64(8))
        )
        slot = (u_slot * u_slot * n_topics).astype(np.uint64)
        lo, hi = int(topic_ranks[0]), min(int(topic_ranks[1]), len(vocab))
        topic_ids = lo + (
            _h(tok_conv, slot, np.uint64(9)) % np.uint64(hi - lo)
        ).astype(np.int64)
        term_ids = np.where(u_sel < topical, topic_ids, term_ids)
    words = vocab[np.minimum(term_ids, len(vocab) - 1)]

    # unicode punctuation injection on a deterministic subset of tokens.
    # Only ~4/211 of tokens are decorated, so decorate just those indices
    # on an object array instead of 8 full-corpus np.char.add copies
    # (byte-identical; measured ~2.8s -> ~0.05s per 1.3M-token partition).
    deco = _h(tok_conv, tok_turn, tok_pos, np.uint64(5)) % np.uint64(211)
    words = words.astype(object)
    for val, pre, post in (
        (0, "\u201c", "\u201d"), (1, "\u2018", "\u2019"),
        (2, "", "\u2013next"), (3, "", "\u00a0"),
    ):
        sel = np.flatnonzero(deco == val)
        if len(sel):
            words[sel] = [pre + w + post for w in words[sel]]

    # per-turn text via ONE global " ".join + offset slicing, identical to
    # a per-turn " ".join (the global join's inter-turn separators land on
    # the dropped boundary positions) — replaces a pandas groupby-join
    # (measured ~1.2s -> ~0.2s per partition)
    if total_tok:
        joined = " ".join(words.tolist())
        wl = np.fromiter(
            (len(w) for w in words), dtype=np.int64, count=total_tok
        ) + 1  # +1 for the following separator
        tok_char_end = np.cumsum(wl)  # end offset incl. trailing sep
        tok_char_start = tok_char_end - wl
        first_tok = tok_starts
        last_tok = np.concatenate([tok_starts[1:], [total_tok]]) - 1
        has = n_tok > 0
        s = np.where(
            has, tok_char_start[np.minimum(first_tok, total_tok - 1)], 0
        )
        e = np.where(has, tok_char_end[np.maximum(last_tok, 0)] - 1, 0)
        text = np.array(
            [joined[a:b] for a, b in zip(s.tolist(), e.tolist())],
            dtype=object,
        )
    else:
        text = np.full(len(turn_idx), "", dtype=object)

    base = np.datetime64("2025-01-01T00:00:00")
    conv_offset = (_h(conv_per_turn, np.uint64(6)) % np.uint64(86_400 * 365)).astype(
        np.int64
    )
    ts = base + conv_offset.astype("timedelta64[s]") + (turn_idx * 7).astype(
        "timedelta64[s]"
    )

    return pd.DataFrame(
        {
            "conv_id": np.char.add(
                "conv-", np.char.zfill(conv_per_turn.astype(np.int64).astype(str), 8)
            ),
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    partitions: int | None = None,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    topical: float = 0.0,
    n_topics: int = 8,
    topic_ranks: tuple = (20, 2000),
) -> DataFrame:
    """Distributed deterministic generation of ``n_convs`` conversations.
    ``topical`` > 0 selects the skewed (bursty-tf, docID-clustered)
    corpus mode — see :func:`_gen_convs`."""
    vocab = np.array(make_vocab())
    cdf = zipf_cdf()
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_convs(
                    pdf["id"].to_numpy(), vocab, cdf, min_tokens,
                    max_tokens, topical, n_topics, topic_ranks,
                )

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def generate_transcripts_pandas(
    n_convs: int, topical: float = 0.0
) -> pd.DataFrame:
    """Driver-side twin for small unit-test corpora (identical output)."""
    return _gen_convs(
        np.arange(n_convs, dtype=np.uint64), np.array(make_vocab()),
        zipf_cdf(), topical=topical,
    )
