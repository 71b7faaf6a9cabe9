"""Byte-pair-encoding tokenization as pure JVM expressions — real BPE
token counts for training-data pipelines (sequence packing, length
filtering, cost estimation) without a Python UDF in the hot path.

Two pieces, mirroring how production tokenizers are built and used:

- ``bpe_learn_merges``: TRAIN a merge table from a corpus — a
  distributed word-frequency aggregate (bounded to the top
  ``max_words`` forms, the same vocab-cap discipline as
  ``unigram_logprob``) collected to the driver, then the classic
  Sennrich et al. 2016 greedy pair-merge loop over the (word, freq)
  dict. The collect is O(max_words), never corpus-sized.
- ``bpe_token_count`` / ``bpe_pieces``: ENCODE with a FIXED merge
  table (the production mode: tokenizers ship as frozen artifacts) as
  a pure column expression — per word, space-delimit its characters
  and apply each merge in rank order as one string ``replace``.

Why sequential replace is exact BPE: the reference encoder repeatedly
merges the lowest-ranked pair present. Merging pair (a,b) -> ab only
creates NEW adjacencies that involve ab, and any learned merge
consuming ab must have been learned after ab existed, i.e. carries a
HIGHER rank — so a single pass through the table in rank order can
never miss a lower-ranked opportunity (new opportunities only appear
further down the table). Within one merge, a global left-to-right
non-overlapping replace is exactly the encoder's merge-all-occurrences
step ("a a a" + merge (a,a) -> "aa a", leftmost-greedy). Both Spark's
``replace`` and ANSI/DuckDB ``replace`` implement that scan, which is
what makes the encoding bit-identical across engines and lets the
driver gate oracle-verify real BPE output.

Symbol framing: a bare space-delimited representation is AMBIGUOUS —
searching 'a s' inside 'f a st' matches the 's' PREFIX of symbol
'st' (found by the corpus equivalence test), and any one-sided marker
fails symmetrically on suffixes or breaks adjacent-run greediness by
sharing the boundary character. Each symbol is therefore framed as
``US + symbol + SP`` (US = \\x1f, outside the printable-ASCII symbol
alphabet): a merge pattern ``US a SP US b SP -> US ab SP`` can only
match two whole adjacent symbols, and neighbouring matches share no
characters, so "a a a a" merges to "aa aa" exactly like the encoder.

Scope: words are whitespace-split, lowercased, and BPE applies to
printable-ASCII words (the regex class both engines' regex dialects
treat identically); any other word counts as ONE token (UNK) — the
usual byte-fallback is a vocab detail, not a pipeline-shape one.

Scale: encoding is a per-row projection — no shuffle, no Python
workers, whole-stage codegen; training is one word-count shuffle
(partial-aggregable) plus a bounded driver loop.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Printable ASCII, no space — identical semantics in Java regex (Spark)
# and RE2 (DuckDB).
ASCII_WORD_RE = r"^[\x21-\x7e]+$"

# Frozen default merge table: learned ONCE by bpe_learn_merges over
# /root/testdata/sf0.01 documents (n_merges=64, max_words=65536) and
# vendored here, the way production tokenizers ship a fixed merges.txt.
# Rank order matters; see module docstring for why sequential
# application is exact.
DEFAULT_MERGES: List[Tuple[str, str]] = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    ('j', 'o'),
    ('jo', 'in'),
    ('a', 's'),
    ('as', 'h'),
    ('h', 'ash'),
    ('r', 'ow'),
    ('at', 'c'),
    ('atc', 'h'),
    ('b', 'atch'),
    ('a', 'n'),
    ('c', 'an'),
    ('s', 'can'),
    ('c', 'o'),
    ('c', 'u'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n'),
    ('cu', 'st'),
    ('cust', 'o'),
    ('custo', 'mer'),
    ('f', 'i'),
    ('fi', 'l'),
    ('fil', 't'),
    ('filt', 'er'),
    ('a', 'l'),
    ('al', 'l'),
    ('m', 'all'),
    ('s', 'mall'),
    ('g', 'e'),
    ('l', 'ow'),
    ('mer', 'ge'),
    ('s', 'low'),
    ('c', 't'),
    ('ct', 'or'),
    ('d', 'er'),
    ('e', 'ctor'),
    ('or', 'der'),
    ('v', 'ector'),
    ('in', 'e'),
    ('l', 'ine'),
    ('a', 'b'),
    ('ab', 'l'),
    ('abl', 'e'),
    ('at', 'a'),
    ('d', 'ata'),
    ('t', 'able'),
    ('u', 'p'),
    ('a', 'g'),
    ('ag', 'g'),
    ('a', 'lu'),
    ('alu', 'e'),
    ('v', 'alue'),
    ('e', 'y'),
    ('k', 'ey'),
]


# Unit separator: frames every symbol's START. Cannot occur inside a
# symbol (symbols are printable ASCII \x21-\x7e), and is STRIPPED from
# input text before framing — an embedded US in a document would
# otherwise inflate the count-by-US trick while the SQL oracle's CASE
# counts the word once (ADVICE r8). Both engines strip it identically.
US = "\x1f"


def validate_merges(merges: Sequence[Tuple[str, str]]) -> None:
    """Reject merge tables the sequential-replace encoder is not exact
    for. The proof in the module docstring needs the table to be
    TRAINED-ORDERED (topological in rank): every merge's components must
    be single characters or the outputs of EARLIER merges. An arbitrary
    table (e.g. [('ab','c'), ('a','b')]) would silently encode
    differently from the reference priority-queue encoder, so it raises
    instead (ADVICE r8)."""
    known = set()
    for i, (a, b) in enumerate(merges):
        for part in (a, b):
            if len(part) != 1 and part not in known:
                raise ValueError(
                    f"merges[{i}] = ({a!r}, {b!r}): component {part!r} is "
                    "neither a single character nor the output of an "
                    "earlier merge — sequential-replace encoding is only "
                    "exact for trained (rank-ordered) merge tables"
                )
        known.add(a + b)


def _framed_chars(word: Column) -> Column:
    """'fast' -> '<US>f <US>a <US>s <US>t ' — one framed symbol per
    character (the initial BPE state). Strips any embedded US first —
    the frame marker must count symbols, not input bytes."""
    return F.regexp_replace(
        F.replace(word, F.lit(US), F.lit("")), "(.)", US + "$1 "
    )


def _apply_merges(sym: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    for a, b in merges:
        sym = F.replace(
            sym, F.lit(f"{US}{a} {US}{b} "), F.lit(f"{US}{a}{b} ")
        )
    return sym


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit("")
    )


def bpe_pieces_for_word(word: Column,
                        merges: Sequence[Tuple[str, str]]) -> Column:
    """Array of BPE symbols for one (lowercased, ASCII) word column."""
    merged = _apply_merges(_framed_chars(word), merges)
    # Strip the trailing-space frame, split on the US symbol starts,
    # drop the leading empty element.
    return F.filter(
        F.split(F.replace(merged, F.lit(" "), F.lit("")), US),
        lambda p: p != F.lit(""),
    )


def bpe_piece_count_for_word(word: Column,
                             merges: Sequence[Tuple[str, str]]) -> Column:
    """Symbol count without materializing the array: one US per symbol,
    so count = length delta after deleting them."""
    merged = _apply_merges(_framed_chars(word), merges)
    return (
        F.length(merged)
        - F.length(F.replace(merged, F.lit(US), F.lit("")))
    )


# Whole-document framing (the hot path): ONE regex pass frames every
# symbol of every word — a word containing any non-printable-ASCII
# character is framed WHOLE as one UNK symbol (first alternation
# branch, leftmost-first in both Java regex and RE2), every other
# non-space character individually. Words stay separated by their
# original whitespace, which no merge pattern can match (patterns
# require exactly 'US a SP US b SP'; at a word boundary there are two+
# spaces or other whitespace between frames), so merges remain strictly
# word-internal while the 64 replaces run once per DOCUMENT instead of
# once per word — same bytes scanned, a fraction of the expression
# overhead (measured ~2x on the bench corpus).
# NB: the UNK class must exclude whitespace explicitly — a bare
# [^\x21-\x7e] matches the space between two words and would glue them
# into one "word".
_FRAME_RE = r"(\S*[^\s\x21-\x7e]\S*|\S)"


def _framed_doc(text: Column) -> Column:
    # Strip embedded US FIRST: it is the symbol-count sentinel, so input
    # bytes equal to it would inflate bpe_count_from_merged (and diverge
    # from the SQL oracle, whose CASE counts the word once). The SQL
    # generator strips identically, so both engines see the same words.
    return F.regexp_replace(
        F.replace(F.lower(F.trim(text)), F.lit(US), F.lit("")),
        _FRAME_RE, US + "$1 ",
    )


def bpe_merged(text: Column,
               merges: Sequence[Tuple[str, str]] = None) -> Column:
    """The framed-and-merged symbol string for a whole document — the
    expensive part (one regex pass + one replace per merge). Callers
    needing both count and pieces should materialize THIS once (e.g.
    ``withColumn``) and derive both via ``bpe_count_from_merged`` /
    ``bpe_pieces_from_merged``; Spark's CollapseProject does not
    de-duplicate two independent copies of the chain.

    ``merges`` must be a TRAINED (rank-ordered) table — see
    ``validate_merges``; arbitrary orderings raise."""
    merges = DEFAULT_MERGES if merges is None else merges
    validate_merges(merges)
    return _apply_merges(_framed_doc(text), merges)


def bpe_count_from_merged(merged: Column) -> Column:
    n = F.length(merged) - F.length(
        F.replace(merged, F.lit(US), F.lit(""))
    )
    return F.coalesce(n.cast("long"), F.lit(0).cast("long"))


def bpe_pieces_from_merged(merged: Column) -> Column:
    # Drop the space/whitespace frame tails, split at symbol starts.
    return F.coalesce(
        F.filter(
            F.split(F.regexp_replace(merged, r"\s+", ""), US),
            lambda p: p != F.lit(""),
        ),
        F.array().cast("array<string>"),  # NULL text -> no pieces
    )


def bpe_token_count(text: Column,
                    merges: Sequence[Tuple[str, str]] = None) -> Column:
    """Exact BPE token count of a document under ``merges`` (long; 0
    for empty/NULL-ish text). Non-ASCII words count 1 (UNK).
    ``merges`` must be trained-ordered (``validate_merges``)."""
    return bpe_count_from_merged(bpe_merged(text, merges))


def bpe_pieces(text: Column,
               merges: Sequence[Tuple[str, str]] = None) -> Column:
    """Full piece sequence for a document (array<string>): per-word BPE
    symbols concatenated in document order; non-ASCII words pass
    through whole (UNK-as-itself). ``merges`` must be trained-ordered
    (``validate_merges``)."""
    return bpe_pieces_from_merged(bpe_merged(text, merges))


# ----------------------------------------------------------------- batched
# Production-vocab encoder. The JVM framed-replace chain materializes
# ONE string `replace` expression per merge — exact and shuffle-free,
# but plan size (and Catalyst analysis time) scales linearly with the
# merge count: fine at the vendored 64-merge table, implausible at a
# production 32k-100k-merge vocabulary (measured in
# tests/test_bpe_batched.py; SCALE.md records the sweep). Past ~1k
# merges, encode with THIS: an Arrow-batched mapInPandas-style
# pandas_udf holding the merge-rank table once per executor (shipped
# inside the serialized UDF — Spark broadcasts large task binaries),
# running the classic lowest-rank-first merge loop per DISTINCT word
# with an in-batch cache. Proven bit-equivalent to the JVM path on the
# frozen table and on trained tables (tests/test_bpe_batched.py); the
# JVM path stays the registered oracle-verified query.

# Java semantics mirrored exactly (the JVM path is the spec): Spark's
# `trim` is SQL trim — SPACES only, and spaces are already in the \s
# split class, so the Python side needs no trim at all. Java regex \s
# is [ \t\n\x0B\f\r] (NOT unicode-aware like Python's \s).


# Per-worker-process encoder memo: the pandas UDF body runs once per
# Arrow BATCH, and rebuilding a 32k-100k-entry rank dict (plus losing
# the distinct-word cache) per batch would repeat exactly the work the
# batched path exists to avoid. Keyed on the merge table itself.
_ENCODER_MEMO: dict = {}
# The distinct-word cache survives across batches AND tasks in a
# long-lived worker; cap it so a high-cardinality corpus (random ids,
# hashes) cannot grow it without bound.
_WORD_CACHE_MAX = 1_000_000


def _encoder_for(merges) -> "callable":
    key = tuple(merges)
    # LRU: pop+reinsert moves the hit to the most-recent end, and a
    # pathological many-table caller evicts the LEAST-recent entry —
    # never the one about to be returned (clearing the whole memo made
    # an alternating-table caller rebuild a 32k-rank dict per batch).
    enc = _ENCODER_MEMO.pop(key, None)
    if enc is None:
        enc = _make_text_encoder(key)
        while len(_ENCODER_MEMO) >= 8:
            _ENCODER_MEMO.pop(next(iter(_ENCODER_MEMO)))
    _ENCODER_MEMO[key] = enc
    return enc


def _make_text_encoder(merges: Sequence[Tuple[str, str]]):
    """Pure-Python closure: text -> list of BPE pieces, byte-equivalent
    to the JVM framed-replace path (same trim/lower/split/UNK rules)."""
    import re as _re

    ranks = {pair: i for i, pair in enumerate(merges)}
    pairs = list(merges)
    ascii_re = _re.compile(ASCII_WORD_RE)
    ws_re = _re.compile(r"[ \t\n\x0b\f\r]+")
    cache: dict = {}

    def encode_word(word: str) -> list:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = pairs[best]
            merged = a + b
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        if len(cache) >= _WORD_CACHE_MAX:
            cache.clear()
        cache[word] = syms
        return syms

    def encode_text(text) -> list:
        if text is None:
            return []
        t = text.lower().replace(US, "")
        out: list = []
        for w in ws_re.split(t):
            if not w:
                continue
            if ascii_re.match(w):
                out.extend(encode_word(w))
            else:
                out.append(w)  # UNK-as-itself, like the JVM frame
        return out

    return encode_text


def bpe_pieces_batched(text: Column,
                       merges: Sequence[Tuple[str, str]] = None) -> Column:
    """``bpe_pieces`` for production-size merge tables: Arrow-batched
    pandas UDF (one Python call per batch, merge table resident per
    executor) instead of a per-merge JVM replace chain. Use when
    ``len(merges)`` is in the thousands; bit-equivalent to the JVM
    path. ``merges`` must be trained-ordered (``validate_merges``)."""
    merges = DEFAULT_MERGES if merges is None else list(merges)
    validate_merges(merges)

    @F.pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        encode = _encoder_for(merges)
        return s.map(encode)

    return _enc(text)


def bpe_token_count_batched(
        text: Column, merges: Sequence[Tuple[str, str]] = None) -> Column:
    """``bpe_token_count`` via the Arrow-batched encoder (long; 0 for
    empty/NULL text). ``merges`` must be trained-ordered."""
    merges = DEFAULT_MERGES if merges is None else list(merges)
    validate_merges(merges)

    @F.pandas_udf("long")
    def _cnt(s: pd.Series) -> pd.Series:
        encode = _encoder_for(merges)
        return s.map(lambda t: len(encode(t)))

    return _cnt(text)


def _sq(s: str) -> str:
    """SQL single-quote escape: symbols are corpus-derived printable
    ASCII, which includes the quote character itself."""
    return s.replace("'", "''")


def _merged_sql(word_sql: str, merges: Sequence[Tuple[str, str]]) -> str:
    """DuckDB expression: the framed-and-merged symbol string for one
    word expression — same US+SP framing as the Spark side, generated
    from the SAME merge table so oracles can never drift."""
    base = rf"regexp_replace({word_sql}, '(.)', '{US}\1 ', 'g')"
    for a, b in merges:
        base = (f"replace({base}, '{US}{_sq(a)} {US}{_sq(b)} ', "
                f"'{US}{_sq(a)}{_sq(b)} ')")
    return base


def bpe_count_sql(text_sql: str,
                  merges: Sequence[Tuple[str, str]] = None) -> str:
    """DuckDB expression computing ``bpe_token_count`` for the SQL
    expression ``text_sql``."""
    merges = DEFAULT_MERGES if merges is None else merges
    validate_merges(merges)
    m = _merged_sql("w", merges)
    # replace(..., US, '') mirrors _framed_doc's sentinel strip.
    return (
        "COALESCE(list_sum(list_transform("
        f"list_filter(regexp_split_to_array(replace(lower(trim("
        f"{text_sql})), '{US}', ''), "
        r"'\s+'), w -> w <> ''), "
        "w -> CASE WHEN regexp_matches(w, '^[\\x21-\\x7e]+$') "
        f"THEN length({m}) - length(replace({m}, '{US}', '')) "
        "ELSE 1 END)), 0)::BIGINT"
    )


def bpe_pieces_sql(word_sql: str,
                   merges: Sequence[Tuple[str, str]] = None) -> str:
    """DuckDB expression: '|'-joined BPE pieces of one word expression
    (assumed already lowercased ASCII). ``merges`` must be
    trained-ordered (``validate_merges``)."""
    merges = DEFAULT_MERGES if merges is None else merges
    validate_merges(merges)
    m = _merged_sql(word_sql, merges)
    return (f"trim(replace(replace({m}, ' ', ''), '{US}', '|'), '|')")


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 64,
    max_words: int = 65536,
) -> List[Tuple[str, str]]:
    """Learn a BPE merge table from a corpus (Sennrich et al. 2016,
    arXiv:1508.07909). Distributed part: lowercase/split/filter to
    ASCII words, count frequencies, keep the ``max_words`` most
    frequent (ties by word) — a bounded collect, like every vocab
    broadcast in this repo. Driver part: greedily merge the most
    frequent adjacent symbol pair (ties: lexicographically smallest
    pair) ``n_merges`` times. Deterministic end to end."""
    wf = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike(ASCII_WORD_RE))
        .groupBy("w").agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    vocab = {tuple(r["w"]): int(r["f"]) for r in wf}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges
