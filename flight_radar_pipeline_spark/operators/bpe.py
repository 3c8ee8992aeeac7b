"""Byte-pair-encoding merge training, expressed relationally.

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units" — the public algorithm behind GPT/Llama tokenizers)
learns a merge table: repeatedly find the most frequent adjacent symbol
pair across the corpus vocabulary and fuse it into a new symbol. Here
each merge iteration is pure DataFrame algebra:

- The corpus collapses ONCE to a (word, freq) vocabulary — the only
  corpus-sized aggregate; Zipf makes this table tiny relative to the
  corpus, and every iteration after it touches only the vocabulary.
- A word's symbol sequence is carried as a wrapped string
  ``(h)(e)(l)(l)(o)``. Wrapping makes greedy left-to-right
  non-overlapping pair fusion EXACTLY a literal string replace
  (``(a)(b)`` → ``(ab)``) — no boundary sharing, identical semantics in
  any engine — and the pair instances re-derive from the string by one
  regexp extract.
- The winning pair per iteration is an (count desc, pair asc)-argmax of
  a pair-count aggregate over the vocabulary — collected as ONE bounded
  driver row (the broadcast-literal class), because the next iteration's
  replace pattern has to fold into the expression tree.

Scale posture: iterations = fixed small N (a real tokenizer run does
~30k merges over a ~10M-word vocab — still vocabulary-sized, not
corpus-sized; the per-iteration shuffle is the pair-count groupBy whose
key cardinality Zipf bounds). Nothing per-row leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T

_SYM_RE_SQL = r"\\(([^)]+)\\)"  # doubled: survives SQL-literal unescaping


def word_vocabulary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq, seq): whitespace-token vocabulary with each word's
    initial character-symbol sequence in wrapped form."""
    words = (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.split(F.col("word"), "")
    seq = F.array_join(
        F.transform(chars, lambda c: F.concat(F.lit("("), c, F.lit(")"))), ""
    )
    return words.select("word", "freq", seq.alias("seq"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, n): frequency-weighted adjacent-pair counts over the
    vocabulary's current symbol sequences."""
    syms = F.expr(f"regexp_extract_all(seq, '{_SYM_RE_SQL}', 1)")
    pairs = F.expr(
        "transform(sequence(0, size(__syms) - 2),"
        " i -> struct(__syms[i] as lhs, __syms[i + 1] as rhs))"
    )
    return (
        vocab.select("freq", syms.alias("__syms"))
        .filter(F.size("__syms") >= 2)
        .select("freq", F.explode(pairs).alias("__p"))
        .groupBy("__p.lhs", "__p.rhs")
        .agg(F.sum("freq").cast("bigint").alias("n"))
    )


def _train_merge_list(
    vocab: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The MM loop on a caller-supplied (ideally persisted) vocabulary:
    ``n_merges`` rounds of pair-count aggregate → deterministic
    (n desc, lhs asc, rhs asc) argmax → literal-replace fusion. The
    1-row winner collect per iteration is the bounded driver action that
    folds the next replace pattern into the expression tree."""
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        win = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not win:
            break
        lhs, rhs, n = win[0]["lhs"], win[0]["rhs"], win[0]["n"]
        out.append((rank, lhs, rhs, int(n)))
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f"({lhs})({rhs})"),
                F.lit(f"({lhs}{rhs})"),
            ),
        )
    return out


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges → (merge_rank, lhs, rhs, n).

    The vocabulary is persisted for the duration of the loop (one corpus
    scan total; every iteration after it is vocabulary-sized)."""
    spark = docs.sparkSession
    base = word_vocabulary(docs, text_col, id_col).persist()
    out = _train_merge_list(base, n_merges)
    base.unpersist()  # iterations already ran (one collect each)
    return spark.createDataFrame(
        out, "merge_rank int, lhs string, rhs string, n bigint"
    )


def encode_token_counts(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Apply trained BPE merges to the corpus → (id, n_words, n_subwords).

    The "tokenize with a trained tokenizer" half of the BPE story
    (train_bpe_merges is the other): each DISTINCT word is encoded once —
    merges applied in rank order as literal replaces over the wrapped
    symbol string, then the surviving symbol count read off with one
    regexp extract — and the corpus-sized side only explodes to words and
    joins word → n_sym. n_subwords is the post-merge token budget a
    packing/costing stage consumes.

    Scale posture: encoding work is vocabulary-sized (Zipf-bounded), not
    corpus-sized; the merge table is ``n_merges`` bounded driver rows
    (broadcast-literal class — the replace chain must fold into the
    expression tree); the word→n_sym join is keyed on word and Zipf makes
    the vocab side broadcastable far beyond this SF (falls back to a
    word-keyed shuffle join under AQE when it isn't).

    The vocabulary is materialized ONCE (persisted) and shared between
    the training loop and the encode projection — round-12 adjudication
    of the doc_bpe_encode bench watch item: the previous shape trained on
    a persisted vocab, unpersisted it, then re-derived the same
    vocabulary from a second corpus scan for the encode side, which is
    one full corpus scan of pure waste at any scale. When ``vocab`` is
    None, the persist is left live for the returned plan to consume (the
    house per-operator-persist pattern — the bench clears the catalog
    cache between entries; Spark's ContextCleaner reclaims it otherwise).
    Library callers invoking this repeatedly should pass their own
    ``vocab`` (``word_vocabulary(docs).persist()``) and unpersist it when
    done — with a caller-supplied vocab this function persists nothing,
    so the cache lifecycle is fully deterministic (round-12 ADVICE).
    """
    if vocab is None:
        vocab = word_vocabulary(docs, text_col, id_col).persist()
    mrows = _train_merge_list(vocab, n_merges)
    seq = F.col("seq")
    for rank, lhs, rhs, n in mrows:
        seq = F.replace(
            seq,
            F.lit(f"({lhs})({rhs})"),
            F.lit(f"({lhs}{rhs})"),
        )
    n_sym = F.size(F.expr(f"regexp_extract_all({'__seq'}, '{_SYM_RE_SQL}', 1)"))
    encoded = vocab.select(
        "word", seq.alias("__seq")
    ).select("word", n_sym.alias("n_sym"))
    words = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("word")
    )
    return (
        words.join(F.broadcast(encoded), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_subwords"),
        )
    )
