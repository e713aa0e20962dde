"""Distributed BPE merge training (word-level) — the tokenizer-
training loop of an LLM data pipeline, run as a Spark iteration.

Byte-pair encoding (Sennrich et al., ACL'16) greedily merges the most
frequent adjacent token pair, N times.  The distributed shape per
iteration is tiny and classic:

1. one map-side pass derives adjacent-pair counts from the delimited
   corpus strings (partial-aggregated groupBy — the ONLY shuffle);
2. the argmax pair (count DESC, pair ASC tiebreak) collects to the
   driver as a 1-row scalar — model state, not data;
3. the merge applies as a literal string ``replace`` folded into the
   next iteration's projection (map-side, WholeStageCodegen).

Corpus representation: tokens joined with a TWO-space delimiter, so
``replace(s, 'a  b', 'a+b')`` consumes no character any neighboring
occurrence needs — left-to-right non-overlapping replacement is then
exactly BPE's greedy merge application, and DuckDB's ``replace`` has
identical semantics, which is what makes the full literal-replay
oracle possible (plans/ext3_catalog._bpe_oracle unrolls the same
iterations in SQL).

Scale notes: the corpus is read once (the dedup groupBy that builds
the (s, w) vocab table); per round only (pair, count) rows and the
|distinct|-row vocab table shuffle, and the per-round model state is a
handful of pairs.

**Batched rounds (round 5):** the expensive part of a round is the
corpus pass (pair-count scan + merge projection + recount), so at real
vocab scale one merge per corpus pass is O(vocab) passes.  The trainer
therefore accepts up to ``batch_k`` pairs per round, greedily in
(cnt DESC, l, r) order, each TOKEN-DISJOINT from the pairs already
accepted this round: merging (a,b) only destroys adjacencies involving
a or b and only creates adjacencies involving a+b, so the counts of
token-disjoint pairs are invariant under each other's merges — the
recorded counts are exact, and the k replaces fold into ONE corpus
projection.  Round count drops to O(vocab / k).  The batch is a
faithful prefix of the sequential greedy order whenever no pair
created/boosted by an earlier batch member would outrank a later one
(tests/test_bpe_batched.py proves table equivalence on such a corpus);
on adversarial corpora it is the standard batched-BPE approximation,
and the driver oracle replays the batched rule literally either way.
``corpus_tokens_after`` is recounted once per ROUND (every merge of a
round reports the same post-round count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import pin

BPE_MERGES = 5
BPE_BATCH_K = 3      # max token-disjoint merges folded per round
SEP = "  "           # two-space token delimiter (see module docstring)
JOIN_CH = "+"        # merged-token glue


def _corpus_strings(docs: DataFrame) -> DataFrame:
    """documents.text → lowercase tokens joined with the 2-space
    delimiter (empty tokens dropped)."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    return docs.select(
        "doc_id", F.array_join(toks, SEP).alias("s"))


def _pair_counts(table: DataFrame) -> DataFrame:
    """Adjacent-pair counts over a weighted sequence table (s, w):
    each distinct sequence contributes (occurrences within s) × w —
    with w=1 per corpus row this is the plain corpus count, with the
    dedup'd vocab table it is Sennrich's frequency-weighted count."""
    pairs = F.expr(
        "transform(slice(split(s, '  '), 1, size(split(s, '  ')) - 1),"
        " (t, i) -> struct(t as l, element_at(split(s, '  '), i + 2) as r))")
    return (
        table.where(F.size(F.split(F.col("s"), SEP)) >= 2)
        .select(F.explode(pairs).alias("p"), "w")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("w").cast("bigint").alias("cnt"))
    )


def _select_batch(pc: DataFrame, want: int) -> list[tuple[str, str, int]]:
    """Greedy token-disjoint batch: walk the (cnt DESC, l, r) order,
    accept a pair iff neither of its tokens appears in an already-
    accepted pair.  Each accept is a tiny argmax over the REDUCED
    (pair, count) frame — no corpus pass."""
    accepted: list[tuple[str, str, int]] = []
    used: list[str] = []
    for _ in range(want):
        cand = pc
        if used:
            cand = cand.where(
                ~F.col("l").isin(used) & ~F.col("r").isin(used))
        top = cand.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        accepted.append((left, right, cnt))
        for t in (left, right):
            if t not in used:
                used.append(t)
    return accepted


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES,
              batch_k: int = BPE_BATCH_K,
              on_vocab: bool = True) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the documents corpus; returns
    one row per merge: (merge_rank, merge_left, merge_right,
    pair_count, corpus_tokens_after) — the merge table a tokenizer
    ships.  (Column names avoid the SQL keywords LEFT/RIGHT so the
    oracle needs no quoting.)  ``batch_k=1`` is the classic one-merge-
    per-corpus-pass loop; the default folds up to BPE_BATCH_K
    token-disjoint merges into each corpus pass (see module
    docstring).

    **Vocab-table training (default, round 6):** classic BPE (Sennrich
    ACL'16 §3) never iterates the corpus — it iterates the DISTINCT
    sequence table with frequencies, weighting pair counts by sequence
    count and rewriting only the distinct rows each round.  The analog
    here: the training state is ``(s, w) = distinct corpus string ×
    occurrence count``, pair counts are w-weighted sums (identical
    totals by linearity), merges rewrite |distinct| rows and re-dedupe
    (a merge can make two sequences collide), and
    ``corpus_tokens_after = Σ w·|s|``.  The corpus itself is touched
    exactly once, at dedup; per-round work scales with the distinct
    count — at 100 TB, where near-duplicate text is the norm, that is
    the difference between re-tokenizing the lake per merge round and
    iterating a reduced table.  The merge table is bit-identical to
    corpus training (``on_vocab=False``, kept for the equivalence
    test): same counts ⇒ same (cnt DESC, l, r) argmax ⇒ same merges ⇒
    same oracle."""
    strings = _corpus_strings(docs)
    if on_vocab:
        table = (strings.groupBy("s")
                 .agg(F.count("*").cast("bigint").alias("w"))
                 .transform(pin))
    else:
        table = strings.select(
            "s", F.lit(1).cast("bigint").alias("w")).transform(pin)
    out = []
    rank = 0
    while rank < n_merges:
        pc = _pair_counts(table).transform(pin)
        batch = _select_batch(pc, min(batch_k, n_merges - rank))
        if not batch:
            break
        expr = "s"
        for left, right, _cnt in batch:
            expr = (f"replace({expr}, {_sql_str(left + SEP + right)}, "
                    f"{_sql_str(left + JOIN_CH + right)})")
        table = table.select(F.expr(expr).alias("s"), "w")
        if on_vocab:
            table = table.groupBy("s").agg(
                F.sum("w").cast("bigint").alias("w"))
        table = table.transform(pin)
        tokens_after = int(table.select(
            F.sum(F.size(F.split(F.col("s"), SEP)) * F.col("w"))
        ).collect()[0][0])
        for left, right, cnt in batch:
            rank += 1
            out.append((rank, left, right, cnt, tokens_after))
    return docs.sparkSession.createDataFrame(
        out, "merge_rank int, merge_left string, merge_right string, "
             "pair_count bigint, corpus_tokens_after bigint")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_apply(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """The inference half: train the merge table, then apply all
    merges to the corpus and report per-source compression — the
    measurement that decides whether a tokenizer's merges transfer to
    a new source mix.  Application is a chain of literal replaces
    (map-side, no shuffle); the only shuffles are training's pair
    counts and the final per-source rollup."""
    merges = [(r["merge_left"], r["merge_right"])
              for r in bpe_train(docs, n_merges).collect()]
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    applied = docs.select(
        "source", F.array_join(toks, SEP).alias("s"),
        F.size(toks).alias("__before"))
    sql = "s"
    for left, right in merges:
        sql = (f"replace({sql}, {_sql_str(left + SEP + right)}, "
               f"{_sql_str(left + JOIN_CH + right)})")
    return (
        applied.withColumn("__after", F.size(F.split(F.expr(sql), SEP)))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("__before").cast("bigint").alias("tokens_before"),
             F.sum("__after").cast("bigint").alias("tokens_after"))
        .withColumn("compression", F.round(
            F.col("tokens_after") / F.col("tokens_before"), 6))
    )
