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

Scale notes: corpus strings never shuffle — only (pair, count) rows
move, and the per-iteration state is one pair.  At real vocab scale
you batch merges per round (pick top-k compatible pairs) to cut
round count; the loop structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 5
SEP = "  "           # two-space token delimiter (see module docstring)
JOIN_CH = "+"        # merged-token glue


def _corpus_strings(docs: DataFrame) -> DataFrame:
    """documents.text → lowercase tokens joined with the 2-space
    delimiter (empty tokens dropped)."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    return docs.select(
        "doc_id", F.array_join(toks, SEP).alias("s"))


def _pair_counts(strings: DataFrame) -> DataFrame:
    toks = F.split(F.col("s"), SEP)
    pairs = F.expr(
        "transform(slice(split(s, '  '), 1, size(split(s, '  ')) - 1),"
        " (t, i) -> struct(t as l, element_at(split(s, '  '), i + 2) as r))")
    _ = toks
    return (
        strings.where(F.size(F.split(F.col("s"), SEP)) >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the documents corpus; returns
    one row per merge: (merge_rank, merge_left, merge_right,
    pair_count, corpus_tokens_after) — the merge table a tokenizer
    ships.  (Column names avoid the SQL keywords LEFT/RIGHT so the
    oracle needs no quoting.)"""
    strings = _corpus_strings(docs).localCheckpoint()
    out = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(strings)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1).collect())
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        strings = strings.select(
            "doc_id",
            F.expr(
                "replace(s, "
                f"{_sql_str(left + SEP + right)}, "
                f"{_sql_str(left + JOIN_CH + right)})").alias("s")
        ).localCheckpoint()
        tokens_after = strings.select(
            F.sum(F.size(F.split(F.col("s"), SEP)))).collect()[0][0]
        out.append((rank, left, right, cnt, int(tokens_after)))
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
