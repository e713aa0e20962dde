"""Distributed connected components — cluster-level dedup.

Pair generators (MinHash-LSH, exact Jaccard, SimHash) emit near-dup
EDGES; corpus dedup needs the transitive closure: every doc labeled
with its duplicate-cluster id so one canonical doc per cluster
survives.  This is the step after candidate generation in every
large-scale dedup pipeline (e.g. the C4 / RefinedWeb recipes).

Algorithm: iterative min-label propagation over the undirected edge
set — label(v) ← min(label(v), min label among neighbors) until a
fixpoint.  Rounds = graph diameter; near-dup graphs are overwhelmingly
tiny star/clique components (diameter ≤ ~3), so 3-5 rounds converge.
Each round is one shuffle of the EDGE table (sparse: |E| ≪ corpus
after LSH banding) plus a groupBy on node id.  Convergence is detected
with a sum(label) aggregate — labels only ever decrease, so an
unchanged sum ⟺ fixpoint — which avoids a join-with-previous per
round.  For adversarial long-chain graphs at extreme scale, switch to
the large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) which converges in
O(log²) rounds; the driver loop below is the same shape.

The loop is DRIVER-SIDE CONTROL ONLY (one scalar aggregate per round);
all data movement stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import pin


def connected_components(edges: DataFrame, vertices: DataFrame,
                         src: str = "src", dst: str = "dst",
                         id_col: str = "node",
                         max_iter: int = 25) -> DataFrame:
    """(node, cluster_id) for every vertex; cluster_id = min node id in
    the component (deterministic canonical representative).

    ``edges``: one row per undirected edge (any orientation).
    ``vertices``: one row per node (isolated nodes become singleton
    clusters).
    """
    # symmetrize via explode, NOT self-union: a union would give the
    # physical plan two copies of the (possibly expensive) edge-producing
    # subtree — e.g. the whole near-dup pair pipeline — and evaluate it
    # twice before the persist materializes
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
        .persist()
    )
    # iterate ONLY over edge-touched nodes: isolated vertices are
    # singletons by definition and re-enter via anti-join at the end.
    # On a 100 TB corpus the near-dup subgraph is orders of magnitude
    # smaller than the corpus — the per-round shuffles must be sized by
    # |V(E)|, not |V|.
    lbl = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")).persist()
    prev_sum = lbl.agg(F.sum("lbl")).collect()[0][0]

    for _ in range(max_iter):
        msgs = sym.join(lbl, sym["b"] == lbl["node"]).select(
            F.col("a").alias("node"), F.col("lbl"))
        nxt = (
            lbl.union(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            # truncate lineage per round: without this the logical plan
            # (and task binary) doubles every iteration
            .transform(pin)
        )
        new_sum = nxt.agg(F.sum("lbl")).collect()[0][0]
        lbl.unpersist()
        lbl = nxt
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    singles = vertices.select(F.col(id_col).alias("node")).join(
        lbl.select("node"), "node", "left_anti")
    out = lbl.unionByName(singles.select("node", F.col("node").alias("lbl")))
    sym.unpersist()
    return out.select("node", F.col("lbl").alias("cluster_id"))


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Cluster-level dedup verdict per document.

    ``pairs``: verified near-dup pairs (doc_i, doc_j).  Output one row
    per doc: cluster_id (min doc_id in its component), cluster_size,
    and is_canonical (the single survivor per cluster).
    """
    cc = connected_components(
        pairs.select(F.col("doc_i").alias("src"), F.col("doc_j").alias("dst")),
        docs.select(F.col(id_col).alias("node")),
    )
    w = F.count("*").over(Window.partitionBy("cluster_id"))
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        w.cast("bigint").alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


def connected_components_bigstar(edges: DataFrame, vertices: DataFrame,
                                 src: str = "src", dst: str = "dst",
                                 id_col: str = "node",
                                 max_iter: int = 20) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    adversarial-scale escalation of ``connected_components``:
    O(log²) rounds regardless of component diameter, so a pathological
    long-chain near-dup graph cannot stretch the round count.

    Per round, two edge rewrites (each: one groupBy-min on the edge
    table + a join back — no windows, no sorts):
      large-star: every neighbor v > u re-points at m(u) = min(N(u)∪u)
      small-star: every neighbor v ≤ u (and u itself) re-points at
                  min of that set
    Edges only ever point DOWNWARD to smaller ids; the per-round
    (count, Σsrc, Σdst) triple is monotone non-increasing and
    stabilizes exactly at the star fixpoint, giving a scalar-only
    convergence test (same discipline as the min-label loop).  Output
    contract is identical to ``connected_components``."""
    sym = (
        edges.where(F.col(src) != F.col(dst))
        .select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
        .distinct()
        .transform(pin)
    )
    # capture the edge-touched node set once, up front, for the
    # final root/singleton labeling
    touched = sym.select(F.col("a").alias("node")).distinct() \
        .transform(pin)

    cur = sym
    prev_chk = None
    for _ in range(max_iter):
        # ---- large-star: for node a, m = min(a, min neighbors);
        # strictly-larger neighbors re-point at m
        mins = cur.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            cur.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # ---- small-star over the large-star output: for node a, its
        # ≤-neighbors plus a re-point at the min of that set
        down = large.where(F.col("b") != F.col("a")).distinct()
        smins = down.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            down.join(smins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            # symmetrize for the next large-star pass
            .select(F.explode(F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )).alias("e"))
            .select("e.a", "e.b")
            .distinct()
            .transform(pin)  # truncate per-round lineage
        )
        chk = tuple(small.agg(
            F.count("*"), F.sum("a"), F.sum("b")).collect()[0])
        # cheap scalar triple gates the sound (exact set-equality)
        # confirmation, which therefore runs ~once, at the fixpoint
        if prev_chk == chk and small.exceptAll(cur).limit(1).count() == 0:
            cur = small
            break
        prev_chk = chk
        cur = small

    # star fixpoint: every node's label = min over its (downward)
    # neighbors; roots label themselves
    lbl = (
        cur.where(F.col("b") < F.col("a"))
        .groupBy("a").agg(F.min("b").alias("lbl"))
        .select(F.col("a").alias("node"), "lbl")
    )
    roots_and_isolated = touched.join(
        lbl.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("lbl"))
    singles = vertices.select(F.col(id_col).alias("node")).join(
        touched, "node", "left_anti"
    ).select("node", F.col("node").alias("lbl"))
    out = lbl.unionByName(roots_and_isolated).unionByName(singles)
    return out.select("node", F.col("lbl").alias("cluster_id"))


def dedup_clusters_bigstar(docs: DataFrame, pairs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """``dedup_clusters`` with the large-star/small-star engine — the
    same output contract (and therefore the same oracle), different
    round complexity."""
    cc = connected_components_bigstar(
        pairs.select(F.col("doc_i").alias("src"), F.col("doc_j").alias("dst")),
        docs.select(F.col(id_col).alias("node")),
    )
    w = F.count("*").over(Window.partitionBy("cluster_id"))
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        w.cast("bigint").alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph

PR_DAMPING = 0.85
PR_ITERS = 3


def pagerank(edges: DataFrame, damping: float = PR_DAMPING,
             iters: int = PR_ITERS,
             src: str = "doc_i", dst: str = "doc_j") -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge set — ranks the
    HUBS of the near-dup graph (a doc with high rank is duplicated
    into many places: boilerplate, templates, licence blocks — the
    rows worth inspecting before cluster-collapse deletes them).

    Canonical Spark iterative-graph shape: per round, one join of the
    edge table with the tiny (node, pr) frame + one groupBy on dst —
    the edge table shuffles on its keys, rank state stays
    node-sized.  localCheckpoint per round truncates the growing
    lineage exactly like connected_components above.

    Oracle determinism: per-edge contributions round to 12 dp and sum
    as DECIMAL(28,12) — decimal addition is order-independent, so the
    distributed sum matches DuckDB's serial one bit-for-bit; the
    damping update rounds back to 12 dp each round to stop drift
    compounding."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .distinct().transform(pin)
    )
    deg = sym.groupBy("src").agg(
        F.count("*").cast("bigint").alias("deg")).transform(pin)
    n = deg.count()
    pr = deg.select(
        F.col("src").alias("node"),
        F.round(F.lit(1.0) / F.lit(float(n)), 12).alias("pr"))
    for _ in range(iters):
        contrib = (
            sym.join(pr.select(F.col("node").alias("src"), "pr"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"),
                    F.round(F.col("pr") / F.col("deg"), 12)
                    .cast("decimal(28,12)").alias("c"))
        )
        pr = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select("node",
                    F.round(F.lit((1.0 - damping)) / F.lit(float(n))
                            + F.lit(damping) * F.col("s").cast("double"),
                            12).alias("pr"))
            .transform(pin)
        )
    return (
        pr.join(deg.select(F.col("src").alias("node"), "deg"), "node")
        .select(F.col("node").alias("doc_id"), "deg",
                F.round("pr", 6).alias("pagerank"))
    )
