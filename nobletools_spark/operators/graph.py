"""Graph analytics over materialized KG edge tables (degrees, PageRank,
triangle counts) — the read-side companions to the triple emitters in
``operators/triples.py``.

The reference materializes the concept graph (Document.getConcepts
coder/model/Document.java:87-93 for co-occurrence; PathHelper.java for
isa) but ships no analytics over it; these operators are the
"beyond-the-reference" extensions a KG consumer needs: node importance
(PageRank), local clustering signals (per-node triangle counts), and
degree profiles — all expressed as DataFrame plans so Catalyst picks
the physical strategy.

Input convention: an **undirected** weighted pair table
``(a, b, weight)`` with one row per unordered pair (``a < b``), i.e.
exactly the shape of ``cooccurrence_triples`` output
(subj/obj/n_docs). ``symmetrize`` expands it to the directed
``(src, dst, weight)`` view the per-node operators consume.

Scale notes (the 100 TB story):

- The *concept* graph is terminology-bounded (|V| ≤ concepts), but the
  same operators apply to corpus-sized graphs (doc-similarity pairs
  from ``operators/dedup.py``), so every plan below avoids
  driver-sized state and unbounded blow-ups:
- ``degrees`` — ONE partial-aggregated shuffle on the node key.
- ``pagerank`` — classic synchronous iteration: each round is one
  join (rank ⋈ edges, both sides hash-partitioned on the same key —
  the exchange on the static ``edges`` side is reused across rounds
  once cached) plus one aggregation shuffle on ``dst``. Ranks are
  per-node scalars (never materialized on the driver); each round's
  result is cached and the previous round unpersisted, so lineage
  stays O(1) per round instead of O(rounds) at plan time.
- ``triangles`` — Suri & Vassilvitskii MapReduce triangle counting:
  orient every edge from the (degree, id)-smaller endpoint to the
  larger, so wedge pivots have out-degree O(√m) on ANY graph
  (including Zipf-skewed co-occurrence hubs); triangles close with a
  second join against the oriented edge set. Without the orientation
  a hub of degree d contributes d² wedges; with it, O(m^1.5) total
  work — the difference between feasible and not at 10^9 edges.

Determinism/oracle note: ``pagerank`` supports an exact fixed-point
integer mode (``scale`` set): ranks are scaled BIGINTs, per-edge
contributions use integer division, and sums of integers are
order-independent — so the result hash-matches a DuckDB replay
bit-for-bit, unlike float sums whose value depends on reduction
order. Integer mode is exact up to |V|·scale·damping_den < 2^63
(document-checked below); production runs on billion-node graphs use
``scale=None`` (doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["symmetrize", "degrees", "pagerank", "triangles"]


def symmetrize(pairs: DataFrame, a: str = "a", b: str = "b",
               weight: str | None = "weight") -> DataFrame:
    """Undirected pair table (one row per unordered pair) → directed
    edge view (src, dst[, weight]) with both orientations."""
    w = [F.col(weight).alias("weight")] if weight else []
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"), *w)
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"), *w)
    return fwd.unionByName(rev)


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree + weighted degree over a directed edge view
    (count/sum of out-edges; on a symmetrized undirected graph this is
    THE degree). One shuffle, map-side partial aggregation."""
    aggs = [F.count("*").cast("long").alias("degree")]
    if "weight" in edges.columns:
        aggs.append(F.sum("weight").cast("long").alias("weighted_degree"))
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(*aggs))


def pagerank(edges: DataFrame, iterations: int = 3,
             damping_num: int = 85, damping_den: int = 100,
             scale: int | None = None) -> DataFrame:
    """Synchronous PageRank over a directed edge view (src, dst).

    Convention: every node starts at rank 1.0 and the teleport term is
    the constant (1 - d) per node (the un-normalized textbook variant;
    ranks sum ≈ |V|, stable for comparison across graph sizes).
    Dangling mass is dropped (nodes with no out-edges leak their rank)
    — acceptable on symmetrized graphs where out-degree ≥ 1 for every
    node that appears at all, and documented for directed use.

    ``scale`` = None → double ranks (production path).
    ``scale`` = K → exact fixed-point mode: rank r is the BIGINT
    ⌊true_rank·K⌋ under per-edge integer division; bit-reproducible
    regardless of partitioning/reduction order, hence DuckDB-oracle
    hashable. Overflow-safe while |V|·K·damping_num < 2^63 (e.g. 10^6
    nodes at K=10^9 peaks near 10^17).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # cache the edge view FIRST: edges may sit on an arbitrarily
    # expensive lineage (the whole matcher pipeline for the
    # co-occurrence graph), and everything below — out-degrees, node
    # set, every iteration — re-reads it
    e = edges.select("src", "dst").persist()
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    # static per-round join input: (src, dst, od); cache so each
    # round reuses one exchange instead of recomputing the edge scan
    eo = e.join(outdeg, "src").persist()
    eo.count()  # materialize so the raw edge cache can release
    e.unpersist()
    nodes = eo.select(F.col("src").alias("node")).distinct()

    if scale is None:
        init = F.lit(1.0)
        contrib_expr = F.col("r") / F.col("od")
        def step(c):  # (1-d) + d * contribs
            return (F.lit((damping_den - damping_num) / damping_den)
                    + F.lit(damping_num / damping_den) * c).alias("r")
    else:
        init = F.lit(int(scale)).cast("long")
        contrib_expr = F.expr("r DIV od")
        base = (damping_den - damping_num) * int(scale)
        def step(c):
            return F.expr(f"CAST(({base} + {damping_num} * c) DIV "
                          f"{damping_den} AS BIGINT)").alias("r")

    # nodes is joined every round: checkpoint it once so each round's
    # plan references a leaf, not the eo scan
    nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.select("node", init.alias("r"))
    for _ in range(iterations):
        contribs = (eo.join(ranks, eo["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"),
                            contrib_expr.alias("c"))
                    .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contribs, "node", "left")
                 .select("node", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
                 .select("node", step(F.col("c"))))
        # TRUNCATE the lineage, don't just cache it: each round embeds
        # the previous ranks plan on two join sides, so with persist()
        # alone the logical plan doubles per round and Catalyst
        # analysis time grows exponentially with `iterations` (driver
        # CPU, not executor work). localCheckpoint materializes to
        # executor storage and re-roots the plan at a leaf — the
        # standard Spark idiom for iterative DataFrame algorithms.
        # (Production note: localCheckpoint blocks don't survive
        # executor loss; a long PageRank on a lossy cluster should
        # setCheckpointDir + checkpoint() every ~10 rounds instead.)
        ranks = ranks.localCheckpoint(eager=True)
    eo.unpersist()
    return ranks


def triangles(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts over an undirected pair
    table (one row per unordered pair, no self-loops).

    Degree orientation (Suri & Vassilvitskii, WWW'11): an edge {u,v}
    is directed u→v iff (deg(u), u) < (deg(v), v) — total order, so
    each triangle appears exactly once as the pattern
    x→y, y→z, x→z. Wedge pivots then have out-degree O(√m) even on
    skew-heavy graphs, bounding the join blow-up.
    """
    # cache the deduped pair table: degrees + the orientation join
    # re-read it, and its lineage may be the whole upstream pipeline
    e = (pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
         .where(F.col("a") != F.col("b")).distinct().persist())
    deg = degrees(symmetrize(e, weight=None)) \
        .select(F.col("node"), F.col("degree"))
    # orient: src = (deg,id)-smaller endpoint
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    lt = (F.col("da") < F.col("db")) | \
         ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    # cache the oriented edge set: it feeds three join sides below
    # (left untouched after materialization — Spark's LRU block
    # manager reclaims it under pressure)
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst")).persist()
    oriented.count()  # materialize so the pair cache can release
    e.unpersist()
    wedges = (oriented.select(F.col("src").alias("x"),
                              F.col("dst").alias("y"))
              .join(oriented.select(F.col("src").alias("y"),
                                    F.col("dst").alias("z")), "y"))
    tri = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("z")),
        ["x", "z"])
    nodes = (tri.select(F.col("x").alias("node"))
             .unionByName(tri.select(F.col("y").alias("node")))
             .unionByName(tri.select(F.col("z").alias("node"))))
    return nodes.groupBy("node").agg(
        F.count("*").cast("long").alias("triangles"))
