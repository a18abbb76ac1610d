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
  once cached) plus one aggregation shuffle on ``dst``. Ranks stay
  distributed; each round's result is localCheckpoint-truncated so the
  logical plan stays O(1) per round instead of doubling (see the
  in-function comment). Terminology-bounded graphs short-circuit to a
  driver-side replay behind one limit-probe job.
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

__all__ = ["symmetrize", "degrees", "pagerank", "triangles",
           "label_propagation", "k_hop"]


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
        from nobletools_spark.functions.ids import _INTEGRAL

        # preserve fractional weights (similarity graphs from the dedup
        # operators carry jaccard/cosine doubles — a blanket long cast
        # would truncate 0.9+0.8 to 1); integral weights keep the BIGINT
        # shape the oracle replays
        w = F.sum("weight")
        integral = isinstance(edges.schema["weight"].dataType, _INTEGRAL)
        aggs.append((w.cast("long") if integral else w.cast("double"))
                    .alias("weighted_degree"))
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(*aggs))


def _local_result(df: DataFrame, node_col: str, rows: list,
                  col2: str, dtype2) -> DataFrame:
    """Driver-fast-path result as a JVM LocalRelation with the caller's
    id dtype preserved (canonical.py convention)."""
    from pyspark.sql import types as T

    from nobletools_spark.session import local_table

    node_type = df.schema[node_col].dataType
    schema = T.StructType([T.StructField("node", node_type),
                           T.StructField(col2, dtype2)])
    return local_table(df.sparkSession, rows, schema)


def _pagerank_local(rows: list, iterations: int, damping_num: int,
                    damping_den: int, scale: int | None) -> list:
    """Pure-Python replay of the distributed plan on collected
    (src, dst) rows — IDENTICAL semantics: out-degree counts duplicate
    rows, the node set is distinct SOURCES only (contributions to
    sink-only nodes are dropped, exactly like the distributed
    nodes-left-join), integer mode uses the same non-negative
    truncating division."""
    adj: dict = {}
    for r in rows:
        adj.setdefault(r.src, []).append(r.dst)
    init = int(scale) if scale is not None else 1.0
    ranks = {v: init for v in adj}
    for _ in range(iterations):
        c = {v: 0 for v in adj}
        for u, outs in adj.items():
            share = (ranks[u] // len(outs) if scale is not None
                     else ranks[u] / len(outs))
            for v in outs:
                if v in c:
                    c[v] += share
        if scale is not None:
            base = (damping_den - damping_num) * int(scale)
            ranks = {v: (base + damping_num * c[v]) // damping_den
                     for v in adj}
        else:
            ranks = {v: (damping_den - damping_num) / damping_den
                     + damping_num / damping_den * c[v] for v in adj}
    return [(v, ranks[v]) for v in sorted(ranks, key=str)]


def pagerank(edges: DataFrame, iterations: int = 3,
             damping_num: int = 85, damping_den: int = 100,
             scale: int | None = None,
             driver_threshold: int = 100_000) -> DataFrame:
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
    # driver fast path (canonical.py convention): graphs whose RAW
    # edge rows fit the probe budget iterate in pure Python — each
    # distributed round costs ~1 s of job overhead on ANY input size,
    # and concept graphs are terminology-bounded by construction. One
    # limit-probe job; oversized graphs pay it and go distributed.
    # NULL endpoints are meaningless graph edges — drop them here so
    # the driver and distributed paths agree (SQL NULL-join semantics
    # and Python None keys would otherwise diverge)
    edges = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull())
    if driver_threshold > 0:
        probe = edges.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            from pyspark.sql import types as T

            rows = _pagerank_local(probe, iterations, damping_num,
                                   damping_den, scale)
            dtype2 = (T.DoubleType() if scale is None else T.LongType())
            return _local_result(edges, "src", rows, "r", dtype2)
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


def _lpa_local(rows: list, iterations: int) -> list:
    """Pure-Python replay of the distributed LPA plan on collected
    (src, dst) rows — IDENTICAL semantics: duplicate edge rows count as
    multiple votes, a node's new label is the mode of its IN-neighbor
    labels (max count, ties → smallest label), and a node with no
    labeled in-neighbor drops out of the round (never happens on a
    symmetrized view)."""
    edges = [(r.src, r.dst) for r in rows]
    labels = {u: u for u, _ in edges}
    for _ in range(iterations):
        cnt: dict = {}
        for u, v in edges:
            if u in labels:
                k = (v, labels[u])
                cnt[k] = cnt.get(k, 0) + 1
        best: dict = {}
        for (v, lbl), c in cnt.items():
            cur = best.get(v)
            if cur is None or c > cur[1] or (c == cur[1] and lbl < cur[0]):
                best[v] = (lbl, c)
        labels = {v: t[0] for v, t in best.items()}
    return [(v, labels[v]) for v in sorted(labels, key=str)]


def label_propagation(edges: DataFrame, iterations: int = 3,
                      driver_threshold: int = 100_000) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over a directed edge view (src, dst): every node starts labeled
    with itself; each round it adopts the most frequent label among its
    in-neighbors, ties broken by the SMALLEST label — fully
    deterministic, so the result is DuckDB-replayable (the oracle
    unrolls the same rounds as CTEs). Returns (node, community).

    Intended input is a ``symmetrize``d view (so in-neighbors ==
    neighbors and every node votes every round); fixed synchronous
    rounds sidestep the classic LPA oscillation nondeterminism —
    communities stabilize in a few rounds on clustered graphs, and
    identical inputs give identical outputs on any cluster size.

    Scale shape: per round ONE co-keyed join (static edge side cached,
    its exchange reused across rounds) + one (dst, label) count
    aggregation + one per-node argmax window — all keyed on node ids,
    no all-pairs anything; lineage localCheckpoint-truncated per round
    like ``pagerank``. Terminology-bounded graphs short-circuit to a
    driver replay behind one limit-probe job."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edges = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull())
    if driver_threshold > 0:
        probe = edges.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            return _local_result(edges, "src",
                                 _lpa_local(probe, iterations),
                                 "community", edges.schema["src"].dataType)
    from pyspark.sql import Window

    e = edges.persist()
    labels = (e.select(F.col("src").alias("node")).distinct()
              .withColumn("lbl", F.col("node"))
              .localCheckpoint(eager=True))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.col("lbl"))
    for _ in range(iterations):
        contribs = (e.join(labels, e["src"] == labels["node"])
                    .groupBy(F.col("dst").alias("node"), "lbl")
                    .agg(F.count("*").alias("c")))
        labels = (contribs.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).select("node", "lbl")
                  .localCheckpoint(eager=True))
    e.unpersist()
    return labels.select("node", F.col("lbl").alias("community"))


def _khop_local(rows: list, seeds: list, k: int) -> list:
    """Pure-Python replay of the frontier BFS on collected (src, dst)
    rows — IDENTICAL semantics: seeds report hop 0 whether or not they
    appear in the edge view, every other reachable node reports its
    MINIMUM hop distance ≤ k."""
    adj: dict = {}
    for r in rows:
        adj.setdefault(r.src, set()).add(r.dst)
    hops = {s: 0 for s in seeds}
    frontier = set(hops)
    for d in range(1, k + 1):
        nxt: set = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= hops.keys()
        for v in nxt:
            hops[v] = d
        frontier = nxt
        if not frontier:
            break
    return [(v, hops[v]) for v in sorted(hops, key=str)]


def k_hop(edges: DataFrame, seeds, k: int,
          driver_threshold: int = 100_000) -> DataFrame:
    """Minimum-hop distances from a seed set over a directed edge view
    (src, dst): returns (node, hops) for every node reachable in ≤ ``k``
    hops, seeds included at hop 0 (whether or not they appear in the
    edge view — "0 hops away from itself" holds vacuously). The k-hop
    neighborhood query every KG consumer runs ("what is within two
    relations of this concept?").

    ``seeds`` is a Python list of node ids (inlined as a JVM
    LocalRelation in the edge-id dtype) or a single-column DataFrame.

    Scale shape: classic frontier BFS — per round ONE co-keyed join
    (frontier ⋈ edges on src), a distinct on the frontier key, and one
    anti-join against the visited set; the frontier and visited tables
    are node-sized, never edge-sized, and each round's lineage is
    localCheckpoint-truncated (see ``pagerank``). The round count is the
    constant ``k``, not the graph diameter. Graphs whose raw edge rows
    fit ``driver_threshold`` replay in pure Python behind one
    limit-probe job (canonical.py convention)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    edges = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull())
    if not isinstance(seeds, DataFrame):
        seeds = sorted(set(seeds), key=str)
        if driver_threshold > 0:
            probe = edges.limit(driver_threshold + 1).collect()
            if len(probe) <= driver_threshold:
                from pyspark.sql import types as T

                return _local_result(edges, "src",
                                     _khop_local(probe, seeds, k),
                                     "hops", T.IntegerType())
        from nobletools_spark.session import local_table
        from pyspark.sql import types as T

        node_type = edges.schema["src"].dataType
        seed_df = local_table(
            edges.sparkSession, [(s,) for s in seeds],
            T.StructType([T.StructField("node", node_type)]))
    else:
        seed_df = (seeds.select(F.col(seeds.columns[0]).alias("node"))
                   .distinct())
    e = edges.persist()
    visited = (seed_df.withColumn("hops", F.lit(0).cast("int"))
               .localCheckpoint(eager=True))
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (e.join(frontier.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(d).cast("int"))
               .localCheckpoint(eager=True))
        # early-exit probe: one cheap job per round, bounded by k — a
        # drained frontier means every further round is a no-op
        if not nxt.limit(1).count():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    e.unpersist()
    return visited


def _triangles_local(rows: list) -> list:
    """Pure-Python replay of the oriented-wedge count on collected
    (a, b) rows: dedup, degree-orient, intersect out-neighborhoods —
    the same triangles, each counted once."""
    edges = {(r[0], r[1]) for r in rows
             if r[0] is not None and r[1] is not None and r[0] != r[1]}
    deg: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    adj: dict = {}
    for u, v in edges:
        x, y = ((u, v) if (deg[u], u) < (deg[v], v) else (v, u))
        adj.setdefault(x, set()).add(y)
    counts: dict = {}
    for x, outs in adj.items():
        for y in outs:
            for z in outs & adj.get(y, frozenset()):
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
    return [(n, counts[n]) for n in sorted(counts, key=str)]


def triangles(pairs: DataFrame, a: str = "a", b: str = "b",
              driver_threshold: int = 100_000) -> DataFrame:
    """Per-node triangle participation counts over an undirected pair
    table (one row per unordered pair, no self-loops).

    Graphs whose RAW pair rows fit ``driver_threshold`` (one
    limit-probe job, no pre-limit distinct shuffle) count driver-side
    in pure Python — the canonical.py fast-path convention; larger
    graphs run the distributed plan below.

    Degree orientation (Suri & Vassilvitskii, WWW'11): an edge {u,v}
    is directed u→v iff (deg(u), u) < (deg(v), v) — total order, so
    each triangle appears exactly once as the pattern
    x→y, y→z, x→z. Wedge pivots then have out-degree O(√m) even on
    skew-heavy graphs, bounding the join blow-up.
    """
    if driver_threshold > 0:
        probe = (pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
                 .limit(driver_threshold + 1).collect())
        if len(probe) <= driver_threshold:
            from pyspark.sql import types as T

            return _local_result(pairs, a, _triangles_local(probe),
                                 "triangles", T.LongType())
    # cache the deduped pair table: degrees + the orientation join
    # re-read it, and its lineage may be the whole upstream pipeline
    # canonicalize the unordered pair BEFORE distinct: an input that
    # carries both (u,v) and (v,u) — e.g. an already-symmetrized edge
    # view — must collapse to ONE pair, or every edge lands twice in
    # `oriented` and the wedge/closure joins inflate each triangle 8x
    # (the driver fast path's adjacency sets dedup this naturally)
    e = (pairs.select(F.least(F.col(a), F.col(b)).alias("a"),
                      F.greatest(F.col(a), F.col(b)).alias("b"))
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
    # ONE pass over the triangle stream: a three-way select union would
    # embed the wedge+closure join subtree in each branch and execute
    # it three times (the cached `oriented` bounds but does not remove
    # that cost)
    nodes = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node"))
    return nodes.groupBy("node").agg(
        F.count("*").cast("long").alias("triangles"))
