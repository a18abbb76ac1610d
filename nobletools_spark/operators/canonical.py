"""CUI canonicalization: connected components over synonym / cross-code
edges via iterative min-label propagation (SURVEY.md §2.3 — the
reference's many-codes-to-one-CUI resolution, codeMap
NobleCoderTerminology.java:1092-1095 and cross-source codes
util/ConceptImporter.java:877, generalized to a component computation).

Algorithm: graphs small enough to fit on the driver (one limit-probe
job) run union-find driver-side; larger graphs run the
large-star/small-star alternation of Kiveris et al., "Connected
Components in MapReduce and Beyond" (ACM SoCC 2014): each pass is two
key-grouped min-aggregations over the edge list, the fixed point is a
star forest (every node → its component minimum), and convergence is
O(log² n) passes regardless of graph DIAMETER — a billion-edge
similarity graph with a long chain converges in ~a dozen passes where
1-hop min-label propagation would need diameter rounds. Large-star
also bounds degree growth (a hub's neighbors re-attach to the
neighborhood minimum, splitting the hub), so skewed high-degree nodes
don't concentrate a pass onto one reducer. Each pass is
localCheckpoint-truncated so the plan stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _star_pass(e: DataFrame) -> DataFrame:
    """One large-star + small-star pass (Kiveris et al. 2014 §3).

    large-star(u): every neighbor v > u re-attaches to
    m = min(Γ(u) ∪ {u}); small-star(u), on edges oriented
    (max, min): every neighbor v (all < u) and u itself attach to
    m = min(Γ(u) ∪ {u}). Both preserve connectivity; the common fixed
    point is a star forest (child > root, child → component min)."""
    sym = (e.select("a", "b")
           .union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    lmin = (sym.groupBy("a").agg(F.min("b").alias("_mn"))
            .select("a", F.least("a", "_mn").alias("_m")))
    large = (sym.join(lmin, "a")
             .filter(F.col("b") > F.col("a"))
             .select(F.col("b").alias("a"), F.col("_m").alias("b"))
             .filter(F.col("a") != F.col("b"))
             .distinct())
    orient = large.select(F.greatest("a", "b").alias("a"),
                          F.least("a", "b").alias("b"))
    smin = orient.groupBy("a").agg(F.min("b").alias("_m"))
    small = (orient.join(smin, "a")
             .select(F.col("b").alias("v"), "_m")
             .union(smin.select(F.col("a").alias("v"), "_m"))
             .filter(F.col("v") != F.col("_m"))
             .select(F.col("v").alias("a"), F.col("_m").alias("b"))
             .distinct())
    return small


def connected_components(edges: DataFrame, max_iter: int = 25,
                         driver_threshold: int = 100_000) -> DataFrame:
    """edges(a, b) undirected → (node, component) with component =
    min node id reachable (lexicographic for strings).

    Graphs whose RAW non-self-loop rows number ≤ driver_threshold
    (one limit-probe job — no pre-limit distinct shuffle; union-find
    absorbs duplicate edges for free) run union-find driver-side: a
    distributed pass costs ~1 s of Spark job overhead on any input
    size, and most callers' edge tables (synonym cross-walks, near-dup
    pair tables) are terminology-/pair-sized by construction. A
    heavily-duplicated table can exceed the raw budget while its
    distinct edge set is small — that only routes it to the
    (result-identical) distributed strategy. Larger graphs run the
    large-star/small-star alternation — O(log² n) passes independent
    of diameter, skew-bounded (see module docstring) — so
    `max_iter` is a safety cap, not a diameter bound."""
    if max_iter <= 0:
        raise ValueError(f"max_iter must be positive, got {max_iter}")
    # probe RAW rows (a pre-limit distinct is a full shuffle of the
    # edge table — a defaultParallelism-task stage even for tiny pair
    # graphs); union-find absorbs duplicate edges for free. A
    # heavily-duplicated table can exceed the raw budget while its
    # distinct edge set is small — that only routes it to the
    # (identical-result) distributed strategy.
    probe = (edges.select("a", "b").filter(F.col("a") != F.col("b"))
             .limit(driver_threshold + 1).collect())
    if len(probe) <= driver_threshold:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in probe:
            for v in (r.a, r.b):
                parent.setdefault(v, v)
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict[str, str] = {}
        for v in parent:
            root = find(v)
            if root not in comp_min or v < comp_min[root]:
                comp_min[root] = v
        rows = [(v, comp_min[find(v)]) for v in sorted(parent)]
        from pyspark.sql import types as T

        node_type = edges.schema["a"].dataType  # preserve caller's id type
        schema = T.StructType([T.StructField("node", node_type),
                               T.StructField("component", node_type)])
        # bounded by the probe budget: a JVM LocalRelation, so
        # downstream stages never spawn Python workers to re-scan it
        from nobletools_spark.session import local_table

        return local_table(edges.sparkSession, rows or [], schema)
    # self-loop-only nodes are excluded, matching the driver fast path
    real = edges.select("a", "b").filter(F.col("a") != F.col("b"))
    nodes = (real.select(F.col("a").alias("node"))
             .union(real.select(F.col("b").alias("node")))
             .distinct())
    e = real.distinct().localCheckpoint(eager=True)
    # pass-to-pass convergence: a cheap order-insensitive checksum
    # (count + multi-arg xxhash64 masked to 32 bits so the sum can't
    # overflow long under ANSI for < 2^31 edges; multi-arg hashing has
    # no delimiter ambiguity for ids containing separators) gates an
    # EXACT set-equality confirmation — wrong components from a
    # checksum collision would silently merge CUIs downstream, so the
    # hash alone is never trusted to stop the loop

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").bitwiseAND(F.lit(0xFFFFFFFF)))
            .alias("h")).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(e)
    for _ in range(max_iter):
        prev = e
        e = _star_pass(e).localCheckpoint(eager=True)
        new_sig = _sig(e)
        if new_sig == sig and e.exceptAll(prev).limit(1).count() == 0:
            # equal counts + empty difference ⟹ equal edge MULTISETS
            # (both are distinct sets by construction) ⟹ fixed point
            break
        sig = new_sig
    else:
        # silently returning partial labels would merge CUIs wrongly
        # downstream (canonicalize_triples) with no signal
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"large-star/small-star passes — O(log² n) passes suffice "
            f"for any graph, so raise max_iter for this input size")
    # converged star forest: every non-root points to its component
    # min (defensive groupBy-min in case the checksum stabilized one
    # pass before a literal star)
    parents = e.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("_comp"))
    return (nodes.join(parents, "node", "left")
            .select("node",
                    F.coalesce("_comp", F.col("node")).alias("component")))


def canonical_map(edges: DataFrame) -> DataFrame:
    """(cui, canonical_cui) mapping: every node of the synonym graph →
    the min CUI of its component (the canonicalization the triple
    emitters join through)."""
    return (connected_components(edges)
            .select(F.col("node").alias("cui"),
                    F.col("component").alias("canonical_cui")))


def canonicalize_triples(triples: DataFrame, mapping: DataFrame,
                         cols: tuple[str, ...] = ("subj", "obj")) -> DataFrame:
    """Rewrite triple endpoints through the canonical map (CUIs not in
    the map pass through unchanged) and re-distinct. The map is
    terminology-sized → broadcast left joins; the corpus-scale triple
    table is never shuffled except for the final distinct."""
    out = triples
    for c in cols:
        m = mapping.select(F.col("cui").alias(c),
                           F.col("canonical_cui").alias(f"_canon_{c}"))
        out = (out.join(F.broadcast(m), c, "left")
               .withColumn(c, F.coalesce(f"_canon_{c}", c))
               .drop(f"_canon_{c}"))
    return out.select(*triples.columns).distinct()


def canonicalize_kg(triples: DataFrame, mapping: DataFrame,
                    doc_subject_preds: tuple = ("mentions-concept",),
                    non_cui_obj_preds: tuple = ("has-semantic-type",),
                    symmetric_preds: tuple = ("co-occurs-with",)
                    ) -> DataFrame:
    """Predicate-aware canonicalization of a mixed (subj, pred, obj) KG
    snapshot — the shape ``build_kg`` / the pipeline's triples stage
    emit. A blanket endpoint rewrite breaks the snapshot's own
    invariants (``kg_integrity``): folding one side of a co-occurrence
    pair whose endpoints are synonyms mints a self-edge, and folding an
    obj below its subj breaks the subj<obj pair orientation. Rules:

    - ``doc_subject_preds``: subj is a document id — fold obj only.
    - ``non_cui_obj_preds``: obj is not a CUI (e.g. a TUI) — fold subj
      only.
    - everything else (isa, co-occurrence, …): fold BOTH endpoints;
      ``symmetric_preds`` rows are re-oriented to subj<obj afterwards,
      and post-fold identity edges (a pair or isa between two aliases
      of one concept — a tautology about the canonical node) drop.

    Same plan shape as ``canonicalize_triples``: two broadcast left
    joins against the terminology-sized map + one distinct."""
    ms = mapping.select(F.col("cui").alias("_ms_key"),
                        F.col("canonical_cui").alias("_canon_s"))
    mo = mapping.select(F.col("cui").alias("_mo_key"),
                        F.col("canonical_cui").alias("_canon_o"))
    doc_subj = F.col("pred").isin(*doc_subject_preds)
    non_cui = F.col("pred").isin(*non_cui_obj_preds)
    sym = F.col("pred").isin(*symmetric_preds)
    cui_cui = ~doc_subj & ~non_cui
    out = (triples
           .join(F.broadcast(ms),
                 F.col("subj") == F.col("_ms_key"), "left")
           .join(F.broadcast(mo),
                 F.col("obj") == F.col("_mo_key"), "left")
           .withColumn("subj", F.when(doc_subj, F.col("subj"))
                       .otherwise(F.coalesce("_canon_s", "subj")))
           .withColumn("obj", F.when(non_cui, F.col("obj"))
                       .otherwise(F.coalesce("_canon_o", "obj")))
           .withColumn("_s", F.when(sym, F.least("subj", "obj"))
                       .otherwise(F.col("subj")))
           .withColumn("obj", F.when(sym, F.greatest("subj", "obj"))
                       .otherwise(F.col("obj")))
           .withColumn("subj", F.col("_s"))
           .filter(~(cui_cui & (F.col("subj") == F.col("obj")))))
    return out.select(*triples.columns).distinct()
