"""CUI canonicalization: connected components over synonym / cross-code
edges via iterative min-label propagation (SURVEY.md §2.3 — the
reference's many-codes-to-one-CUI resolution, codeMap
NobleCoderTerminology.java:1092-1095 and cross-source codes
util/ConceptImporter.java:877, generalized to a component computation).

Algorithm: undirected edges are symmetrized; every node starts labeled
with itself; each round propagates min(label) over the 1-hop
neighborhood; convergence when no label changes. Rounds are O(graph
diameter) — synonym graphs are shallow (diameter ≤ ~6 for vocabulary
cross-walks), and each round is a self-join on the (terminology-sized,
≪ corpus) edge table, localCheckpoint-truncated so the plan stays flat.
For corpus-scale graphs swap in GraphFrames' large-star/small-star; the
API (edges → (node, component)) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, max_iter: int = 20,
                         driver_threshold: int = 100_000) -> DataFrame:
    """edges(a, b) undirected → (node, component) with component =
    min node id reachable (lexicographic for strings).

    Graphs with ≤ driver_threshold distinct edges (one limit-probe
    job) run union-find driver-side: the propagation loop costs
    ~1 s of Spark job overhead PER ROUND on any input size, and every
    caller's edge table (synonym cross-walks, near-dup pair tables) is
    terminology-/pair-sized by construction. Larger graphs keep the
    distributed min-label propagation (or swap in GraphFrames)."""
    if max_iter <= 0:
        raise ValueError(f"max_iter must be positive, got {max_iter}")
    probe = (edges.select("a", "b").filter(F.col("a") != F.col("b"))
             .distinct().limit(driver_threshold + 1).collect())
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
        return edges.sparkSession.createDataFrame(rows or [], schema)
    sym = (edges.select(F.col("a"), F.col("b"))
           .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    labels = (sym.select(F.col("a").alias("node"))
              .union(sym.select(F.col("b").alias("node")))
              .distinct()
              .withColumn("component", F.col("node")))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # candidate label for each node = min over neighbors' labels
        neigh = (sym.alias("e")
                 .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
                 .select(F.col("e.a").alias("node"),
                         F.col("l.component").alias("cand")))
        new = (labels.alias("l")
               .join(neigh.groupBy("node").agg(F.min("cand").alias("cand")),
                     "node", "left")
               .select("node",
                       F.least(F.col("component"),
                               F.coalesce(F.col("cand"), F.col("component")))
                       .alias("component")))
        new = new.localCheckpoint(eager=True)
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .count())
        labels = new
        if changed == 0:
            break
    else:
        # silently returning partial labels would merge CUIs wrongly
        # downstream (canonicalize_triples) with no signal
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — the graph has a "
            f"component with diameter > {max_iter}; raise max_iter or "
            f"use a doubling propagation (GraphFrames) for this input")
    return labels


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
