"""Graph analytics (operators/graph.py): degrees, PageRank (exact
fixed-point + double), degree-oriented triangle counts — pinned
against pure-Python replays and brute-force enumeration."""

from itertools import combinations

import pytest
from hypothesis import given, settings, strategies as st

from nobletools_spark.operators.graph import (
    degrees, pagerank, symmetrize, triangles)

# square A-B-C-D-A with diagonal A-C: triangles ABC and ACD
SQUARE = [("A", "B", 2), ("B", "C", 1), ("C", "D", 4),
          ("A", "D", 1), ("A", "C", 3)]


def _pairs_df(spark, rows, weight=True):
    ddl = "a string, b string, weight bigint" if weight else \
        "a string, b string"
    if not weight:
        rows = [(a, b) for a, b, *_ in rows]
    return spark.createDataFrame(rows, ddl)


def py_pagerank_int(pairs, iterations, scale=10**9, num=85, den=100):
    adj: dict[str, list[str]] = {}
    for a, b, *_ in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    r = {v: scale for v in adj}
    base = (den - num) * scale
    for _ in range(iterations):
        c = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            share = r[u] // len(nbrs)
            for v in nbrs:
                c[v] += share
        r = {v: (base + num * c[v]) // den for v in adj}
    return r


def py_triangles(pairs):
    edges = {frozenset((a, b)) for a, b, *_ in pairs if a != b}
    nodes = sorted({x for e in edges for x in e})
    t = {v: 0 for v in nodes}
    found = 0
    for x, y, z in combinations(nodes, 3):
        if {frozenset((x, y)), frozenset((y, z)),
                frozenset((x, z))} <= edges:
            found += 1
            t[x] += 1
            t[y] += 1
            t[z] += 1
    return {v: n for v, n in t.items() if n}, found


def test_degrees_square(spark):
    out = {r["node"]: (r["degree"], r["weighted_degree"])
           for r in degrees(symmetrize(_pairs_df(spark, SQUARE))).collect()}
    assert out == {"A": (3, 6), "B": (2, 3), "C": (3, 8), "D": (2, 5)}


def test_degrees_without_weight_column(spark):
    df = degrees(symmetrize(_pairs_df(spark, SQUARE, weight=False),
                            weight=None))
    assert "weighted_degree" not in df.columns
    assert {r["node"]: r["degree"] for r in df.collect()} == \
        {"A": 3, "B": 2, "C": 3, "D": 2}


@pytest.mark.parametrize("dt", [0, 100_000],
                         ids=["distributed", "driver"])
def test_triangles_square(spark, dt):
    out = {r["node"]: r["triangles"]
           for r in triangles(_pairs_df(spark, SQUARE),
                              driver_threshold=dt).collect()}
    assert out == {"A": 2, "B": 1, "C": 2, "D": 1}


def test_triangles_triangle_free(spark):
    # path graph: no triangles -> empty result
    rows = [("A", "B", 1), ("B", "C", 1), ("C", "D", 1)]
    assert triangles(_pairs_df(spark, rows)).count() == 0


@pytest.mark.parametrize("dt", [0, 100_000],
                         ids=["distributed", "driver"])
def test_pagerank_int_exact_vs_python(spark, dt):
    e = symmetrize(_pairs_df(spark, SQUARE))
    got = {r["node"]: r["r"]
           for r in pagerank(e, iterations=3, scale=10**9,
                             driver_threshold=dt).collect()}
    assert got == py_pagerank_int(SQUARE, 3)


def test_pagerank_double_close_to_int(spark):
    e = symmetrize(_pairs_df(spark, SQUARE))
    dbl = {r["node"]: r["r"] for r in pagerank(e, iterations=3).collect()}
    ref = py_pagerank_int(SQUARE, 3, scale=10**12)
    for v, r in dbl.items():
        assert r == pytest.approx(ref[v] / 10**12, rel=1e-6)
    # higher-degree nodes rank higher on the square+diagonal
    assert dbl["A"] > dbl["B"] and dbl["C"] > dbl["D"]


def test_pagerank_rejects_zero_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(symmetrize(_pairs_df(spark, SQUARE)), iterations=0)


@settings(max_examples=6, deadline=None)
@given(st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda t: (f"n{min(t)}", f"n{max(t)}")).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=20))
def test_graph_ops_match_bruteforce(spark, edge_set):
    pairs = [(a, b, 1) for a, b in sorted(edge_set)]
    df = _pairs_df(spark, pairs)
    # triangles vs brute force (sum of per-node counts = 3 * total),
    # BOTH strategies (driver fast path and distributed plan)
    want, total = py_triangles(pairs)
    for dt in (0, 100_000):
        got = {r["node"]: r["triangles"]
               for r in triangles(df, driver_threshold=dt).collect()}
        assert got == want, dt
        assert sum(got.values()) == 3 * total
    # degree sum = 2|E|
    deg = {r["node"]: r["degree"]
           for r in degrees(symmetrize(df)).collect()}
    assert sum(deg.values()) == 2 * len(pairs)
    # fixed-point pagerank exact vs python replay, BOTH strategies
    for dt in (0, 100_000):
        pr = {r["node"]: r["r"]
              for r in pagerank(symmetrize(df), iterations=2, scale=10**9,
                                driver_threshold=dt).collect()}
        assert pr == py_pagerank_int(pairs, 2), dt


# --- label propagation ------------------------------------------------

# two triangles bridged by one edge: LPA should give each triangle one
# community (the min node id in it wins within 3 rounds)
TWO_CLIQUES = [("A", "B", 1), ("B", "C", 1), ("A", "C", 1),
               ("X", "Y", 1), ("Y", "Z", 1), ("X", "Z", 1),
               ("C", "X", 1)]


def py_lpa(pairs, iterations):
    edges = []
    for a, b, *_ in pairs:
        edges += [(a, b), (b, a)]
    labels = {u: u for u, _ in edges}
    for _ in range(iterations):
        cnt: dict = {}
        for u, v in edges:
            cnt.setdefault(v, {})
            cnt[v][labels[u]] = cnt[v].get(labels[u], 0) + 1
        labels = {v: min(d, key=lambda l: (-d[l], l))
                  for v, d in cnt.items()}
    return labels


@pytest.mark.parametrize("dt", [0, 100_000],
                         ids=["distributed", "driver"])
def test_label_propagation_two_cliques(spark, dt):
    from nobletools_spark.operators.graph import label_propagation

    e = symmetrize(_pairs_df(spark, TWO_CLIQUES), weight=None)
    got = {r["node"]: r["community"]
           for r in label_propagation(e, 3, driver_threshold=dt).collect()}
    assert got == py_lpa(TWO_CLIQUES, 3)
    # the two triangles resolve to distinct communities
    assert len({got["A"], got["B"], got["C"]}) == 1
    assert len({got["X"], got["Y"], got["Z"]}) == 1
    assert got["A"] != got["Y"]


@pytest.mark.parametrize("dt", [0, 100_000],
                         ids=["distributed", "driver"])
def test_label_propagation_tie_breaks_smallest(spark, dt):
    from nobletools_spark.operators.graph import label_propagation

    # path A-B-C: B's neighbors vote A and C once each -> smallest (A)
    e = symmetrize(_pairs_df(spark, [("A", "B", 1), ("B", "C", 1)]),
                   weight=None)
    got = {r["node"]: r["community"]
           for r in label_propagation(e, 1, driver_threshold=dt).collect()}
    assert got["B"] == "A"
    assert got == py_lpa([("A", "B"), ("B", "C")], 1)


@given(st.lists(st.tuples(st.sampled_from("ABCDEFG"),
                          st.sampled_from("ABCDEFG")),
                min_size=1, max_size=15),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=12, deadline=None)
def test_label_propagation_matches_replay(spark, pairs, iters):
    from nobletools_spark.operators.graph import label_propagation

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    e = symmetrize(_pairs_df(spark, [(a, b, 1) for a, b in pairs]),
                   weight=None)
    for dt in (0, 100_000):
        got = {r["node"]: r["community"]
               for r in label_propagation(e, iters,
                                          driver_threshold=dt).collect()}
        assert got == py_lpa(pairs, iters)


def test_label_propagation_rejects_zero_iterations(spark):
    from nobletools_spark.operators.graph import label_propagation

    e = symmetrize(_pairs_df(spark, TWO_CLIQUES), weight=None)
    with pytest.raises(ValueError):
        label_propagation(e, 0)


# chain A-B-C-D-E plus isolate pair F-G: distances from A are 0..4
CHAIN = [("A", "B", 1), ("B", "C", 1), ("C", "D", 1), ("D", "E", 1),
         ("F", "G", 1)]


def py_khop(pairs, seeds, k):
    adj: dict[str, set[str]] = {}
    for a, b, *_ in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hops = {s: 0 for s in seeds}
    frontier = set(hops)
    for d in range(1, k + 1):
        nxt = set().union(*(adj.get(u, set()) for u in frontier)) \
            - hops.keys() if frontier else set()
        for v in nxt:
            hops[v] = d
        frontier = nxt
    return hops


@pytest.mark.parametrize("dt", [100_000, 0])  # driver + distributed
@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_k_hop_chain(spark, dt, k):
    from nobletools_spark.operators.graph import k_hop

    e = symmetrize(_pairs_df(spark, CHAIN), weight=None)
    got = {r["node"]: r["hops"]
           for r in k_hop(e, ["A"], k, driver_threshold=dt).collect()}
    assert got == py_khop(CHAIN, ["A"], k)


@pytest.mark.parametrize("dt", [100_000, 0])
def test_k_hop_multi_seed_min_distance(spark, dt):
    from nobletools_spark.operators.graph import k_hop

    e = symmetrize(_pairs_df(spark, CHAIN), weight=None)
    got = {r["node"]: r["hops"]
           for r in k_hop(e, ["A", "E"], 2, driver_threshold=dt).collect()}
    # C is 2 hops from both ends; B/D are 1 from the nearer seed
    assert got == {"A": 0, "E": 0, "B": 1, "D": 1, "C": 2}


@pytest.mark.parametrize("dt", [100_000, 0])
def test_k_hop_seed_absent_from_graph(spark, dt):
    from nobletools_spark.operators.graph import k_hop

    e = symmetrize(_pairs_df(spark, CHAIN), weight=None)
    got = {r["node"]: r["hops"]
           for r in k_hop(e, ["Z"], 3, driver_threshold=dt).collect()}
    assert got == {"Z": 0}


def test_k_hop_dataframe_seeds_and_early_exit(spark):
    from nobletools_spark.operators.graph import k_hop

    e = symmetrize(_pairs_df(spark, CHAIN), weight=None)
    seeds = spark.createDataFrame([("F",), ("F",)], "s string")
    # k far beyond the component diameter: the drained-frontier
    # early exit must stop the loop, and dup seeds collapse
    got = {r["node"]: r["hops"]
           for r in k_hop(e, seeds, 9, driver_threshold=0).collect()}
    assert got == {"F": 0, "G": 1}


def test_k_hop_rejects_negative_k(spark):
    from nobletools_spark.operators.graph import k_hop

    e = symmetrize(_pairs_df(spark, CHAIN), weight=None)
    with pytest.raises(ValueError):
        k_hop(e, ["A"], -1)


@settings(max_examples=15, deadline=None)
@given(edge_set=st.sets(
    st.tuples(st.sampled_from("ABCDEF"), st.sampled_from("ABCDEF")),
    max_size=12), k=st.integers(0, 3))
def test_k_hop_matches_bruteforce(spark, edge_set, k):
    from nobletools_spark.operators.graph import k_hop

    pairs = [(a, b, 1) for a, b in edge_set if a != b]
    if not pairs:
        return
    e = symmetrize(_pairs_df(spark, pairs), weight=None)
    for dt in (100_000, 0):
        got = {r["node"]: r["hops"]
               for r in k_hop(e, ["A"], k, driver_threshold=dt).collect()}
        assert got == py_khop(pairs, ["A"], k)


def test_degrees_keeps_fractional_weights(spark):
    """Similarity graphs carry double weights (jaccard/cosine): the
    weighted degree must stay a double — a blanket long cast would
    truncate 0.9+0.8 to 1."""
    from nobletools_spark.operators.graph import degrees

    e = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.8)],
        "src string, dst string, weight double")
    row = {r.node: r.weighted_degree for r in degrees(e).collect()}
    assert abs(row["a"] - 1.7) < 1e-12
    # integral weights keep the BIGINT shape the oracle replays
    ei = spark.createDataFrame([("a", "b", 2), ("a", "c", 3)],
                               "src string, dst string, weight long")
    out = degrees(ei)
    assert dict(out.dtypes)["weighted_degree"] == "bigint"


def test_triangles_distributed_handles_symmetrized_input(spark):
    """An input carrying BOTH orientations of every edge (a symmetrized
    view) must not inflate counts: pairs canonicalize to one row per
    unordered edge before orientation. driver_threshold=0 forces the
    distributed path (the driver fast path's adjacency sets dedup
    naturally)."""
    from nobletools_spark.operators.graph import triangles

    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    both = tri + [(b, a) for a, b in tri]
    pairs = spark.createDataFrame(both, "a string, b string")
    got = {r.node: r.triangles
           for r in triangles(pairs, driver_threshold=0).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}
