"""Regenerate PLANS.md: physical-plan evidence for every entry query.

For each `__spark_entry__.queries()` entry at sf0.01: join strategies,
exchange count, and the pruned scan schema — the plan properties that
must hold at 100 TB. A per-query NOTE explains why the shape is the one
you'd want. Usage: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NOTES = {
    "kg_mentions": "map-only matcher (broadcast index); exchanges = input round-robin spread + the distinct agg; scan pruned to (doc_id, text)",
    "kg_mentions_full": "map-only matcher stage — the one exchange is the fixture's input round-robin spread, no algorithmic shuffle",
    "kg_doc_concepts": "map-only matcher + single hash agg",
    "kg_mentions_by_ancestor": "broadcast ancestry join (terminology side"
                               " tiny)",
    "kg_cooccurrence": "broadcast doc-level self-join + salted two-phase"
                       " aggregation",
    "kg_isa_closure": "iterative BFS on terminology-sized edges (driver"
                      " loop, localCheckpoint-truncated)",
    "kg_semtypes": "single aggregation over terminology-sized table",
    "kg_canonical": "connected components on terminology-sized edges"
                    " (driver union-find here; large-star/small-star"
                    " doubling beyond the threshold)",
    "kg_word_stats": "single aggregation, map-side partials",
    "text_token_stats": "pure whole-stage codegen, zero exchange",
    "text_quality": "pure whole-stage codegen, zero exchange",
    "text_lang_id": "pure whole-stage codegen, zero exchange",
    "text_fingerprints": "pure whole-stage codegen, zero exchange",
    "events_rollup": "single shuffle on (day, event_type), partial aggs",
    "events_sessionize": "single shuffle on user_id, O(1) per-user window"
                         " state",
    "dedup_exact_bag": "one shuffle on 60-bit signature, AQE-coalesced",
    "dedup_window_spans": "map-side sliding-window hashes; one count"
                          " shuffle keyed by 60-bit hash (hot"
                          " boilerplate = a counter cell, no join)",
    "dedup_jaccard": "group-cap broadcast anti-join, then co-partitioned"
                     " (reused-exchange) self-join over hashed shingles;"
                     " shingle projection pinned below the exchange",
    "dedup_minhash_lsh": "map-side signatures; shuffles band keys only;"
                         " window-capped buckets; Jaccard verify join",
    "dedup_clusters": "components over the (tiny) pair table only —"
                      " iterative min-label propagation, then one join"
                      " back to the corpus",
    "dedup_simhash": "explode + single aggregation (map-side partials)",
    "dedup_embedding": "co-partitioned group self-join, vectors"
                       " materialized below",
    "dedup_embedding_lsh": "sign-projection buckets (64 keys) +"
                           " window cap + bucket self-join",
    "sim_topk": "broadcast nested loop vs tiny query side + per-query"
                " window",
    "sim_ivf_topk": "deterministic k-means cells (quantizer fit on a"
                    " bounded hash sample, centroid LITERALS inlined):"
                    " map-side argmin assignment + n_probe cell explode"
                    " (no crossJoin/window shuffle), max_cell skew cap"
                    " on BOTH sides of the cell-local candidate join",
    "kg_template_items": "matcher + broadcast isa-closure/template"
                         " joins (both terminology-sized) — corpus side"
                         " never shuffles before the final distinct",
    "kg_root_findings": "terminology-derived template (roots as"
                        " finding/self items): same broadcast"
                        " closure×template expansion as"
                        " kg_template_items over the mention stream —"
                        " corpus side never shuffles before the final"
                        " distinct",
    "text_pii_scrub": "pure whole-stage codegen, zero exchange",
    "text_sample": "deterministic hash filter, zero exchange",
    "sim_lsh_topk": "64-bucket (6-plane) capped self-join + window rank —"
                    " bucket keys lift the r01 16-task ceiling",
    "dedup_lines": "map-side line explode; ONE partial-agged"
                   " count+keeper shuffle on the line text; dup table"
                   " broadcast into the line join; one doc-keyed"
                   " rebuild",
    "dedup_strip_windows": "map-side window hashes (raw-expression"
                           " explode — no inferred-filter double eval);"
                           " one count shuffle; hash-keyed semi-join vs"
                           " the duplicates-only hot table; doc-keyed"
                           " regroup + join back",
    "dedup_drop_near": "LSH pairs -> components on the tiny pair table;"
                       " corpus pays one left-anti join against the"
                       " non-representative drop list",
    "text_filter": "pure whole-stage codegen, zero exchange, no float"
                   " outputs",
    "text_mix_sample": "hash-range buckets + driver prefix decision"
                       " table; only the boundary bucket per group pays"
                       " a window sort",
    "text_chunks": "map-only Generate + projection, zero shuffle",
    "text_contamination": "broadcast benchmark-hash semi-join over"
                          " map-side window hashes; duplicate-sized doc"
                          " rollup",
    "text_repetition": "map-side sorted-array folds, zero exchange",
    "text_vocab": "per-doc term frequencies fold MAP-SIDE (sorted-array"
                  " boundary fold — no (doc, token) shuffle exists);"
                  " the ONE exchange is the token rollup (a row per"
                  " document-distinct token) + TakeOrderedAndProject"
                  " top-k — never a global sort",
    "text_pack": "map-side token counts + shard hash; ONE shard-keyed"
                 " shuffle; per-shard window cumsum (a packed shard is"
                 " one ordered stream by definition — n_shards is the"
                 " parallelism knob)",
    "text_pack_manifest": "pack layout + per-doc touched-sequence"
                          " explode (~|docs| rows) + ONE (shard,"
                          " seq)-keyed rollup reusing the shard"
                          " partitioning — ONE exchange total",
    "kg_media_triples": "map-only matcher + doc_id-keyed join of media"
                        " spans to same-doc distinct concepts (both"
                        " sides co-keyed on doc_id — the one shuffle"
                        " the semantics require)",
    "media_frames": "pandas-UDF container synthesis + mapInPandas"
                    " demux, zero shuffle",
    "media_decode": "mapInPandas decode + features, zero shuffle",
    "kg_degrees": "symmetrized edge view over the checkpointed pair"
                  " table; ONE partial-agged shuffle on the node key",
    "kg_pagerank": "iterative rank propagation: static (src,dst,od)"
                   " side cached once; each round = one co-keyed join +"
                   " one dst-keyed agg, lineage TRUNCATED per round via"
                   " localCheckpoint (persist alone doubles the logical"
                   " plan per round -> exponential Catalyst analysis)",
    "kg_triangles": "degree-oriented (Suri-Vassilvitskii) edge set"
                    " cached once; wedge join + closure join both keyed"
                    " on oriented endpoints — pivot out-degree O(sqrt m)"
                    " bounds the wedge blow-up on skewed graphs",
    "text_shuffle": "seeded hash shard + in-shard rank: ONE shard-keyed"
                    " shuffle, NEVER a global total-order sort (a 10^12-"
                    "doc global row_number funnels through one range"
                    " boundary pass)",
    "dedup_semantic": "shared IVF quantizer fit (bounded sample,"
                      " centroid literals inlined); map-side home-cell"
                      " assignment; ONE cell-keyed self-join with"
                      " max_cell dropping oversized cells on both sides",
    "kg_communities": "3 deterministic synchronous LPA rounds (mode of"
                      " neighbor labels, smallest-label ties); per round"
                      " one co-keyed join + one count agg + one per-node"
                      " argmax window — driver fast path at this scale",
    "kg_incremental_diff": "fingerprint-gated re-annotation: only"
                           " changed/new docs hit the matcher (one"
                           " skinny fp join), unchanged mentions carry"
                           " forward; diff = two EXCEPT-DISTINCT"
                           " shuffles over skinny triples. Exchanges"
                           " are doc_id-/triple-keyed, all"
                           " increment-proportional at scale",
    "kg_incremental_cooc": "delta IVM: new = old − pairs(removed) +"
                           " pairs(added); the exchanges are the three"
                           " pair aggregations (old table replay at"
                           " bench scale + two INCREMENT-sized deltas)"
                           " + fp joins — in production `old` is read"
                           " from the previous run's parquet, so only"
                           " delta-sized work remains",
    "text_classifier": "hashed n-gram linear quality gate: per-token"
                       " md5 bucket + integer-weight in-array fold,"
                       " pure whole-stage codegen, zero shuffle;"
                       " learned weights swap in as a broadcast array"
                       " literal with the identical plan",
    "kg_stale_triples": "terminology diff = ONE full-outer join of two"
                        " terminology-sized snapshots (no corpus);"
                        " stale work-list = broadcast join of the"
                        " change rows against the triple stream, one"
                        " leg per endpoint — the corpus never"
                        " shuffles on a diff key",
    "kg_integrity": "per-predicate filters + BROADCAST anti-joins vs"
                    " terminology-sized vocabularies; violations-only"
                    " output. The snapshot projection is persisted and"
                    " shared by the five report legs — the static plan"
                    " re-renders the cached subtree (and its exchanges)"
                    " per leg, but execution computes it ONCE; on a"
                    " parquet-backed snapshot the gate costs one scan",
    "kg_media_adjacent": "spans posexplode to per-doc span rows (tiny"
                         " vs corpus); media x nearby-text adjacency"
                         " and the mention attach are doc-keyed joins"
                         " + offset-range filters — no corpus"
                         " self-join",
    "kg_lift": "pairs + doc-frequency + corpus-N all derive from ONE"
               " persisted (doc,cui) projection (matcher runs once);"
               " both frequency joins broadcast (vocab-sized); the"
               " BroadcastNestedLoopJoin is the 1-ROW corpus-total"
               " crossJoin — constant-size at any scale; lift is"
               " integer fixed-point, bit-reproducible",
    "kg_khop": "frontier BFS: per round one co-keyed join + distinct +"
               " visited anti-join, frontier/visited node-sized, rounds"
               " = constant k (not diameter), localCheckpoint-truncated;"
               " exchanges 0 here = the driver fast path under the"
               " 100k-edge probe — the distributed path engages beyond",
    "kg_negatives": "distinct triple set persisted once (4 plan legs);"
                    " entity rank is the DISTRIBUTED alphabetic_ids"
                    " scheme (range partition + per-partition window +"
                    " cumulative offsets — no single-partition window"
                    " exchange; the only SinglePartition is the 1-row"
                    " global count agg); candidate fan-out is a map-side"
                    " explode + hash-mod; the BroadcastNestedLoopJoin"
                    " is the 1-ROW entity-count crossJoin; anti-join"
                    " co-keyed on (subj,pred,obj)",
    "kg_typed_cooc": "pair table shuffles once (salted cooc agg);"
                     " semtype and rule joins broadcast (terminology-/"
                     "rule-sized); both orientations probed map-side",
    "kg_relations": "map-only matcher feeds a SENTENCE-keyed self-join"
                    " (sentence-local pairs, gap-capped — never a"
                    " corpus self-join); shared mention projection"
                    " persisted so the matcher pass runs once",
    "kg_concept_nodes": "one corpus-keyed (doc,cui) aggregation; degree"
                        " legs reuse the persisted pair table; semtype/"
                        "name joins broadcast (terminology-sized) —"
                        " vertices + edges from the same lineage",
}


def _count_exchanges(plan: str) -> int:
    """Distinct data-moving Exchange operators in an executedPlan string.

    plan_id-carrying lines dedupe by id. For the rest: the plan string
    reprints one physical cached subtree verbatim under EVERY
    InMemoryTableScan site, so an ``InMemoryRelation`` subtree whose
    text was already seen is skipped wholesale; surviving id-less
    exchange lines count positionally (identical text in different
    live subtrees = different operators)."""
    lines = plan.splitlines()

    def art(ln: str) -> int:  # tree-art prefix length = node depth
        return len(re.match(r"[\s:+\-*]*", ln).group(0))

    skip = [False] * len(lines)
    seen_blocks: set[str] = set()
    i = 0
    while i < len(lines):
        if "InMemoryRelation" in lines[i]:
            d = art(lines[i])
            j = i + 1
            while j < len(lines) and art(lines[j]) > d:
                j += 1
            block = "\n".join(lines[i:j])
            if block in seen_blocks:
                for k in range(i, j):
                    skip[k] = True
            else:
                seen_blocks.add(block)
            i = j
        else:
            i += 1
    ex_ids: set[str] = set()
    noid = 0
    for idx, ln in enumerate(lines):
        if skip[idx]:
            continue
        if not re.search(r"\bExchange (?!SinglePartition)", ln):
            continue
        m = re.search(r"plan_id=(\d+)", ln)
        if m:
            ex_ids.add(m.group(1))
        else:
            noid += 1
    return len(ex_ids) + noid


def main() -> None:
    import __spark_entry__ as entry
    from nobletools_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    out = ["# PLANS — physical-plan evidence for the entry queries", "",
           f"Generated by `tools/gen_plans.py` against {sf_dir} (plans",
           "are scale-invariant in shape). For each query: join",
           "strategies, exchange count, and the pruned scan schema —",
           "the properties that must hold at 100 TB.", ""]
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(r"(\w*(?:HashJoin|NestedLoopJoin|MergeJoin))\b",
                           plan)
        # count DISTINCT exchange operators: the plan STRING reprints a
        # cached/shared subtree under every InMemoryTableScan and reused
        # leg, so raw matches overcount multiplicatively once a query
        # persists two nested frames (e.g. kg_negatives: 150 raw vs 19
        # real). plan_ids dedupe; for id-less lines (cached relations
        # planned with AQE off) dedupe whole reprinted CACHED-SUBTREE
        # BLOCKS (an InMemoryRelation subtree seen verbatim before is
        # one physical cache, skipped on reprint) and count the
        # remaining lines positionally — two genuinely distinct
        # exchanges that happen to stringify identically in different
        # subtrees must both count.
        exchanges = _count_exchanges(plan)
        scans = sorted(set(re.findall(r"ReadSchema: (\S+)", plan)))
        out.append(f"## {name}")
        out.append("")
        out.append(f"- joins: {sorted(set(joins)) or 'none'};"
                   f" exchanges: {exchanges}")
        for s in scans:
            out.append(
                f"- scan: `{s.removeprefix('struct<').removesuffix('>')}`")
        if name in NOTES:
            out.append(f"- {NOTES[name]}")
        out.append("")
    # anchor to the repo root — a CWD-relative write from another
    # directory would silently leave the real evidence artifact stale
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    open(dest, "w").write("\n".join(out).rstrip() + "\n")
    print(f"{dest} written")
    spark.stop()


if __name__ == "__main__":
    main()
