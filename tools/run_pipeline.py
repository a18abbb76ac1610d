"""spark-submit entry point for the full KG-construction pipeline
(north_rule: "run via spark-submit --py-files on a multi-executor
cluster").

    zip -r nobletools_spark.zip nobletools_spark
    spark-submit --py-files nobletools_spark.zip tools/run_pipeline.py \
        --input  <interleaved docs parquet/iceberg path> \
        --rrf    <MRCONSO/... dir>       (or --obo file.obo) \
        --output <triples output dir>

In this sandbox it runs on local[*]; on a cluster the same script runs
unchanged under YARN/K8s masters — the pipeline stages checkpoint under
--output so a killed run resumes at the last completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--rrf")
    ap.add_argument("--obo")
    ap.add_argument("--owl", help="RDF/XML ontology terminology")
    ap.add_argument("--owl-imports", metavar="DIR|ignore",
                    help="owl:imports resolution for --owl: a directory "
                         "holding the imported modules (each import IRI "
                         "resolves to DIR/<last path segment>, .owl/.rdf"
                         "/.xml extensions tried), or 'ignore' to accept "
                         "a PARTIAL hierarchy. Default: a declared "
                         "import is an error (silent partial isa graphs "
                         "are the failure mode)")
    ap.add_argument("--search", default="best-match")
    ap.add_argument("--sources", default="")
    ap.add_argument("--semtypes", default="")
    ap.add_argument("--context", action="store_true",
                    help="enable ConText modifier assignment")
    ap.add_argument("--asserted", action="store_true",
                    help="only ConText-asserted mentions (not negated/"
                         "other-experiencer/hypothetical/hedged) become"
                         " graph edges; the mention table keeps all "
                         "rows with modifiers (requires --context)")
    ap.add_argument("--template",
                    help=".template XML file: adds an item_instances "
                         "extraction stage (templates_from_xml)")
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--incremental-from", metavar="PREV_OUT_DIR",
                    help="previous run's --output dir: only "
                         "fingerprint-changed/new docs go through the "
                         "matcher; unchanged mentions carry forward. "
                         "Falls back to a full run if the previous "
                         "matcher sidecar (kg_matcher.json) is missing "
                         "or differs (different terminology/config).")
    ap.add_argument("--force", action="store_true",
                    help="recompute all stages (ignore checkpoints)")
    ap.add_argument("--html-report", type=int, metavar="N",
                    help="write span-highlighted HTML review reports "
                         "(reference HTMLExporter parity: highlighted "
                         "text pane, concept legend, index.html frame "
                         "page) for the first N doc_ids to "
                         "<output>/html. A bounded driver-side sample "
                         "for human review — the scale path is the "
                         "html_report_df DataFrame")
    ap.add_argument("--validate", action="store_true",
                    help="post-run KG integrity gate (kg_integrity) "
                         "over the materialized triples; violations "
                         "land in <output>/_integrity and a nonzero "
                         "count exits 1")
    args = ap.parse_args()
    if args.asserted and not args.context:
        ap.error("--asserted requires --context (the gate reads the "
                 "ConText modifiers map)")

    from pyspark.sql import SparkSession

    from nobletools_spark.index import build_index_df
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import default_context_index
    from nobletools_spark.plans.pipeline import Pipeline, kg_stages
    from nobletools_spark.session import ship_package

    spark = SparkSession.builder.appName("nobletools-kg").getOrCreate()
    ship_package(spark)

    term_fp = ""  # ontology CONTENT hash for in-memory-built inputs:
    # --obo/--owl edges feed isa_edges via createDataFrame (no backing
    # files → schema-only input fingerprint), so an edited is_a graph
    # must invalidate checkpoints through run_config, same as --template
    if args.rrf:
        from nobletools_spark.sources.rrf import concepts_for_index, load_rrf

        filters = {}
        if args.sources:
            filters["source_filter"] = tuple(args.sources.split(","))
        if args.semtypes:
            filters["semtype_filter"] = tuple(args.semtypes.split(","))
        tables = load_rrf(spark, args.rrf, **filters)
        concepts_df = concepts_for_index(tables)
        isa_edges = tables["relations"]
        semtypes = tables["semtypes"]
    elif args.obo:
        from nobletools_spark.sources.obo import (
            concepts_df_from_records,
            parse_obo,
        )

        import hashlib

        with open(args.obo) as f:
            src = f.read()
        term_fp = hashlib.md5(src.encode()).hexdigest()
        concepts, edges = parse_obo(src)
        concepts_df = concepts_df_from_records(spark, concepts)
        isa_edges = spark.createDataFrame(edges, "cui string, parent string")
        semtypes = None
    elif args.owl:
        import hashlib

        from nobletools_spark.sources.obo import concepts_df_from_records
        from nobletools_spark.sources.owl import local_name, owl_imports, parse_owl

        with open(args.owl) as f:
            src = f.read()
        term_fp = hashlib.md5(src.encode()).hexdigest()
        imports: object = "error"
        if args.owl_imports == "ignore":
            imports = "ignore"
        elif args.owl_imports:
            # offline resolver: IRI → DIR/<last segment>[.owl|.rdf|.xml];
            # resolve transitively so modules importing modules load too
            def _resolve(dirname: str) -> dict[str, str]:
                out: dict[str, str] = {}
                todo = list(owl_imports(src))
                while todo:
                    iri = todo.pop()
                    if iri in out:
                        continue
                    seg = local_name(iri)
                    for cand in (seg, f"{seg}.owl", f"{seg}.rdf",
                                 f"{seg}.xml"):
                        p = os.path.join(dirname, cand)
                        if os.path.exists(p):
                            with open(p) as fh:
                                out[iri] = fh.read()
                            todo.extend(owl_imports(out[iri]))
                            break
                    # unresolved IRIs stay absent — parse_owl raises
                    # with the exact missing list
                return out

            imports = _resolve(args.owl_imports)
            # imported content is a matcher determinant: fold it into
            # the terminology fingerprint so checkpoints invalidate
            for iri in sorted(imports):
                term_fp = hashlib.md5(
                    (term_fp + imports[iri]).encode()).hexdigest()
        concepts, edges = parse_owl(src, imports=imports)
        concepts_df = concepts_df_from_records(spark, concepts)
        isa_edges = spark.createDataFrame(edges, "cui string, parent string")
        semtypes = None
    else:
        ap.error("one of --rrf / --obo / --owl is required")
        return

    index = build_index_df(spark, concepts_df)
    cfg = MatchConfig(search_method=args.search)
    ctx = default_context_index() if args.context else None

    docs = spark.read.parquet(args.input)
    if "spans" not in docs.columns and "text" in docs.columns:
        # flat (doc_id, text) table → wrap into the interleaved spans
        # schema so plain corpora run without a conversion step
        from pyspark.sql import functions as F

        docs = docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.array(F.struct(
                F.lit("text").alias("kind"), F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"))).alias("spans"))
    templates_df = components_df = None
    template_fp = ""
    if args.template:
        import hashlib

        from nobletools_spark.operators.templates import (
            COMPONENTS_DDL,
            TEMPLATES_DDL,
            templates_from_xml,
        )

        with open(args.template) as f:
            template_xml = f.read()
        # CONTENT hash, not the path: an edited template must
        # invalidate the item_instances checkpoint, not resume it
        template_fp = hashlib.md5(template_xml.encode()).hexdigest()
        t_rows, c_rows = templates_from_xml(template_xml)
        templates_df = spark.createDataFrame(t_rows, TEMPLATES_DDL)
        if c_rows:
            components_df = spark.createDataFrame(c_rows, COMPONENTS_DDL)
    # matcher sidecar: the determinants carried-forward mentions were
    # minted under. Incremental mode is only sound when they match the
    # previous run's sidecar (see kg_stages CONTRACT). The terminology
    # identity is the BUILT INDEX digest (the exact object the matcher
    # probes), not a source-file hash — it covers RRF dirs and
    # source/semtype filters uniformly (an --rrf run with different
    # filters builds a different index, hence a different digest).
    from nobletools_spark.plans.pipeline import (
        _fs_delete,
        _fs_read_json,
        _fs_write_json,
        _stable_digest,
    )

    idx_obj = index.value if hasattr(index, "value") else index
    # 'asserted' sits in the sidecar although it is an emitter flag,
    # not a matcher determinant: incremental carry-forward reuses the
    # previous run's TRIPLE/PAIR tables, which were materialized under
    # that run's gate — a flag mismatch makes them non-reusable
    matcher_state = {"index": _stable_digest(idx_obj),
                     "search": args.search, "context": bool(ctx),
                     "asserted": bool(args.asserted)}
    out = args.output.rstrip("/")
    inputs = {"documents": docs, "isa_edges": isa_edges}
    incremental = False
    term_diff_counts = None
    from pyspark.sql.functions import count as F_count
    if args.incremental_from:
        prev = args.incremental_from.rstrip("/")
        prev_state = _fs_read_json(spark, f"{prev}/kg_matcher.json")
        if os.path.abspath(prev) == os.path.abspath(out):
            # in-place update would overwrite {out}/mentions while the
            # incremental plan is reading it — run full instead
            print("incremental-from: previous dir == --output; "
                  "running FULL annotate", file=sys.stderr)
        elif prev_state == matcher_state:
            inputs["prev_doc_fp"] = spark.read.parquet(f"{prev}/doc_fp")
            inputs["prev_mentions"] = spark.read.parquet(f"{prev}/mentions")
            inputs["prev_cooccurrence"] = spark.read.parquet(
                f"{prev}/cooccurrence")
            inputs["prev_mention_triples"] = spark.read.parquet(
                f"{prev}/mention_triples")
            incremental = True
        else:
            print(f"incremental-from: matcher state differs or missing "
                  f"at {prev}/kg_matcher.json - running FULL annotate",
                  file=sys.stderr)
            # when the mismatch is a terminology change, say WHAT
            # changed: diff the previous run's persisted concept
            # snapshot against this run's, write the change rows to
            # {out}/_terminology_diff, and summarize in the report —
            # the operator deciding whether a full re-run was worth it
            # reads this, and stale_triples over {prev}/triples turns
            # it into the invalidated-edge work-list
            try:
                prev_term = spark.read.parquet(f"{prev}/terminology")
                from nobletools_spark.index import terminology_diff

                d = terminology_diff(prev_term, concepts_df)
                d.write.mode("overwrite").parquet(
                    f"{out}/_terminology_diff")
                term_diff_counts = {
                    r["change"]: r["n"]
                    for r in d.groupBy("change")
                    .agg(F_count("*").alias("n")).collect()}
                print(f"terminology diff vs {prev}: "
                      f"{term_diff_counts}", file=sys.stderr)
            except Exception as e:  # older runs have no snapshot
                print(f"terminology diff unavailable: {e}",
                      file=sys.stderr)
    pipe = Pipeline(args.output,
                    kg_stages(index, context=ctx, cfg=cfg,
                              cooccurrence_salt=args.salt,
                              templates_df=templates_df,
                              components_df=components_df,
                              incremental=incremental,
                              asserted=args.asserted))
    if semtypes is not None:
        inputs["semtypes"] = semtypes
    run_config = {"search": args.search, "input": args.input,
                  "context": bool(ctx), "salt": args.salt,
                  "asserted": bool(args.asserted),
                  "template": template_fp, "terminology": term_fp}
    # drop the stale sidecar BEFORE running (crash-consistency, same
    # rule as stage manifests): a killed config-changed rerun must
    # leave NO sidecar — a later --incremental-from of this dir then
    # fail-safes to a full run — rather than one describing a matcher
    # whose mentions parquet was already partially replaced
    _fs_delete(spark, f"{out}/kg_matcher.json")
    res = pipe.run(spark, inputs, run_config=run_config, force=args.force)
    # persist the concept snapshot (terminology-sized) so the NEXT
    # run's sidecar mismatch can report a release diff; written before
    # the sidecar (a crash between the two leaves no sidecar, so the
    # snapshot is never trusted against a half-finished run)
    concepts_df.write.mode("overwrite").parquet(f"{out}/terminology")
    _fs_write_json(spark, f"{out}/kg_matcher.json", matcher_state)
    report = {
        "stages": [{"stage": r.stage, "status": r.status, "rows": r.rows,
                    "wall_s": r.wall_s} for r in pipe.reports],
        "triples": res["triples"].count(),
        "incremental": incremental,
        "output": args.output,
    }
    if term_diff_counts is not None:
        report["terminology_diff"] = term_diff_counts
    if args.html_report:
        from nobletools_spark.sources.sinks import write_html_report

        write_html_report(docs, res["mentions"], f"{out}/html",
                          concepts_df=concepts_df,
                          max_docs=args.html_report)
        report["html"] = f"{out}/html"
    if incremental:
        # the per-snapshot audit row: an unexpectedly large n_changed
        # (fingerprint bug, upstream re-encode) shows up HERE, in the
        # run report an operator actually reads. Derived from the
        # materialized doc_fp tables — no extra fingerprint compute
        from pyspark.sql import functions as F

        cur = res["doc_fp"].select("doc_id", F.col("fp").alias("_n"))
        j = inputs["prev_doc_fp"].join(cur, "doc_id", "full")
        srow = j.agg(
            F.coalesce(F.sum(F.when(F.col("fp").isNull(), 1)
                             .otherwise(0)), F.lit(0)).alias("n_new"),
            F.coalesce(F.sum(F.when(F.col("fp").isNotNull()
                                    & F.col("_n").isNotNull()
                                    & (F.col("fp") != F.col("_n")), 1)
                             .otherwise(0)), F.lit(0)).alias("n_changed"),
            F.coalesce(F.sum(F.when(F.col("fp") == F.col("_n"), 1)
                             .otherwise(0)), F.lit(0)).alias("n_unchanged"),
            F.coalesce(F.sum(F.when(F.col("_n").isNull(), 1)
                             .otherwise(0)), F.lit(0)).alias("n_deleted"),
        ).collect()[0]
        report["increment"] = {k: int(srow[k]) for k in
                               ("n_new", "n_changed", "n_unchanged",
                                "n_deleted")}
    if args.validate:
        # pre-publish QA gate over the materialized snapshot: unknown
        # endpoints / self edges / non-canonical pairs / dangling TUIs
        # against the vocabulary THIS run was built from. Violations
        # land in {out}/_integrity and the count in the run report;
        # nonzero exits 1 so a scheduler fails the publish step.
        from pyspark.sql import functions as F

        from nobletools_spark.operators.triples import kg_integrity
        from nobletools_spark.session import local_table

        node_ids = sorted(
            set(idx_obj.concepts)
            | {r for e in isa_edges.collect() for r in (e[0], e[1])})
        known = local_table(spark, [(k,) for k in node_ids],
                            "cui string")
        tuis = (semtypes.select("tui").distinct()
                if semtypes is not None else None)
        viol = kg_integrity(
            spark.read.parquet(f"{out}/triples"), known, tuis)
        viol.write.mode("overwrite").parquet(f"{out}/_integrity")
        n_viol = spark.read.parquet(f"{out}/_integrity").count()
        report["integrity_violations"] = n_viol
        if n_viol:
            print(json.dumps(report))
            sys.exit(1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
