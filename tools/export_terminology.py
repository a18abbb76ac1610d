#!/usr/bin/env python
"""Terminology export CLI — the reference's TerminologyExporter workflow
(ui/TerminologyExporter.java: pick a terminology, pick root branches +
a semantic-type filter + an optional recursion depth, export to an OWL
ontology) plus the ConceptExporter RRF/ORF formats
(util/ConceptExporter.java:66-238), headless over this engine's loaders
and sinks.

    python tools/export_terminology.py --obo terms.obo \
        --root GO:0001 --semtypes Disease --depth 3 \
        --format owl --output /tmp/branch.owl

Inputs: --obo FILE | --owl FILE (repeat --owl-import IRI=FILE for
offline modular imports) | --text FILE (tab-indented) | --xml FILE
(NobleCoder XML terminology) | --rrf DIR.
Formats: owl (single RDF/XML file), xml (NobleCoder <Terminology>
document, toElement parity), rrf (MRCONSO directory),
orf (MRCON/MRSO/MRSTY/CUI2CODE directory).

OWL export is driver-side by nature (one XML document per terminology);
rrf/orf are distributed DataFrame writes and spin a local SparkSession,
as does --rrf input.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load(args):
    """→ (concepts: list[dict], isa_edges: list[(child, parent)])."""
    from nobletools_spark.sources.obo import parse_obo, parse_text_terminology
    from nobletools_spark.sources.owl import parse_owl

    if args.obo:
        return parse_obo(Path(args.obo).read_text())
    if args.owl:
        resolver = {}
        for spec in args.owl_import or ():
            iri, _, f = spec.partition("=")
            if not f:
                raise SystemExit(f"--owl-import wants IRI=FILE, got {spec!r}")
            resolver[iri] = Path(f).read_text()
        if resolver:
            return parse_owl(Path(args.owl).read_text(), imports=resolver)
        return parse_owl(Path(args.owl).read_text())
    if args.text:
        return parse_text_terminology(Path(args.text).read_text())
    if args.xml:
        from nobletools_spark.sources.termxml import parse_term_xml
        return parse_term_xml(Path(args.xml).read_text())
    # --rrf: distributed load, then the terminology-sized collect every
    # driver-side export shares
    from nobletools_spark.sources.rrf import concepts_for_index, load_rrf
    spark = _spark()
    tables = load_rrf(spark, args.rrf)
    defs: dict[str, str] = {}
    if "definitions" in tables:
        # first definition per CUI by (sab, definition) — deterministic
        rows = (tables["definitions"].select("cui", "sab", "definition")
                .filter("definition IS NOT NULL").collect())
        for r in sorted(rows, key=lambda r: (r[0], r[1] or "", r[2])):
            defs.setdefault(r[0], r[2])
    concepts = [{
        "cui": r.cui, "name": r.name,
        "synonyms": tuple(r.synonyms or ()),
        "semtypes": tuple(r.semtypes or ()),
        "sources": tuple(r.sources or ()),
        "definition": defs.get(r.cui),
        "codes": tuple((c["sab"], c["code"]) for c in (r.codes or ())),
    } for r in concepts_for_index(tables).collect()]
    edges = [(r.cui, r.parent) for r in tables["relations"].collect()]
    return concepts, edges


_SPARK = None


def _spark():
    global _SPARK
    if _SPARK is None:
        from nobletools_spark.session import get_spark
        _SPARK = get_spark(app_name="export_terminology")
    return _SPARK


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--obo", help="OBO terminology file")
    src.add_argument("--owl", help="OWL (RDF/XML) ontology file")
    src.add_argument("--text", help="tab-indented text terminology file")
    src.add_argument("--xml", help="NobleCoder XML terminology file")
    src.add_argument("--rrf", help="UMLS RRF directory")
    p.add_argument("--owl-import", action="append", metavar="IRI=FILE",
                   help="offline resolver entry for --owl owl:imports")
    p.add_argument("--root", action="append", default=[],
                   help="root concept id; repeatable. Default: export all")
    p.add_argument("--semtypes", default="",
                   help="comma-separated semantic-type filter (prunes the "
                        "whole subtree under a non-matching node)")
    p.add_argument("--depth", type=int, default=None,
                   help="recursion depth from the roots (1 = roots only)")
    p.add_argument("--format", choices=("owl", "xml", "rrf", "orf"),
                   default="owl")
    p.add_argument("--output", required=True,
                   help="owl/xml: file path; rrf/orf: directory")
    p.add_argument("--base-iri", default="http://noble.tools/export")
    p.add_argument("--name", default=None, help="ontology label (owl)")
    p.add_argument("--sab", default="NOBLE", help="source abbrev (rrf/orf)")
    args = p.parse_args(argv)

    concepts, edges = _load(args)
    semtypes = tuple(s.strip() for s in args.semtypes.split(",")
                     if s.strip())
    if args.root or semtypes or args.depth is not None:
        from nobletools_spark.sources.sinks import (default_roots,
                                                    select_branch)
        roots = args.root or default_roots(concepts, edges)
        concepts, edges = select_branch(concepts, edges, roots,
                                        semtypes=semtypes, depth=args.depth)
    print(f"selected {len(concepts)} concepts, {len(edges)} isa edges",
          file=sys.stderr)

    if args.format == "owl":
        from nobletools_spark.sources.sinks import write_owl
        write_owl(concepts, args.output, isa_edges=edges,
                  base_iri=args.base_iri, ontology_name=args.name)
    elif args.format == "xml":
        from nobletools_spark.sources.termxml import write_term_xml
        write_term_xml(concepts, args.output, isa_edges=edges,
                       name=args.name or "terminology")
    else:
        from nobletools_spark.sources.obo import concepts_df_from_records
        from nobletools_spark.sources.sinks import export_orf, export_rrf
        df = concepts_df_from_records(_spark(), concepts)
        (export_rrf if args.format == "rrf" else export_orf)(
            df, args.output, sab=args.sab)
    print(f"wrote {args.format} to {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
