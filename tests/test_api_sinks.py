"""Facade (search rollup, filters, lookup), sinks (RESULTS.tsv, RRF
export), and the ancestry-gated mention filter."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.api import NobleCoderSpark
from nobletools_spark.model import MatchConfig
from nobletools_spark.sources.fixtures import (
    PYTEST_CONCEPTS,
    PYTEST_ISA_EDGES,
    SPANS_DDL,
    pytest_index,
)

NC = NobleCoderSpark(pytest_index())


def test_search_rollup_merges_mentions():
    # melanoma appears twice → one ranked concept with merged annotations
    # (annotation collection is case-sensitive on the original surface,
    # getAnnotations :1277-1292 — so both occurrences share the case)
    res = NC.search("Melanoma was seen; then Melanoma was excised.")
    assert [c.cui for c in res][0] == "C013"
    top = res[0]
    assert len(top.annotations) == 2
    assert top.name == "Melanoma"


def test_search_ranking_score_desc():
    res = NC.search("The deep margin near the nasal septum.")
    assert len(res) >= 2
    scores = [c.score for c in res]
    assert scores == sorted(scores, reverse=True)


def test_search_method_override():
    # all-match keeps subsumed concepts that best-match subsumes away
    best = {c.cui for c in NC.search("deep margin")}
    allm = {c.cui for c in NC.search("deep margin", method="all-match")}
    assert "C001" in best and "C002" not in best
    assert {"C001", "C002", "C003"} <= allm


def test_source_filter_drops_best_candidate():
    nc = NobleCoderSpark(pytest_index(),
                         MatchConfig(source_filter=("NOPE",)))
    # every pytest concept carries TST (+others) → all filtered out
    assert nc.search("Melanoma was seen.") == []
    nc.set_filters(sources=("TST",))
    assert {c.cui for c in nc.search("Melanoma was seen.")} == {"C013"}


def test_semtype_filter():
    nc = NobleCoderSpark(pytest_index(),
                         MatchConfig(semtype_filter=("T191",)))
    res = {c.cui for c in nc.search("Melanoma near the deep margin.")}
    assert res == {"C013"}  # T047 margin concepts filtered


def test_lookup():
    c = NC.lookup_concept("C013")
    assert c.name == "Melanoma" and "ALT" in c.sources
    assert NC.lookup_concept("C999") is None


def test_mentions_with_ancestor(spark):
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.operators.triples import mentions_with_ancestor

    docs = spark.createDataFrame(
        [("d1", [("text", "Melanoma and a deep margin and FISH.", None, 0)])],
        SPANS_DDL)
    m = annotate(docs, pytest_index(), MatchConfig())
    edges = spark.createDataFrame(list(PYTEST_ISA_EDGES),
                                  "cui string, parent string")
    # C015 (disease) ancestors: melanoma (C013 via C014), FISH (C005 via
    # C016), margins (C003/C012/C001 via C003→C015) — but not itself-only
    got = {r.cui for r in mentions_with_ancestor(m, edges, "C015").collect()}
    assert "C013" in got and "C005" in got
    got14 = {r.cui for r in mentions_with_ancestor(m, edges, "C014").collect()}
    assert got14 == {"C013"}


def test_results_tsv(spark):
    from nobletools_spark.operators.context import default_context_index
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.obo import concepts_df_from_records
    from nobletools_spark.sources.sinks import MODIFIER_COLUMNS, results_tsv_df

    docs = spark.createDataFrame(
        [("d1", [("text", "No evidence of melanoma.", None, 0)])], SPANS_DDL)
    m = annotate(docs, pytest_index(), MatchConfig(),
                 context=default_context_index())
    cdf = concepts_df_from_records(spark, PYTEST_CONCEPTS)
    out = results_tsv_df(m, cdf)
    assert out.columns == ["Document", "Matched Term", "Code", "Concept Name",
                           "Semantic Type", "Annotations", *MODIFIER_COLUMNS]
    row = [r for r in out.collect() if r.Code == "C013"][0]
    assert row.Polarity == "Negative_Polarity"
    assert row["Concept Name"] == "Melanoma"
    assert "/" in row.Annotations


def test_rrf_export_roundtrip(spark, tmp_path):
    from nobletools_spark.sources.obo import concepts_df_from_records
    from nobletools_spark.sources.rrf import load_rrf
    from nobletools_spark.sources.sinks import export_rrf

    cdf = concepts_df_from_records(spark, PYTEST_CONCEPTS[:4])
    out = str(tmp_path / "rrf_out")
    export_rrf(cdf, out)
    # exported files are MRCONSO-shaped: re-load through the RRF scanner
    import glob
    import os
    merged = str(tmp_path / "rrf_merged")
    os.makedirs(merged)
    with open(f"{merged}/MRCONSO.RRF", "w") as f:
        for part in sorted(glob.glob(f"{out}/part-*")):
            f.write(open(part).read())
    open(f"{merged}/MRSTY.RRF", "w").close()
    open(f"{merged}/MRREL.RRF", "w").close()
    t = load_rrf(spark, merged)
    back = {r["cui"]: r for r in t["concepts"].collect()}
    assert set(back) == {c["cui"] for c in PYTEST_CONCEPTS[:4]}
    assert back["C001"]["name"] == "Deep Margin"
    assert set(back["C004"]["synonyms"]) == {"Nasal Septum", "Septum of Nose"}

def test_canonicalize_triples(spark):
    from nobletools_spark.operators.canonical import (
        canonical_map,
        canonicalize_triples,
    )
    from nobletools_spark.sources.fixtures import BUILTIN_SYNONYM_EDGES

    edges = spark.createDataFrame(list(BUILTIN_SYNONYM_EDGES),
                                  "a string, b string")
    triples = spark.createDataFrame(
        [("C201", "isa", "C404"),       # both endpoints alias CUIs
         ("C201", "isa", "C304"),       # same canonical triple as above
         ("C999", "isa", "C888")],      # unmapped: passes through
        "subj string, pred string, obj string")
    got = {tuple(r) for r in
           canonicalize_triples(triples, canonical_map(edges)).collect()}
    assert got == {("C101", "isa", "C104"), ("C999", "isa", "C888")}


def test_html_report(spark):
    """Span-highlighted HTML (HTMLExporter.java:424-519 fidelity):
    annotation-level <label> highlights whose ids/offsets agree with the
    mention table, concept legend with hover wiring, footer count."""
    import re

    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.sinks import html_report_df

    docs = spark.createDataFrame(
        [("d1", [("text", "Melanoma was seen.\nDeep margin clear.",
                  None, 0)]),
         ("d2", [("text", "Nothing here.", None, 0)])], SPANS_DDL)
    m = annotate(docs, pytest_index(), MatchConfig())
    html = {r.doc_id: r.html for r in html_report_df(docs, m).collect()}

    # --- parity of highlighted offsets with the mention table ---
    # every word annotation of every mention appears as a <label> whose
    # id is the annotation's document offset and whose text is the
    # annotation's surface form (codeLabel :215-236)
    labels = dict(re.findall(r'<label id="(\d+)"[^>]*>([^<]*)</label>',
                             html["d1"]))
    anns = {(str(a["offset"]), a["text"])
            for r in m.filter(F.col("doc_id") == "d1").collect()
            for a in r.annotations}
    for off, text in anns:
        assert labels.get(off) == text, (off, text, labels)
    # no stray highlights beyond the mention table
    assert set(labels) == {off for off, _ in anns}

    # mouseover wiring carries the owning concept code (quirk: N/U
    # prefix when negated/hedged), label default color is green
    assert "h(['C013'])" in html["d1"]
    assert 'style="color:green;"' in html["d1"]
    # concept legend: bold header, entry id = plain code, jump href to
    # the first annotation id, alternating first color blue
    assert "<b>Concepts</b>" in html["d1"]
    assert re.search(r'<a style="color:blue;" id="C0\d\d"', html["d1"])
    # newline → <br> (export(Document) :442-449)
    assert "<br>" in html["d1"]
    # footer found-items count equals the mention count
    n1 = m.filter(F.col("doc_id") == "d1").count()
    assert f"found items: <b>{n1}</b>" in html["d1"]
    # mention-free document: no labels, no legend, zero count
    assert "<label" not in html["d2"] and "Nothing here." in html["d2"]
    assert "found items: <b>0</b>" in html["d2"]


def test_html_report_legend_only_rendered_ids(spark):
    """Partially overlapping kept spans: the left-to-right walk renders
    only the first (<label>), so the concept legend must not reference
    the unrendered one — a mouseover h()/j() on a missing element id
    would throw and abort highlighting for every subsequent id."""
    import re

    from nobletools_spark.operators.matcher import MENTIONS_DDL
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.sinks import html_report_df

    docs = spark.createDataFrame(
        [("d1", [("text", "abcdefghijklmnop", None, 0)])], SPANS_DDL)
    # spans (0,10) and (5,15): an antichain (neither contains the
    # other), both kept, only the first rendered by the walk
    m = spark.createDataFrame(
        [("d1", 0, "C0AAA", "abcdefghij", "abcdefghij", 1.0, 0, 10,
          [("abcdefghij", 0)], None),
         ("d1", 0, "C0BBB", "fghijklmno", "fghijklmno", 1.0, 5, 15,
          [("fghijklmno", 5)], None)], MENTIONS_DDL)
    html = html_report_df(docs, m).collect()[0].html
    labels = re.findall(r'<label id="(\d+)"', html)
    assert labels == ["0"]                       # walk-order skip
    # the skipped span's id never appears in any hover wiring
    assert "'5'" not in html
    # and its concept has no legend entry at all
    assert 'id="C0BBB"' not in html
    assert 'id="C0AAA"' in html                  # rendered one keeps its row
    # charset meta present (non-ASCII docs survive any locale/browser)
    assert '<meta charset="utf-8"/>' in html


def test_write_html_report(spark, tmp_path):
    """write_html_report: bounded per-doc files + index.html frame page
    (HTMLExporter.getIndex :389-407)."""
    import os

    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.sinks import write_html_report

    docs = spark.createDataFrame(
        [("d1", [("text", "Melanoma was seen.", None, 0)]),
         ("d2", [("text", "Nothing here.", None, 0)])], SPANS_DDL)
    m = annotate(docs, pytest_index(), MatchConfig())
    out = str(tmp_path / "html")
    write_html_report(docs, m, out, max_docs=1)  # bounded sample
    assert os.path.exists(f"{out}/index.html")
    assert os.path.exists(f"{out}/reports/d1.html")
    assert not os.path.exists(f"{out}/reports/d2.html")  # cap respected
    idx = open(f"{out}/index.html").read()
    assert 'href="reports/d1.html" target="frame"' in idx
    assert "<label" in open(f"{out}/reports/d1.html").read()


def test_export_orf_round_trip(spark, tmp_path):
    """ORF export (ConceptExporter.exportORF :66-238): MRCON/MRSO/MRSTY/
    CUI2CODE layouts, trailing pipe, referential id integrity (same
    string ⇒ same SUI, same normalized string ⇒ same LUI), CUI/TUI
    passthrough vs assignment."""
    from nobletools_spark.sources.sinks import export_orf

    concepts = spark.createDataFrame(
        [("C0001234", "melanoma", ["melanoma", "malignant melanoma"],
          ["T191"]),
         ("GO:0002", "neoplasm", ["neoplasm", "Melanomas"],
          ["Neoplastic Process"])],
        "cui string, name string, synonyms array<string>, "
        "semtypes array<string>")
    out = str(tmp_path / "orf")
    export_orf(concepts, out)

    mrcon = [l.value.split("|") for l in
             spark.read.text(f"{out}/MRCON").collect()]
    assert all(len(r) == 9 and r[-1] == "" for r in mrcon)  # trailing pipe
    by_str = {}
    for cui, lat, ts, lui, stt, sui, s, lrl, _ in mrcon:
        assert lat == "ENG" and lrl == "0"
        assert (ts, stt) in {("P", "PF"), ("S", "VO")}
        by_str.setdefault(s, set()).add(sui)
    assert set(by_str) == {"melanoma", "malignant melanoma", "neoplasm",
                           "Melanomas"}
    assert all(len(v) == 1 for v in by_str.values())  # same str ⇒ same SUI
    # CUI passthrough vs assigned
    cuis = {r[0] for r in mrcon}
    assert "C0001234" in cuis
    assert any(c.startswith("C000000") and c != "C0001234" for c in cuis)
    # LUI: 'melanoma' and 'Melanomas' normalize together
    luis = {s: next(r[3] for r in mrcon if r[6] == s) for s in by_str}
    assert luis["melanoma"] == luis["Melanomas"]
    # MRSO rows mirror MRCON (same cui/lui/sui), PT/NP term types
    mrso = [l.value.split("|") for l in
            spark.read.text(f"{out}/MRSO").collect()]
    assert {(r[0], r[1], r[2]) for r in mrso} == \
           {(r[0], r[3], r[5]) for r in mrcon}
    assert {r[4] for r in mrso} == {"PT", "NP"}
    # MRSTY: T191 passthrough, name-typed semtype gets assigned T%03d
    mrsty = [l.value.split("|") for l in
             spark.read.text(f"{out}/MRSTY").collect()]
    assert ("C0001234", "T191", "T191") in {(r[0], r[1], r[2]) for r in mrsty}
    assert any(r[1] == "T000" and r[2] == "Neoplastic Process"
               for r in mrsty)
    # CUI2CODE maps assigned cuis back to original codes
    c2c = dict(l.value.split("=", 1) for l in
               spark.read.text(f"{out}/CUI2CODE").collect())
    assert c2c["C0001234"] == "C0001234"
    assert "GO:0002" in c2c.values()
    # MRDEF/MRSAB exist (exportORF :115-124,:165-211): no definition
    # column here ⇒ empty MRDEF; no sources ⇒ one fallback MRSAB row
    assert spark.read.text(f"{out}/MRDEF").count() == 0
    mrsab = [l.value.split("|") for l in
             spark.read.text(f"{out}/MRSAB").collect()]
    assert len(mrsab) == 1 and len(mrsab[0]) == 24  # 23 fields + trailing
    assert mrsab[0][3] == "NOBLE" and mrsab[0][19] == "ENG"


def test_export_orf_mrdef_and_mrsab(spark, tmp_path):
    """MRDEF carries cui|sab|definition| rows for concepts with a
    definition; MRSAB emits one row per distinct source."""
    from nobletools_spark.sources.sinks import export_orf

    concepts = spark.createDataFrame(
        [("C0001234", "melanoma", ["melanoma"], ["T191"], ["NCI"],
          "a malignant neoplasm of melanocytes"),
         ("C0002503", "nevus", ["nevus"], ["T191"], ["NCI", "SNOMEDCT"],
          None)],
        "cui string, name string, synonyms array<string>, "
        "semtypes array<string>, sources array<string>, definition string")
    out = str(tmp_path / "orf3")
    export_orf(concepts, out)
    mrdef = [l.value.split("|") for l in
             spark.read.text(f"{out}/MRDEF").collect()]
    assert mrdef == [["C0001234", "NCI",
                      "a malignant neoplasm of melanocytes", ""]]
    mrsab = sorted(l.value.split("|") for l in
                   spark.read.text(f"{out}/MRSAB").collect())
    assert [r[3] for r in mrsab] == ["NCI", "SNOMEDCT"]
    assert all(len(r) == 24 and r[13] == "0" and r[20] == "UTF-8"
               for r in mrsab)


def test_export_orf_no_id_collisions(spark, tmp_path):
    """Assigned C%07d / T%03d ids must skip values already present as
    passthrough ids in the data."""
    from nobletools_spark.sources.sinks import export_orf

    concepts = spark.createDataFrame(
        [("C0000000", "alpha", ["alpha"], ["T000"]),
         ("GO:0001", "beta", ["beta"], ["Odd Type"]),
         ("GO:0002", "gamma", ["gamma"], [])],
        "cui string, name string, synonyms array<string>, "
        "semtypes array<string>")
    out = str(tmp_path / "orf2")
    export_orf(concepts, out)
    c2c = dict(l.value.split("=", 1) for l in
               spark.read.text(f"{out}/CUI2CODE").collect())
    # three distinct ocuis, real C0000000 untouched, assigned skip it
    assert len(c2c) == 3 and c2c["C0000000"] == "C0000000"
    assert set(c2c) == {"C0000000", "C0000001", "C0000002"}
    mrsty = [l.value.split("|") for l in
             spark.read.text(f"{out}/MRSTY").collect()]
    tuis = {r[2]: r[1] for r in mrsty}
    assert tuis["T000"] == "T000"          # passthrough kept
    assert tuis["Odd Type"] == "T001"      # assigned skips taken T000


def test_export_orf_nameless_concept_keeps_referential_integrity(
        spark, tmp_path):
    """A concept with NULL name and no synonyms has no MRCON rows but
    must still get a consistent assigned CUI in CUI2CODE and MRSTY —
    the reference's getCUI maps every concept it touches."""
    from nobletools_spark.sources.sinks import export_orf

    concepts = spark.createDataFrame(
        [("local:tumor", None, [], ["Finding"], ["SRC"], "a tumor"),
         ("local:node", "Node", ["node"], ["Body Part"], ["SRC"], None)],
        "cui string, name string, synonyms array<string>, "
        "semtypes array<string>, sources array<string>, definition string")
    out = str(tmp_path / "orf")
    export_orf(concepts, out)

    def lines(name):
        import glob

        return [ln for f in glob.glob(f"{out}/{name}/part-*")
                for ln in open(f).read().splitlines() if ln]

    c2c = dict(ln.split("=", 1) for ln in lines("CUI2CODE"))
    assert set(c2c.values()) == {"local:tumor", "local:node"}
    assigned = {v: k for k, v in c2c.items()}
    tumor_id = assigned["local:tumor"]
    assert tumor_id.startswith("C") and tumor_id[1:].isdigit()
    # MRSTY rows reference the ASSIGNED id, not the raw code
    sty_cuis = {ln.split("|")[0] for ln in lines("MRSTY")}
    assert tumor_id in sty_cuis and "local:tumor" not in sty_cuis
    # and the MRDEF row for the nameless concept maps too
    def_cuis = {ln.split("|")[0] for ln in lines("MRDEF")}
    assert def_cuis == {tumor_id}


def test_build_kg_matches_pipeline_composition(spark, tmp_path):
    """build_kg equals the resumable pipeline's triples stage on the
    same corpus (same emitters, same unions, same canonicalization
    hook points), and asserted=True without a ConText index raises."""
    import pytest as _pytest

    from nobletools_spark.model import MatchConfig
    from nobletools_spark.plans.pipeline import Pipeline, kg_stages
    from nobletools_spark.sources.fixtures import (
        PYTEST_ISA_EDGES,
        pytest_index,
        synthetic_corpus_df,
    )

    docs = synthetic_corpus_df(spark, 40, seed=11)
    edges = spark.createDataFrame(list(PYTEST_ISA_EDGES),
                                  "cui string, parent string")
    nc = NobleCoderSpark(pytest_index(), MatchConfig())
    got = sorted(tuple(r) for r in
                 nc.build_kg(docs, isa_edges=edges).collect())
    pipe = Pipeline(str(tmp_path / "kg"),
                    kg_stages(pytest_index(), cfg=MatchConfig()))
    res = pipe.run(spark, {"documents": docs, "isa_edges": edges})
    want = sorted(tuple(r) for r in
                  res["triples"].select("subj", "pred", "obj").collect())
    assert got == want and got
    with _pytest.raises(ValueError):
        nc.build_kg(docs, asserted=True)   # no ConText index


def test_build_property_graph_facade(spark):
    """build_property_graph returns the GraphFrames-shaped pair from
    one annotate pass; asserted=True without ConText raises."""
    import pytest as _pytest

    from nobletools_spark.model import MatchConfig
    from nobletools_spark.sources.fixtures import (
        pytest_index,
        synthetic_corpus_df,
    )

    docs = synthetic_corpus_df(spark, 30, seed=3)
    nc = NobleCoderSpark(pytest_index(), MatchConfig())
    verts, edges = nc.build_property_graph(docs)
    assert {"id", "n_docs", "degree", "weighted_degree"} <= set(verts.columns)
    assert ["src", "dst", "relationship", "weight"] == edges.columns
    assert verts.count() > 0
    e = edges.collect()
    assert all(r.src < r.dst for r in e)
    with _pytest.raises(ValueError):
        nc.build_property_graph(docs, asserted=True)


def test_export_owl_round_trip(spark, tmp_path):
    """OWL export (OntologyCreator.java:105-338 workflow): concepts +
    isa edges → RDF/XML that parse_owl reads back losslessly — name,
    synonyms, semtypes, definition, alternate codes (under the
    _prop_tag name), XML-escaped content, and EVERY edge including
    those through hierarchy-only parents."""
    from nobletools_spark.sources.fixtures import (
        BUILTIN_CONCEPTS,
        BUILTIN_ISA_EDGES,
    )
    from nobletools_spark.sources.obo import concepts_df_from_records
    from nobletools_spark.sources.owl import parse_owl
    from nobletools_spark.sources.sinks import export_owl, write_owl

    xml = export_owl(BUILTIN_CONCEPTS, BUILTIN_ISA_EDGES)
    concepts, edges = parse_owl(xml)
    by = {c["cui"]: c for c in concepts}
    for o in BUILTIN_CONCEPTS:
        g = by[o["cui"]]
        assert g["name"] == o["name"]
        assert set(g["synonyms"]) >= set(o["synonyms"])
        assert g["semtypes"] == tuple(o["semtypes"])
    assert set(edges) == set(BUILTIN_ISA_EDGES)
    # hierarchy-only parents come back as pretty-named concepts
    assert "C100" in by

    # escaping + definition + alternate-code property naming
    c = [{"cui": "X1", "name": 'a <b> & "c"',
          "synonyms": ('a <b> & "c"', "alt&syn"), "semtypes": ("T1",),
          "sources": ("S",), "definition": "def <&>",
          "codes": (("UMLS_CUI", "C0001"), ("NCI", "N1"),
                    ("URI", "ignored"), ("we!rd", "W"))}]
    got = {g["cui"]: g for g in parse_owl(export_owl(c, [("X1", "P1")]))[0]}
    codes = dict(got["X1"]["codes"])
    assert got["X1"]["name"] == 'a <b> & "c"'
    assert "alt&syn" in got["X1"]["synonyms"]
    assert got["X1"]["definition"] == "def <&>"
    assert codes["UMLS_CUI"] == "C0001"      # already a code property
    assert codes["NCI_ID"] == "N1"           # suffixed to read as one
    assert codes["code"] == "W"              # invalid XML name fallback
    assert ("X1", "P1") in parse_owl(export_owl(c, [("X1", "P1")]))[1]

    # DataFrame input branch + file sink
    df = concepts_df_from_records(spark, BUILTIN_CONCEPTS)
    p = str(tmp_path / "term.owl")
    write_owl(df, p, isa_edges=BUILTIN_ISA_EDGES,
              ontology_name="Builtin Terminology")
    concepts2, edges2 = parse_owl(open(p).read())
    assert {c["cui"] for c in concepts2} >= {o["cui"] for o in
                                             BUILTIN_CONCEPTS}
    assert set(edges2) == set(BUILTIN_ISA_EDGES)


def test_facade_export_terminology(spark, tmp_path):
    """NobleCoderSpark.export_terminology (headless TerminologyExporter
    over the facade): whole-terminology OWL out re-loads to an
    equivalent coder; branch selection prunes; rrf format writes a
    distributed MRCONSO directory."""
    import nobletools_spark.api as api
    from nobletools_spark.sources.fixtures import (
        BUILTIN_CONCEPTS,
        BUILTIN_ISA_EDGES,
    )
    from nobletools_spark.sources.owl import parse_owl

    nc = api.NobleCoderSpark.from_concepts(BUILTIN_CONCEPTS)
    nc.isa_edges = tuple(BUILTIN_ISA_EDGES)

    p = tmp_path / "all.owl"
    nc.export_terminology(str(p))
    concepts, edges = parse_owl(p.read_text())
    assert {c["cui"] for c in concepts} >= {c["cui"] for c in BUILTIN_CONCEPTS}
    assert set(edges) == set(BUILTIN_ISA_EDGES)
    nc2 = api.NobleCoderSpark.from_owl(spark, p.read_text())
    assert nc2.search("spark")[0].cui == nc.search("spark")[0].cui

    # branch selection: depth 1 from an explicit root keeps only it
    root = BUILTIN_ISA_EDGES[0][1]
    p2 = tmp_path / "branch.owl"
    nc.export_terminology(str(p2), roots=[root], depth=1)
    got, ge = parse_owl(p2.read_text())
    assert {c["cui"] for c in got} == {root} and ge == []

    # distributed RRF write
    d = tmp_path / "rrf"
    nc.export_terminology(str(d), format="rrf", spark=spark, sab="TST")
    lines = [ln for f in d.glob("part-*.txt")
             for ln in f.read_text().splitlines()]
    assert {ln.split("|")[0] for ln in lines} == \
        {c["cui"] for c in BUILTIN_CONCEPTS}

    import pytest

    with pytest.raises(ValueError):
        nc.export_terminology(str(tmp_path / "x"), format="bogus")


def test_facade_export_terminology_rrf_roots(spark, tmp_path):
    """Branch export without explicit roots on an RRF terminology starts
    from the stored SRC V-* root table (getRootConcepts — the same
    source terminology_template consults), NOT every parentless CUI: a
    parentless orphan concept stays out, and the SRC root exports with
    its grafted name."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.sources.rrf import (
        conso_row, rel_row, sty_row, write_fixture_rrf)
    from nobletools_spark.sources.termxml import parse_term_xml

    p = str(tmp_path / "rrft")
    write_fixture_rrf(
        p,
        mrconso=[
            conso_row("C900", "Test Source", sab="SRC", code="V-TST"),
            conso_row("C901", "melanoma"),
            conso_row("C904", "orphan finding"),  # parentless, NOT a root
        ],
        mrsty=[sty_row("C901", "T047", "Disease or Syndrome"),
               sty_row("C904", "T047", "Disease or Syndrome")],
        mrrel=[rel_row("C901", "PAR", "C900")])
    nc = NobleCoderSpark.from_rrf(spark, p)
    out = tmp_path / "branch.xml"
    nc.export_terminology(str(out), format="xml", depth=2)
    concepts, edges = parse_term_xml(out.read_text())
    by = {c["cui"]: c for c in concepts}
    assert set(by) == {"C900", "C901"}     # orphan C904 excluded
    assert by["C900"]["name"] == "Test Source"   # grafted root name
    assert ("C901", "C900") in edges

    # rrf-format branch export: grafted roots are full-shape records —
    # concepts_df_from_records indexes synonyms/semtypes/sources
    # strictly and must not KeyError on them
    d = tmp_path / "branch_rrf"
    nc.export_terminology(str(d), format="rrf", depth=2, spark=spark,
                          sab="TST")
    lines = [ln for f in d.glob("part-*.txt")
             for ln in f.read_text().splitlines()]
    assert {ln.split("|")[0] for ln in lines} == {"C900", "C901"}

    # semtype-filtered branch export falls back to parentless-node
    # roots: SRC roots carry no semtypes and would be pruned at the
    # root, silently emptying the export
    x2 = tmp_path / "semtype.xml"
    nc.export_terminology(str(x2), format="xml", semtypes=("T047",))
    got = {c["cui"] for c in parse_term_xml(x2.read_text())[0]}
    assert "C904" in got                   # matching orphan exported


def test_html_report_numeric_doc_ids(spark):
    """html_report_df declares `doc_id string`; numeric corpora (all
    sf* testdata tables use bigint doc_ids) must render, with the
    groupby key cast to string rather than tripping Arrow's int64 →
    string schema check."""
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.sinks import html_report_df

    docs = spark.createDataFrame(
        [(7, [("text", "Melanoma was seen.", None, 0)])],
        "doc_id long, spans array<struct<kind:string, text:string, "
        "media_ref:string, offset:int>>")
    m = annotate(docs, pytest_index(), MatchConfig())
    rows = html_report_df(docs, m).collect()
    assert [r.doc_id for r in rows] == ["7"]
    assert "<label" in rows[0].html


def test_html_report_containment_arbitration_position_order(spark):
    """Which annotation survives a containment conflict follows mention
    POSITION order (the reference walks doc.getMentions() after
    setMentions' offset sort), not cui order: an outer span seen first
    keeps its annotation and the later contained one is dropped — even
    when the contained mention's cui sorts first."""
    import re

    from nobletools_spark.operators.matcher import MENTIONS_DDL
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.sinks import html_report_df

    docs = spark.createDataFrame(
        [("d1", [("text", "abcdefghijklmnop", None, 0)])], SPANS_DDL)
    # outer (0,10) belongs to C0ZZZ (sorts LAST by cui); inner (2,8)
    # to C0AAA (sorts FIRST by cui). Position order must keep the outer.
    m = spark.createDataFrame(
        [("d1", 0, "C0ZZZ", "abcdefghij", "abcdefghij", 1.0, 0, 10,
          [("abcdefghij", 0)], None),
         ("d1", 0, "C0AAA", "cdefgh", "cdefgh", 1.0, 2, 8,
          [("cdefgh", 2)], None)], MENTIONS_DDL)
    html = html_report_df(docs, m).collect()[0].html
    labels = re.findall(r'<label id="(\d+)"', html)
    assert labels == ["0"]               # outer kept, contained dropped
    assert 'id="C0ZZZ"' in html          # legend follows the kept span
    assert 'id="C0AAA"' not in html


def test_export_terminology_keeps_definitions(spark, tmp_path):
    """Load → export round trips must not drop definitions: ConceptMeta
    (the broadcast payload) deliberately omits them, so the facade
    re-attaches its driver-side sidecar (loaders) or the MRDEF table
    (RRF) at export time."""
    from nobletools_spark.sources.owl import parse_owl
    from nobletools_spark.sources.rrf import (
        conso_row, sty_row, rel_row, write_fixture_rrf)
    from nobletools_spark.sources.termxml import parse_term_xml

    obo = (
        "[Term]\nid: TST:001\nname: melanoma\n"
        'def: "A malignant neoplasm of melanocytes." [NCI]\n')
    nc = NobleCoderSpark.from_obo(spark, obo)
    x = tmp_path / "t.xml"
    nc.export_terminology(str(x), format="xml")
    by = {c["cui"]: c for c in parse_term_xml(x.read_text())[0]}
    assert by["TST:001"]["definition"] == \
        "A malignant neoplasm of melanocytes."
    o = tmp_path / "t.owl"
    nc.export_terminology(str(o), format="owl")
    by = {c["cui"]: c for c in parse_owl(o.read_text())[0]}
    assert by["TST:001"]["definition"] == \
        "A malignant neoplasm of melanocytes."

    # RRF load: definitions come from the MRDEF table, lazily, once
    p = str(tmp_path / "rrft")
    write_fixture_rrf(
        p,
        mrconso=[conso_row("C901", "melanoma")],
        mrsty=[sty_row("C901", "T047", "Disease or Syndrome")],
        mrrel=[],
        mrdef=[("C901", "", "", "", "NCI", "A malignant neoplasm.")])
    nc2 = NobleCoderSpark.from_rrf(spark, p)
    x2 = tmp_path / "t2.xml"
    nc2.export_terminology(str(x2), format="xml")
    by = {c["cui"]: c for c in parse_term_xml(x2.read_text())[0]}
    assert by["C901"]["definition"] == "A malignant neoplasm."


def test_html_report_header_sentences_bold(spark):
    """Header sentences render as <b>…</b><br> with no labels inside
    (HTMLExporter.codeSentence :325-328) — recomputed from the same
    docproc kernel the matcher uses, so the bolded ranges are exactly
    the sentences the matcher's default filter skipped."""
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.sinks import html_report_df

    text = ("FINAL DIAGNOSIS:  Malignant melanoma of the skin.\n\n"
            "Melanoma was seen at the deep margin.\n")
    docs = spark.createDataFrame(
        [("d1", [("text", text, None, 0)])], SPANS_DDL)
    m = annotate(docs, pytest_index(), MatchConfig())
    html = html_report_df(docs, m).collect()[0].html
    # the header line is bold (whole Header sentence, escaped)
    assert "<b>FINAL DIAGNOSIS:" in html and "</b><br>" in html
    # no <label> lands inside the bolded header range
    head_end = html.index("</b><br>")
    assert "<label" not in html[html.index("<b>FINAL"):head_end]
    # the prose mention below the header still renders as a label
    assert "<label" in html[head_end:]


def test_canonicalize_kg_predicate_aware(spark):
    """Predicate-aware KG canonicalization: doc subjects keep their
    ids, TUI objects keep theirs, cui-cui edges fold BOTH endpoints,
    co-occurrence pairs re-orient to subj<obj, and post-fold identity
    edges (a pair between two aliases of one concept) drop — so the
    canonicalized snapshot passes its own kg_integrity gate."""
    from nobletools_spark.operators.canonical import canonicalize_kg

    mapping = spark.createDataFrame(
        [("C2", "C1"), ("C1", "C1"), ("C9", "C5")],
        "cui string, canonical_cui string")
    t = spark.createDataFrame(
        [("d1", "mentions-concept", "C2"),     # obj folds, subj kept
         ("C2", "has-semantic-type", "T047"),  # subj folds, obj kept
         ("C1", "co-occurs-with", "C2"),       # aliases → tautology, drops
         ("C3", "co-occurs-with", "C9"),       # C9→C5 < C3 → re-orient
         ("C2", "isa", "C1"),                  # alias isa canonical → drops
         ("C3", "isa", "C9")],                 # obj folds
        "subj string, pred string, obj string")
    got = {tuple(r) for r in canonicalize_kg(t, mapping).collect()}
    assert got == {
        ("d1", "mentions-concept", "C1"),
        ("C1", "has-semantic-type", "T047"),
        ("C3", "co-occurs-with", "C5"),
        ("C3", "isa", "C5"),
    }


def test_export_terminology_orf_keeps_definitions(spark, tmp_path):
    """The ORF round trip must carry definitions into MRDEF — the
    concept records DataFrame now carries the definition column the
    sink's MRDEF leg filters on."""
    obo = ("[Term]\nid: TST:001\nname: melanoma\n"
           'def: "A malignant neoplasm." [NCI]\n')
    nc = NobleCoderSpark.from_obo(spark, obo)
    d = tmp_path / "orf"
    nc.export_terminology(str(d), format="orf", spark=spark, sab="TST")
    lines = [ln for f in (d / "MRDEF").glob("part-*.txt")
             for ln in f.read_text().splitlines()]
    assert any("A malignant neoplasm." in ln for ln in lines)


def test_search_keeps_first_score_and_buckets_ties():
    """search(String,String) :1321-1329: a later same-code mention only
    merges terms/annotations — the FIRST mention's score stands; and
    the ranking comparator buckets scores at 0.001 before the
    code-desc tie-break (:1299-1306)."""
    res = NC.search("Melanoma was seen; then Melanoma was excised.")
    top = res[0]
    assert top.cui == "C013" and len(top.annotations) == 2
    # both occurrences score 1.0 here — the pinned invariant is the
    # merge count plus the bucketed ordering being stable
    scores = [int(1000 * c.score) for c in res]
    assert scores == sorted(scores, reverse=True)
