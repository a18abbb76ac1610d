"""Extraction/template layer goldens (TemplateItem.java:347-451,
ItemInstance.java:397-445, TextTools.java:1036-1129)."""

from nobletools_spark.operators.templates import (
    TEMPLATES_DDL,
    extract_items,
    parse_decimal_value,
)

MENTIONS_DDL = ("doc_id string, cui string, matched_term string, "
                "start int, end int, modifiers map<string,string>")

EDGES = [("C104", "C100"), ("C106", "C100"), ("C105", "C110"),
         ("C100", "C120"), ("C110", "C120")]


def _mentions(spark, rows):
    return spark.createDataFrame(rows, MENTIONS_DDL)


def _templates(spark, rows):
    return spark.createDataFrame(rows, TEMPLATES_DDL)


def _edges(spark):
    return spark.createDataFrame(EDGES, "cui string, parent string")


def test_parse_decimal_value_reference_semantics():
    """TextTools.parseDecimalValue: floats, subtractive roman numerals
    (iv=1+3, ix=1+8), number words, plain ints; NO_VALUE -> None."""
    assert parse_decimal_value("3.5") == 3.5
    assert parse_decimal_value("IV") == 4.0
    assert parse_decimal_value("ix") == 9.0
    assert parse_decimal_value("vii") == 7.0
    assert parse_decimal_value("xiv") == 14.0
    assert parse_decimal_value("three") == 3.0
    assert parse_decimal_value("Twelve") == 12.0
    assert parse_decimal_value("13") == 13.0
    assert parse_decimal_value("melanoma") is None
    assert parse_decimal_value("x5") is None
    assert parse_decimal_value(None) is None
    # Integer.parseInt edge semantics: underscores, surrounding
    # whitespace, and >32-bit magnitudes are NumberFormatException →
    # NO_VALUE in the reference (Python int() accepts all three).
    assert parse_decimal_value("1_000") is None
    assert parse_decimal_value(" 5 ") is None
    assert parse_decimal_value("99999999999") is None
    assert parse_decimal_value("+12") == 12.0
    assert parse_decimal_value("-7") == -7.0
    assert parse_decimal_value("2147483647") == 2147483647.0
    assert parse_decimal_value("2147483648") is None


def test_extract_items_ancestry_gating(spark):
    """TemplateItem.process :396-418: a mention qualifies iff its
    concept IS the item concept or descends from it (hasAncestor
    :316-318 includes equality). C105 (a scan) must not satisfy the
    join_operator item."""
    m = _mentions(spark, [
        ("d1", "C104", "hash join", 0, 9, None),
        ("d1", "C105", "table scan", 10, 20, None),
        ("d2", "C100", "join op", 0, 7, None),
    ])
    t = _templates(spark, [("t1", "join_operator", "C100", None, "boolean")])
    rows = extract_items(m, _edges(spark), t).collect()
    got = {(r.doc_id, r.cui) for r in rows}
    assert got == {("d1", "C104"), ("d2", "C100")}
    assert all(r.item == "join_operator" and r.concept == "C100"
               for r in rows)


def test_extract_items_value_resolution(spark):
    """ItemInstance.process :424-430: DOMAIN_VALUE parses a decimal
    from a STRICT descendant's term; the item concept itself is not a
    value; non-numeric terms keep value_str with NULL value_num."""
    m = _mentions(spark, [
        ("d1", "C104", "iv", 0, 2, None),          # roman -> 4.0
        ("d1", "C106", "2.5", 3, 6, None),         # float
        ("d1", "C105", "seven", 7, 12, None),      # word
        ("d2", "C120", "stage", 0, 5, None),       # == concept: no value
        ("d2", "C104", "melanoma", 6, 14, None),   # NO_VALUE -> str only
    ])
    t = _templates(spark, [("t1", "stage", "C120", None, "value")])
    rows = {(r.doc_id, r.cui): r for r in
            extract_items(m, _edges(spark), t).collect()}
    assert rows[("d1", "C104")].value_num == 4.0
    assert rows[("d1", "C106")].value_num == 2.5
    assert rows[("d1", "C105")].value_num == 7.0
    assert rows[("d2", "C120")].value_str is None
    assert rows[("d2", "C120")].value_num is None
    assert rows[("d2", "C104")].value_str == "melanoma"
    assert rows[("d2", "C104")].value_num is None
    # DOMAIN_VALUE never sets absent (isAttributeValueDomain :500)
    assert not any(r.absent for r in rows.values())


def test_extract_items_per_annotation_values(spark):
    """ItemInstance.process :424-430 parses each ANNOTATION word, not
    the whole term: 'grade 3' resolves to 3.0 (first parseable word);
    with an annotations column only the matched words are parsed (gap
    words never contribute)."""
    m = _mentions(spark, [
        ("d1", "C104", "grade 3", 0, 7, None),     # word fallback
        ("d1", "C106", "grade q of z", 8, 20, None),  # nothing parses
    ])
    t = _templates(spark, [("t1", "stage", "C120", None, "value")])
    rows = {r.cui: r for r in
            extract_items(m, _edges(spark), t).collect()}
    assert rows["C104"].value_num == 3.0
    assert rows["C104"].value_str == "grade 3"
    assert rows["C106"].value_num is None
    # explicit annotations: the matched-word list is authoritative —
    # '3' inside the term is NOT an annotation here, so no value
    ddl = MENTIONS_DDL + ", annotations array<struct<text:string, " \
                         "offset:int>>"
    m2 = spark.createDataFrame(
        [("d1", "C104", "grade 3", 0, 7, None,
          [{"text": "grade", "offset": 0}]),
         ("d1", "C106", "stage iv disease", 8, 24, None,
          [{"text": "stage", "offset": 8}, {"text": "iv", "offset": 14}]),
         ], ddl)
    rows2 = {r.cui: r for r in
             extract_items(m2, _edges(spark), t).collect()}
    assert rows2["C104"].value_num is None
    assert rows2["C106"].value_num == 4.0            # roman via word 2


def test_extract_items_absent_flag(spark):
    """ItemInstance.process :432-435: a ConText-negated mention sets
    absent for boolean items; attribute/value domains never do."""
    neg = {"Polarity": "Negative_Polarity"}
    pos = {"Polarity": "Positive_Polarity"}
    m = _mentions(spark, [
        ("d1", "C104", "hash join", 0, 9, neg),
        ("d2", "C104", "hash join", 0, 9, pos),
        ("d3", "C104", "hash join", 0, 9, None),
    ])
    t = _templates(spark, [
        ("t1", "join_b", "C100", None, "boolean"),
        ("t1", "join_v", "C100", None, "value"),
    ])
    rows = {(r.doc_id, r.item): r.absent for r in
            extract_items(m, _edges(spark), t).collect()}
    assert rows[("d1", "join_b")] is True
    assert rows[("d2", "join_b")] is False
    assert rows[("d3", "join_b")] is False
    assert rows[("d1", "join_v")] is False   # value domain: no absent


def test_extract_items_section_filter(spark):
    """TemplateItem.process :355-391: a section_filter restricts an
    item to mentions inside sections whose title FULL-matches the
    filter regex (Java String.matches); unfiltered items see all
    mentions; with no sections_df a filtered item matches nothing."""
    m = _mentions(spark, [
        ("d1", "C104", "hash join", 5, 14, None),    # in GROSS DESCRIPTION
        ("d1", "C106", "sort merge", 50, 60, None),  # in MARGIN STATUS
        ("d2", "C104", "hash join", 5, 14, None),    # no sections in d2
    ])
    sections = spark.createDataFrame(
        [("d1", "GROSS DESCRIPTION:", 0, 40),
         ("d1", "MARGIN STATUS:", 40, 80)],
        "doc_id string, title string, start int, end int")
    t = _templates(spark, [
        ("t1", "gross_item", "C120", "GROSS.*", "boolean"),
        ("t1", "any_item", "C120", None, "boolean"),
    ])
    rows = extract_items(m, _edges(spark), t, sections_df=sections).collect()
    got = {(r.item, r.doc_id, r.cui) for r in rows}
    assert ("gross_item", "d1", "C104") in got
    assert ("gross_item", "d1", "C106") not in got    # wrong section
    assert ("gross_item", "d2", "C104") not in got    # doc has no sections
    assert {(d, c) for i, d, c in got if i == "any_item"} == \
           {("d1", "C104"), ("d1", "C106"), ("d2", "C104")}
    # full-match semantics: 'GROSS' alone must not match 'GROSS DESC...'
    t2 = _templates(spark, [("t1", "g", "C120", "GROSS", "boolean")])
    assert extract_items(m, _edges(spark), t2,
                         sections_df=sections).count() == 0
    # no sections_df: filtered item contributes nothing
    assert extract_items(m, _edges(spark), t).filter(
        "item = 'gross_item'").count() == 0


TEMPLATE_XML = """\
<Template name="melanoma-synoptic" version="1.0">
  <Description>synoptic melanoma template</Description>
  <Filters><Filter type="section">FINAL DIAGNOSIS:?</Filter></Filters>
  <TemplateItems>
    <TemplateItem name="tumor" type="diagnosis" value.domain="trigger"
                  concept="C100">
      <AttributeValues>
        <Attribute><TemplateItem name="depth" concept="C110"/></Attribute>
        <Values>
          <TemplateItem name="deep" concept="C105"/>
        </Values>
      </AttributeValues>
      <Modifiers><TemplateItem name="grade" concept="C120"/></Modifiers>
      <Units><TemplateItem name="mm" concept="C130"/></Units>
    </TemplateItem>
    <TemplateItem name="site" concept="C110" value.domain="boolean">
      <Filters><Filter type="section">GROSS.*</Filter></Filters>
    </TemplateItem>
    <TemplateItem name="masked" concept="C110">
      <Filters><Filter type="section" invert.match="true">X.*</Filter></Filters>
    </TemplateItem>
  </TemplateItems>
</Template>
"""


def test_templates_from_xml():
    """Reference .template XML (Template.fromElement :228-274 /
    TemplateItem.fromElement): items, value domains, section filters
    (item-level overrides template-level; inverted filters skipped),
    and nested AttributeValues/Modifiers/Units component rows."""
    from nobletools_spark.operators.templates import templates_from_xml

    templates, components = templates_from_xml(TEMPLATE_XML)
    by_item = {t[1]: t for t in templates}
    assert set(by_item) == {"tumor", "site", "masked"}
    assert by_item["tumor"] == ("melanoma-synoptic", "tumor", "C100",
                                "FINAL DIAGNOSIS:?", "trigger")
    assert by_item["site"][3] == "GROSS.*"        # item filter wins
    assert by_item["masked"][3] == "FINAL DIAGNOSIS:?"  # inverted skipped
    assert by_item["site"][4] == "boolean"
    got = {(c[2], c[3], c[4]) for c in components if c[1] == "tumor"}
    assert got == {("attribute", "depth", "C105"),
                   ("modifier", "grade", "C120"),
                   ("unit", "mm", "C130")}


def test_extract_items_component_composition(spark):
    """ItemInstance.process :440-480: attributes / modifiers / units
    resolve against same-sentence ancestry-gated mentions; a
    DOMAIN_TRIGGER item without a firing attribute-value is dropped
    (ItemInstance :408-422)."""
    from nobletools_spark.operators.templates import (
        COMPONENTS_DDL,
        extract_items,
    )

    rows = [
        # sentence 0 of d1: anchor + attribute value + modifier
        ("d1", "C104", "hash join", 0, 9, None, 0),
        ("d1", "C105", "table scan", 10, 20, None, 0),   # attr value (scan)
        ("d1", "C108", "window group", 21, 33, None, 0),  # modifier
        # sentence 5 of d1: anchor alone — trigger unsatisfied
        ("d1", "C104", "hash join", 50, 59, None, 5),
        # d2: anchor + modifier only (no attribute value)
        ("d2", "C106", "sort merge", 0, 10, None, 0),
        ("d2", "C108", "window group", 11, 23, None, 0),
    ]
    m = spark.createDataFrame(
        rows, MENTIONS_DDL + ", sent_offset int")
    t = _templates(spark, [
        ("t1", "join_trigger", "C100", None, "trigger"),
        ("t1", "join_bool", "C100", None, "boolean"),
    ])
    comps = spark.createDataFrame(
        [("t1", "join_trigger", "attribute", "scan_depth", "C110"),
         ("t1", "join_trigger", "modifier", "grouping", "C108"),
         ("t1", "join_bool", "modifier", "grouping", "C108")],
        COMPONENTS_DDL)
    out = extract_items(m, _edges(spark), t, components_df=comps).collect()
    # trigger fires only where the C110-descendant attr value is present
    trig_rows = [r for r in out if r.item == "join_trigger"]
    assert {(r.doc_id, r.start) for r in trig_rows} == {("d1", 0)}
    assert trig_rows[0].attributes == {"scan_depth": "C105"}
    assert trig_rows[0].modifier_cuis == ["C108"]
    # boolean item keeps all anchors; modifiers attach where present
    bools = {(r.doc_id, r.start): r for r in out if r.item == "join_bool"}
    assert set(bools) == {("d1", 0), ("d1", 50), ("d2", 0)}
    assert bools[("d2", 0)].modifier_cuis == ["C108"]
    assert bools[("d1", 50)].modifier_cuis in (None, [])


def test_apply_document_filter_mask_semantics():
    """DocumentFilter.filter (:137-158) exactly: length-preserving,
    MULTILINE, and the reference's keep-matches quirk — the tail after
    the LAST match stays unmasked."""
    from nobletools_spark.functions.docproc import apply_document_filter

    text = "keep1 drop drop keep2 tail stays"
    kept = apply_document_filter(text, r"keep\d")
    assert len(kept) == len(text)
    assert kept == "keep1           keep2 tail stays"  # quirky raw tail
    inv = apply_document_filter(text, r"keep\d", invert=True)
    assert inv == "      drop drop       tail stays"
    assert apply_document_filter(text, None) == text
    # MULTILINE anchors fire mid-string; the gap newline becomes a
    # space (getMask), the tail newline survives via the raw-tail quirk
    two = "head: a\nhead: b\nother"
    assert apply_document_filter(two, r"^head: \w") == \
        "head: a head: b\nother"


def test_mask_documents_interleaved_and_flat(spark):
    """Distributed mask: flat text masked in place; interleaved docs
    mask only text spans (media untouched, offsets/order preserved)."""
    from nobletools_spark.operators.templates import (
        mask_filters_from_xml,
        mask_documents,
    )

    flat = spark.createDataFrame([(1, "secret alpha secret beta")],
                                 "doc_id long, text string")
    out = mask_documents(flat, r"secret", invert=True).collect()[0].text
    assert out == "       alpha        beta"
    docs = spark.createDataFrame(
        [("d1", [("text", "secret alpha", None, 0),
                 ("media", None, "img://1", 12)])],
        "doc_id string, spans array<struct<kind:string, text:string, "
        "media_ref:string, offset:int>>")
    rows = mask_documents(docs, r"secret", invert=True).collect()[0].spans
    assert rows[0].text == "       alpha" and rows[0].offset == 0
    assert rows[1].kind == "media" and rows[1].media_ref == "img://1"
    # template-level mask filters parse from the XML
    xml = ('<Template name="t"><Filters>'
           '<Filter type="mask" invert.match="true">secret</Filter>'
           '<Filter type="section">GROSS.*</Filter></Filters>'
           '<TemplateItems/></Template>')
    assert mask_filters_from_xml(xml) == [("t", "secret", True)]


def test_item_instances_tsv_matrix(spark, tmp_path):
    """InformationExtractor result matrix (CSVExporter.export :62-82):
    one row per doc, one column per item, answers joined in MENTION
    order as 'a ;b ;' (trailing ' ;'); values via TextTools.toString
    (integral %d, else %.2f); finding-typed items render
    present/absent (getAnswer :369-370), other types 'name (code)'."""
    from nobletools_spark.sources.sinks import (
        item_instances_tsv_df,
        write_item_instances_tsv,
    )

    m = _mentions(spark, [
        ("d1", "C104", "hash join", 0, 9, None),
        ("d1", "C106", "iv", 10, 12, None),
        ("d1", "C106", "2.5", 20, 23, None),
        ("d2", "C104", "hash join", 0, 9,
         {"Polarity": "Negative_Polarity"}),
        ("d3", "C104", "hash join", 0, 9, None),
    ])
    t = _templates(spark, [
        ("t1", "join_op", "C100", None, "boolean"),
        ("t1", "stage", "C120", None, "value"),
    ])
    items = extract_items(m, _edges(spark), t)
    types = {"join_op": "finding"}
    out = {r.Document: r for r in
           item_instances_tsv_df(items, item_order=["join_op", "stage"],
                                 item_types=types).collect()}
    # mention order (start asc), finding type -> present/absent
    assert out["d1"].join_op == "present ;present ;present ;"
    assert out["d1"].stage == "hash join ;4 ;2.50 ;"  # %.2f, source order
    assert out["d2"].join_op == "absent ;"
    # untyped items keep the name (code) rendering
    out2 = {r.Document: r for r in
            item_instances_tsv_df(items,
                                  item_order=["join_op", "stage"]).collect()}
    assert out2["d3"].join_op == "hash join (C104) ;"
    # docs_df fixes the row universe: hit-less docs get empty rows
    docs = spark.createDataFrame([("d1",), ("d2",), ("d3",), ("d4",)],
                                 "doc_id string")
    out3 = {r.Document: r for r in
            item_instances_tsv_df(items, item_order=["join_op", "stage"],
                                  item_types=types,
                                  docs_df=docs).collect()}
    assert set(out3) == {"d1", "d2", "d3", "d4"}
    assert out3["d4"].join_op == "" and out3["d4"].stage == ""
    write_item_instances_tsv(items, str(tmp_path / "items_tsv"),
                             item_order=["join_op", "stage"],
                             item_types=types)
    back = spark.read.option("sep", "\t").option("header", True) \
        .csv(str(tmp_path / "items_tsv"))
    assert back.count() == 3
    assert back.columns == ["Document", "join_op", "stage"]


def test_extract_end_to_end_rich_corpus(spark):
    """Full InformationExtractor flow on the structured fixture corpus:
    annotate → sections_from_docs → extract_items. A neoplasm item
    catches melanoma/DCIS mentions through the isa closure; a
    GROSS-DESCRIPTION-scoped item only fires inside that section; some
    'No evidence of melanoma' sentences must yield absent=true."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.operators.context import default_context_index
    from nobletools_spark.operators.templates import sections_from_docs
    from nobletools_spark.sources.fixtures import (
        PYTEST_CONCEPTS,
        PYTEST_ISA_EDGES,
        rich_corpus_df,
    )

    docs = rich_corpus_df(spark, 40, seed=7)
    coder = NobleCoderSpark.from_concepts(
        PYTEST_CONCEPTS, context=default_context_index())
    coder.isa_edges = PYTEST_ISA_EDGES
    sections = sections_from_docs(docs)
    assert sections.filter("title like 'GROSS%'").count() > 0
    templates = _templates(spark, [
        ("t1", "neoplasm", "C014", None, "boolean"),
        ("t1", "gross_neoplasm", "C014", "GROSS DESCRIPTION:", "boolean"),
    ])
    items = coder.extract(docs, templates, sections_df=sections).cache()
    rows = items.collect()
    assert rows
    # ancestry: every emitted cui descends from / equals C014
    assert {r.cui for r in rows} <= {"C013", "C014"}
    # section scoping is a strict subset of the unfiltered item
    allv = {(r.doc_id, r.cui, r.start) for r in rows if r.item == "neoplasm"}
    scoped = {(r.doc_id, r.cui, r.start) for r in rows
              if r.item == "gross_neoplasm"}
    assert scoped and scoped < allv
    # ConText negation propagates to absent on boolean items
    assert any(r.absent for r in rows if r.item == "neoplasm")
    items.unpersist()


def test_extract_items_section_sentence_ranges(spark):
    """TemplateItem.process :362-384: `title[-N]` keeps all but the
    section's last N sentences; a non-negative range adds the WHOLE
    section (the reference TODO quirk); a sections table without
    sent_starts falls back to whole-section scoping."""
    m = _mentions(spark, [
        ("d1", "C104", "hash join", 25, 34, None),   # sentence @20
        ("d1", "C104", "hash join", 55, 64, None),   # sentence @50
        ("d1", "C104", "hash join", 85, 94, None),   # sentence @80 (last)
    ])
    sections = spark.createDataFrame(
        [("d1", "FINDINGS:", 0, 100, [0, 20, 50, 80])],
        "doc_id string, title string, start int, end int, "
        "sent_starts array<int>")

    def starts(flt):
        t = _templates(spark, [("t1", "it", "C120", flt, "boolean")])
        return {r.start for r in
                extract_items(m, _edges(spark), t,
                              sections_df=sections).collect()}

    assert starts("FINDINGS:[-1]") == {25, 55}       # last sentence cut
    assert starts("FINDINGS:[-3]") == set()          # only @0 kept
    assert starts("FINDINGS:[-9]") == set()          # over-cut: empty
    assert starts("FINDINGS:[2]") == {25, 55, 85}    # whole-section TODO
    assert starts("FIND.*[-1]") == {25, 55}          # regex title + range
    assert starts("FINDINGS:") == {25, 55, 85}       # no range unchanged
    # ranges-less sections table: [-1] widens to the whole section
    bare = sections.drop("sent_starts")
    t = _templates(spark, [("t1", "it", "C120", "FINDINGS:[-1]",
                            "boolean")])
    got = extract_items(m, _edges(spark), t, sections_df=bare).count()
    assert got == 3
    # a NULL sent_starts CELL (column present, row built without
    # sentence parsing) also widens to the whole section
    nulled = spark.createDataFrame(
        [("d1", "FINDINGS:", 0, 100, None)],
        "doc_id string, title string, start int, end int, "
        "sent_starts array<int>")
    got2 = extract_items(m, _edges(spark), t, sections_df=nulled).count()
    assert got2 == 3


def test_sections_from_docs_sent_starts(spark):
    """sections_from_docs emits every sentence offset (headers
    included) inside [title_offset, body_end) — the
    Section.getSentences counting base for `title[range]`."""
    from nobletools_spark.operators.templates import sections_from_docs

    text = ("FINDINGS: One sentence here. Another sentence follows.\n"
            "MARGINS: Clear of tumor.")
    docs = spark.createDataFrame([("d1", text)],
                                 "doc_id string, text string")
    secs = {r.title: r for r in sections_from_docs(docs).collect()}
    f = secs["FINDINGS:"]
    assert f.sent_starts and all(f.start <= o < f.end
                                 for o in f.sent_starts)
    assert len(f.sent_starts) >= 2
    m = secs["MARGINS:"]
    assert m.sent_starts and min(m.sent_starts) >= m.start


TERM_OBO = """\
format-version: 1.2

[Term]
id: T:0001
name: melanoma
is_a: T:0002

[Term]
id: T:0002
name: neoplasm
is_a: T:0003

[Term]
id: T:0003
name: disease

[Term]
id: T:0004
name: biopsy
"""


def test_template_from_terminology(spark):
    """TemplateFactory.importTerminologyTemplate parity
    (TemplateFactory.java:127-166): roots become finding/SELF items,
    the BACKGROUND mask filter is attached (the reference constructs it
    but never applies it — applying is our OPT-IN deviation, exercised
    below), descendants satisfy their root's item, and nothing below
    BACKGROUND: survives once the opt-in mask IS applied."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.operators.templates import mask_documents
    from nobletools_spark.sources.fixtures import SPANS_DDL

    nc = NobleCoderSpark.from_obo(spark, TERM_OBO)
    tdf, masks, types = nc.terminology_template(spark, name="onco")
    rows = tdf.collect()
    assert {(r.item, r.concept, r.value_domain) for r in rows} == {
        ("disease", "T:0003", "self"), ("biopsy", "T:0004", "self")}
    assert all(r.template_id == "onco Template"
               and r.section_filter is None for r in rows)
    assert masks == [("onco Template", r"(?s)^BACKGROUND:$.*^$", True)]
    assert types == {"disease": "finding", "biopsy": "finding"}

    text = ("Patient has melanoma. Biopsy performed.\n"
            "BACKGROUND:\nold melanoma noted\n\n"
            "END")
    docs = spark.createDataFrame(
        [("d1", [("text", text, None, 0)])], SPANS_DDL)
    masked = mask_documents(docs, masks[0][1], masks[0][2])
    items = nc.extract(masked, tdf).collect()
    # the BACKGROUND melanoma is blanked away; the leading mentions
    # satisfy their ROOT items via the isa closure (melanoma -> disease)
    got = {(r.item, r.cui) for r in items}
    assert got == {("disease", "T:0001"), ("biopsy", "T:0004")}
    assert all(r.value_str is None for r in items)  # SELF: answer = cui


def test_template_from_terminology_rrf_roots(spark, tmp_path):
    """For an RRF terminology the reference's getRootConcepts() is the
    stored SRC V-* root table, NOT every parentless CUI
    (TemplateFactory.java:137): a parentless non-root concept must not
    become a template item."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.sources.rrf import (
        conso_row, rel_row, sty_row, write_fixture_rrf)

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
    tdf, masks, types = nc.terminology_template(spark, name="rrf")
    rows = tdf.collect()
    assert {(r.item, r.concept) for r in rows} == {("Test Source", "C900")}
    assert types == {"Test Source": "finding"}


def test_template_from_terminology_ghost_root():
    """A hierarchy-only edge parent (no concept record) still roots the
    template; its item name falls back to the cui."""
    from nobletools_spark.operators.templates import (
        template_from_terminology,
    )

    rows, masks, types = template_from_terminology(
        [{"cui": "A", "name": "alpha"}], [("A", "GHOST")], "t")
    assert rows == [("t Template", "GHOST", "GHOST", None, "self")]
    assert types == {"GHOST": "finding"}
