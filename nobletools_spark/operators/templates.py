"""Minimal extraction/template layer: structured information extraction
over the mention stream (reference: extract/model/Template.java,
TemplateItem.java:347-451, ItemInstance.java:397-445).

A *template* is a set of items; each item names a terminology concept,
an optional section filter, and a value domain. ``extract_items`` emits
one ItemInstance row per (mention × matching item):

- **ancestry gating** (TemplateItem.process :396-418): a mention
  qualifies when its concept IS the item concept or descends from it in
  the isa closure (`PathHelper.hasAncestor` :316-318 includes
  equality). The closure is terminology-sized → broadcast; the corpus
  side never shuffles.
- **section filtering** (TemplateItem.process :355-391): items with a
  ``section_filter`` only see mentions inside sections whose title
  full-matches the filter regex (Java ``String.matches``). Sentence
  ranges (``title[range]``, :362-368) are honored when the sections
  table carries ``sent_starts`` (``sections_from_docs`` emits it):
  ``title[-N]`` keeps all but the section's last N sentences, a
  non-negative range adds the WHOLE section (the reference's TODO
  quirk, :380-384). A ranges-less sections table falls back to
  whole-section scoping. Without a ``sections_df``, filtered items
  match nothing — same as the reference when no section matches.
- **value resolution** (ItemInstance.process :424-430): for
  ``value_domain='value'`` a STRICT descendant mention is the value:
  ``value_num`` = TextTools.parseDecimalValue (float, roman numerals,
  number words, int — :1036-1129) over each annotation word in turn
  (the matcher's matched-word list, or a whitespace split when the
  mention table has no ``annotations`` column), first parseable word
  wins — NULL when the reference would return NO_VALUE for every
  word; ``value_str`` keeps the whole term. (The reference collects
  EVERY parseable word's value; this layer keeps the first — the
  kernel keeps the full list.)
- **absent flag** (ItemInstance.process :432-435 + :500): for
  non-attribute/value domains a negated mention (ConText
  Polarity=Negative_Polarity) sets ``absent`` instead of dropping.

Attribute/modifier/unit/value components compose via ``components_df``
(see ``extract_items``); only the Feature second pass
(TemplateItem.process :421-449) stays out of this declarative layer's
scope — ``operators/extract_kernel`` implements it faithfully (Java
parity leg at P=R=1.0).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F, types as T

from nobletools_spark.operators.triples import PATH_DEPTH_LIMIT, ancestors

TEMPLATES_DDL = ("template_id string, item string, concept string, "
                 "section_filter string, value_domain string")

# component rows attached to an item (TemplateItem attributeValues /
# modifiers / units / values, TemplateItem.java:55-61): comp_type ∈
# {'attribute','modifier','unit','value'}; comp_name is the attribute
# item's name for attribute-values, else the component item's name.
COMPONENTS_DDL = ("template_id string, item string, comp_type string, "
                  "comp_name string, concept string")

DOMAIN_SELF = "self"          # TemplateItem.java:46-50
DOMAIN_ATTRIBUTE = "attribute"
DOMAIN_VALUE = "value"
DOMAIN_BOOLEAN = "boolean"
DOMAIN_TRIGGER = "trigger"

def parse_decimal_value(text: str | None) -> float | None:
    """TextTools.parseDecimalValue (:1036-1129) with NO_VALUE → None:
    ``\\d+.\\d+`` floats, roman numerals (subtractive: iv=4, ix=9),
    number words zero..twelve, plain integers."""
    if text is None:
        return None
    if re.fullmatch(r"\d+\.\d+", text):
        return float(text)
    if re.fullmatch(r"[IiVvXx]+", text):
        value, one_less = 0, False
        for ch in text.lower():
            if ch == "i":
                value, one_less = value + 1, True
            elif ch == "v":
                value, one_less = value + (3 if one_less else 5), False
            elif ch == "x":
                value, one_less = value + (8 if one_less else 10), False
        return float(value)
    if re.fullmatch(r"[a-zA-Z]+", text):
        words = ("zero", "one", "two", "three", "four", "five", "six",
                 "seven", "eight", "nine", "ten", "eleven", "twelve")
        low = text.lower()
        return float(words.index(low)) if low in words else None
    # Integer.parseInt semantics: ASCII digits only (no underscores or
    # surrounding whitespace, which Python int() accepts) and 32-bit range
    # (Java throws NumberFormatException → NO_VALUE on overflow).
    if re.fullmatch(r"[+-]?\d+", text, flags=re.ASCII):
        value = int(text)
        if -(2 ** 31) <= value <= 2 ** 31 - 1:
            return float(value)
    return None


def _parse_words_value_udf():
    """Per-annotation value parsing (ItemInstance.process :424-430):
    the reference parses EACH annotation word and collects every
    parseable value; this declarative projection keeps the first
    parseable word's value (the kernel keeps the full list). 'grade 3'
    resolves to 3.0 where a whole-term parse would be NO_VALUE."""
    def batch(words):
        def first_val(ws):
            if ws is None:
                return None
            for w in ws:
                d = parse_decimal_value(w)
                if d is not None:
                    return d
            return None

        return words.map(first_val).astype("float64")

    return F.pandas_udf(batch, T.DoubleType())


def templates_from_xml(xml_text: str) -> tuple[list[tuple], list[tuple]]:
    """Parse the reference's ``.template`` XML format
    (Template.fromElement :228-274, TemplateItem.fromElement
    :480-543, DocumentFilter.fromElement :111-119) into
    (template_rows, component_rows) for
    ``spark.createDataFrame(rows, TEMPLATES_DDL / COMPONENTS_DDL)``.

    Concepts stay as their code strings (the reference resolves them
    against its bundled terminology; a DataFrame pipeline joins on the
    code). Item-level section Filters become ``section_filter``
    (first non-inverted section filter; Template-level filters apply
    to items without their own). Nested Modifiers / Units / Values /
    AttributeValues items become component rows; Feature sub-items are
    parsed as components of type 'feature' (the feature second pass of
    TemplateItem.process :420-447 is not replayed)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    t_elems = [root] if root.tag == "Template" else root.findall(".//Template")
    templates: list[tuple] = []
    components: list[tuple] = []

    def section_filter(elem) -> str | None:
        flt = elem.find("Filters")
        if flt is None:
            return None
        for f in flt.findall("Filter"):
            ftype = f.get("type") or "section"
            inv = (f.get("invert.match") or "false").lower() == "true"
            if ftype == "section" and not inv and (f.text or "").strip():
                return f.text.strip()
        return None

    for t in t_elems:
        tid = t.get("name") or "template"
        t_filter = section_filter(t)
        items = t.find("TemplateItems")
        for it in (items.findall("TemplateItem")
                   if items is not None else []):
            item = it.get("name") or it.get("concept")
            templates.append((
                tid, item, it.get("concept"),
                section_filter(it) or t_filter,
                it.get("value.domain") or DOMAIN_BOOLEAN))

            def comp(sub, ctype, cname=None):
                components.append((tid, item, ctype,
                                   cname or sub.get("name")
                                   or sub.get("concept"),
                                   sub.get("concept")))

            for tag, ctype in (("Modifiers", "modifier"),
                               ("Values", "value"), ("Units", "unit")):
                grp = it.find(tag)
                if grp is not None:
                    for sub in grp.findall("TemplateItem"):
                        comp(sub, ctype)
            feat = it.find("Feature/TemplateItem")
            if feat is not None:
                comp(feat, "feature")
            for av in it.findall("AttributeValues"):
                attr = av.find("Attribute/TemplateItem")
                aname = (attr.get("name") or attr.get("concept")
                         if attr is not None else None)
                vals = av.find("Values")
                if vals is not None:
                    for sub in vals.findall("TemplateItem"):
                        comp(sub, "attribute", aname)
    return templates, components


def template_from_terminology(concepts, isa_edges, name: str,
                              roots=None) -> tuple[
        list[tuple], list[tuple[str, str, bool]], dict[str, str]]:
    """TemplateFactory.importTerminologyTemplate parity
    (extract/model/TemplateFactory.java:127-166): build a template from
    an existing terminology where every ROOT concept becomes one
    ``type=finding`` item with value domain SELF (:160-163 — the
    answer is whichever descendant concept was found), plus the
    constructor's always-attached BACKGROUND mask filter
    ``DocumentFilter("(?s)^BACKGROUND:$.*^$", invert=True)`` (:134),
    which blanks the BACKGROUND section so nothing below it yields an
    ItemInstance.

    ``concepts`` / ``isa_edges`` accept the loaders' driver-side shapes
    or DataFrames (terminology-sized; same contract as
    ``sinks.select_branch``). The reference enumerates
    ``terminology.getRootConcepts()`` (:137) — the terminology's OWN
    stored root table — so pass ``roots`` when the loader produced one
    (RRF: the SRC ``V-*`` atoms, NOT every parentless CUI). When
    ``roots`` is None (OBO/OWL/XML loads, whose stored roots ARE the
    no-Broader concepts) they derive via ``sinks.default_roots``
    ("nobody's child", ghost edge-parents included — a ghost root still
    owns its subtree); a ghost root's item name falls back to its cui.

    Returns ``(template_rows, mask_filters, item_types)``:
    ``template_rows`` in TEMPLATES_DDL shape (concept codes are cuis —
    ``extract_items`` expands them through the isa closure, so any
    descendant mention satisfies its root's item), ``mask_filters`` in
    ``mask_filters_from_xml`` shape, ``item_types`` the item→type map
    the result sink consumes.

    NOTE on the mask: the reference CONSTRUCTS this filter but never
    APPLIES it — every ``doc.getFilters().addAll(...)`` call in
    InformationExtractor.java (:607,:627,:669) and
    ``TemplateDocument.getFilteredDocument()`` itself are commented out
    (measured by the termtemplate parity leg, which passes with no mask
    on either side). ``mask_filters`` is returned for model fidelity
    (XML round-trips, a future re-enable); running ``mask_documents``
    with it is an OPT-IN deviation from the reference's actual
    behavior, not a parity requirement."""
    from nobletools_spark.sources.sinks import _concept_records, default_roots

    tid = f"{name} Template"
    recs = _concept_records(concepts)
    by = {c["cui"]: c for c in recs}
    root_list = (sorted(roots) if roots is not None
                 else default_roots(recs, isa_edges))
    rows: list[tuple] = []
    for root in root_list:
        iname = (by.get(root) or {}).get("name") or root
        rows.append((tid, iname, root, None, DOMAIN_SELF))
    masks = [(tid, r"(?s)^BACKGROUND:$.*^$", True)]
    types = {r[1]: "finding" for r in rows}
    return rows, masks, types


def item_types_from_xml(xml_text: str) -> dict[str, str]:
    """item name → ``type`` attribute (TemplateItem.java:37-44:
    diagnosis/finding/organ/attribute/...) from the .template XML —
    the result sink renders finding/diagnosis items as present/absent
    (ItemInstance.getAnswer :369-370) and needs this mapping."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    t_elems = [root] if root.tag == "Template" else root.findall(".//Template")
    out: dict[str, str] = {}
    for t in t_elems:
        items = t.find("TemplateItems")
        for it in (items.findall("TemplateItem")
                   if items is not None else []):
            name = it.get("name") or it.get("concept")
            if it.get("type"):
                out[name] = it.get("type")
    return out


def mask_filters_from_xml(xml_text: str) -> list[tuple[str, str, bool]]:
    """Template-level ``type="mask"`` DocumentFilters from the
    .template XML: [(template_id, pattern, invert_match)] — applied to
    the whole document text BEFORE processing (DocumentFilter
    :137-158), unlike section filters which scope items."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    t_elems = [root] if root.tag == "Template" else root.findall(".//Template")
    out: list[tuple[str, str, bool]] = []
    for t in t_elems:
        flt = t.find("Filters")
        if flt is None:
            continue
        for f in flt.findall("Filter"):
            if (f.get("type") or "section") == "mask" and (f.text or "").strip():
                inv = (f.get("invert.match") or "false").lower() == "true"
                out.append((t.get("name") or "template",
                            f.text.strip(), inv))
    return out


def mask_documents(docs_df: DataFrame, pattern: str,
                   invert: bool = False,
                   text_col: str = "text") -> DataFrame:
    """Distributed DocumentFilter mask (length-preserving, so every
    downstream offset stays valid): flat tables mask ``text_col``;
    interleaved tables mask each text span's payload and leave media
    spans untouched. mapInPandas — map-only, zero shuffle."""
    from nobletools_spark.functions.docproc import apply_document_filter
    from nobletools_spark.operators.matcher import _span_fields

    interleaved = "spans" in docs_df.columns and text_col not in docs_df.columns

    def run(batches):
        for pdf in batches:
            if interleaved:
                def mask_spans(spans):
                    out = []
                    for s in spans:
                        kind, text, ref, off = _span_fields(s)
                        if kind == "text" and text is not None:
                            text = apply_document_filter(text, pattern,
                                                         invert)
                        out.append({"kind": kind, "text": text,
                                    "media_ref": ref, "offset": off})
                    return out

                pdf["spans"] = pdf["spans"].map(mask_spans)
            else:
                pdf[text_col] = pdf[text_col].map(
                    lambda t: apply_document_filter(t, pattern, invert)
                    if t is not None else None)
            yield pdf

    return docs_df.mapInPandas(run, docs_df.schema)


SECTIONS_DDL = ("doc_id string, title string, start int, end int, "
                "sent_starts array<int>")


def sections_from_docs(docs_df: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Distributed sectioning: (doc_id, title, start, end, sent_starts)
    spans via docproc.process_document_text (DocumentProcessor.section
    :344-377) inside mapInPandas — map-only, mirrors the matcher's
    zero-shuffle shape. ``sent_starts`` carries the offsets of EVERY
    sentence (including filtered headers) inside the section — the
    Section.getSentences equivalent that ``title[range]`` filters count
    against. Accepts either a flat text column or the interleaved
    (doc_id, spans) layout (text spans concatenated at their offsets)."""
    import pandas as pd

    from nobletools_spark.functions.docproc import process_document_text
    from nobletools_spark.operators.matcher import _span_fields

    interleaved = "spans" in docs_df.columns and text_col not in docs_df.columns

    def emit(doc_id, text, off, out):
        parsed = process_document_text(text, off)
        sent_offs = [o for _t, o, _ty in parsed.sentences]
        for sec in parsed.sections:
            end = sec.body_offset + len(sec.body)
            out.append((doc_id, sec.title, sec.title_offset, end,
                        [o for o in sent_offs
                         if sec.title_offset <= o < end]))

    def run(batches):
        for pdf in batches:
            out = []
            if interleaved:
                for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                    for s in spans:
                        kind, text, _ref, off = _span_fields(s)
                        if kind != "text" or not text:
                            continue
                        emit(doc_id, text, off, out)
            else:
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                    emit(doc_id, text or "", 0, out)
            yield pd.DataFrame(out, columns=["doc_id", "title",
                                             "start", "end",
                                             "sent_starts"])

    cols = (["doc_id", "spans"] if interleaved else ["doc_id", text_col])
    return docs_df.select(*cols).mapInPandas(run, SECTIONS_DDL)


def extract_items(mentions_df: DataFrame, edges_df: DataFrame,
                  templates_df: DataFrame,
                  sections_df: DataFrame | None = None,
                  components_df: DataFrame | None = None,
                  max_depth: int = PATH_DEPTH_LIMIT) -> DataFrame:
    """Mentions ⋈ isa-closure ⋈ templates → ItemInstance rows:
    (doc_id, template_id, item, concept, cui, matched_term, start, end,
    value_str, value_num, absent).

    Scale shape: templates and the isa closure are terminology-sized →
    both broadcast; sections are per-doc metadata joined on doc_id.
    The only corpus-sized input streams through map-side joins — no
    corpus shuffle, linear at 10^12 documents.
    """
    cols = mentions_df.columns
    m = mentions_df
    if "modifiers" in cols:
        negated = (F.coalesce(F.col("modifiers").getItem("Polarity"),
                              F.lit("")) == "Negative_Polarity")
    else:
        negated = F.lit(False)
    m = m.withColumn("_negated", negated)
    if "matched_term" not in cols:
        m = m.withColumn("matched_term", F.lit(None).cast("string"))
    for c in ("start", "end"):
        if c not in cols:
            m = m.withColumn(c, F.lit(None).cast("int"))
    if components_df is not None:
        # the component pass reads the mention stream a second time
        # (m2 below); persist so an expensive lineage (a live matcher
        # plan rather than a materialized stage table) executes once —
        # AQE does not guarantee exchange reuse across the two legs
        m = m.persist()

    # ancestry gate (hasAncestor :316-318 = equals || ancestor-closure
    # containment), pre-expanded on the TERMINOLOGY side: each template
    # item explodes to its qualifying cuis (itself + strict
    # descendants), so the corpus-sized mention stream is touched by a
    # single broadcast join — one matcher pass, no union of two
    # lineages (which would compute the mapInPandas matcher twice)
    t = templates_df
    # (cui, ancestor) is already unique from ancestors() — both its
    # strategies group/construct on exactly that key — so no distinct
    closure = ancestors(edges_df, max_depth).select("cui", "ancestor")
    # templates are the smallest side by far: broadcast them so this
    # terminology-sized join never plans as a sort-merge with
    # full-width exchanges
    expand = (F.broadcast(t).join(closure,
                                  t["concept"] == closure["ancestor"])
              .drop("ancestor")
              .unionByName(t.withColumn("cui", F.col("concept"))))
    gated = m.join(F.broadcast(expand), "cui")

    # section scope (TemplateItem.process :355-391): Java String.matches
    # is a FULL match — anchor the stored filter. A `[range]` suffix is
    # split off the title first (:362-368, TemplateItem's
    # `(.*)\[([\d\-]+)\]` parse): `title[-N]` keeps all but the
    # section's last N sentences — a mention qualifies when its start
    # precedes the first dropped sentence's offset — while a
    # non-negative range adds the WHOLE section (the reference TODO,
    # :380-384). Needs the sections table's `sent_starts`; without that
    # column, ranges fall back to whole-section scoping.
    if sections_df is not None:
        # the reference's range parse accepts ANY [\d\-]+ suffix
        # (TemplateItem.java:361-368): the title is ALWAYS split off;
        # only a plain-negative range ('-N') parses as an int and trims
        # sentences — a non-negative or multi-part range ('1-2') keeps
        # the whole section (the reference TODO / its parse crash,
        # which template_spec_from_xml rejects at the driver)
        rng_re = r"^(.*)\[([\d\-]+)\]$"
        filt = gated.filter(F.col("section_filter").isNotNull())
        has_rng = F.col("section_filter").rlike(rng_re)
        rng_str = F.regexp_extract("section_filter", rng_re, 2)
        filt = (filt
                .withColumn("_title", F.when(
                    has_rng,
                    F.regexp_extract("section_filter", rng_re, 1))
                    .otherwise(F.col("section_filter")))
                .withColumn("_rng", F.when(
                    has_rng & rng_str.rlike(r"^-\d+$"),
                    rng_str.cast("int"))))
        scols = [F.col("doc_id").alias("s_doc"),
                 F.col("title").alias("s_title"),
                 F.col("start").alias("s_start"),
                 F.col("end").alias("s_end")]
        ranged = "sent_starts" in sections_df.columns
        if ranged:
            scols.append(F.col("sent_starts").alias("s_sents"))
        s = sections_df.select(*scols)
        cond = ((F.col("doc_id") == F.col("s_doc"))
                & (F.col("start") >= F.col("s_start"))
                & (F.col("start") < F.col("s_end"))
                & F.expr("s_title rlike concat('^(?:', _title, ')$')"))
        if ranged:
            # a NULL sent_starts cell (rows built without sentence
            # parsing) falls back to whole-section scoping, same as a
            # table without the column
            cond = cond & F.expr(
                "_rng IS NULL OR _rng >= 0 OR s_sents IS NULL OR "
                "(size(s_sents) + _rng >= 1 AND "
                " start < element_at(s_sents, size(s_sents) + _rng + 1))")
        in_section = (filt.join(s, cond)
                      .drop("s_doc", "s_title", "s_start", "s_end",
                            "_title", "_rng",
                            *(["s_sents"] if ranged else [])))
        gated = (gated.filter(F.col("section_filter").isNull())
                 .unionByName(in_section))
    else:
        gated = gated.filter(F.col("section_filter").isNull())

    is_value = ((F.col("value_domain") == DOMAIN_VALUE)
                & (F.col("cui") != F.col("concept")))
    # absent is only ever set in ItemInstance.process's FINAL else
    # branch (:433 inside the else at :431): the trigger branch (:408)
    # and the strict-descendant value branch (:424) return before the
    # negation check, and isAttributeValueDomain covers the rest
    no_absent_domain = F.col("value_domain").isin(DOMAIN_ATTRIBUTE,
                                                  DOMAIN_VALUE,
                                                  DOMAIN_TRIGGER)
    parse_words = _parse_words_value_udf()
    # the matcher's annotations are the MATCHED words (gap words
    # excluded) — the exact list the reference iterates; mention
    # tables without it fall back to whitespace-split matched terms
    if "annotations" in cols:
        val_words = F.expr("transform(annotations, a -> a.text)")
    else:
        val_words = F.split(F.coalesce(F.col("matched_term"),
                                       F.lit("")), " ")
    skey = ["doc_id"] + (["sent_offset"] if "sent_offset" in cols else [])
    out = gated.select(
        *skey, "template_id", "item", "concept", "cui", "matched_term",
        "start", "end", "value_domain", "_negated",
        F.when(is_value, F.col("matched_term")).alias("value_str"),
        F.when(is_value, parse_words(val_words)).alias("value_num"))

    # component composition (ItemInstance.process :440-480 +
    # getMatchingInstances): attributes / modifiers / units / value
    # alternatives resolve against SAME-SENTENCE mentions, ancestry-
    # gated per component concept. All instances of an item in a
    # sentence share the same component resolution (the reference
    # re-runs findConcept over the same mention list), so matches
    # aggregate per (sentence, item) and join back — one broadcast
    # join + one sentence-keyed aggregation, no corpus self-join.
    # Instead of the reference's annotation-subsumption dedup, the
    # best mention per component is the longest matched term
    # (earliest start, smallest cui on ties) — deterministic argmax.
    if components_df is not None:
        m2 = m.select(*skey, F.col("cui").alias("c_cui"),
                      F.col("matched_term").alias("c_term"),
                      F.col("start").alias("c_start"))
        cmp_ = components_df.filter(F.col("comp_type") != "feature")
        # same terminology-side pre-expansion as the item gate: one
        # broadcast join against the mention stream, no dual lineage
        closure2 = closure.withColumnRenamed("cui", "c_cui")
        cexpand = (F.broadcast(cmp_)
                   .join(closure2,
                         cmp_["concept"] == closure2["ancestor"])
                   .drop("ancestor")
                   .unionByName(cmp_.withColumn("c_cui",
                                                F.col("concept"))))
        hits = m2.join(F.broadcast(cexpand), "c_cui")
        w = Window.partitionBy(*skey, "template_id", "item",
                               "comp_type", "comp_name") \
                  .orderBy(F.length("c_term").desc(), F.col("c_start"),
                           F.col("c_cui"))
        best = (hits.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1))
        attr_entry = F.when(F.col("comp_type") == "attribute",
                            F.struct(F.col("comp_name").alias("key"),
                                     F.col("c_cui").alias("value")))
        agg = best.groupBy(*skey, "template_id", "item").agg(
            F.map_from_entries(F.array_sort(
                F.collect_list(attr_entry))).alias("attributes"),
            F.array_sort(F.collect_set(
                F.when(F.col("comp_type") == "modifier", F.col("c_cui"))
            )).alias("modifier_cuis"),
            F.min(F.when(F.col("comp_type") == "unit",
                         F.col("c_cui"))).alias("unit"),
            F.min(F.when(F.col("comp_type") == "value",
                         F.col("c_cui"))).alias("value_concept"))
        out = out.join(agg, skey + ["template_id", "item"], "left")
        # DOMAIN_TRIGGER satisfaction (ItemInstance :408-422): the item
        # only holds when some attribute-value fires in the sentence
        out = out.filter(
            # null-safe: a NULL value_domain row must behave like the
            # no-components path (plain != yields NULL and drops it)
            (~F.col("value_domain").eqNullSafe(DOMAIN_TRIGGER))
            | (F.size(F.coalesce(
                F.map_entries(F.col("attributes")),
                F.array().cast("array<struct<key:string,value:string>>")
            )) > 0))
        extra = ["attributes", "modifier_cuis", "unit", "value_concept"]
    else:
        extra = []
    return out.select(
        "doc_id", "template_id", "item", "concept", "cui", "matched_term",
        "start", "end", "value_str", "value_num",
        F.when(no_absent_domain, F.lit(False))
         .otherwise(F.col("_negated")).alias("absent"), *extra)
