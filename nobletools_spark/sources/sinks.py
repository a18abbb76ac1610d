"""Output sinks — RESULTS.tsv mention export (util/CSVExporter.java:
92-147) and RRF terminology export (util/ConceptExporter.java:66-238),
as distributed DataFrame writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nobletools_spark.session import local_table

# Mention.getModifierTypes order = ConText.MODIFIER_TYPES
# (tools/ConText.java:76-84): sorted modifier type list
MODIFIER_COLUMNS = ("Certainty", "ContextualAspect", "ContextualModality",
                    "Degree", "Experiencer", "Permanence", "Polarity",
                    "Temporality")


def results_tsv_df(mentions_df: DataFrame,
                   concepts_df: DataFrame | None = None) -> DataFrame:
    """Shape the mentions table into RESULTS.tsv rows: `Document |
    Matched Term | Code | Concept Name | Semantic Type | Annotations |
    <8 modifier columns>` (CSVExporter.java:108,144). Annotations render
    as "text/offset, text/offset". "Matched Term" is the mention's
    SURFACE text — the space-joined annotation words (Mention.getText
    :48-56), not the terminology term: a stemmed match on "tables"
    must report "tables"."""
    anns = F.concat_ws(", ", F.transform(
        "annotations",
        lambda a: F.concat(a["text"], F.lit("/"), a["offset"].cast("string"))))
    surface = F.when(
        F.size("annotations") > 0,
        F.concat_ws(" ", F.transform("annotations", lambda a: a["text"]))
    ).otherwise(F.col("matched_term"))
    # acronym-propagated mentions (score-0.0 quirk) carry a FRESH
    # concept named after the acronym (AcronymDetector:180) — their
    # Concept Name column is the acronym, not the canonical name
    acro = (F.col("score").eqNullSafe(0.0)
            & F.col("matched_term").isNotNull()
            if "score" in mentions_df.columns else F.lit(False))
    df = mentions_df.select(
        F.col("doc_id").alias("Document"),
        surface.alias("Matched Term"),
        F.col("cui").alias("Code"),
        anns.alias("Annotations"),
        "modifiers",
        acro.alias("_acro"),
        F.col("matched_term").alias("_mt"),
    )
    if concepts_df is not None:
        names = concepts_df.select(
            F.col("cui").alias("Code"),
            F.col("name").alias("Concept Name"),
            F.concat_ws(", ", "semtypes").alias("Semantic Type"))
        df = (df.join(F.broadcast(names), "Code", "left")
              # CUIs absent from concepts_df fall back to the code,
              # matching the no-concepts_df branch
              .withColumn("Concept Name",
                          F.coalesce("Concept Name", F.col("Code")))
              .withColumn("Semantic Type",
                          F.coalesce("Semantic Type", F.lit(""))))
    else:
        df = df.withColumn("Concept Name", F.col("Code")) \
               .withColumn("Semantic Type", F.lit(""))
    df = df.withColumn("Concept Name",
                       F.when(F.col("_acro"), F.col("_mt"))
                       .otherwise(F.col("Concept Name")))
    cols = ["Document", "Matched Term", "Code", "Concept Name",
            "Semantic Type", "Annotations"]
    for mt in MODIFIER_COLUMNS:
        df = df.withColumn(mt, F.coalesce(F.col("modifiers")[mt], F.lit("")))
    return df.select(*cols, *MODIFIER_COLUMNS)


def write_results_tsv(mentions_df: DataFrame, path: str,
                      concepts_df: DataFrame | None = None) -> None:
    (results_tsv_df(mentions_df, concepts_df)
     .write.mode("overwrite")
     .option("sep", "\t").option("header", True).csv(path))


def item_instances_tsv_df(items_df: DataFrame,
                          names_df: DataFrame | None = None,
                          item_order: list[str] | None = None,
                          item_types: dict[str, str] | None = None,
                          docs_df: DataFrame | None = None) -> DataFrame:
    """Shape extract_items output into the InformationExtractor result
    matrix (util/CSVExporter.export(TemplateDocument) :62-82): one row
    per document, one column per template-item question, each cell the
    instance answers in MENTION order joined as "a ;b ;" (every answer
    appended with " ;", trailing space trimmed — the reference's exact
    cell shape). With a ``docs_df`` the row universe is every document
    (the reference writes a row per processed doc, hits or not).

    Answer rendering (ItemInstance.getAnswer :313-371):
    - resolved values as TextTools.toString (:1149-1156): integral →
      "%d", else "%.2f" — with " <unit>" appended when extract_items
      resolved a unit component (:317-319);
    - finding/diagnosis-typed items (``item_types``, from the XML type
      attribute — see templates.item_types_from_xml) as
      'present'/'absent' (:369-370);
    - everything else as "name (code)" (name = preferred name via
      ``names_df(cui, name)``, else the mention surface)."""
    num = F.col("value_num")
    num_str = F.when(num == F.floor(num),
                     num.cast("long").cast("string")) \
               .otherwise(F.format_string("%.2f", num))
    base = items_df
    if names_df is not None:
        names = names_df.select(F.col("cui"), F.col("name").alias("_nm"))
        base = base.join(F.broadcast(names), "cui", "left")
    else:
        base = base.withColumn("_nm", F.lit(None).cast("string"))
    if "unit" in base.columns:
        unit_nm = F.col("unit")
        if names_df is not None:
            unames = names_df.select(F.col("cui").alias("unit"),
                                     F.col("name").alias("_unm"))
            base = base.join(F.broadcast(unames), "unit", "left")
            unit_nm = F.coalesce(F.col("_unm"), F.col("unit"))
        num_str = F.when(F.col("unit").isNotNull(),
                         F.concat(num_str, F.lit(" "), unit_nm)) \
                   .otherwise(num_str)
    finding = tuple(i for i, t in (item_types or {}).items()
                    if t in ("finding", "diagnosis"))
    answer = (F.when(num.isNotNull(), num_str)
              .when(F.col("value_str").isNotNull(), F.col("value_str"))
              .when(F.col("item").isin(*finding) if finding else F.lit(False),
                    F.when(F.col("absent"), F.lit("absent"))
                     .otherwise(F.lit("present")))
              .otherwise(F.concat(
                  F.coalesce(F.col("_nm"), F.col("matched_term"),
                             F.col("cui")),
                  F.lit(" ("), F.col("cui"), F.lit(")"))))
    # instance order = mention order (the reference appends instances
    # as encountered in the document): sort by (start, answer)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.coalesce(F.col("start"), F.lit(0)).alias("s"),
            F.col("_ans").alias("a")))),
        lambda e: e["a"])
    cells = (base.withColumn("_ans", answer)
             .groupBy("doc_id", "item")
             .agg(F.concat(F.concat_ws(" ;", ordered),
                           F.lit(" ;")).alias("cell")))
    items = item_order or sorted(
        r.item for r in items_df.select("item").distinct().collect())
    out = cells.groupBy("doc_id").pivot("item", items).agg(
        F.first("cell"))
    if docs_df is not None:
        universe = docs_df.select("doc_id").distinct()
        out = universe.join(out, "doc_id", "left")
    return out.select(F.col("doc_id").alias("Document"),
                      *[F.coalesce(out[i], F.lit("")).alias(i)
                        for i in items])


def write_item_instances_tsv(items_df: DataFrame, path: str,
                             names_df: DataFrame | None = None,
                             item_order: list[str] | None = None,
                             item_types: dict[str, str] | None = None,
                             docs_df: DataFrame | None = None) -> None:
    (item_instances_tsv_df(items_df, names_df, item_order, item_types,
                           docs_df)
     .write.mode("overwrite")
     .option("sep", "\t").option("header", True).csv(path))


# util/HTMLExporter.java:476-485 — the hover-highlight / jump / resize
# script every report page carries (h = highlight yellow, u = unhighlight,
# j = jump to anchor, l = pane sizing)
_HTML_SCRIPT = (
    '<script type="text/javascript">'
    'function h(id){for(i=0;i<id.length;i++){'
    'document.getElementById(id[i]).style.backgroundColor="yellow";}}'
    'function u(id){for(i=0;i<id.length;i++){'
    'document.getElementById(id[i]).style.backgroundColor="white";}}'
    'function j(id){for(i=0;i<id.length;i++){'
    'location.href="#";location.href="#"+id[i];}}'
    "</script>")

# Mention.isNegated/:237-238, isHedged/:241-242 → the N / U prefix on
# codeLabel's per-mention code ids (HTMLExporter.java:222)
_NEGATED = "Negative_Polarity"
_HEDGED = "Hedged_ContextualModality"
# tooltip modifier order — HTMLExporter.getModifiers:247-256
_TIP_MODIFIERS = ("Certainty", "Polarity", "Experiencer", "Temporality")


def html_report_df(docs_df: DataFrame, mentions_df: DataFrame,
                   concepts_df: DataFrame | None = None) -> DataFrame:
    """Per-document annotated HTML report with the reference's
    span-highlight structure (util/HTMLExporter.java export(Document)
    :424-519, codeSentence :318-345, codeLabel :215-236, codeMentions
    :355-380, codeConcept :266-284) — (doc_id, html).

    Fidelity reproduced: word-level annotation spans become
    ``<label id="{doc_offset}">`` elements colored green (default
    modifiers) or #994d00 (any non-default modifier), with
    mouseover-highlight of the owning concepts' legend entries and a
    tooltip carrying "name (code) [semtypes]" plus the 4-modifier
    block; a "Concepts" legend lists each concept once (sorted by name
    then code, alternating blue/black) with mouseover/jump wiring to
    its annotation ids and a tooltip of code, semtypes, definition and
    terms; newlines render as <br>; the page is the reference's
    two-pane (report | concepts) table with the found-items footer.
    Header sentences render bold with no labels (codeSentence
    :325-328), recomputed from the same docproc kernel the matcher
    uses. Deviations (documented): the legend anchors at the first
    annotation id instead of the reference's terminology-servlet URL
    (offline engine), the report text is HTML-escaped (the reference
    emits it raw — broken markup on documents containing ``<``), and
    the legend lists only RENDERED annotation ids (the reference lists
    every annotation offset, so a dead id aborts its JS highlight
    loop). Annotations that CONTAIN or are
    contained by an already-kept annotation are skipped
    (groupAnnotations/intersects :292-315), and the left-to-right walk
    drops any survivor starting before the cursor — the reference
    reaches the same outcome through its StringIndexOutOfBounds catch
    (:337-341).

    Distributed shape: concept metadata broadcast-joins onto mentions;
    ONE shuffle groups everything by doc_id; HTML assembly is
    applyInPandas (Arrow batches, per-doc string building — inherently
    imperative offset math, the sanctioned pandas-UDF case)."""
    import bisect

    import pandas as pd
    from html import escape

    # NULL text renders as nothing (filter explicitly); NULL offset
    # coalesces to 0 — left as NULLs, the pandas groupby below would
    # DROP those spans silently (groupby dropna default)
    # doc_id normalized to string on BOTH sides: the join must stay an
    # exact string match (a string=bigint join would coerce lossily)
    # and the applyInPandas schema declares doc_id string
    docs_df = docs_df.withColumn("doc_id", F.col("doc_id").cast("string"))
    mentions_df = mentions_df.withColumn(
        "doc_id", F.col("doc_id").cast("string"))
    spans = (docs_df
             .select("doc_id", F.explode("spans").alias("s"))
             .filter((F.col("s.kind") == "text")
                     & F.col("s.text").isNotNull())
             .select("doc_id", F.col("s.text").alias("text"),
                     F.coalesce(F.col("s.offset"), F.lit(0))
                     .alias("offset")))

    m = mentions_df
    if "annotations" not in m.columns:
        # minimal inputs (doc_id,cui,start,end): the whole mention span
        # is its one annotation. Annotation text is used ONLY for its
        # length (the render slices the document text for the label),
        # so synthesize a filler of exactly end-start chars rather than
        # trusting matched_term (absent on bare tables; stemmed terms
        # are a different length than the surface span)
        m = m.withColumn("annotations", F.array(F.struct(
            F.repeat(F.lit("x"),
                     F.greatest(F.lit(0),
                                (F.col("end") - F.col("start"))
                                .cast("int"))).alias("text"),
            F.col("start").cast("int").alias("offset"))))
    if "modifiers" not in m.columns:
        m = m.withColumn("modifiers",
                         F.lit(None).cast("map<string,string>"))
    if concepts_df is not None:
        meta = concepts_df.select(
            "cui", F.col("name").alias("c_name"),
            F.concat_ws(", ", "semtypes").alias("c_sty"),
            (F.col("definition") if "definition" in concepts_df.columns
             else F.lit(None).cast("string")).alias("c_def"),
            F.concat_ws("; ", "synonyms").alias("c_syn"))
        m = m.join(F.broadcast(meta), "cui", "left")
    else:
        m = (m.withColumn("c_name", F.lit(None).cast("string"))
             .withColumn("c_sty", F.lit(None).cast("string"))
             .withColumn("c_def", F.lit(None).cast("string"))
             .withColumn("c_syn", F.lit(None).cast("string")))
    # matched_term + score feed the acronym legend rule (below); both
    # are optional so bare (doc_id,cui,start,end) tables still render
    for opt, typ in (("matched_term", "string"), ("score", "double")):
        if opt not in m.columns:
            m = m.withColumn(opt, F.lit(None).cast(typ))
    anns = m.select("doc_id", "cui", "start", "end", "annotations",
                    "modifiers", "c_name", "c_sty", "c_def", "c_syn",
                    "matched_term", "score")
    joined = spans.join(anns, "doc_id", "left")

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        from nobletools_spark.operators.context import DEFAULT_VALUES

        out = []
        for doc_id, g in pdf.groupby("doc_id"):  # scalar key: stable across pandas 1.x/2.x
            # one logical mention list per doc (rows repeat per text span)
            mentions = {}
            for r in g.itertuples():
                if pd.notna(r.start) and r.cui is not None:
                    key = (r.cui, int(r.start), int(r.end))
                    if key not in mentions:
                        mentions[key] = r
            # annotation → owning mentions (groupAnnotations :292-306,
            # containment-skip via intersects :308-315). Kept spans are
            # an antichain under containment (insertion rejects any
            # containment pair), so sorted by start their ends strictly
            # increase — exact hits are a dict probe and containment
            # needs only the two bisect neighbors: the predecessor has
            # the max end among starts <= s, the successor the min end
            # among starts >= s. O(A log A) vs the naive full rescan.
            ann_owners: dict[tuple, list] = {}
            kept: list[tuple] = []      # (start, end, span_key), sorted
            exact: dict[tuple, tuple] = {}
            # mention POSITION order — the reference walks
            # doc.getMentions() after setMentions' offset sort, and
            # which annotation survives a containment conflict depends
            # on who is seen first (keys are (cui, start, end))
            for key in sorted(mentions, key=lambda k: (k[1], k[2], k[0])):
                r = mentions[key]
                # Arrow hands array<struct> back as a numpy array —
                # `or []` trips its ambiguous truth value
                for a in (r.annotations if r.annotations is not None
                          else []):
                    if a is None or a["offset"] is None:
                        continue
                    st = int(a["offset"])
                    en = st + len(a["text"] or "")
                    span = (st, en, a["text"] or "")
                    hit = exact.get((st, en))
                    if hit is not None:
                        ann_owners[hit].append(r)
                        continue
                    i = bisect.bisect_right(kept, (st, float("inf")))
                    if i > 0 and kept[i - 1][1] >= en:
                        continue        # predecessor contains span
                    j = bisect.bisect_left(kept, (st,))
                    if j < len(kept) and kept[j][1] <= en:
                        continue        # span contains successor
                    ann_owners[span] = [r]
                    exact[(st, en)] = span
                    kept.insert(i, (st, en, span))

            def code_id(r) -> str:
                mods = dict(r.modifiers or {})
                p = ("N" if mods.get("Polarity") == _NEGATED else
                     "U" if mods.get("ContextualModality") == _HEDGED
                     else "")
                return p + r.cui

            def is_default(r) -> bool:
                mods = dict(r.modifiers or {})
                return all(DEFAULT_VALUES.get(k) == v
                           for k, v in mods.items())

            # ---- report pane: per text span, labels left-to-right ----
            parts = []
            rendered: set[tuple] = set()  # span keys that got a <label>
            for (text, offset), gg in g.groupby(["text", "offset"]):
                # kept is start-sorted with strictly increasing ends,
                # so the spans inside [offset, offset+len(text)] are
                # one contiguous run
                off = int(offset)
                local = []
                for st0, en0, k in kept[bisect.bisect_left(kept, (off,)):]:
                    if en0 - off > len(text):
                        break
                    local.append((st0 - off, en0 - off, k))
                # Header sentences render as <b>…</b><br> with no label
                # walk (codeSentence :325-328) — recomputed here from
                # the SAME docproc kernel the matcher uses, so the
                # bolded ranges agree with the sentences the matcher's
                # default filter skipped. Any label landing inside one
                # (a custom process_filter coded headers) is dropped,
                # as the reference's header branch would.
                from nobletools_spark.functions.docproc import (
                    process_document_text)
                from nobletools_spark.functions.textkit import SENT_HEADER
                heads = [(o - off, o - off + len(t))
                         for t, o, ty in
                         process_document_text(text, off).sentences
                         if ty == SENT_HEADER]
                local = [l for l in local
                         if not any(h0 <= l[0] < h1 for h0, h1 in heads)]
                events = sorted(
                    [(h0, h1, None) for h0, h1 in heads] + local,
                    key=lambda e: (e[0], e[1]))
                html, pos = [], 0
                for st, en, key in events:
                    if st < pos:
                        continue  # walk-order skip (see docstring)
                    if key is None:      # Header sentence
                        html.append(escape(text[pos:st])
                                    .replace("\n", "<br>"))
                        html.append("<b>" + escape(text[st:en])
                                    .replace("\n", "<br>") + "</b><br>")
                        pos = en
                        continue
                    owners = ann_owners[key]
                    codes = ",".join(f"'{code_id(r)}'" for r in owners)
                    tip, color = [], "green"
                    for r in owners:
                        nm = r.c_name or r.cui
                        tip.append(f"{nm} ({r.cui}) [{r.c_sty or ''}]")
                        mods = dict(r.modifiers or {})
                        tip.extend(f"\t{t} :\t{mods.get(t, '')}"
                                   for t in _TIP_MODIFIERS)
                        if not is_default(r):
                            color = "#994d00"
                    html.append(escape(text[pos:st]).replace("\n", "<br>"))
                    html.append(
                        f'<label id="{key[0]}" class="mention" '
                        f'style="color:{color};" '
                        f'onmouseover="h([{codes}]);" '
                        f'onmouseout="u([{codes}]);" '
                        f'title="{escape(chr(10).join(tip))}">'
                        f"{escape(text[st:en])}</label>")
                    rendered.add(key)
                    pos = en
                html.append(escape(text[pos:]).replace("\n", "<br>"))
                parts.append((int(offset), "".join(html)))
            report = "\n<br/>\n".join(h for _, h in sorted(parts))

            # ---- concepts pane (codeMentions :355-380) ----
            by_concept: dict[tuple, list] = {}
            rep: dict[tuple, object] = {}
            for key, owners in sorted(ann_owners.items()):
                if key not in rendered:
                    # a kept span skipped by the walk-order rule has no
                    # <label> anchor — a legend h()/j() pointing at it
                    # would hit getElementById(...)==null and abort the
                    # highlight for every subsequent id
                    continue
                for r in owners:
                    # acronym-propagated mentions carry a FRESH concept
                    # named after the acronym (AcronymDetector:180 `new
                    # Concept(code, acronym)`) — their score-0.0 quirk
                    # marks them, so they legend under the acronym text,
                    # a separate row from the canonical concept
                    if (r.score is not None and not pd.isna(r.score)
                            and float(r.score) == 0.0 and r.matched_term):
                        ck = (str(r.matched_term), r.cui)
                    else:
                        ck = (r.c_name or r.cui, r.cui)
                    by_concept.setdefault(ck, []).append(key)
                    rep.setdefault(ck, r)
            legend, alt = [], True
            for ck in sorted(by_concept):  # name then code (:356-361)
                nm, cui = ck
                r = rep[ck]
                keys = list(dict.fromkeys(by_concept[ck]))
                ids = ",".join(f"'{k[0]}'" for k in keys)
                color = "blue" if alt else "black"
                alt = not alt
                tip = (f"{cui} [{r.c_sty or ''}]\n{r.c_def or ''}\n"
                       f"terms:  {r.c_syn or ''}")
                first = keys[0][0]
                # legend id is the PLAIN code — codeConcept:267 leaves
                # its prefix empty, so negated labels' h('N'+code) find
                # no legend anchor; quirk reproduced as-is
                legend.append(
                    f'<a style="color:{color};" id="{cui}" '
                    f'href="#{first}" '
                    f'onmouseover="h([{ids}]);'
                    f"t=setTimeout(function(){{j([{ids}]);}},2000);\" "
                    f'onmouseout="u([{ids}]); clearTimeout(t);" '
                    f'title="{escape(tip)}">{escape(nm)}</a> &nbsp; ')
            concepts_html = (
                "<p><b>Concepts</b><br>" + "".join(legend) + "</p>"
                if legend else "")
            n_found = len(mentions)

            page = (
                '<html xmlns="http://www.w3.org/1999/xhtml">'
                f'<head><meta charset="utf-8"/>'
                f"<title>Report Processor Output</title>"
                f"{_HTML_SCRIPT}</head>"
                '<body><table width="100%" style="table-layout:fixed;"'
                ' cellspacing="5">'
                f'<tr><td colspan=2 align=center><h3>{escape(str(doc_id))}'
                "</h3></td></tr>"
                f'<tr><td width="50%" valign=middle><div id="d1" '
                f'style="overflow: auto;">{report}</div></td>'
                f'<td width="50%" valign=top><div id="d2" '
                f'style="overflow: auto;">{concepts_html}</div></td></tr>'
                f"<tr><td colspan=2 align=center>found items: "
                f"<b>{n_found}</b></td></tr>"
                "</table></body></html>")
            # groupby key keeps the input dtype (int64 for numeric
            # doc_ids) — the declared schema says string
            out.append((str(doc_id), page))
        return pd.DataFrame(out, columns=["doc_id", "html"])

    return joined.groupBy("doc_id").applyInPandas(
        render, "doc_id string, html string")


def write_html_report(docs_df: DataFrame, mentions_df: DataFrame,
                      path: str, concepts_df: DataFrame | None = None,
                      max_docs: int = 100) -> None:
    """Materialize per-document ``reports/<doc_id>.html`` files plus the
    reference's ``index.html`` frame page (HTMLExporter.getIndex
    :389-407, flush :412-420) for human review. One HTML FILE per
    document cannot be the scale path (the DataFrame from
    ``html_report_df`` is); this writes a BOUNDED sample — the first
    ``max_docs`` doc_ids — and the driver-side collect is bounded by
    the same cap."""
    import os
    import re
    from html import escape

    sample = docs_df.orderBy("doc_id").limit(int(max_docs))
    rows = (html_report_df(sample, mentions_df, concepts_df)
            .orderBy("doc_id").collect())  # bounded by max_docs
    os.makedirs(os.path.join(path, "reports"), exist_ok=True)
    links = []
    used: set[str] = set()
    for r in rows:
        name = str(r.doc_id)
        # doc_ids are arbitrary strings: strip path separators and
        # anything else unsafe for a filename, dedupe collisions
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", name).lstrip(".") or "doc"
        if safe in used:
            i = 2
            while f"{safe}~{i}" in used:
                i += 1
            safe = f"{safe}~{i}"
        used.add(safe)
        with open(os.path.join(path, "reports", f"{safe}.html"), "w",
                  encoding="utf-8") as fh:
            fh.write(r.html)
        links.append(
            '<span style="font-size: 90%; display:block;">'
            f'<a href="reports/{safe}.html" target="frame">'
            f"{escape(name)}</a></span>")
    with open(os.path.join(path, "index.html"), "w",
              encoding="utf-8") as fh:
        fh.write(
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            '<head><meta charset="utf-8"/>'
            "<title>Noble Coder</title></head>"
            '<body bgcolor="#EEEEFF"><center><h3>Noble Coder Output</h3>'
            "</center><table width=\"100%\" height=\"95%\" border=0>"
            '<tr><td align="left" valign="top" width="200px">'
            f'<div id="d1" style="overflow: auto;">{"".join(links)}</div>'
            '</td><td valign=top><iframe frameborder="0" scrolling="auto"'
            ' name="frame" width="100%" height="100%"></iframe>'
            "</td></tr></table></body></html>")


def _name_and_synonyms() -> "F.Column":
    """Row universe for terminology exports: every synonym PLUS the
    preferred name (first, deduped) — a concept whose name is not among
    its synonyms (e.g. SQL-sourced tables; OBO folds it in) must still
    emit its TS=P/ISPREF=Y row, and an empty-synonym concept must not
    vanish from the export."""
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.concat(
        F.when(F.col("name").isNotNull(),
               F.array("name")).otherwise(empty),
        F.coalesce(F.col("synonyms"), empty)))


def export_rrf(concepts_df: DataFrame, path: str, lat: str = "ENG",
               sab: str = "NOBLE") -> None:
    """Write concepts back to MRCONSO.RRF shape (ConceptExporter.toRRF
    :66-238): one pipe-delimited row per synonym; the preferred name row
    carries TS=P/ISPREF=Y."""
    rows = (concepts_df
            .select("cui", "name",
                    F.explode(_name_and_synonyms()).alias("str"))
            .select(
                "cui", F.lit(lat).alias("lat"),
                F.when(F.col("str") == F.col("name"), "P").otherwise("S")
                 .alias("ts"),
                F.lit("").alias("lui"), F.lit("").alias("stt"),
                F.lit("").alias("sui"),
                F.when(F.col("str") == F.col("name"), "Y").otherwise("N")
                 .alias("ispref"),
                F.lit("").alias("aui"), F.lit("").alias("saui"),
                F.lit("").alias("scui"), F.lit("").alias("sdui"),
                F.lit(sab).alias("sab"),
                F.when(F.col("str") == F.col("name"), "PT").otherwise("SY")
                 .alias("tty"),
                F.col("cui").alias("code"), F.col("str").alias("str_"),
                F.lit("").alias("srl"), F.lit("").alias("suppress"),
                F.lit("").alias("cvf")))
    (rows.select(F.concat_ws("|", *rows.columns).alias("line"))
     .write.mode("overwrite").text(path))


def export_orf(concepts_df: DataFrame, path: str, lat: str = "ENG",
               sab: str = "NOBLE") -> None:
    """ORF (Original Release Format) export variant
    (ConceptExporter.exportORF :66-238): MRCON + MRSO + MRSTY +
    CUI2CODE under ``path``, pipe-delimited with trailing pipe.

    ID maps (getCUI/getLUI/getSUI :405-430) are first-seen counters in
    the reference; the distributed equivalent assigns dense ranks over a
    deterministic sort (same referential integrity — equal string ⇒
    equal SUI, equal normalized string ⇒ equal LUI — with stable rather
    than visit-order ids). The terminology is index-sized, so the
    global-order windows here are driver-scale by design, exactly like
    the reference's in-memory maps."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from nobletools_spark.functions.textkit import normalize

    def _norm_batch(s):  # functional form: stringized hints break inference
        return s.map(lambda x: normalize(x) if x is not None else None)

    norm_udf = F.pandas_udf(_norm_batch, T.StringType())

    base = (concepts_df
            .select("cui", "name",
                    F.explode(_name_and_synonyms()).alias("str"))
            .withColumn("ts", F.when(F.col("str") == F.col("name"), "P")
                        .otherwise("S"))
            .withColumn("nrm", norm_udf("str")))
    # CUI passthrough when already [A-Z]\d{7}, else a deterministic
    # assigned C%07d that SKIPS ids present in the passthrough set (a
    # real C0000000 in the data must not collide with an assigned one).
    # The id tables are terminology-sized — driver-side by design.
    # ids come from concepts_df, NOT post-explode `base`: a concept
    # with a NULL name and no synonyms has no MRCON rows but must
    # still map consistently in MRSTY/MRDEF/CUI2CODE (the reference's
    # getCUI assigns for every concept it touches)
    spark = concepts_df.sparkSession
    all_cuis = [r["cui"]
                for r in concepts_df.select("cui").distinct().collect()]
    taken = {c for c in all_cuis
             if len(c) == 8 and c[0].isalpha() and c[0].isupper()
             and c[1:].isdigit()}
    need = sorted(c for c in all_cuis if c not in taken)
    assigned, nxt = [], 0
    for c in need:
        while f"C{nxt:07d}" in taken:
            nxt += 1
        assigned.append((c, nxt))
        nxt += 1
    cui_ids = local_table(spark, assigned, "cui string, cui_id long")
    lw = Window.orderBy("nrm")
    lui_ids = (base.select("nrm").distinct()
               .withColumn("lui_id", F.dense_rank().over(lw) - 1))
    sw = Window.orderBy("str")
    sui_ids = (base.select("str").distinct()
               .withColumn("sui_id", F.dense_rank().over(sw) - 1))
    rows = (base
            .join(F.broadcast(cui_ids), "cui", "left")
            .join(F.broadcast(lui_ids), "nrm")
            .join(F.broadcast(sui_ids), "str")
            .withColumn("ocui", F.when(
                F.col("cui_id").isNotNull(),
                F.format_string("C%07d", "cui_id")).otherwise(F.col("cui")))
            .withColumn("lui", F.format_string("L%07d", "lui_id"))
            .withColumn("sui", F.format_string("S%07d", "sui_id"))
            .withColumn("stt", F.when(F.col("ts") == "P", "PF")
                        .otherwise("VO")))
    mrcon = rows.select(
        "ocui", F.lit(lat).alias("lat"), "ts", "lui", "stt", "sui", "str",
        F.lit("0").alias("lrl"), F.lit("").alias("end"))
    (mrcon.select(F.concat_ws("|", *mrcon.columns).alias("line"))
     .write.mode("overwrite").text(f"{path}/MRCON"))
    mrso = rows.select(
        "ocui", "lui", "sui", F.lit(sab).alias("sab"),
        F.when(F.col("ts") == "P", "PT").otherwise("NP").alias("tty"),
        F.col("cui").alias("scode"), F.lit("0").alias("lrl"),
        F.lit("").alias("end"))
    (mrso.select(F.concat_ws("|", *mrso.columns).alias("line"))
     .write.mode("overwrite").text(f"{path}/MRSO"))
    if "semtypes" in concepts_df.columns:
        # TUI passthrough when already T\d{3}, else dense-rank T%03d
        # (getTUI :432-442)
        st = concepts_df.select("cui", F.explode("semtypes").alias("sty"))
        all_stys = [r["sty"] for r in st.select("sty").distinct().collect()]
        ttaken = {s for s in all_stys
                  if len(s) == 4 and s[0] == "T" and s[1:].isdigit()}
        tneed = sorted(s for s in all_stys if s not in ttaken)
        tassigned, tn = [], 0
        for s in tneed:
            while f"T{tn:03d}" in ttaken:
                tn += 1
            tassigned.append((s, tn))
            tn += 1
        tui_ids = local_table(spark, tassigned, "sty string, tui_id long")
        sty = (st.join(F.broadcast(cui_ids), "cui", "left")
               .join(F.broadcast(tui_ids), "sty", "left")
               .select(F.when(F.col("cui_id").isNotNull(),
                              F.format_string("C%07d", "cui_id"))
                       .otherwise(F.col("cui")).alias("ocui"),
                       F.when(F.col("tui_id").isNotNull(),
                              F.format_string("T%03d", "tui_id"))
                       .otherwise(F.col("sty")).alias("tui"),
                       F.col("sty"), F.lit("").alias("end")))
        (sty.select(F.concat_ws("|", *sty.columns).alias("line"))
         .write.mode("overwrite").text(f"{path}/MRSTY"))
    # from concepts_df (not `rows`): every concept maps, even one with
    # no MRCON rows (NULL name, no synonyms)
    cui2code = (concepts_df.select("cui").distinct()
                .join(F.broadcast(cui_ids), "cui", "left")
                .select(F.when(F.col("cui_id").isNotNull(),
                               F.format_string("C%07d", "cui_id"))
                        .otherwise(F.col("cui")).alias("ocui"),
                        F.col("cui"))
                .select(F.concat_ws("=", "ocui", "cui").alias("line")))
    cui2code.write.mode("overwrite").text(f"{path}/CUI2CODE")
    # MRDEF (exportORF :115-124: cui|sab|definition| — definition's
    # source falls back to the concept's first source)
    # try_element_at: ANSI mode (Spark 4 default) makes plain
    # element_at THROW on an empty sources array
    first_src = (F.try_element_at(F.col("sources"), F.lit(1))
                 if "sources" in concepts_df.columns else F.lit(sab))
    mrdef_src = concepts_df
    if "definition" not in mrdef_src.columns:
        mrdef_src = mrdef_src.withColumn("definition",
                                         F.lit(None).cast("string"))
    mrdef = (mrdef_src.filter(F.col("definition").isNotNull())
             .join(F.broadcast(cui_ids), "cui", "left")
             .select(F.when(F.col("cui_id").isNotNull(),
                            F.format_string("C%07d", "cui_id"))
                     .otherwise(F.col("cui")).alias("ocui"),
                     F.coalesce(first_src, F.lit(sab)).alias("dsab"),
                     F.col("definition"), F.lit("").alias("end")))
    (mrdef.select(F.concat_ws("|", *mrdef.columns).alias("line"))
     .write.mode("overwrite").text(f"{path}/MRDEF"))
    # MRSAB (exportORF :165-211: 23 mostly-empty fields per distinct
    # source — vcui|rcui|vsab|rsab|son|sf|...|srl=0|...|ENG|UTF-8|Y|Y|)
    if "sources" in concepts_df.columns:
        sabs = (concepts_df.select(F.explode("sources").alias("s"))
                .distinct())
    else:
        sabs = local_table(spark, [(sab,)], "s string")
    mrsab = sabs.select(
        F.lit("").alias("vcui"), F.col("s").alias("rcui"),
        F.lit("").alias("vsab"), F.col("s").alias("rsab"),
        F.lit("").alias("son"), F.col("s").alias("sf"),
        *[F.lit("").alias(c) for c in
          ("sver", "vstart", "vend", "imeta", "rmeta", "slc", "scc")],
        F.lit("0").alias("srl"),
        *[F.lit("").alias(c) for c in ("tfr", "cfr", "cxty", "ttyl", "atnl")],
        F.lit("ENG").alias("lat"), F.lit("UTF-8").alias("cenc"),
        F.lit("Y").alias("curver"), F.lit("Y").alias("sabin"),
        F.lit("").alias("end"))
    (mrsab.select(F.concat_ws("|", *mrsab.columns).alias("line"))
     .write.mode("overwrite").text(f"{path}/MRSAB"))


# ---------------------------------------------------------------------------
# OWL (RDF/XML) terminology export — the reference builds OWL ontologies
# from seed terminologies (util/OntologyCreator.java:105-338 over the
# OWL-API; ontology/OntologyUtils URI conventions). One XML document per
# terminology by nature, so the build is driver-side over the
# terminology-sized concept set (the same bound as every loader in
# sources/) and round-trips through sources/owl.py:parse_owl.
# ---------------------------------------------------------------------------

_XML_NAME_RE = None  # built lazily in _prop_tag


def _prop_tag(sab: str) -> str:
    """Alternate-code property tag for a source, chosen so the emitted
    property PROVABLY round-trips through parse_owl's dispatch
    (owl.tag_is_code — the code arm must win net of the synonym/
    semtype/definition arms tried before it): the sab itself when it
    already classifies as a code (UMLS_CUI, NCI_code, ...), else
    `{sab}_ID` when THAT classifies (CodeSystem → CodeSystem_ID), else
    the generic `code` — also used when the sab isn't a valid XML name
    (e.g. `Name_Code` ends in code but the synonym arm claims it first,
    so it falls through to `code`)."""
    global _XML_NAME_RE
    import re as _re

    from nobletools_spark.sources.owl import tag_is_code

    if _XML_NAME_RE is None:
        _XML_NAME_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*$")
    if not sab or not _XML_NAME_RE.match(sab):
        return "code"
    if tag_is_code(sab):
        return sab
    if tag_is_code(f"{sab}_ID"):
        return f"{sab}_ID"
    return "code"


def _concept_records(concepts) -> list[dict]:
    """Loaders' concept dicts, or a ``concepts_df_from_records``-schema
    DataFrame collected to them (terminologies are dimension-sized, the
    package-wide driver-parse bound)."""
    if hasattr(concepts, "collect"):
        return [{
            "cui": r.cui, "name": r.name,
            "synonyms": tuple(r.synonyms or ()),
            "semtypes": tuple(r.semtypes or ()),
            "sources": tuple(r.sources or ())
            if "sources" in r.__fields__ else (),
            "definition": getattr(r, "definition", None),
            "codes": tuple((c["sab"], c["code"]) for c in (r.codes or ()))
            if "codes" in r.__fields__ else (),
        } for r in concepts.collect()]
    return list(concepts)


def _edge_pairs(isa_edges) -> list[tuple[str, str]]:
    if hasattr(isa_edges, "collect"):
        return [(r[0], r[1]) for r in isa_edges.collect()]
    return [tuple(e) for e in isa_edges]


def default_roots(concepts, isa_edges) -> list[str]:
    """Root concepts for branch export when the caller names none: every
    node that is nobody's child — INCLUDING hierarchy-only edge parents
    with no concept record (a ghost root still owns its subtree; leaving
    it out would silently drop every concept beneath it)."""
    cuis = {c["cui"] for c in _concept_records(concepts)}
    edges = _edge_pairs(isa_edges)
    child_set = {ch for ch, _ in edges}
    return sorted((cuis | {par for _, par in edges}) - child_set)


def select_branch(concepts, isa_edges, roots,
                  semtypes=(), depth: int | None = None):
    """Branch selection for terminology export — the reference's
    TerminologyExporter workflow (ui/TerminologyExporter.java:743-845):
    depth-first from the chosen root concepts over isa children, with

    - a semantic-type filter that prunes the WHOLE subtree under a
      non-matching node (isFilteredOut :969-979 + the early return at
      :815 — children of a filtered node are never visited even if they
      would match),
    - an optional recursion depth (:716-718; ``None`` = unbounded, the
      reference's ``Integer.MAX_VALUE``; ``depth=1`` keeps roots only),
    - revisit semantics for diamonds/cycles (:822-826): an
      already-exported node gains the extra parent edge (unless that
      edge would duplicate or directly invert an already-kept link) and
      its subtree is not re-walked.

    ``concepts``/``isa_edges`` accept the loaders' driver-side shapes or
    DataFrames (collected here — terminology-sized). Returns
    ``(kept_concepts, kept_edges)`` in deterministic DFS preorder
    (children sorted by cui); ``kept_edges`` are the traversed
    ``(child, parent)`` links, so ``export_owl(*select_branch(...))``
    emits exactly the selected hierarchy. A root or child that has isa
    edges but no concept record is kept as a bare ``{"cui", "name"}``
    node when no semantic-type filter is active (the filter cannot be
    proven for it otherwise).
    """
    by = {c["cui"]: c for c in _concept_records(concepts)}
    children: dict[str, list[str]] = {}
    for ch, par in _edge_pairs(isa_edges):
        children.setdefault(par, []).append(ch)
    for v in children.values():
        v.sort()
    stset = set(semtypes)

    def _keeps(cui: str) -> bool:
        if not stset:
            return True
        c = by.get(cui)
        return c is not None and bool(stset & set(c.get("semtypes") or ()))

    kept: dict[str, dict] = {}
    kept_edges: list[tuple[str, str]] = []
    edge_set: set[tuple[str, str]] = set()
    # explicit stack: UMLS-deep hierarchies must not hit the Python
    # recursion limit. Entries are (cui, parent, remaining_depth).
    stack: list[tuple[str, str | None, int | None]] = [
        (r, None, depth) for r in reversed(list(roots))]
    while stack:
        cui, parent, d = stack.pop()
        if (d is not None and d <= 0) or not _keeps(cui):
            continue
        if cui in kept:
            if (parent is not None and parent != cui
                    and (cui, parent) not in edge_set
                    and (parent, cui) not in edge_set):
                edge_set.add((cui, parent))
                kept_edges.append((cui, parent))
            continue
        # bare hierarchy-only record in the full loader shape so every
        # downstream sink (incl. concepts_df_from_records) accepts it
        kept[cui] = by.get(cui) or {"cui": cui, "name": cui,
                                    "synonyms": (cui,), "semtypes": (),
                                    "sources": (), "codes": ()}
        if parent is not None:
            edge_set.add((cui, parent))
            kept_edges.append((cui, parent))
        nd = d - 1 if d is not None else None
        for ch in reversed(children.get(cui, ())):
            stack.append((ch, cui, nd))
    return list(kept.values()), kept_edges


def export_owl(concepts, isa_edges=(),
               base_iri: str = "http://noble.tools/export",
               ontology_name: str | None = None) -> str:
    """Concepts + isa edges → one RDF/XML OWL document (string).

    ``concepts`` is either the loaders' concept-dict iterable
    (cui/name/synonyms/semtypes/definition/codes — parse_obo/parse_owl/
    fetch_all output) or a concepts DataFrame in the
    ``concepts_df_from_records`` schema (collected here: terminologies
    are dimension-sized, the package-wide driver-parse bound).

    Round-trip contract (tested): ``parse_owl(export_owl(c, e))``
    reproduces cui, name, synonyms, semtypes, definition, and EVERY
    isa edge; alternate codes come back under the ``_prop_tag`` name
    (plus the URI code parse_owl always adds). A hierarchy-only node
    (an edge child with no concept row) is emitted as a bare owl:Class
    carrying its subClassOf — re-parsing yields it as a pretty-named
    concept, the same thing the reference's class iterator would do.
    """
    from xml.sax.saxutils import escape, quoteattr

    concepts = _concept_records(concepts)
    isa_edges = _edge_pairs(isa_edges)

    parents: dict[str, list[str]] = {}
    for child, parent in isa_edges:
        parents.setdefault(child, []).append(parent)

    nt = f"{base_iri}#"
    out = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
        f'         xmlns:nt={quoteattr(nt)}',
        f'         xml:base={quoteattr(base_iri)}>',
        f'  <owl:Ontology rdf:about={quoteattr(base_iri)}'
        + (f'><rdfs:label>{escape(ontology_name)}</rdfs:label>'
           '</owl:Ontology>' if ontology_name else '/>'),
    ]
    for c in concepts:
        cui, name = c["cui"], c["name"]
        out.append(f'  <owl:Class rdf:about={quoteattr(base_iri + "#" + cui)}>')
        out.append(f'    <rdfs:label>{escape(name)}</rdfs:label>')
        for syn in c.get("synonyms") or ():
            if syn and syn != name:
                out.append(f'    <nt:synonym>{escape(syn)}</nt:synonym>')
        for st in c.get("semtypes") or ():
            out.append(
                f'    <nt:Semantic_Type>{escape(st)}</nt:Semantic_Type>')
        if c.get("definition"):
            out.append(f'    <nt:definition>{escape(c["definition"])}'
                       '</nt:definition>')
        for sab, code in c.get("codes") or ():
            if sab == "URI":  # parse_owl re-adds the class URI itself
                continue
            tag = _prop_tag(sab)
            out.append(f'    <nt:{tag}>{escape(code)}</nt:{tag}>')
        for p in parents.get(cui, ()):
            out.append('    <rdfs:subClassOf '
                       f'rdf:resource={quoteattr(base_iri + "#" + p)}/>')
        out.append('  </owl:Class>')
    for cui in sorted(set(parents) - {c["cui"] for c in concepts}):
        # hierarchy-only node: no concept row, but its isa edges must
        # survive the round trip
        out.append(f'  <owl:Class rdf:about={quoteattr(base_iri + "#" + cui)}>')
        for p in parents[cui]:
            out.append('    <rdfs:subClassOf '
                       f'rdf:resource={quoteattr(base_iri + "#" + p)}/>')
        out.append('  </owl:Class>')
    out.append('</rdf:RDF>')
    return "\n".join(out) + "\n"


def write_owl(concepts, path: str, isa_edges=(), **kw) -> None:
    """export_owl to a single local/DBFS-mounted file (one document per
    terminology; driver-side by nature, like the reference's
    OntologyCreator file output)."""
    xml = export_owl(concepts, isa_edges, **kw)
    with open(path, "w", encoding="utf-8") as f:
        f.write(xml)
