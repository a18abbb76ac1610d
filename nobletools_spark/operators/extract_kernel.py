"""Faithful InformationExtractor kernel: a per-document replay of the
reference's template-extraction semantics, run as a map-only Spark
stage (the same design as the matcher kernel — per-doc Python inside
mapInPandas, zero shuffle, linear at 10^12 documents).

This is the high-fidelity counterpart of ``operators/templates.
extract_items`` (the declarative broadcast-join operator, DuckDB-oracle
checked). The kernel reproduces, mention for mention and cell for cell:

- ``TemplateItem.process`` (extract/model/TemplateItem.java:347-451):
  section filters with sentence ranges (:355-391 — ``title[-N]`` keeps
  all but the last N sentences; a non-negative range is parsed but adds
  the WHOLE section, the reference's TODO quirk), the ancestry-gated
  first pass, and the Feature second pass (:421-449) with its
  component-instance comparison.
- ``ItemInstance.process`` (extract/model/ItemInstance.java:397-497):
  trigger-domain satisfaction, per-ANNOTATION value parsing for strict
  descendants of a value-domain item (:424-430), negation → absent,
  component resolution (:439-485) via the one-concept re-match
  (``findConcept`` :704-733 — a fresh single-concept NobleCoder with
  ignoreSmallWords/scoreConcepts/selectBestCandidate off and
  ignoreUsedWords on, run over the sentence text) with the
  sentence-mention fallback (:662-668 — note the INVERTED ancestry:
  the component concept must descend from the mention's concept), the
  annotation-subsumption dedup of ``getMatchingInstances`` (:573-599),
  ``filterValues`` (:509-517), and last-wins unit assignment.
- ``TemplateItem.addInstance`` (:454-488): equal concepts merge,
  a more specific concept replaces its ancestor IN PLACE, siblings
  append — and value-domain items never merge.
- ``ItemInstance.getAnswer`` (:313-390) with ``humanReadable=false``
  ("Name (CODE)" cells) and ``CSVExporter.export(TemplateDocument)``
  (util/CSVExporter.java:62-82): one question per item (or per
  attribute), cells joined as ``"a ;b ;"``.

Known bounded deviations (pinned by the parity leg):
- attribute iteration order: the reference iterates a ``HashMap`` of
  attributes; this kernel keeps template order. Templates with ≤1
  attribute per item (the common case) are unaffected.
- the linkage-code first-pass branch (TemplateItem.java:404-418) is
  skipped: template XMLs written without ``Codes`` elements never take
  it.

Scale shape: the template spec, concept names, ancestor closure, and
the per-component single-concept indexes are all terminology-sized —
one broadcast. Each document is processed independently; the result
matrix row is emitted from the same map task that matched the
mentions. No shuffle anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator, Optional

from nobletools_spark.model import MatchConfig, TerminologyIndex
from nobletools_spark.operators import match_core

# findConcept's single-concept coder settings (ItemInstance.java:707-711)
_TINY_CFG = MatchConfig(ignore_small_words=False, score_concepts=False,
                        select_best_candidate=False, ignore_used_words=True)


@dataclass(frozen=True)
class ItemSpec:
    """One TemplateItem: concepts are codes into the template
    terminology; component tuples are kept in template order and sorted
    by concept NAME at resolution time (the reference stores them in
    ``TreeSet``s ordered by ``Concept.compareTo`` = name order)."""

    name: str
    concept: str
    item_type: str = "finding"
    value_domain: str = "boolean"
    filters: tuple[str, ...] = ()          # section filters (raw, may carry [range])
    scoped: bool = False   # ANY filter present (TemplateItem.process only
    #                        honors section filters; an item with only
    #                        non-section filters scopes to NOTHING)
    modifiers: tuple[str, ...] = ()
    values: tuple[str, ...] = ()
    units: tuple[str, ...] = ()
    attributes: tuple[tuple[str, tuple[str, ...]], ...] = ()
    feature: Optional["ItemSpec"] = None


@dataclass(frozen=True)
class TemplateSpec:
    name: str
    items: tuple[ItemSpec, ...]
    concepts: tuple[tuple, ...] = ()       # hashable concept records
    isa_edges: tuple[tuple[str, str], ...] = ()

    def concept_records(self) -> list[dict]:
        return [{"cui": c, "name": n, "synonyms": syn, "semtypes": st,
                 "sources": src, "definition": d}
                for c, n, syn, st, src, d in self.concepts]


# ---------------------------------------------------------------------------
# .template XML → TemplateSpec (Template.fromElement :228-274,
# TemplateItem.fromElement :564-627, AbstractTerminology XML round-trip)
# ---------------------------------------------------------------------------

def template_spec_from_xml(xml_text: str) -> TemplateSpec:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    if root.tag != "Template":
        root = root.find(".//Template")
        if root is None:
            raise ValueError("no <Template> element in the XML")

    concepts, edges = terminology_from_template_xml(xml_text)
    names = {c["cui"]: c["name"] for c in concepts}

    def parse_item(el) -> ItemSpec:
        # the reference honors every TYPE_SECTION filter regardless of
        # invert.match (TemplateItem.process :357-358 never checks it)
        all_filters = el.findall("Filters/Filter")
        filters = tuple(
            (f.text or "").strip()
            for f in all_filters
            if (f.get("type") or "section") == "section"
            and (f.text or "").strip())
        for filt in filters:
            # fail fast ON THE DRIVER for ranges that would throw in
            # the per-document kernel (Integer.parseInt semantics,
            # TemplateItem.java:376): only a '-'-leading range is
            # parsed as an int there — '[-1-2]' / '[-]' would abort
            # every executor task instead of one Java document
            mm = re.fullmatch(r"(.*)\[([\d\-]+)\]", filt)
            if (mm and mm.group(2).startswith("-")
                    and not re.fullmatch(r"-\d+", mm.group(2))):
                raise ValueError(
                    f"unparseable sentence range in section filter "
                    f"{filt!r}: {mm.group(2)!r} is not a Java int")

        def codes(tag):
            return tuple(s.get("concept")
                         for s in el.findall(f"{tag}/TemplateItem"))

        attrs = []
        for av in el.findall("AttributeValues"):
            a = av.find("Attribute/TemplateItem")
            vals = tuple(s.get("concept")
                         for s in av.findall("Values/TemplateItem"))
            if a is not None and vals:
                attrs.append((a.get("concept"), vals))
        feat_el = el.find("Feature/TemplateItem")
        # TemplateItem.getName() (:66-68) is ALWAYS the concept's
        # terminology name, never a free-form attribute
        return ItemSpec(
            name=names.get(el.get("concept"),
                           el.get("name") or el.get("concept")),
            concept=el.get("concept"),
            # fromElement stores getAttribute verbatim: a missing type is
            # "" (NOT finding — absent/present only renders for an
            # explicit type="finding"), and a missing value.domain
            # overwrites the field default to "" too (:566-567)
            item_type=el.get("type") or "",
            value_domain=el.get("value.domain") or "",
            filters=filters, scoped=bool(all_filters),
            modifiers=codes("Modifiers"),
            values=codes("Values"), units=codes("Units"),
            attributes=tuple(attrs),
            feature=parse_item(feat_el) if feat_el is not None else None)

    items = tuple(parse_item(el)
                  for el in root.findall("TemplateItems/TemplateItem"))

    crecs = tuple((c["cui"], c["name"], tuple(c["synonyms"]),
                   tuple(c["semtypes"]), tuple(c["sources"]),
                   c.get("definition"))
                  for c in concepts)
    return TemplateSpec(name=root.get("name") or "template", items=items,
                        concepts=crecs, isa_edges=tuple(edges))


def terminology_from_template_xml(xml_text: str):
    """The Terminology element embedded in a .template file → (concept
    records, isa edges): Concepts/Concept with Term children (preferred
    first) and Relations/Relation name="Broader" hierarchy — the same
    record shape the OBO/OWL loaders emit, so the full Spark pipeline
    can run off a reference .template file alone."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    for con in root.findall(".//Terminology/Concepts/Concept"):
        code, name = con.get("code"), con.get("name")
        pref = [t.text.strip() for t in con.findall("Term")
                if (t.get("preferred") or "").lower() == "true" and t.text]
        rest = [t.text.strip() for t in con.findall("Term")
                if (t.get("preferred") or "").lower() != "true" and t.text]
        syns = tuple(dict.fromkeys([*(pref or [name]), *rest]))
        defs = [d.text.strip() for d in con.findall("Definition") if d.text]
        concepts.append({
            "cui": code, "name": name or code, "synonyms": syns,
            "semtypes": tuple(s.get("name")
                              for s in con.findall("SemanticType")),
            "sources": tuple(s.get("name") for s in con.findall("Source")),
            "definition": defs[0] if defs else None})
        for rel in con.findall("Relations/Relation"):
            if rel.get("name") == "Broader" and rel.text:
                for parent in rel.text.split(","):
                    if parent.strip():
                        edges.append((code, parent.strip()))
    return concepts, edges


# ---------------------------------------------------------------------------
# runtime (broadcastable): name map + unlimited-depth ancestors + tiny
# single-concept indexes for findConcept
# ---------------------------------------------------------------------------

class ExtractRuntime:
    def __init__(self, template: TemplateSpec):
        from nobletools_spark.index import build_index

        self.template = template
        recs = template.concept_records()
        self.names = {c["cui"]: c["name"] for c in recs}
        # PathHelper with pathDepthLimit(-1) (Template.java:117-121):
        # UNLIMITED-depth ancestry, unlike the coder's depth-7 closure
        parents: dict[str, set[str]] = {}
        for c, p in template.isa_edges:
            parents.setdefault(c, set()).add(p)
        self.anc: dict[str, set[str]] = {}
        for c in self.names:
            seen: set[str] = set()
            frontier = list(parents.get(c, ()))
            while frontier:
                nxt = frontier.pop()
                if nxt in seen:
                    continue
                seen.add(nxt)
                frontier.extend(parents.get(nxt, ()))
            self.anc[c] = seen
        by_cui = {c["cui"]: c for c in recs}
        comp_codes: set[str] = set()

        def walk(item: ItemSpec):
            comp_codes.add(item.concept)
            comp_codes.update(item.modifiers, item.values, item.units)
            for _a, vals in item.attributes:
                comp_codes.update(vals)
            if item.feature is not None:
                walk(item.feature)

        for it in template.items:
            walk(it)
        self.tiny = {c: build_index([by_cui[c]])
                     for c in comp_codes if c in by_cui}

    def has_anc(self, a: str, b: str) -> bool:
        return a == b or b in self.anc.get(a, ())

    def name(self, code: str) -> str:
        return self.names.get(code, code)


# ---------------------------------------------------------------------------
# per-document replay
# ---------------------------------------------------------------------------

class _MRef:
    """A document mention with absolute-offset annotations and its
    sentence linkage."""

    __slots__ = ("cui", "anns", "sent_i", "negated", "start", "mod_anns")

    def __init__(self, cui, anns, sent_i, negated, start, mod_anns=()):
        self.cui = cui
        self.anns = anns          # tuple[(word, abs_offset)]
        self.sent_i = sent_i      # index into matched-sentence list
        self.negated = negated
        self.start = start
        self.mod_anns = mod_anns  # modifier trigger anns, abs offsets


class _Inst:
    __slots__ = ("spec", "concept", "mention", "values", "absent",
                 "feature", "attr_values", "modifiers", "unit",
                 "satisfied", "anns")

    def __init__(self, spec: ItemSpec, concept: str, anns,
                 mention: _MRef | None = None):
        self.spec = spec
        self.concept = concept
        self.mention = mention
        self.anns = list(anns)    # [(word, abs_offset)]
        self.values: list = []    # LinkedHashSet: ordered dedupe
        self.absent = False
        self.feature: _Inst | None = None
        self.attr_values: list[tuple[str, list[_Inst]]] = []
        self.modifiers: list[_Inst] = []
        self.unit: _Inst | None = None
        self.satisfied = True

    def add_value(self, v):
        if not any(type(x) is type(v) and x == v for x in self.values):
            self.values.append(v)

    def merge(self, other: "_Inst"):
        self.anns.extend(other.anns)

    def component_instances(self) -> list["_Inst"]:
        out = []
        if self.feature is not None:
            out.append(self.feature)
        for _a, vals in self.attr_values:
            out.extend(vals)
        out.extend(self.modifiers)
        if self.unit is not None:
            out.append(self.unit)
        return out


def _to_str(v: float) -> str:
    # TextTools.toString (:1149-1156): integral → %d, else %.2f
    if (v * 10) % 10 == 0:
        return str(int(v))
    return f"{v:.2f}"


class _DocExtractor:
    def __init__(self, rt: ExtractRuntime, sentences, all_sentences,
                 sections, cfg: MatchConfig):
        self.rt = rt
        self.sentences = sentences          # [(text, off, mentions)]
        self.cfg = cfg
        self._find_cache: dict[tuple[str, int], object] = {}
        # document mention list (Document.getMentions: sentence order)
        # plus a per-sentence index: process_instance resolves each
        # component against the mention's sentence, so the lookup must
        # be O(sentence mentions), not O(document mentions) per call
        self.doc_mentions: list[_MRef] = []
        self._by_sent: dict[int, list[_MRef]] = {}
        for i, (_t, off, mentions) in enumerate(sentences):
            for m in mentions:
                anns = tuple((w, off + o) for w, o in m.annotations)
                neg = m.modifiers.get("Polarity") == "Negative_Polarity"
                mod_anns = tuple(
                    (w, off + o)
                    for ml in getattr(m, "modifier_anns", {}).values()
                    for w, o in ml)
                ref = _MRef(m.cui, anns, i, neg, off + m.start, mod_anns)
                self.doc_mentions.append(ref)
                self._by_sent.setdefault(i, []).append(ref)
        # Section.getSentences equivalent: every sentence (incl. filtered
        # headers) inside [title_offset, body_end), in document order
        self.sections = []
        for sec in sections:
            end = sec.body_offset + len(sec.body)
            sent_offs = [o for _t, o, _ty, _f in all_sentences
                         if sec.title_offset <= o < end]
            self.sections.append((sec.title, sent_offs))
        self.matched_by_off = {off: i
                               for i, (_t, off, _m) in enumerate(sentences)}

    # -- findConcept --------------------------------------------------

    def _find_primary(self, code: str, sent_i: int):
        """ItemInstance.findConcept (:704-733): single-concept NobleCoder
        over the sentence text, first mention wins."""
        key = (code, sent_i)
        if key in self._find_cache:
            return self._find_cache[key]
        out = None
        idx = self.rt.tiny.get(code)
        if idx is not None:
            text, off, _m = self.sentences[sent_i]
            found = match_core.match_sentence(text, idx, _TINY_CFG)
            if found:
                m = found[0]
                out = _MRef(m.cui, tuple((w, off + o)
                                         for w, o in m.annotations),
                            sent_i, False, off + m.start)
        self._find_cache[key] = out
        return out

    def _find_fallback(self, r: list[_MRef], code: str):
        """findConcept(List<Mention>, TemplateItem) (:662-668): first
        sentence mention whose concept the COMPONENT descends from
        (hasAncestor(component, mention) — inverted on purpose)."""
        for m in r:
            if self.rt.has_anc(code, m.cui):
                return m
        return None

    def _sentence_mentions(self, sent_i: int) -> list[_MRef]:
        return self._by_sent.get(sent_i, [])

    # -- getMatchingInstances (:573-599) ------------------------------

    def _matching_instances(self, comp_codes, specs: dict[str, ItemSpec],
                            sent_i: int,
                            r: list[_MRef] | None) -> list[_Inst]:
        result: list[_Inst] = []
        for code in sorted(comp_codes, key=self.rt.name):  # TreeSet order
            c = (self._find_primary(code, sent_i) if r is None
                 else self._find_fallback(r, code))
            if c is None:
                continue
            inst = _Inst(specs[code], c.cui, c.anns, c)
            new_set = set(inst.anns)
            k, blocked = 0, False
            while k < len(result):
                ex_set = set(result[k].anns)
                if ex_set >= new_set:   # existing subsumes new: reject,
                    blocked = True      # nothing already filed is removed
                    break
                if new_set >= ex_set:   # new subsumes existing: evict
                    del result[k]
                    continue
                k += 1
            if not blocked:
                result.append(inst)
        return result

    # -- ItemInstance.process (:397-497) ------------------------------

    def process_instance(self, item: ItemSpec, m: _MRef) -> _Inst:
        rt = self.rt
        inst = _Inst(item, m.cui, m.anns, m)
        inst.satisfied = True
        r = self._sentence_mentions(m.sent_i)
        annotations: list = []

        comp_specs = _component_specs(item)

        if item.value_domain == "trigger":
            annotations.extend(m.anns)
            for attr_code, val_codes in item.attributes:
                inst.satisfied = False
                vals: list[_Inst] = []
                for v in val_codes:
                    for m2 in r:
                        if rt.has_anc(m2.cui, v):
                            vi = _Inst(comp_specs[v], m2.cui, m2.anns, m2)
                            vals.append(vi)
                            annotations.extend(m2.anns)
                            inst.satisfied = True
                if vals:
                    _add_attr_values(inst, attr_code, vals, rt)
        elif (m.cui != item.concept and rt.has_anc(m.cui, item.concept)
                and item.value_domain == "value"):
            # the mention IS the value: parse each annotation word
            from nobletools_spark.operators.templates import (
                parse_decimal_value)
            for w, _o in m.anns:
                d = parse_decimal_value(w)
                inst.add_value(w if d is None else d)
        else:
            if m.negated and item.value_domain not in ("attribute", "value"):
                inst.absent = True
                # mention.getModifierAnnotations() (:435) — the real
                # trigger-phrase annotations of the assigning modifiers
                annotations.extend(m.mod_anns)
            feat_item = item.feature if item.feature is not None else item
            c = self._find_primary(feat_item.concept, m.sent_i)
            if c is not None:
                inst.feature = _Inst(feat_item, c.cui, c.anns, c)
            for attr_code, val_codes in item.attributes:
                found = self._matching_instances(val_codes, comp_specs,
                                                 m.sent_i, None)
                if not found:
                    found = self._matching_instances(val_codes, comp_specs,
                                                     m.sent_i, r)
                if found:
                    _add_attr_values(inst, attr_code, found, rt)
                    for i in found:
                        annotations.extend(i.anns)
            found = self._matching_instances(item.modifiers, comp_specs,
                                             m.sent_i, None)
            if not found:
                found = self._matching_instances(item.modifiers, comp_specs,
                                                 m.sent_i, r)
            for i in found:
                # getModifiers() is a TreeSet<ItemInstance> (:200-212):
                # concept-NAME order, compareTo==0 (same name) dedupes
                if not any(rt.name(e.concept) == rt.name(i.concept)
                           for e in inst.modifiers):
                    inst.modifiers.append(i)
                    inst.modifiers.sort(key=lambda e: rt.name(e.concept))
                annotations.extend(i.anns)
            found = self._matching_instances(item.units, comp_specs,
                                             m.sent_i, None)
            if not found:
                found = self._matching_instances(item.units, comp_specs,
                                                 m.sent_i, r)
            for i in found:                   # last wins (:469-471)
                inst.unit = i
                annotations.extend(i.anns)
            found = self._matching_instances(item.values, comp_specs,
                                             m.sent_i, None)
            if not found:
                found = self._matching_instances(item.values, comp_specs,
                                                 m.sent_i, r)
            from nobletools_spark.operators.templates import (
                parse_decimal_value)
            for i in found:
                # filterValues (:509-517): drop annotations already used
                used = set(annotations)
                i.anns = [a for a in i.anns if a not in used]
                for w, _o in i.anns:
                    d = parse_decimal_value(w)
                    inst.add_value(w if d is None else d)
                annotations.extend(i.anns)
            if not annotations and item.value_domain in ("attribute",
                                                         "value"):
                inst.satisfied = False
        for a in annotations:
            if a not in inst.anns:
                inst.anns.append(a)
        return inst

    # -- TemplateItem.process (:347-451) ------------------------------

    def process_item(self, item: ItemSpec) -> list[_Inst]:
        rt = self.rt
        items: list[_Inst] = []
        if not item.scoped:
            scope = list(self.doc_mentions)
        else:
            scope = []
            for filt in item.filters:
                title, rng = filt, None
                mm = re.fullmatch(r"(.*)\[([\d\-]+)\]", filt)
                if mm:
                    title, rng = mm.group(1), mm.group(2)
                for sec_title, sent_offs in self.sections:
                    if not _java_matches(sec_title, title):
                        continue
                    if rng is not None and rng.startswith("-"):
                        keep = sent_offs[:len(sent_offs) + int(rng)]
                    else:
                        # non-negative range: reference TODO — whole
                        # section (TemplateItem.java:380-384)
                        keep = sent_offs
                    keep_is = {self.matched_by_off[o] for o in keep
                               if o in self.matched_by_off}
                    scope.extend(m for m in self.doc_mentions
                                 if m.sent_i in keep_is)
        # first pass
        for m in scope:
            if rt.has_anc(m.cui, item.concept):
                inst = self.process_instance(item, m)
                if inst.satisfied:
                    self._add_instance(items, inst)
        # second pass: Feature (:421-449)
        if not items and item.feature is not None:
            for m in scope:
                if rt.has_anc(m.cui, item.feature.concept):
                    inst = self.process_instance(item, m)
                    finst = self.process_instance(item.feature, m)
                    l1 = [c.concept for c in inst.component_instances()]
                    l2 = [c.concept for c in finst.component_instances()]
                    if len(l1) == len(l2) and all(c in l1 for c in l2):
                        self._add_instance(items, inst)
        return items

    def _add_instance(self, items: list[_Inst], i: _Inst):
        # addInstance (:454-488)
        rt = self.rt
        if not items:
            items.append(i)
            return
        filed = False
        if i.spec.value_domain != "value":
            for k, o in enumerate(items):
                if i.concept == o.concept:
                    o.merge(i)
                    filed = True
                    break
                if rt.has_anc(i.concept, o.concept):
                    i.merge(o)
                    items[k] = i
                    filed = True
                    break
                if rt.has_anc(o.concept, i.concept):
                    o.merge(i)
                    filed = True
                    break
        if not filed:
            items.append(i)

    # -- answers + matrix ---------------------------------------------

    def answer(self, inst: _Inst, human: bool = False) -> str:
        rt = self.rt
        item = inst.spec

        def name_code(code):
            return rt.name(code) if human else f"{rt.name(code)} ({code})"

        if inst.values:
            buf = ""
            for v in inst.values:
                if isinstance(v, float):
                    buf += _to_str(v) + (f" {rt.name(inst.unit.concept)}"
                                         if inst.unit is not None else "")
                else:
                    buf += str(v)
            return buf
        if item.value_domain == "self":
            return name_code(inst.concept)
        if item.attributes:
            s, included = "", False
            for _a, vals in inst.attr_values:
                for v in vals:
                    if rt.name(v.concept).lower() in item.name.lower():
                        included = True
                    else:
                        s += name_code(v.concept) + " "
            if not included and s:
                return s.strip()
        if inst.modifiers:
            return " ".join(name_code(v.concept)
                            for v in inst.modifiers).strip()
        if item.item_type != "finding":
            return name_code(inst.concept)
        return "absent" if inst.absent else "present"

    def matrix_row(self) -> dict[str, str]:
        """One CSVExporter row (export(TemplateDocument) :62-82):
        column → cell, instances rendered in insertion order. Columns
        come from ``question_columns`` so two items sharing a question
        name (e.g. two diagnosis-typed items) keep SEPARATE cells —
        the reference's TSV simply repeats the header; a dict/DataFrame
        needs the ``__k`` disambiguation suffix."""
        out: dict[str, str] = {}
        cache: dict[int, list[_Inst]] = {}
        for col, item, attr in question_columns(self.rt):
            if id(item) not in cache:
                cache[id(item)] = self.process_item(item)
            insts = cache[id(item)]
            if attr is None:
                cell_insts = insts
            else:
                cell_insts = []
                for inst in insts:
                    for a, vals in inst.attr_values:
                        if a == attr:
                            cell_insts.extend(vals)
            out[col] = "".join(self.answer(i) + " ;"
                               for i in cell_insts).strip()
        return out


def item_questions(rt: ExtractRuntime,
                   item: ItemSpec) -> list[tuple[str, str | None]]:
    """TemplateItem.getQuestions (:309-324) + the CSVExporter attribute
    resolution (getAttribute :331-339 suffix match): (question,
    attr_code|None) pairs in column order; attribute display names come
    from the terminology (attr.getName()).

    Documented deviation: when one attribute name is a suffix of
    another's question string (e.g. 'grade' vs 'nuclear grade'), the
    reference's endsWith scan binds whichever attribute a HashMap
    keySet iterates first (getAttributes :128-130 — JVM hash order,
    unstable and unportable); this engine always binds the question's
    OWN attribute, the only well-defined resolution."""
    if not item.attributes:
        q = "diagnosis" if item.item_type == "diagnosis" else item.name
        return [(q, None)]
    return [(f"{item.name} {rt.name(a)}", a) for a, _v in item.attributes]


def question_columns(rt: ExtractRuntime) -> list[tuple[str, ItemSpec,
                                                       str | None]]:
    """Stable result-matrix columns: one per (item, question) pair.
    Duplicate question display names (e.g. several diagnosis-typed
    items, which all ask 'diagnosis') get a ``__k`` suffix: the
    reference's CSVExporter keeps them as separate list columns under
    a repeated TSV header, which a dict/DataFrame cannot. Template-
    constant, so cached on the runtime — matrix_row calls this per
    document."""
    cached = getattr(rt, "_question_cols", None)
    if cached is not None:
        return cached
    cols: list[tuple[str, ItemSpec, str | None]] = []
    seen: dict[str, int] = {}
    for item in rt.template.items:
        for q, attr in item_questions(rt, item):
            k = seen.get(q, 0)
            seen[q] = k + 1
            cols.append((q if k == 0 else f"{q}__{k + 1}", item, attr))
    rt._question_cols = cols
    return cols


def _java_matches(s: str, regex: str) -> bool:
    try:
        return re.fullmatch(regex, s) is not None
    except re.error:
        return False


def _component_specs(item: ItemSpec) -> dict[str, ItemSpec]:
    """Component codes → minimal specs (components render as
    "Name (CODE)" cells — non-finding type so getAnswer falls through
    to the name+code branch)."""
    out: dict[str, ItemSpec] = {}
    for code in (*item.modifiers, *item.values, *item.units):
        out[code] = ItemSpec(name=code, concept=code,
                             item_type="attribute-value")
    for _a, vals in item.attributes:
        for code in vals:
            out[code] = ItemSpec(name=code, concept=code,
                                 item_type="attribute-value")
    return out


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

def extract_matrix(docs_df, index, template: TemplateSpec | str,
                   cfg: MatchConfig = MatchConfig(select_best_candidate=False),
                   context=None, process_filter: int | None = None):
    """documents (doc_id, spans) → the InformationExtractor result
    matrix: one row per document, one column per template question,
    cells exactly as CSVExporter writes them. ``template`` may be a
    TemplateSpec or raw .template XML text.

    The default config matches InformationExtractor's coder
    (NobleCoder over the template terminology with the terminology
    defaults — selectBestCandidate stays OFF, unlike the batch coding
    pipeline)."""
    import pandas as pd

    from nobletools_spark.operators.matcher import parse_and_match
    from nobletools_spark.session import ship_package

    if isinstance(template, str):
        template = template_spec_from_xml(template)
    spark = docs_df.sparkSession
    ship_package(spark)
    rt = ExtractRuntime(template)
    questions = [col for col, _it, _a in question_columns(rt)]
    bc = (spark.sparkContext.broadcast(index)
          if isinstance(index, TerminologyIndex) else index)
    rt_bc = spark.sparkContext.broadcast(rt)
    ctx_bc = (spark.sparkContext.broadcast(context)
              if context is not None and not hasattr(context, "value")
              else context)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        rt_l = rt_bc.value
        ctx = ctx_bc.value if ctx_bc is not None else None
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                sents, all_s, secs = parse_and_match(
                    doc_id, spans, idx, cfg, ctx, process_filter)
                ex = _DocExtractor(rt_l, sents, all_s, secs, cfg)
                row = ex.matrix_row()
                rows.append((doc_id, *[row.get(q, "") for q in questions]))
            yield pd.DataFrame(rows, columns=["Document", *questions])

    ddl = ", ".join(["Document string",
                     *[f"`{q.replace(chr(96), chr(96) * 2)}` string"
                       for q in questions]])
    return docs_df.select("doc_id", "spans").mapInPandas(fn, ddl)


def _add_attr_values(inst: _Inst, attr_code: str, vals: list[_Inst],
                     rt: ExtractRuntime):
    """addAttributeValue semantics (:175-182): values per attribute
    accumulate in a TreeSet<ItemInstance> — concept-NAME order, and
    compareTo==0 (equal names) dedupes even across distinct codes."""
    for a, existing in inst.attr_values:
        if a == attr_code:
            for v in vals:
                if not any(rt.name(e.concept) == rt.name(v.concept)
                           for e in existing):
                    existing.append(v)
            existing.sort(key=lambda e: rt.name(e.concept))
            return
    merged = []
    for v in vals:
        if not any(rt.name(e.concept) == rt.name(v.concept)
                   for e in merged):
            merged.append(v)
    merged.sort(key=lambda e: rt.name(e.concept))
    inst.attr_values.append((attr_code, merged))


# ---------------------------------------------------------------------------
# HTMLExporter.export(TemplateDocument) — the Information Extraction
# report page (util/HTMLExporter.java:518-586, createTemplate :168-207,
# codeConcept(ItemInstance) :625-636, codeTemplateItem :643-654), built
# from the SAME per-doc kernel the result matrix uses.
# ---------------------------------------------------------------------------

_NEGATED = "Negative_Polarity"
_HEDGED = "Hedged_ContextualModality"


def _mod_prefix(m) -> str:
    """codeLabel's N/U code prefix (isNegated/isHedged, Mention.java
    :237-243)."""
    mods = getattr(m, "modifiers", None) or {}
    if mods.get("Polarity") == _NEGATED:
        return "N"
    if mods.get("ContextualModality") == _HEDGED:
        return "U"
    return ""


def _is_default_mods(m) -> bool:
    from nobletools_spark.operators.context import DEFAULT_VALUES

    mods = getattr(m, "modifiers", None) or {}
    return all(DEFAULT_VALUES.get(k) == v for k, v in mods.items())


def _group_annotations(sent_len: int, sent_off: int, mentions):
    """groupAnnotations per sentence (:292-315): TreeMap keyed by
    (offset, length) — equal spans MERGE owner lists; a span containing
    or contained by an existing (non-equal) key is skipped; annotations
    outside the sentence are skipped (s.contains). Returns
    [(abs_start, abs_end, word, owners)] sorted by key."""
    amap: dict[tuple[int, int], tuple[str, list]] = {}
    for m in mentions:
        for w, rel in m.annotations:
            if rel is None or rel < 0 or rel + len(w or "") > sent_len:
                continue
            st = sent_off + rel
            en = st + len(w or "")
            hit = amap.get((st, en))
            if hit is not None:
                hit[1].append(m)
                continue
            if any((k[0] <= st and en <= k[1]) or (st <= k[0] and k[1] <= en)
                   for k in amap if k != (st, en)):
                continue
            amap[(st, en)] = (w or "", [m])
    return [(k[0], k[1], v[0], v[1]) for k, v in sorted(amap.items())]


def _label(lid, word, codes, color, tip, esc, jump: bool = False) -> str:
    cs = ",".join(f"'{c}'" for c in codes)
    j = f' onclick="j([{cs}])"' if jump else ""
    return (f'<label id="{lid}" style="color:{color};" '
            f'onmouseover="h([{cs}]);" onmouseout="u([{cs}]);"{j} '
            f'title="{esc(tip)}">{word}</label>')


class _DocReport:
    """Renders one TemplateDocument report page; shares the
    _DocExtractor instance so item processing runs once."""

    def __init__(self, ex: "_DocExtractor", all_sentences, spans):
        self.ex = ex
        self.all_sentences = all_sentences  # [(text, off, type, filtered)]
        self.spans = spans

    def _code_sentence(self, stext: str, soff: int, mentions, esc) -> str:
        rt = self.ex.rt
        out, pos = [], 0
        for st, en, word, owners in _group_annotations(
                len(stext), soff, mentions):
            o = st - soff
            if o < pos:
                continue      # the StringIndexOutOfBounds catch (:337)
            codes = [_mod_prefix(m) + m.cui for m in owners]
            color = "green"
            tip = []
            for m in owners:
                tip.append(f"{rt.name(m.cui)} ({m.cui}) []")
                mods = getattr(m, "modifiers", None) or {}
                tip.extend(f"\t{t} :\t{mods.get(t, '')}"
                           for t in ("Certainty", "Polarity",
                                     "Experiencer", "Temporality"))
                if not _is_default_mods(m):
                    color = "#994d00"
            out.append(esc(stext[pos:o]).replace("\n", "<br>"))
            out.append(_label(st, esc(word), codes, color,
                              chr(10).join(tip), esc))
            pos = o + len(word)
        out.append(esc(stext[pos:]).replace("\n", "<br>"))
        return "".join(out)

    def _report_pane(self, esc) -> str:
        from nobletools_spark.functions.textkit import SENT_HEADER

        from nobletools_spark.operators.matcher import _span_fields

        by_off = {off: ms for _t, off, ms in self.ex.sentences}
        parts = []
        for span in self.spans:
            # Arrow hands spans back as dicts; locals may be tuples/Rows
            kind, text, _m, base = _span_fields(span)
            if kind != "text" or not text:
                continue
            sents = sorted((s for s in self.all_sentences
                            if base <= s[1] < base + len(text) + 1),
                           key=lambda s: s[1])
            out, pos = [], 0
            for stext, soff, stype, _f in sents:
                o = soff - base
                if o < pos:
                    continue
                out.append(esc(text[pos:o]).replace("\n", "<br>"))
                if stype == SENT_HEADER:
                    out.append("<b>" + esc(stext) + "</b><br>")
                else:
                    out.append(self._code_sentence(
                        stext, soff, by_off.get(soff, ()), esc))
                pos = o + len(stext)
            out.append(esc(text[pos:]).replace("\n", "<br>"))
            parts.append("".join(out))
        return "\n<br/>\n".join(parts)

    def _code_concept(self, v: _Inst, esc) -> str:
        rt = self.ex.rt
        codes = [off for _w, off in v.anns]
        return _label(esc(rt.name(v.concept)),
                      esc(self.ex.answer(v, human=True)), codes,
                      "blue", "", esc, jump=True)

    def _code_template_item(self, v: _Inst, esc) -> str:
        rt = self.ex.rt
        q = ("diagnosis" if v.spec.item_type == "diagnosis"
             else v.spec.name)
        codes = [off for _w, off in v.anns]
        return _label(esc(rt.name(v.concept)), esc(q), codes,
                      "blue", "", esc, jump=True)

    def _cap_pane(self, esc) -> tuple[str, int]:
        rt = self.ex.rt
        cap = [f"<h3>{esc(rt.template.name)}</h3>",
               "<table border=0 cellspacing=0 cellpadding=2>"]
        total, num = 0, 1
        cache: dict[int, list] = {}
        for item in rt.template.items:
            if id(item) not in cache:
                cache[id(item)] = self.ex.process_item(item)
            insts = cache[id(item)]
            total += len(insts)
            name = (esc(item.name) if not insts
                    else self._code_template_item(insts[0], esc))
            if not item.attributes:
                rows = [(name, list(insts))]
            else:
                # per attribute: LinkedHashSet over the items' matching
                # attribute values (dedupe = ItemInstance equality =
                # concept equality, first wins). Row order follows the
                # spec's attribute order — the reference iterates a
                # HashMap keySet (unstable); same documented deviation
                # as item_questions.
                rows = []
                for attr_code, _v in item.attributes:
                    vals, seen = [], set()
                    for inst in insts:
                        for a_code, avals in inst.attr_values:
                            if a_code == attr_code:
                                for v in avals:
                                    if v.concept not in seen:
                                        seen.add(v.concept)
                                        vals.append(v)
                    rows.append(
                        (name + " " + esc(rt.name(attr_code)), vals))
            for nm, vals in rows:
                cap.append(f'<tr><td> <font color="#E0E0E0 ">{num}'
                           f"</font> </td><th align=left> {nm} </th>"
                           f'<td align=left style="padding-left:20px;">')
                num += 1
                cap.append("<br>".join(self._code_concept(v, esc)
                                       for v in vals))
            # the reference closes ONE cell per template item, not per
            # row (createTemplate :202 sits outside the name loop) —
            # malformed-HTML quirk reproduced as-is
            cap.append("</td></tr>")
        cap.append("</table>")
        return "".join(cap), total

    def page(self, title: str) -> str:
        from html import escape as esc

        from nobletools_spark.sources.sinks import _HTML_SCRIPT

        report = self._report_pane(esc)
        cap, n = self._cap_pane(esc)
        return (
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><meta charset=\"utf-8\"/>"
            f"<title>Report Processor Output</title>{_HTML_SCRIPT}</head>"
            '<body><table width="100%" style="table-layout:fixed;"'
            ' cellspacing="5">'
            f"<tr><td colspan=2 align=center><h3>{esc(title)}</h3>"
            "</td></tr>"
            f'<tr><td width="50%" valign=middle><div id="d1" '
            f'style="overflow: auto;">{report}</div></td>'
            f'<td width="50%" valign=top><div id="d2" '
            f'style="overflow: auto;">{cap}</div></td></tr>'
            f"<tr><td colspan=2 align=center>found items: "
            f"<b>{n}</b></td></tr>"
            "</table></body></html>")


def extract_html(docs_df, index, template: "TemplateSpec | str",
                 cfg: MatchConfig = MatchConfig(select_best_candidate=False),
                 context=None, process_filter: int | None = None):
    """documents (doc_id, spans) → (doc_id, html): per-document
    Information Extraction report pages (HTMLExporter.export
    (TemplateDocument) :518-586) — the coded report pane on the left
    (span labels, Header bolds) and the template "cap protocol" table
    on the right (numbered rows, attribute grouping, answer labels
    wired to their annotation offsets), found-items footer.

    Same distributed shape as ``extract_matrix``: map-only mapInPandas
    over (doc_id, spans), broadcast index/runtime, zero shuffle."""
    import pandas as pd

    from nobletools_spark.operators.matcher import parse_and_match
    from nobletools_spark.session import ship_package

    if isinstance(template, str):
        template = template_spec_from_xml(template)
    spark = docs_df.sparkSession
    ship_package(spark)
    rt = ExtractRuntime(template)
    bc = (spark.sparkContext.broadcast(index)
          if isinstance(index, TerminologyIndex) else index)
    rt_bc = spark.sparkContext.broadcast(rt)
    ctx_bc = (spark.sparkContext.broadcast(context)
              if context is not None and not hasattr(context, "value")
              else context)

    def fn(batches):
        idx = bc.value
        rt_l = rt_bc.value
        ctx = ctx_bc.value if ctx_bc is not None else None
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                sents, all_s, secs = parse_and_match(
                    doc_id, spans, idx, cfg, ctx, process_filter)
                ex = _DocExtractor(rt_l, sents, all_s, secs, cfg)
                page = _DocReport(ex, all_s, spans).page(str(doc_id))
                rows.append((str(doc_id), page))
            yield pd.DataFrame(rows, columns=["doc_id", "html"])

    from pyspark.sql import functions as F

    return (docs_df.select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans")
        .mapInPandas(fn, "doc_id string, html string"))
