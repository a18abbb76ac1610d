"""NobleCoder XML terminology interchange — the reference's own
serialization (`terminology/AbstractTerminology.toElement`,
`impl/NobleCoderTerminology.toElement/fromElement:2155-2217`,
`Concept.toElement:1338-1382`, `Term/SemanticType/Definition/Source
.toElement`): a single ``<Terminology>`` document carrying Sources,
Languages, Roots, Concepts (Terms with a ``preferred`` flag,
SemanticTypes, per-source Codes, Definitions, and Broader/Narrower
Relations), and search Options.

Driver-side by nature (one XML document per terminology — the same
bound as every loader in this package); ``parse_term_xml`` returns the
loaders' common ``(concepts, isa_edges)`` shape so the result feeds
``build_index`` / ``concepts_df_from_records`` like OBO/OWL/RRF input.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_SPLIT_RE = re.compile(r",\s*")


def _as_root(xml: "str | ET.Element") -> ET.Element:
    root = ET.fromstring(xml) if isinstance(xml, str) else xml
    if root.tag != "Terminology":
        raise ValueError(f"expected <Terminology>, got <{root.tag}>")
    return root


def parse_term_xml(xml_text: "str | ET.Element") -> tuple[
        list[dict], list[tuple[str, str]]]:
    """One ``<Terminology>`` XML document (text or a pre-parsed root
    Element — callers that also need ``term_xml_options`` can parse
    once) → (concepts, isa_edges).

    Mapping (fromElement parity, NobleCoderTerminology.java:2173-2217):
    Concept@code → cui, Concept@name → name, Term texts → synonyms
    (a ``preferred`` Term overrides the name attribute, Term.java
    semantics), SemanticType@code (fallback @name) → semtypes,
    Source@name children → sources, first preferred-then-first
    Definition → definition, Codes/Code(source,code) → codes.
    ``Broader`` relations on the child and ``Narrower`` relations on
    the parent (Relation.java:16-17) both yield (child, parent) edges,
    deduplicated; self-edges are dropped.
    """
    root = _as_root(xml_text)
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    seen_edges: set[tuple[str, str]] = set()
    # relation targets: the reference writes comma-joined lists, but a
    # concept code may itself contain ", " — so resolve each Relation
    # text against the document's full code set first (whole-text match
    # wins) and only fall back to the comma split. Needs the codes up
    # front: one cheap pre-pass.
    all_codes = {ce.get("code") or "" for ce in root.iter("Concept")}

    def _targets(text: str) -> list[str]:
        text = text.strip()
        if not text:
            return []
        if text in all_codes:
            return [text]
        return [t for t in _SPLIT_RE.split(text) if t]

    def _edge(child: str, parent: str) -> None:
        e = (child, parent)
        if child and parent and child != parent and e not in seen_edges:
            seen_edges.add(e)
            edges.append(e)

    for ce in root.iter("Concept"):
        cui = ce.get("code") or ""
        name = ce.get("name") or cui
        synonyms: list[str] = []
        semtypes: list[str] = []
        sources: list[str] = []
        codes: list[tuple[str, str]] = []
        definition = None
        pref_def_seen = False
        for el in ce:
            tag = el.tag
            if tag == "Term":
                t = (el.text or "").strip()
                if t:
                    if el.get("preferred") == "true":
                        name = t
                    if t not in synonyms:
                        synonyms.append(t)
            elif tag == "SemanticType":
                st = el.get("code") or el.get("name") or ""
                if st and st not in semtypes:
                    semtypes.append(st)
            elif tag == "Source":
                s = el.get("name") or el.get("code") or ""
                if s and s not in sources:
                    sources.append(s)
            elif tag == "Definition":
                d = (el.text or "").strip()
                pref = el.get("preferred") == "true"
                if d and (definition is None
                          or (pref and not pref_def_seen)):
                    definition = d
                    pref_def_seen = pref_def_seen or pref
            elif tag == "Codes":
                for code in el.iter("Code"):
                    sab = code.get("source") or ""
                    cd = code.get("code") or ""
                    if cd and (sab, cd) not in codes:
                        codes.append((sab, cd))
            elif tag == "Relations":
                for rel in el.iter("Relation"):
                    rname = rel.get("name")
                    for t in _targets(rel.text or ""):
                        if rname == "Broader":
                            _edge(cui, t)
                        elif rname == "Narrower":
                            _edge(t, cui)
        if name and name not in synonyms:
            synonyms.insert(0, name)
        concepts.append({
            "cui": cui, "name": name, "synonyms": tuple(synonyms),
            "semtypes": tuple(semtypes), "sources": tuple(sources),
            "definition": definition, "codes": tuple(codes)})
    return concepts, edges


def term_xml_options(xml_text: "str | ET.Element") -> dict[str, str]:
    """The ``<Options>`` block of a ``<Terminology>`` document (text or
    a pre-parsed root Element) as a plain dict
    (NobleCoderTerminology.toElement:2157-2165 writes one
    ``<Option name= value=>`` per search property)."""
    root = _as_root(xml_text)
    out: dict[str, str] = {}
    for opts in root.iter("Options"):
        for op in opts.iter("Option"):
            n = op.get("name")
            if n:
                out[n] = op.get("value") or ""
    return out


def match_config_to_properties(cfg) -> dict[str, str]:
    """MatchConfig → the reference's search-properties map
    (getSearchProperties, NobleCoderTerminology.java — key set preserved
    verbatim, INCLUDING the ``partial.match.theshold`` typo the
    reference writes and reads)."""
    def b(x):
        return "true" if x else "false"
    return {
        "default.search.method": cfg.search_method,
        "ignore.small.words": b(cfg.ignore_small_words),
        "source.filter": ", ".join(cfg.source_filter),
        "language.filter": "",
        "semantic.type.filter": ", ".join(cfg.semtype_filter),
        "ignore.common.words": b(cfg.ignore_common_words),
        "ignore.acronyms": "false",
        "select.best.candidate": b(cfg.select_best_candidate),
        "score.concepts": b(cfg.score_concepts),
        "window.size": str(cfg.window_size),
        "maximum.word.gap": str(cfg.max_word_gap),
        "ignore.used.words": b(cfg.ignore_used_words),
        "subsumption.mode": b(cfg.subsumption_mode),
        "overlap.mode": b(cfg.overlap_mode),
        "contiguous.mode": b(cfg.contiguous_mode),
        "ordered.mode": b(cfg.ordered_mode),
        "partial.mode": b(cfg.partial_mode),
        "stem.words": b(cfg.stem_words),
        "ignore.digits": b(cfg.strip_digits),
        # the engine's doc-local acronym pass always runs (the
        # reference's handlePossibleAcronyms default) — written so the
        # key set matches getSearchProperties exactly (:635)
        "handle.possible.acronyms": "true",
        "partial.match.theshold": str(cfg.partial_match_threshold),
        "max.words.in.term": str(cfg.max_words_in_term),
    }


def match_config_from_properties(props: dict, base=None):
    """Search-properties map → MatchConfig (setSearchProperties parity,
    NobleCoderTerminology.java): ONLY the keys the reference applies are
    applied — ``stem.words`` / ``ignore.digits`` / ``ignore.small.words``
    are commented out there ("should not be reset by user") and stay at
    ``base``'s values here too; an unknown ``default.search.method``
    falls back to best-match; ``word.window.size`` is ``maxWordGap+1``
    and ``maximum.word.gap`` (read after it) overrides; numeric parse
    failures keep the previous value (the reference swallows them)."""
    from dataclasses import replace

    from nobletools_spark.model import (ALL_MATCH, BEST_MATCH, MatchConfig,
                                        NONOVERLAP_MATCH, PARTIAL_MATCH,
                                        PRECISE_MATCH)

    cfg = base if base is not None else MatchConfig()
    methods = (BEST_MATCH, ALL_MATCH, PRECISE_MATCH, NONOVERLAP_MATCH,
               PARTIAL_MATCH)
    upd: dict = {}
    if "default.search.method" in props:
        m = props["default.search.method"]
        upd["search_method"] = m if m in methods else BEST_MATCH

    def _bool(key, field):
        if key in props:
            upd[field] = props[key] == "true"

    def _num(key, field, conv):
        if key in props:
            try:
                upd[field] = conv(props[key])
            except (TypeError, ValueError):
                pass

    _bool("ignore.common.words", "ignore_common_words")
    _bool("select.best.candidate", "select_best_candidate")
    _num("window.size", "window_size", int)
    if "word.window.size" in props:
        try:
            upd["max_word_gap"] = int(props["word.window.size"]) - 1
        except (TypeError, ValueError):
            pass
    _num("maximum.word.gap", "max_word_gap", int)
    _bool("ignore.used.words", "ignore_used_words")
    _bool("subsumption.mode", "subsumption_mode")
    _bool("overlap.mode", "overlap_mode")
    _bool("contiguous.mode", "contiguous_mode")
    _bool("ordered.mode", "ordered_mode")
    _bool("partial.mode", "partial_mode")
    _num("partial.match.theshold", "partial_match_threshold", float)
    _num("max.words.in.term", "max_words_in_term", int)
    for key, field in (("source.filter", "source_filter"),
                       ("semantic.type.filter", "semtype_filter")):
        v = props.get(key)
        if v:
            sep = ";" if ";" in v else ","
            upd[field] = tuple(s.strip() for s in v.split(sep) if s.strip())
    return replace(cfg, **upd) if upd else cfg


def export_term_xml(concepts, isa_edges=(), name: str = "terminology",
                    version: str = "1.0", description: str = "",
                    languages=("ENG",), options: dict | None = None) -> str:
    """Concepts + isa edges → one ``<Terminology>`` XML document
    (toElement parity): Roots are the concepts that are nobody's child,
    every concept's name is its ``preferred`` Term, Broader relations
    are emitted on the child AND the mirror Narrower on the parent
    (the reference's relationMap holds both directions when built from
    RRF PAR/CHD rows), and Options carries the given search properties.

    Round-trip contract (tested): ``parse_term_xml(export_term_xml(c,
    e))`` reproduces cui/name/synonyms/semtypes/sources/definition/
    codes and exactly the (child, parent) edge set.
    """
    from nobletools_spark.sources.sinks import _concept_records, _edge_pairs

    concepts = _concept_records(concepts)
    isa_edges = _edge_pairs(isa_edges)
    parents: dict[str, list[str]] = {}
    children: dict[str, list[str]] = {}
    for ch, par in isa_edges:
        parents.setdefault(ch, []).append(par)
        children.setdefault(par, []).append(ch)
    cuis = {c["cui"] for c in concepts}
    # hierarchy-only nodes (edge endpoints with no concept row): in the
    # reference every node IS a Concept, so emit bare entries carrying
    # their Relations — the edge set must survive the round trip
    extra = sorted((set(parents) | set(children)) - cuis)
    concepts = list(concepts) + [
        {"cui": x, "name": x, "synonyms": (x,)} for x in extra]
    cuis |= set(extra)
    roots = sorted(c for c in cuis if c not in parents)
    all_sources = sorted({s for c in concepts
                          for s in (c.get("sources") or ())})

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<Terminology name={quoteattr(name)} version={quoteattr(version)}'
        f' location="" format="xml" uri="">',
        f'  <Description>{escape(description)}</Description>',
        '  <Sources>',
        *(f'    <Source name={quoteattr(s)} code={quoteattr(s)}'
          ' version=""/>' for s in all_sources),
        '  </Sources>',
        '  <Relations/>',
        f'  <Languages>{escape(", ".join(languages))}</Languages>',
        f'  <Roots>{escape(", ".join(roots))}</Roots>',
        '  <Concepts>',
    ]
    for c in concepts:
        cui, cname = c["cui"], c["name"]
        out.append(f'    <Concept name={quoteattr(cname)}'
                   f' code={quoteattr(cui)}>')
        if c.get("definition"):
            out.append(f'      <Definition preferred="true">'
                       f'{escape(c["definition"])}</Definition>')
        for st in c.get("semtypes") or ():
            # we carry TUIs; the display name is not stored, so emit the
            # code on both attributes (SemanticType.fromElement reads both)
            out.append(f'      <SemanticType name={quoteattr(st)}'
                       f' code={quoteattr(st)}/>')
        for s in c.get("sources") or ():
            out.append(f'      <Source name={quoteattr(s)}/>')
        out.append(f'      <Term preferred="true">{escape(cname)}</Term>')
        for syn in c.get("synonyms") or ():
            if syn and syn != cname:
                out.append(f'      <Term>{escape(syn)}</Term>')
        codes = [(s, k) for s, k in (c.get("codes") or ()) if s != "URI"]
        if codes:
            out.append('      <Codes>')
            for sab, code in codes:
                out.append(f'        <Code source={quoteattr(sab)}'
                           f' code={quoteattr(code)}/>')
            out.append('      </Codes>')
        rels = []
        if parents.get(cui):
            rels.append(("Broader", sorted(parents[cui])))
        if children.get(cui):
            rels.append(("Narrower", sorted(children[cui])))
        if rels:
            # one Relation element per target (never comma-joined): a
            # target code containing ", " would shatter on re-parse; the
            # reference's reader handles single-target elements the same
            out.append('      <Relations>')
            for rname, targets in rels:
                out.extend(f'        <Relation name="{rname}">'
                           f'{escape(t)}</Relation>' for t in targets)
            out.append('      </Relations>')
        out.append('    </Concept>')
    out.append('  </Concepts>')
    if options:
        out.append('  <Options>')
        for k in sorted(options):
            out.append(f'    <Option name={quoteattr(str(k))}'
                       f' value={quoteattr(str(options[k]))}/>')
        out.append('  </Options>')
    out.append('</Terminology>')
    return "\n".join(out) + "\n"


def write_term_xml(concepts, path: str, isa_edges=(), **kw) -> None:
    """export_term_xml to a single local file (one document per
    terminology, like the reference's .term XML)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(export_term_xml(concepts, isa_edges, **kw))
