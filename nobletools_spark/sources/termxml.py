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

_TUI_RE = re.compile(r"T\d{2,4}$")
_SPLIT_RE = re.compile(r",\s*")


def parse_term_xml(xml_text: str) -> tuple[list[dict],
                                           list[tuple[str, str]]]:
    """One ``<Terminology>`` XML document → (concepts, isa_edges).

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
    root = ET.fromstring(xml_text)
    if root.tag != "Terminology":
        raise ValueError(f"expected <Terminology>, got <{root.tag}>")
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    seen_edges: set[tuple[str, str]] = set()

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
                    targets = _SPLIT_RE.split((rel.text or "").strip())
                    rname = rel.get("name")
                    for t in (t for t in targets if t):
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
            out.append('      <Relations>')
            for rname, targets in rels:
                out.append(f'        <Relation name="{rname}">'
                           f'{escape(", ".join(targets))}</Relation>')
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
