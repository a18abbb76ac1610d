"""OBO and tab-indented text terminology loaders (reference:
ConceptImporter.loadOBO util/ConceptImporter.java:181-279, loadText +
createClass :442-553). Terminologies are tiny relative to the corpus, so
these parse driver-side and emit a concepts DataFrame in
build_index_df's input schema; the isa edges feed the closure operator.
"""

from __future__ import annotations

import re
from typing import Iterable

# the reference's quoted-value pattern (ConceptImporter.java:193):
# GREEDY body up to the last quote before the trailing [xrefs] — an
# escaped \" inside the text survives; with no [brackets] the raw
# value passes through whole (m.matches() fails -> val unchanged)
_QVAL_RE = re.compile(r'"(.*)"\s*([A-Z_]*)\s*(.*)?\[.*\]')
# key.matches("(exact_|narrow_|broad_)?synonym") — OBO 1.0 variants
_SYN_KEY_RE = re.compile(r"(exact_|narrow_|broad_)?synonym:")
_ISA_RE = re.compile(r"is_a:\s*(\S+)")


def _obo_val(val: str) -> str:
    m = _QVAL_RE.fullmatch(val.strip())
    return m.group(1) if m else val.strip()
# loadText token recognizers (ConceptImporter.java:500-516)
_CUI_RE = re.compile(r"CL?\d{4,7}")
_TUI_RE = re.compile(r"T\d{2,3}")


def parse_obo(text: str) -> tuple[list[dict], list[tuple[str, str]]]:
    """Parse `[Term]` stanzas → (concepts, isa_edges). Fields: id, name,
    synonym ("..." any scope), def, is_a, is_obsolete (obsolete terms
    dropped, ConceptImporter.java:219-221), namespace → semantic type
    (:216-217), alt_id → alternate code with empty source (:259-262).
    ``relationship:`` lines (part_of etc.) are GENERIC relations in the
    reference — Relation.getRelation(rel) is not Broader (:242-250) —
    so they contribute no isa edge and the concept stays a root
    (pinned by the obo-hierarchy parity leg's part_of trap stanza)."""
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    cur: dict | None = None

    def flush():
        nonlocal cur
        if cur is not None and cur.get("cui") and not cur.get("obsolete"):
            concepts.append({
                "cui": cur["cui"], "name": cur.get("name") or cur["cui"],
                "synonyms": tuple(dict.fromkeys(
                    [cur.get("name") or cur["cui"], *cur.get("synonyms", [])])),
                "semtypes": tuple(cur.get("semtypes", ())),
                "sources": ("OBO",),
                "definition": cur.get("definition"),
                "codes": tuple(("", a) for a in cur.get("alt_ids", ())),
            })
            for p in cur.get("is_a", []):
                edges.append((cur["cui"], p))
        cur = None

    for line in text.splitlines():
        line = line.strip()
        if line == "[Term]":
            flush()
            cur = {"synonyms": [], "is_a": []}
        elif cur is None:
            continue
        elif line.startswith("[") and line.endswith("]"):  # other stanza
            flush()
        elif line.startswith("id:"):
            cur["cui"] = line[3:].strip()
        elif line.startswith("name:"):
            cur["name"] = line[5:].strip()
        elif _SYN_KEY_RE.match(line):
            val = _obo_val(line.split(":", 1)[1])
            if val:
                cur["synonyms"].append(val)
        elif line.startswith("def:"):
            val = _obo_val(line[4:])
            if val:
                cur["definition"] = val
        elif line.startswith("is_a:"):
            m = _ISA_RE.match(line)
            if m:
                cur["is_a"].append(m.group(1))
        elif line.startswith("namespace:"):
            cur.setdefault("semtypes", []).append(
                line[len("namespace:"):].strip())
        elif line.startswith("alt_id:"):
            cur.setdefault("alt_ids", []).append(
                line[len("alt_id:"):].strip())
        elif line.startswith("is_obsolete:") and "true" in line:
            cur["obsolete"] = True
    flush()
    return concepts, edges


def parse_text_terminology(text: str,
                           root: str = "ROOT") -> tuple[list[dict],
                                                        list[tuple[str, str]]]:
    """Tab-indented hierarchy: synonyms separated by ``|``/``;``/``,``;
    CUI/TUI-shaped tokens recognized as codes (ConceptImporter
    .createClass :500-553). Depth is handled with the reference's
    RELATIVE stack (loadText :460-485): ANY deeper line pushes the
    previous class exactly once (an over-indented jump of 2+ tabs still
    nests one level under the previous entry), and a dedent pops
    (prev_depth - depth) frames. One deviation: where the reference
    would crash (EmptyStackException when a dedent pops past the root,
    e.g. a file starting with a tabbed line then an untabbed one), we
    clamp to the root instead."""
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    stack: list[str] = [root]
    last_depth: "int | None" = None
    last_cui: "str | None" = None
    auto = 0
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        depth = len(raw) - len(raw.lstrip("\t"))
        parts = [p.strip() for p in re.split(r"[|;,]", raw.strip()) if p.strip()]
        if not parts:
            continue
        # createClass: the FIRST token is always the class name — even
        # a CUI/TUI-shaped one (the code/semtype recognition applies
        # only to the remaining synonyms, :517-537). A line of just
        # 'C0025202' is a concept NAMED C0025202, never a dropped line
        # (dropping it would also mis-parent its tab-indented children)
        name = parts[0]
        rest = parts[1:]
        cui = next((p for p in rest if _CUI_RE.fullmatch(p)), None)
        tuis = tuple(p for p in rest if _TUI_RE.fullmatch(p))
        names = list(dict.fromkeys(
            [name] + [p for p in rest if p != cui and p not in tuis]))
        if cui is None:
            auto += 1
            cui = f"TX{auto:07d}"
        concepts.append({"cui": cui, "name": names[0],
                         "synonyms": tuple(names), "semtypes": tuis,
                         "sources": ("TXT",)})
        if last_depth is not None:
            if depth > last_depth:
                stack.append(last_cui)
            elif depth < last_depth:
                for _ in range(last_depth - depth):
                    if len(stack) > 1:
                        stack.pop()
        parent = stack[-1]
        if parent != root:
            edges.append((cui, parent))
        last_depth, last_cui = depth, cui
    return concepts, edges


def concepts_df_from_records(spark, concepts: Iterable[dict]):
    from nobletools_spark.session import local_table

    # struct cells as dicts so the Arrow LocalRelation path applies.
    # definition rides along so load -> export round trips reach the
    # ORF/RRF sinks' MRDEF leg (every consumer selects by name)
    rows = [(c["cui"], c["name"], list(c["synonyms"]), list(c["semtypes"]),
             list(c["sources"]),
             [{"sab": s, "code": k} for s, k in c.get("codes", ()) or ()],
             c.get("definition"))
            for c in concepts]
    return local_table(
        spark, rows, "cui string, name string, synonyms array<string>, "
                     "semtypes array<string>, sources array<string>, "
                     "codes array<struct<sab:string, code:string>>, "
                     "definition string")
