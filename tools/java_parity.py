"""Cross-engine parity harness: run the REFERENCE NobleCoder (compiled
from /root/reference with javac) and this Spark engine over IDENTICAL
inputs (one OBO terminology + a directory of .txt documents) and diff
the mention sets — the direct "P/R vs NobleCoder's output" evidence the
north rule asks for, instead of reimplementation goldens alone.

Usage:
    python tools/java_parity.py [n_docs]          # default 60

Steps (all scratch under /tmp):
  1. compile the reference core once (javac -> /tmp/ncls) + RefDriver
  2. emit the shared fixture terminology as OBO + the rich corpus as
     .txt files
  3. java RefDriver -> ref.tsv  (doc, start, end, code, text)
  4. spark annotate() on the same files -> set of the same tuples
  5. print precision / recall / diff samples; write JAVA_PARITY.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from collections import Counter


def _madd(c: Counter, key) -> None:
    """Multiset add: parity legs count DUPLICATE emissions too — a set
    comparison would certify an engine that emits every mention twice
    (or collapses the reference's genuine duplicates) at P=R=1.0."""
    c[key] += 1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"
CLS = "/tmp/ncls"
PATCH = "/tmp/ncls_patch"
CP = (f"{PATCH}:{CLS}:{REF}/src/main/resources:{REF}/lib/jdbm-3.0.jar:"
      f"{REF}/lib/owlapi-distribution-3.5.0.jar")  # resources: .lst tables
DOCS = "/tmp/parity_docs"
OBO = "/tmp/parity_terms.obo"
RRF = "/tmp/parity_rrf"
CTX_OWL = "/tmp/context_fixture.owl"
REF_TSV = "/tmp/parity_ref.tsv"


def compile_reference() -> None:
    drivers = [(f"{CLS}/Ref{n}.class", f"{REPO}/tools/javaref/Ref{n}.java")
               for n in ("Driver", "Extract", "TermTemplate")]
    cls = drivers[0][0]
    fresh = lambda c, s: (os.path.exists(c)
                          and os.path.getmtime(c) >= os.path.getmtime(s))
    if all(fresh(c, s) for c, s in drivers):
        return
    if os.path.exists(cls):   # core compiled: rebuild just the drivers
        for c, s in drivers:
            if not fresh(c, s):
                subprocess.run(["javac", "-encoding", "UTF-8", "-cp", CP,
                                "-d", CLS, s], check=True)
        return
    srcs = subprocess.run(
        ["find", f"{REF}/src/main/java", "-name", "*.java"],
        capture_output=True, text=True, check=True).stdout.split()
    os.makedirs(CLS, exist_ok=True)
    subprocess.run(
        ["javac", "-nowarn", "-encoding", "UTF-8", "-d", CLS, "-cp",
         f"{CP}:{REF}/lib/servlet-2_3.jar", *srcs], check=True)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", CP, "-d", CLS,
         *(s for _c, s in drivers)], check=True)
    # JDBM's mmap defrag uses a cleaner API removed from modern JVMs;
    # shadow JDBMMap with a compact()-as-no-op build ahead on the
    # classpath (only used when the ConText leg persists its lexicon)
    os.makedirs("/tmp/jdbm_patch", exist_ok=True)
    patched = open(f"{REF}/src/main/java/edu/pitt/dbmi/nlp/noble/util/"
                   "JDBMMap.java").read().replace(
        "db.defrag(true);", "// defrag disabled: mmap cleaner API gone")
    open("/tmp/jdbm_patch/JDBMMap.java", "w").write(patched)
    subprocess.run(
        ["javac", "-nowarn", "-encoding", "UTF-8", "-cp",
         f"{CLS}:{REF}/lib/jdbm-3.0.jar", "-d", PATCH,
         "/tmp/jdbm_patch/JDBMMap.java"], check=True)


def emit_fixture(n_docs: int) -> None:
    from nobletools_spark.sources.fixtures import PYTEST_CONCEPTS, rich_corpus

    lines = ["format-version: 1.2", ""]
    # 110 word-disjoint filler concepts: the reference's compact()
    # progress arithmetic floors n/100 and modulos by it — under 100
    # terms it divides by zero, so pad the terminology (fillers never
    # occur in the corpus and, filterTerms being per-concept, they
    # cannot perturb any real word's statistics)
    for i in range(110):
        lines += ["[Term]", f"id: FILL:{i:04d}", f"name: qfiller{i:04d}x",
                  ""]
    for c in PYTEST_CONCEPTS:
        lines += ["[Term]", f"id: {c['cui']}", f"name: {c['name']}"]
        for s in c["synonyms"]:
            if s != c["name"]:
                lines.append(f'synonym: "{s}" EXACT []')
        lines.append("")
    open(OBO, "w").write("\n".join(lines))

    os.makedirs(DOCS, exist_ok=True)
    for f in os.listdir(DOCS):
        os.remove(f"{DOCS}/{f}")
    for doc_id, spans in rich_corpus(n_docs, seed=7):
        text = "".join(t for k, t, _m, _o in spans if k == "text")
        open(f"{DOCS}/{doc_id}.txt", "w").write(text)
    # adversarial seeds: the reference mains' own trap strings plus the
    # NegEx/ConText phrases the round-2 list work added
    for i, text in enumerate(ADVERSARIAL):
        open(f"{DOCS}/zadv-{i:03d}.txt", "w", encoding="utf-8").write(text)
    from tests.test_context import CONTEXT_OWL

    open(CTX_OWL, "w").write(CONTEXT_OWL)
    # same concepts as RRF (MRCONSO/MRSTY) for the RRF-scan parity leg
    from nobletools_spark.sources.rrf import (
        conso_row, sab_row, sty_row, write_fixture_rrf)

    mrconso, mrsty = [], []
    for c in PYTEST_CONCEPTS:
        mrconso.append(conso_row(c["cui"], c["name"], tty="PT", suppress="N"))
        for s in c["synonyms"]:
            if s != c["name"]:
                mrconso.append(conso_row(c["cui"], s, ts="S", ispref="N",
                                         tty="SY", suppress="N"))
        for t in c["semtypes"]:
            mrsty.append(sty_row(c["cui"], t, t))
    write_fixture_rrf(RRF, mrconso=mrconso, mrsty=mrsty, mrrel=[],
                      mrsab=[sab_row("TST", "Test Source", "2025", "t")])


OWL_SRC = "/tmp/parity_terms.owl"
_OWL_BASE = "http://parity.test/terms"


def emit_owl_fixture() -> None:
    """RDF/XML mirror of the fixture concepts for the OWL-scan leg: the
    reference builds this terminology through the REAL OWL-API path
    (OOntology.loadOntology → ConceptImporter.loadOntology:311-413 →
    Concept(IResource):325-399 property-regex arms), the engine through
    parse_owl — rdfs:label carries the preferred name, a declared
    `synonym` annotation property the synonyms, `Semantic_Type` the
    TUIs, and a small subClassOf hierarchy rides along (mentions are
    hierarchy-independent; it exercises the superclass walk)."""
    from xml.sax.saxutils import escape

    from nobletools_spark.sources.fixtures import PYTEST_CONCEPTS

    frags = [
        '<?xml version="1.0"?>',
        f'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        f'         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        f'         xmlns:owl="http://www.w3.org/2002/07/owl#"',
        f'         xmlns:t="{_OWL_BASE}#"',
        f'         xml:base="{_OWL_BASE}">',
        f'  <owl:Ontology rdf:about="{_OWL_BASE}"/>',
        f'  <owl:AnnotationProperty rdf:about="{_OWL_BASE}#synonym"/>',
        f'  <owl:AnnotationProperty rdf:about="{_OWL_BASE}#Semantic_Type"/>',
    ]
    # the two word-overlap families get a parent, everything else is root
    parents = {"C001": "C003", "C007": "C004"}
    for c in PYTEST_CONCEPTS:
        frags.append(f'  <owl:Class rdf:about="{_OWL_BASE}#{c["cui"]}">')
        frags.append(f'    <rdfs:label>{escape(c["name"])}</rdfs:label>')
        for s in c["synonyms"]:
            if s != c["name"]:
                frags.append(f"    <t:synonym>{escape(s)}</t:synonym>")
        for t in c["semtypes"]:
            frags.append(f"    <t:Semantic_Type>{t}</t:Semantic_Type>")
        if c["cui"] in parents:
            frags.append(f'    <rdfs:subClassOf rdf:resource='
                         f'"{_OWL_BASE}#{parents[c["cui"]]}"/>')
        frags.append("  </owl:Class>")
    # hierarchy-only classes for the owl-hierarchy leg (labels never
    # occur in the corpus, so the mention leg is untouched): a plain
    # child, an intersection-defined class (named parent + restriction),
    # and a union-defined class
    frags.append(f'''\
  <owl:ObjectProperty rdf:about="{_OWL_BASE}#hasQfeature"/>
  <owl:Class rdf:about="{_OWL_BASE}#H100">
    <rdfs:label>Qhier basex</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H101">
    <rdfs:label>Qhier valuex</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H102">
    <rdfs:label>Qhier definedx</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <owl:Class rdf:about="{_OWL_BASE}#H100"/>
          <owl:Restriction>
            <owl:onProperty rdf:resource="{_OWL_BASE}#hasQfeature"/>
            <owl:someValuesFrom rdf:resource="{_OWL_BASE}#H101"/>
          </owl:Restriction>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H103">
    <rdfs:label>Qhier unionx</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:unionOf rdf:parseType="Collection">
          <owl:Class rdf:about="{_OWL_BASE}#H104"/>
          <owl:Class rdf:about="{_OWL_BASE}#H105"/>
        </owl:unionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H104">
    <rdfs:label>Qhier leftx</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H105">
    <rdfs:label>Qhier rightx</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H106">
    <rdfs:label>Qhier plainx</rdfs:label>
    <rdfs:subClassOf rdf:resource="{_OWL_BASE}#H100"/>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H107">
    <rdfs:label>Qhier fillerx</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <owl:Class rdf:about="{_OWL_BASE}#H100"/>
          <owl:Restriction>
            <owl:onProperty rdf:resource="{_OWL_BASE}#hasQfeature"/>
            <owl:someValuesFrom>
              <owl:Class>
                <owl:intersectionOf rdf:parseType="Collection">
                  <owl:Class rdf:about="{_OWL_BASE}#H101"/>
                  <owl:Class rdf:about="{_OWL_BASE}#H104"/>
                </owl:intersectionOf>
              </owl:Class>
            </owl:someValuesFrom>
          </owl:Restriction>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H108">
    <rdfs:label>Qhier disjunctx</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:unionOf rdf:parseType="Collection">
          <owl:Class>
            <owl:intersectionOf rdf:parseType="Collection">
              <owl:Class rdf:about="{_OWL_BASE}#H100"/>
              <owl:Class rdf:about="{_OWL_BASE}#H101"/>
            </owl:intersectionOf>
          </owl:Class>
          <owl:Class rdf:about="{_OWL_BASE}#H105"/>
        </owl:unionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="{_OWL_BASE}#H109">
    <rdfs:label>Qhier deepx</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <owl:Class rdf:about="{_OWL_BASE}#H100"/>
          <owl:Class>
            <owl:intersectionOf rdf:parseType="Collection">
              <owl:Class rdf:about="{_OWL_BASE}#H104"/>
              <owl:Class rdf:about="{_OWL_BASE}#H105"/>
            </owl:intersectionOf>
          </owl:Class>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>''')
    frags.append("</rdf:RDF>")
    open(OWL_SRC, "w").write("\n".join(frags))


ADVERSARIAL = (
    "The nasal septum deviates to the left with a rather large spur.",
    "There is a fish under the sea. I had a genetic test done using a "
    "FISH method. WHERE ARE ALL OF THE FISH?",
    "He has DCIS as a diagnosis. What about dcis?",
    "The deep margin and the deep tumor margins were examined.",
    "Septum of the nose deviates; nasal septum noted.",
    "Stage IV melanoma; stage iv was confirmed.",
    "World Health Organization (WHO) criteria applied. WHO grade given.",
    "No evidence of melanoma. Melanoma was ruled out.",
    "Never developed melanoma. Rules her out for melanoma.",
    "No evidence of margins as a cause for melanoma.",
    "Melanoma cannot be evaluated. No change in melanoma.",
    "W/o evidence of melanoma. Without evidence of margins.",
    "Free of melanoma but margins are unlikely.",
    "Skin margin of the deep skin margins; the skin of the margin.",
    "History of melanoma. No evidence of nasal septum deviation but "
    "melanoma was seen.",
    "Protégé software was used for the ontology review.",
    "MELANOMA MELANOMA melanoma Melanoma.",
    "The deep    margin  has   extra   spacing between words.",
    "melanoma",
    "Tumor stage: stage iv. PART 1: melanoma. PARTS 2 AND 3: margins.",
    "Margins ( )  involved  (X)  not involved",
    "**NAME[Case-3] reviewed by **DATE[Jan 5 2020] 1200 melanoma",
    "Churches and churches; a church. Fish under the FISH method.",
    # r5 additions: tokenizer/punctuation/ConText classes not yet pinned
    "The deep-margin area and nasal-septum were reviewed.",
    "melanoma/margin involvement; w/ melanoma present.",
    "The melanoma's margins were clear; the church's fish.",
    "Findings:melanoma,margins;nasal septum.Deep margin!",
    "The nasal\nseptum shows deviation. Deep\nmargin noted.",
    "—Melanoma— and “margins” with ‘fish’.",
    "No increase in melanoma. Not ruled out for margins.",
    "No evidence of melanoma but margins are involved.",
    "Possible melanoma. Findings suggestive of malignant melanoma.",
    "Dr. Smith vs. Dr. Jones: melanoma e.g. margins, i.e. fish.",
    "MeLaNoMa and MARGINS and fIsH were written oddly.",
    "Stage IX confirmed; stage xvi noted. Malignant tiny dark melanoma. "
    "melanoma2 margins3 final diagnosis margins",
    "Windows line\r\nendings: melanoma seen.\r\nMargins\r\nare clear.",
    "Tab\tseparated\tmelanoma\tand\tmargins\there.",
    "   ",
    "... ;;; !!! ??? ((( ))) --- melanoma.",
    "Pneumonoultramicroscopicsilicovolcanoconiosislike melanoma margins "
    "supercalifragilisticexpialidocious fish",
    "",
    "\n",
    "Trailing whitespace line: melanoma.\n   ",
    # wave 3: matcher / ConText / acronym edge semantics
    "No evidence of alpha beta gamma delta epsilon zeta eta melanoma.",
    "No suspicious change noted but no melanoma.",
    "Melanoma is unlikely. The patient is melanoma free today.",
    "Deep Margin (DM) was measured. DM and dm were compared.",
    "Random access memory (RAM) helps. RAM again; ram too.",
    "deep margin skin margin deep margins skin",
    "stage i noted; stage v given; stage ivx odd; stages iv plural; "
    "stage iv4 glued.",
    "malignant very large melanoma and malignant tiny melanoma.",
    "The nasal. Septum is separate. Malignant. Melanoma split.",
    "melanoma melanoma melanoma melanoma melanoma melanoma melanoma "
    "melanoma melanoma melanoma melanoma melanoma melanoma melanoma",
    "(X) melanoma ( ) margins [X] fish [ ] church",
    "MELANOMA: present. MARGINS: clear. FISH: pending.",
    # wave 5: temporality / experiencer / hypothetical ConText axes
    "History of melanoma. Family history of margins.",
    "Mother had melanoma; his brother has involved margins.",
    "If melanoma develops, the margins will be rechecked.",
    "History of melanoma but current melanoma is present.",
    # wave 6: report-sink traps — markup-hostile text (the reference
    # emits it raw, the engine escapes; the leg parsers unescape both),
    # a Header sentence above a coded mention (bold + no-label branch),
    # and an acronym that is later negated (N-prefix + #994d00 color)
    "Melanoma & margins <deep> noted; margins > 2 mm.",
    "FINAL DIAGNOSIS:  Melanoma of the skin.\n\nThe deep margin "
    "is clear.",
    "World Health Organization (WHO) criteria. No WHO grade was "
    "assigned.",
)


def run_reference(mode: str | None = None,
                  method: str = "-", term_src: str = OBO) -> "Counter":
    """mode: None (mentions only) | 'context' | 'negex'."""
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    cmd = ["java", "-cp", CP, "RefDriver", term_src, DOCS, REF_TSV, method]
    if mode == "context":
        cmd += [CTX_OWL]
    elif mode == "negex":
        cmd += ["negex"]
    subprocess.run(cmd, check=True, capture_output=True)
    out = Counter()
    for line in open(REF_TSV):
        doc, st, en, code, _text, mods, score = \
            (line.rstrip("\n").split("\t") + ["", "0"])[:7]
        key = (doc[:-4], int(st), int(en), code,
               round(float(score or 0), 6))
        if mode is not None:
            key += (tuple(sorted(m for m in mods.split(";") if m)),)
        _madd(out, key)
    return out


def run_spark(spark, mode: str | None = None,
              method: str | None = None, term_src: str = OBO) -> set:
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.sources.fixtures import SPANS_DDL

    compact = method == "compact"
    cfg = MatchConfig(compacted=True) if compact else (
        MatchConfig() if method is None else
        MatchConfig(search_method=method))
    ctx = context_index_from_owl(open(CTX_OWL).read()) \
        if mode == "context" else None
    if compact:
        from nobletools_spark.api import NobleCoderSpark as NC
        from nobletools_spark.index import build_index_df
        from nobletools_spark.sources.obo import (
            concepts_df_from_records, parse_obo)

        concepts, _ = parse_obo(open(term_src).read())
        idx = build_index_df(spark, concepts_df_from_records(spark, concepts),
                             compact=True)
        nc = NC(idx, cfg, ctx)
    elif term_src.endswith(".obo"):
        nc = NobleCoderSpark.from_obo(spark, open(term_src).read(), cfg=cfg,
                                      context=ctx)
    elif term_src.endswith(".owl"):
        nc = NobleCoderSpark.from_owl(spark, open(term_src).read(), cfg=cfg,
                                      context=ctx)
    else:
        nc = NobleCoderSpark.from_rrf(spark, term_src, cfg=cfg, context=ctx)
    rows = []
    for fn in sorted(os.listdir(DOCS)):
        rows.append((fn[:-4],
                     [("text", open(f"{DOCS}/{fn}",
                                    encoding="utf-8").read(), None, 0)]))
    docs = spark.createDataFrame(rows, SPANS_DDL)
    out = Counter()
    for r in nc.annotate(docs, negex=(mode == "negex")).collect():
        key = (r.doc_id, r.start, r.end, r.cui, round(r.score, 6))
        if mode is not None:
            key += (tuple(sorted(f"{k}={v}"
                                 for k, v in r.modifiers.items())),)
        _madd(out, key)
    return out


def _reference_hierarchy(src: str, out_file: str) -> "Counter":
    """Run RefDriver's hierarchy dump over ``src`` and parse the
    deduplicated EDGE/ROOT TSV (relations are SETS in the reference
    storage, so both sides compare deduplicated rows)."""
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    subprocess.run(
        ["java", "-cp", CP, "RefDriver", src, DOCS, out_file, "hierarchy"],
        check=True, capture_output=True)
    out = Counter()
    for row in {tuple(ln.rstrip("\n").split("\t"))
                for ln in open(out_file) if ln.strip()}:
        _madd(out, row)
    return out


def run_reference_owl_hierarchy() -> "Counter":
    """Structure of the OWL-built terminology as the REFERENCE stores
    it: Broader relations written by ConceptImporter.loadOntology
    (:377-379, via the StructuralReasoner's getDirectSuperClasses) and
    the root map (:394-395)."""
    return _reference_hierarchy(OWL_SRC, "/tmp/parity_hier.tsv")


def run_local_owl_hierarchy() -> "Counter":
    """parse_owl edges (defaults: intersection parents on, union
    children off — the structural-reasoner contract) + default_roots
    over the same RDF/XML."""
    from nobletools_spark.sources.owl import parse_owl
    from nobletools_spark.sources.sinks import default_roots

    concepts, edges = parse_owl(open(OWL_SRC).read())
    out = Counter()
    for child, parent in set(edges):
        _madd(out, ("EDGE", child, parent))
    for r in set(default_roots(concepts, edges)):
        _madd(out, ("ROOT", r))
    return out


RRF_HIER = "/tmp/parity_rrf_hier"


def emit_rrf_hier_fixture(path: str | None = None) -> None:
    """MRREL-bearing RRF fixture for the rrf-hierarchy leg: PAR/CHD/RB/
    RN direction + dedup, the ignored relation types, a dangling
    endpoint, an SRC-only↔SRC-only mapping (skipped as useless,
    ConceptImporter.java:1136-1141), a self edge, and the SRC ``V-*``
    root convention (:833 candidates, :1169-1177 root iff it acquired a
    NARROWER relation). Names are corpus-disjoint; the leg never runs
    the coder. ``tests/test_sources.py`` reuses this exact fixture (via
    ``path``) so the unit test and the parity leg pin the same rows."""
    from nobletools_spark.sources.rrf import (
        conso_row, rel_row, sab_row, sty_row, write_fixture_rrf)

    mrconso = [
        conso_row("C900", "Qroot sourcex", sab="SRC", code="V-TST",
                  suppress="N"),
        conso_row("C901", "Qalpha nodex", suppress="N"),
        conso_row("C902", "Qbeta nodex", suppress="N"),
        conso_row("C903", "Qgamma nodex", suppress="N"),
        conso_row("C904", "Qdelta nodex", suppress="N"),
        conso_row("C905", "Qsrconly leftx", sab="SRC", code="V-LEFT",
                  suppress="N"),
        conso_row("C906", "Qsrconly rightx", sab="SRC",
                  code="V-RIGHT", suppress="N"),
    ]
    mrsty = [sty_row(c, "T047", "Disease or Syndrome")
             for c in ("C901", "C902", "C903", "C904")]
    mrrel = [
        rel_row("C901", "PAR", "C900"),   # root candidate gains a child
        rel_row("C902", "PAR", "C901"),
        rel_row("C901", "CHD", "C903"),   # inverse form: C903 ⊑ C901
        rel_row("C903", "RB", "C901"),    # duplicate of the above via RB
        rel_row("C904", "RN", "C902"),    # RN: C902 ⊑ C904
        rel_row("C901", "RO", "C902"),    # ignored relation type
        rel_row("C901", "PAR", "C999"),   # dangling endpoint → dropped
        rel_row("C905", "PAR", "C906"),   # SRC-only↔SRC-only → skipped
        rel_row("C901", "PAR", "C901"),   # self edge → skipped
    ]
    write_fixture_rrf(path or RRF_HIER, mrconso=mrconso, mrsty=mrsty,
                      mrrel=mrrel,
                      mrsab=[sab_row("TST", "Test Source", "2025", "t")])


def run_reference_rrf_hierarchy() -> "Counter":
    return _reference_hierarchy(RRF_HIER, "/tmp/parity_hier_rrf.tsv")


def run_local_rrf_hierarchy(spark) -> "Counter":
    from nobletools_spark.sources.rrf import load_rrf

    t = load_rrf(spark, RRF_HIER)
    out = Counter()
    for r in t["relations"].collect():
        _madd(out, ("EDGE", r["cui"], r["parent"]))
    for r in t["roots"].collect():
        _madd(out, ("ROOT", r["cui"]))
    return out


def run_reference_obo_hierarchy() -> "Counter":
    """Same hierarchy dump over the is_a-bearing OBO (the termtemplate
    fixture): loadOBO marks a concept root iff it carries no BROADER
    relation at import (ConceptImporter.java:112-114). Every is_a
    target in the fixture is a defined [Term] — the engine's
    ghost-root allowance (an undefined is_a target still owns its
    subtree, sinks.default_roots) is a documented deviation the
    reference cannot express, so it stays out of the comparison."""
    return _reference_hierarchy(TT_OBO, "/tmp/parity_hier_obo.tsv")


def run_local_obo_hierarchy() -> "Counter":
    from nobletools_spark.sources.obo import parse_obo
    from nobletools_spark.sources.sinks import default_roots

    concepts, edges = parse_obo(open(TT_OBO).read())
    out = Counter()
    for child, parent in set(edges):
        _madd(out, ("EDGE", child, parent))
    for r in set(default_roots(concepts, edges)):
        _madd(out, ("ROOT", r))
    return out


def run_reference_docproc() -> set:
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    subprocess.run(["java", "-cp", CP, "RefDriver", OBO, DOCS, REF_TSV,
                    "-", "docproc"], check=True, capture_output=True)
    out = Counter()
    for line in open(REF_TSV):
        doc, off, typ, sec = (line.rstrip("\n").split("\t") + [""])[:4]
        _madd(out, (doc[:-4], int(off), typ, sec))
    return out


def run_local_docproc() -> set:
    """Sentence boundaries, types, and section assignment from the SAME
    kernel the Spark UDF calls (functions/docproc) — mention offsets pin
    segmentation where mentions exist; this leg pins it everywhere."""
    from nobletools_spark.functions import docproc

    out = Counter()
    for fn in sorted(os.listdir(DOCS)):
        if not fn.endswith(".txt"):
            continue
        text = open(f"{DOCS}/{fn}", encoding="utf-8").read()
        parsed = docproc.process_document_text(text, 0)
        secs = sorted(parsed.sections, key=lambda s: s.title_offset)
        for _t, off, typ in parsed.sentences:
            title = ""
            for s in secs:
                if s.title_offset <= off:
                    title = s.title
                else:
                    break
            _madd(out, (fn[:-4], off, typ, title))
    return out


# ---------------------------------------------------------------------------
# InformationExtractor leg: one shared .template (items + embedded
# terminology), a synoptic-report corpus, RefExtract vs extract_matrix,
# compared CELL for CELL on the CSVExporter result matrix.
# ---------------------------------------------------------------------------

EXT_DOCS = "/tmp/parity_extract_docs"
EXT_TEMPLATE = "/tmp/parity_extract.template"
EXT_OUT = "/tmp/parity_extract_out"

EXTRACT_TEMPLATE_XML = """\
<Template name="parity-synoptic" version="1.0">
  <Description>cross-engine extraction parity fixture</Description>
  <TemplateItems>
    <TemplateItem type="diagnosis" value.domain="trigger" concept="C301">
      <AttributeValues>
        <Attribute><TemplateItem concept="C310"/></Attribute>
        <Values>
          <TemplateItem concept="C311"/>
          <TemplateItem concept="C312"/>
        </Values>
      </AttributeValues>
    </TemplateItem>
    <TemplateItem type="finding" value.domain="value" concept="C320">
      <Values><TemplateItem concept="C326"/></Values>
      <Units><TemplateItem concept="C332"/></Units>
    </TemplateItem>
    <TemplateItem type="finding" value.domain="value" concept="C330"/>
    <TemplateItem value.domain="self" concept="C340"/>
    <TemplateItem type="finding" concept="C350"/>
    <TemplateItem type="finding" concept="C361">
      <Feature>
        <TemplateItem concept="C362">
          <Modifiers><TemplateItem concept="C363"/></Modifiers>
        </TemplateItem>
      </Feature>
      <Modifiers><TemplateItem concept="C363"/></Modifiers>
      <Units><TemplateItem concept="C332"/></Units>
    </TemplateItem>
    <TemplateItem type="finding" concept="C302">
      <Filters><Filter type="section">FINAL DIAGNOSIS:</Filter></Filters>
    </TemplateItem>
    <TemplateItem type="finding" concept="C303">
      <Filters><Filter type="section">COMMENT:[-1]</Filter></Filters>
    </TemplateItem>
  </TemplateItems>
  <Terminology name="parity-extract-terms">
    <Concepts>
      {concepts}
    </Concepts>
  </Terminology>
</Template>
"""

EXTRACT_CONCEPTS = (
    # (code, name, [synonyms], [broader])
    ("C300", "Neoplastic Process", ["neoplastic process"], []),
    ("C301", "Melanoma", ["melanoma"], ["C300"]),
    ("C302", "Superficial Spreading Melanoma",
     ["superficial spreading melanoma"], ["C301"]),
    ("C303", "Nodular Melanoma", ["nodular melanoma"], ["C301"]),
    ("C310", "Histologic Type", ["histologic type"], []),
    ("C311", "Epithelioid Cell Type", ["epithelioid"], ["C310"]),
    ("C312", "Spindle Cell Type", ["spindle cell"], ["C310"]),
    ("C320", "Breslow Depth", ["breslow depth"], []),
    ("C326", "Numeric Value", ["/[0-9]+\\.[0-9]+/"], []),
    ("C332", "Millimeter", ["mm", "millimeters"], []),
    ("C330", "Mitotic Grade", ["mitotic grade"], []),
    ("C331", "Grade Three of Three", ["grade 3 of 3"], ["C330"]),
    ("C340", "Surgical Margin", ["margin", "margins"], []),
    ("C341", "Involved Margin", ["involved margins"], ["C340"]),
    ("C342", "Clear Margin", ["clear margins"], ["C340"]),
    ("C350", "Tumor Ulceration", ["ulceration"], []),
    ("C361", "Brisk Mitotic Activity", ["brisk mitotic activity"], []),
    ("C362", "Mitotic Figures", ["mitotic figures"], []),
    ("C363", "Brisk", ["brisk"], []),
)

_FD, _GD, _CM = "FINAL DIAGNOSIS:", "GROSS DESCRIPTION:", "COMMENT:"

EXTRACT_DOCS = (
    # trigger domain: satisfied / unsatisfied / negated-still-satisfied
    ("e000", {_FD: ["Superficial spreading melanoma with epithelioid "
                    "features is seen."]}),
    ("e001", {_FD: ["Melanoma is identified."]}),
    ("e002", {_FD: ["Nodular melanoma with spindle cell change."]}),
    ("e020", {_FD: ["No evidence of melanoma with epithelioid features."]}),
    # value domain: values + units, decimals, dedup
    ("e003", {_GD: ["Breslow depth is 3.5 mm."]}),
    ("e004", {_GD: ["Breslow depth measured 0.8 mm in thickness."]}),
    ("e021", {_GD: ["Breslow depth is 3.5 mm and again 3.5 mm."]}),
    # per-annotation value parsing via a strict descendant mention
    ("e005", {_GD: ["Mitotic grade was grade 3 of 3."]}),
    # boolean finding: negation -> absent
    ("e006", {_FD: ["No evidence of ulceration."]}),
    ("e007", {_FD: ["Ulceration is identified."]}),
    # self domain + addInstance merge semantics
    ("e008", {_GD: ["Clear margins are noted."]}),
    ("e009", {_GD: ["Clear margins are noted.", "The margin was "
                    "examined."]}),
    ("e010", {_GD: ["Involved margins are seen.", "Clear margins are "
                    "noted."]}),
    # feature second pass: equal components / bare feature / extra unit
    ("e011", {_GD: ["Mitotic figures are brisk."]}),
    ("e012", {_GD: ["Mitotic figures are seen."]}),
    ("e013", {_GD: ["Mitotic figures are brisk measuring 2.1 mm."]}),
    ("e014", {_GD: ["Brisk mitotic activity is present."]}),
    # section filters + sentence ranges
    ("e016", {_CM: ["Nodular melanoma is seen.", "This was reviewed.",
                    "Nodular melanoma persists."]}),
    ("e017", {_CM: ["This was reviewed.", "Nodular melanoma persists."]}),
    ("e018", {_FD: ["Superficial spreading melanoma is seen."],
              _GD: ["Superficial spreading melanoma involves the "
                    "margin."]}),
    ("e019", {_GD: ["Superficial spreading melanoma is present."]}),
    # empty + combined synoptic documents
    ("e022", {_FD: ["The specimen was received fresh."]}),
    ("e023", {_FD: ["Superficial spreading melanoma with epithelioid "
                    "features.", "No evidence of ulceration."],
              _GD: ["Breslow depth is 1.2 mm.", "Clear margins are "
                    "noted.", "Mitotic figures are brisk."],
              _CM: ["Nodular melanoma is seen.", "Margins were "
                    "rechecked."]}),
    ("e024", {_GD: ["Mitotic grade was grade 3 of 3.",
                    "Involved margins are seen."],
              _CM: ["This case was discussed.", "Nodular melanoma is "
                    "favored.", "Final review is pending."]}),
    # r5 wave: multi-value attributes, integer-vs-decimal values, value
    # position, multiple values, unit synonyms, negated/hedged triggers,
    # both subsumed selves in one sentence, bare modifier, filter
    # cross-section interplay
    ("e025", {_FD: ["Melanoma with epithelioid and spindle cell "
                    "features."]}),
    ("e026", {_GD: ["Breslow depth is 3 mm."]}),
    ("e027", {_GD: ["A 3.5 mm Breslow depth was noted."]}),
    ("e028", {_GD: ["Breslow depth is 3.5 mm, previously 2.0 mm."]}),
    ("e029", {_GD: ["Breslow depth is 4.5 millimeters."]}),
    ("e030", {_FD: ["Possible melanoma with spindle cell features."],
              _GD: ["Breslow depth of 1.1 mm was not identified."]}),
    ("e031", {_GD: ["Involved margins and clear margins are noted.",
                    "Brisk was noted."]}),
    ("e032", {_GD: ["Mitotic grade was high.",
                    "Superficial spreading melanoma with epithelioid "
                    "features."]}),
    ("e033", {_FD: ["Nodular melanoma is seen."],
              _CM: ["Nodular melanoma is also here.",
                    "Nodular melanoma closes the comment."]}),
    # wave 4: addInstance replace-in-place vs sibling-append positions,
    # cross-sentence attributes, negated attributes, sibling triggers
    ("e034", {_GD: ["Margins noted.", "Clear margins seen.",
                    "Involved margins found."]}),
    ("e035", {_FD: ["Melanoma is seen.",
                    "Epithelioid features are present."]}),
    ("e036", {_FD: ["Melanoma without epithelioid features, with "
                    "spindle cell change."]}),
    ("e037", {_GD: ["The margin was examined.",
                    "Involved margins are seen.",
                    "The margin was reviewed again."]}),
    ("e038", {_FD: ["Nodular melanoma and superficial spreading "
                    "melanoma are both seen."]}),
)


def emit_extract_fixture() -> None:
    frags = []
    for code, name, syns, broader in EXTRACT_CONCEPTS:
        terms = [f'<Term preferred="true">{name}</Term>']
        terms += [f"<Term>{s}</Term>" for s in syns
                  if s.lower() != name.lower()]
        rel = (f'<Relations><Relation name="Broader">'
               f'{",".join(broader)}</Relation></Relations>'
               if broader else "")
        frags.append(f'<Concept code="{code}" name="{name}">'
                     f'{"".join(terms)}{rel}</Concept>')
    xml = EXTRACT_TEMPLATE_XML.format(concepts="\n      ".join(frags))
    open(EXT_TEMPLATE, "w").write(xml)
    os.makedirs(EXT_DOCS, exist_ok=True)
    for f in os.listdir(EXT_DOCS):
        os.remove(f"{EXT_DOCS}/{f}")
    for doc_id, sections in EXTRACT_DOCS:
        parts = [f"{title} {' '.join(sents)}\n"
                 for title, sents in sections.items()]
        open(f"{EXT_DOCS}/{doc_id}.txt", "w").write("\n".join(parts))
    from tests.test_context import CONTEXT_OWL

    open(CTX_OWL, "w").write(CONTEXT_OWL)


def _matrix_to_cells(header: list, rows: list) -> set:
    """(doc, question, cell) triples for every NON-empty cell, plus a
    (doc, '#cols', n) guard so layout mismatches surface."""
    out = Counter()
    for row in rows:
        doc = row[0].removesuffix(".txt")
        _madd(out, (doc, "#cols", str(len(row))))
        for q, cell in zip(header[1:], row[1:]):
            if cell:
                _madd(out, (doc, q, cell))
    return out


def run_reference_extract() -> set:
    import shutil
    shutil.rmtree("/tmp/noble_terms_ext", ignore_errors=True)
    shutil.rmtree(EXT_OUT, ignore_errors=True)
    subprocess.run(
        ["java", "-cp", CP, "RefExtract", EXT_TEMPLATE, EXT_DOCS, EXT_OUT,
         CTX_OWL], check=True, capture_output=True)
    lines = [ln.rstrip("\n").split("\t")
             for ln in open(f"{EXT_OUT}/RESULTS.tsv") if ln.strip()]
    return _matrix_to_cells(lines[0], lines[1:])


def run_spark_extract(spark) -> set:
    from nobletools_spark.index import build_index
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.operators.extract_kernel import (
        extract_matrix, template_spec_from_xml)
    from nobletools_spark.sources.fixtures import SPANS_DDL

    xml = open(EXT_TEMPLATE).read()
    spec = template_spec_from_xml(xml)
    idx = build_index(spec.concept_records())
    ctx = context_index_from_owl(open(CTX_OWL).read())
    rows = []
    for fn in sorted(os.listdir(EXT_DOCS)):
        rows.append((fn[:-4],
                     [("text", open(f"{EXT_DOCS}/{fn}",
                                    encoding="utf-8").read(), None, 0)]))
    docs = spark.createDataFrame(rows, SPANS_DDL)
    res = extract_matrix(docs, idx, spec,
                         cfg=MatchConfig(select_best_candidate=False),
                         context=ctx)
    header = res.columns
    out_rows = [[r[c] for c in header] for r in res.collect()]
    return _matrix_to_cells(header, out_rows)


# ---------------------------------------------------------------------------
# TemplateFactory.importTerminologyTemplate leg: build a PERSISTED
# terminology from one OBO (hierarchy included), let the reference's
# actual importTerminologyTemplate enumerate the root concepts into
# finding/self items, replay the InformationExtractor loop over the
# extract corpus, and compare the result matrix cell-for-cell with
# template_from_terminology + extract_matrix on the same OBO.
# ---------------------------------------------------------------------------

TT_OBO = "/tmp/paritytt.obo"     # stem doubles as the terminology name
TT_OUT = "/tmp/parity_tt_out"


def emit_termtemplate_fixture() -> None:
    """OBO mirror of EXTRACT_CONCEPTS: is_a edges carry the hierarchy, so
    the roots the factory enumerates are the broader-less concepts (the
    reference marks a concept root iff it has no BROADER relation at
    import, ConceptImporter.java:112-114; every is_a target here is a
    defined [Term], so the engine's ghost-root allowance is moot)."""
    lines = ["format-version: 1.2", ""]
    for code, name, syns, broader in EXTRACT_CONCEPTS:
        lines += ["[Term]", f"id: {code}", f"name: {name}"]
        for s in syns:
            if s.lower() != name.lower():
                lines.append(f'synonym: "{s}" EXACT []')
        for b in broader:
            lines.append(f"is_a: {b}")
        lines.append("")
    # hierarchy-only trap stanzas (names corpus-disjoint): a part_of
    # relationship (generic relation in the reference — Relation
    # .getRelation("part_of") is NOT Broader, ConceptImporter.java:
    # 242-250 — so the concept stays a ROOT), an alt_id + namespace
    # carrier, and an obsolete child (dropped with its is_a edge)
    # NOTE: the obsolete stanza must not be LAST — the reference's
    # loadOBO does a final `list.put(c.getCode(), c)` after the loop
    # (ConceptImporter.java:271) with c nulled by is_obsolete → NPE.
    # A file ending in an obsolete term crashes the reference importer.
    lines += [
        "[Term]", "id: C392", "name: Qobo obsx", "is_a: C301",
        "is_obsolete: true", "",
        "[Term]", "id: C390", "name: Qobo partx",
        "relationship: part_of C301 ! melanoma", "",
        "[Term]", "id: C391", "name: Qobo altx", "alt_id: C390X",
        "namespace: qobo_space", "is_a: C301 ! melanoma", "",
    ]
    open(TT_OBO, "w").write("\n".join(lines))


def run_reference_termtemplate() -> "Counter":
    import shutil
    shutil.rmtree("/tmp/noble_terms_tt", ignore_errors=True)
    shutil.rmtree(TT_OUT, ignore_errors=True)
    subprocess.run(
        ["java", "-cp", CP, "RefTermTemplate", TT_OBO, EXT_DOCS, TT_OUT,
         CTX_OWL], check=True, capture_output=True)
    lines = [ln.rstrip("\n").split("\t")
             for ln in open(f"{TT_OUT}/RESULTS.tsv") if ln.strip()]
    return _matrix_to_cells(lines[0], lines[1:])


def run_spark_termtemplate(spark) -> "Counter":
    from nobletools_spark.index import build_index
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.operators.extract_kernel import (
        ItemSpec, TemplateSpec, extract_matrix)
    from nobletools_spark.operators.templates import (
        template_from_terminology)
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.obo import parse_obo

    concepts, edges = parse_obo(open(TT_OBO).read())
    t_rows, _masks, _types = template_from_terminology(
        concepts, edges, "paritytt")
    items = tuple(ItemSpec(name=iname, concept=root, item_type="finding",
                           value_domain="self")
                  for _tid, iname, root, _filt, _dom in t_rows)
    crecs = tuple((c["cui"], c["name"], tuple(c["synonyms"]),
                   tuple(c["semtypes"]), tuple(c["sources"]),
                   c.get("definition")) for c in concepts)
    spec = TemplateSpec(name="paritytt", items=items, concepts=crecs,
                        isa_edges=tuple(edges))
    idx = build_index(concepts)
    ctx = context_index_from_owl(open(CTX_OWL).read())
    rows = [(fn[:-4], [("text",
                        open(f"{EXT_DOCS}/{fn}", encoding="utf-8").read(),
                        None, 0)])
            for fn in sorted(os.listdir(EXT_DOCS))]
    docs = spark.createDataFrame(rows, SPANS_DDL)
    res = extract_matrix(docs, idx, spec,
                         cfg=MatchConfig(select_best_candidate=False),
                         context=ctx)
    header = res.columns
    out_rows = [[r[c] for c in header] for r in res.collect()]
    return _matrix_to_cells(header, out_rows)


def ref_triples(ref_mentions: "Counter") -> "Counter":
    """The reference's emitted triple set, derived from its mention
    stream by the same rule the engine's emitters implement (distinct
    doc×concept mention triples; same-doc concept pairs a<b with
    distinct-document counts). Predicate labels are the engine's
    vocabulary constants — the comparison is over the graph structure
    (nodes, edges, doc counts), which is where the two engines can
    disagree."""
    from collections import defaultdict

    docs = defaultdict(set)
    for key in ref_mentions:          # (doc, start, end, code, score)
        docs[key[0]].add(key[3])
    out, pair_docs = Counter(), Counter()
    for d, codes in docs.items():
        sc = sorted(codes)
        for c in sc:
            _madd(out, (d, "mentions-concept", c))
        for i, a in enumerate(sc):
            for b in sc[i + 1:]:
                pair_docs[(a, b)] += 1
    for (a, b), n in pair_docs.items():
        _madd(out, (a, "co-occurs-with", b, n))
    return out


def run_spark_triples(spark) -> "Counter":
    """The engine's ACTUAL triple emitters over the annotated corpus:
    one matcher pass (persisted mentions), then mention_triples +
    cooccurrence_triples(salt_buckets=8) exactly as the pipeline runs
    them."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.operators.triples import (cooccurrence_triples,
                                                    mention_triples)
    from nobletools_spark.sources.fixtures import SPANS_DDL

    nc = NobleCoderSpark.from_obo(spark, open(OBO).read())
    rows = [(fn[:-4], [("text", open(f"{DOCS}/{fn}",
                                     encoding="utf-8").read(), None, 0)])
            for fn in sorted(os.listdir(DOCS))]
    m = nc.annotate(spark.createDataFrame(rows, SPANS_DDL)).persist()
    out = Counter()
    for r in mention_triples(m).select("subj", "pred", "obj").collect():
        _madd(out, (r.subj, r.pred, r.obj))
    for r in cooccurrence_triples(m, salt_buckets=8).collect():
        _madd(out, (r.subj, r.pred, r.obj, r.n_docs))
    m.unpersist()
    return out


def _html_struct(pages: "dict[str, str]") -> "Counter":
    """Structural key multiset from a {doc: report_html} map — the parts
    of HTMLExporter output both engines must agree on, independent of
    attribute order / whitespace / tooltip formatting:

      ("label",  doc, id, word, codes, color)  — one per <label>
      ("bold",   doc, text)                    — Header-sentence bolds
      ("legend", doc, code, name, ids)         — concept legend rows
      ("found",  doc, n)                       — footer mention count

    Documented engine deviations are normalized INTO the reference side
    symmetrically: legend id lists are filtered to ids that render as a
    <label> in the SAME page and deduplicated (the reference lists every
    annotation offset, dead ids included — its own h()/j() would abort
    on them), and rows left with no live id are dropped; label words and
    legend names are entity-unescaped (the engine escapes report text,
    the reference emits it raw)."""
    import re
    from html import unescape

    out = Counter()
    for doc, page in pages.items():
        labels = []
        for attrs, word in re.findall(
                r"<label\b([^>]*)>(.*?)</label>", page, re.S):
            lid = re.search(r'id="([^"]*)"', attrs).group(1)
            color = re.search(r"color:\s*([^;\"]+)", attrs).group(1)
            m = re.search(r"h\(\[(.*?)\]\)", attrs)
            codes = tuple(c.strip().strip("'")
                          for c in m.group(1).split(",")) if m else ()
            labels.append((lid, unescape(word), codes, color))
        rendered = {lab[0] for lab in labels}
        for lab in labels:
            _madd(out, ("label", doc) + lab)
        for text in re.findall(r"<b>(.*?)</b>", page, re.S):
            if text == "Concepts" or re.fullmatch(r"\d+", text):
                continue  # legend header / footer count, not a Header
            _madd(out, ("bold", doc, unescape(text)))
        concepts_pane = page[page.find("<b>Concepts</b>"):]
        for attrs, name in re.findall(
                r"<a\b([^>]*)>(.*?)</a>", concepts_pane, re.S):
            aid = re.search(r'id="([^"]*)"', attrs)
            m = re.search(r"h\(\[(.*?)\]\)", attrs)
            if aid is None or m is None:
                continue
            ids = tuple(dict.fromkeys(
                i for i in (c.strip().strip("'")
                            for c in m.group(1).split(","))
                if i in rendered))
            if ids:
                _madd(out, ("legend", doc, aid.group(1),
                            unescape(name), ids))
        m = re.search(r"found items: <b>(\d+)</b>", page)
        if m:
            _madd(out, ("found", doc, int(m.group(1))))
    return out


def run_reference_html() -> "Counter":
    """HTMLExporter.export(doc, writer) over the shared corpus with the
    shared ConText lexicon, parsed into structural keys."""
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    subprocess.run(["java", "-cp", CP, "RefDriver", OBO, DOCS, REF_TSV,
                    "-", "html", CTX_OWL], check=True, capture_output=True)
    pages: dict[str, str] = {}
    doc = None
    for line in open(REF_TSV, encoding="utf-8"):
        if line.startswith("###DOC\t"):
            doc = line.rstrip("\n").split("\t")[1][:-4]
            pages[doc] = ""
        elif doc is not None:
            pages[doc] += line
    return _html_struct(pages)


def run_local_html(spark) -> "Counter":
    """html_report_df over the same docs/terminology/ConText lexicon."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.obo import (
        concepts_df_from_records, parse_obo)
    from nobletools_spark.sources.sinks import html_report_df

    ctx = context_index_from_owl(open(CTX_OWL).read())
    nc = NobleCoderSpark.from_obo(spark, open(OBO).read(),
                                  cfg=MatchConfig(), context=ctx)
    rows = [(fn[:-4], [("text", open(f"{DOCS}/{fn}",
                                     encoding="utf-8").read(), None, 0)])
            for fn in sorted(os.listdir(DOCS)) if fn.endswith(".txt")]
    docs = spark.createDataFrame(rows, SPANS_DDL)
    mentions = nc.annotate(docs)
    concepts_df = concepts_df_from_records(
        spark, parse_obo(open(OBO).read())[0])
    pages = {r.doc_id: r.html
             for r in html_report_df(docs, mentions, concepts_df).collect()}
    return _html_struct(pages)


def run_reference_csv() -> "Counter":
    """CSVExporter.export(Document) — RESULTS.tsv rows over the shared
    corpus with the shared ConText lexicon. Key = the full row: (doc,
    surface text, code, concept name, semtypes, annotations, 8 modifier
    values). The ``.txt`` title suffix is stripped (doc.getTitle() keeps
    it; the engine keys documents by bare id)."""
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    subprocess.run(["java", "-cp", CP, "RefDriver", OBO, DOCS, REF_TSV,
                    "-", "csv", CTX_OWL], check=True, capture_output=True)
    out = Counter()
    with open(f"{REF_TSV}.d/RESULTS.tsv", encoding="utf-8") as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            row = line.rstrip("\n").split("\t")
            row[0] = row[0][:-4] if row[0].endswith(".txt") else row[0]
            _madd(out, tuple(row))
    return header, out


def run_local_csv(spark) -> "Counter":
    """results_tsv_df over the same docs/terminology/ConText lexicon."""
    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.obo import (
        concepts_df_from_records, parse_obo)
    from nobletools_spark.sources.sinks import results_tsv_df

    ctx = context_index_from_owl(open(CTX_OWL).read())
    nc = NobleCoderSpark.from_obo(spark, open(OBO).read(),
                                  cfg=MatchConfig(), context=ctx)
    rows = [(fn[:-4], [("text", open(f"{DOCS}/{fn}",
                                     encoding="utf-8").read(), None, 0)])
            for fn in sorted(os.listdir(DOCS)) if fn.endswith(".txt")]
    docs = spark.createDataFrame(rows, SPANS_DDL)
    mentions = nc.annotate(docs)
    concepts_df = concepts_df_from_records(
        spark, parse_obo(open(OBO).read())[0])
    tsv = results_tsv_df(mentions, concepts_df)
    out = Counter()
    for r in tsv.collect():
        _madd(out, tuple("" if v is None else str(v) for v in r))
    return tsv.columns, out


def _xhtml_struct(pages: "dict[str, str]") -> "Counter":
    """Structural keys of an Information Extraction report page
    (HTMLExporter.export(TemplateDocument)):

      ("label", doc, id, text, codes, color)   — report + cap labels
      ("bold",  doc, text)                     — Header-sentence bolds
      ("capq",  doc, th_text)                  — cap-table row names
      ("h3",    doc, text)                     — template / title h3s
      ("found", doc, n)                        — footer count

    Numbers in the row <font> cells are excluded (the reference's row
    order follows a HashMap keySet); words/names entity-unescape on
    both sides."""
    import re
    from html import unescape

    def strip_tags(x: str) -> str:
        return re.sub(r"<[^>]+>", "", x).strip()

    out = Counter()
    for doc, page in pages.items():
        for attrs, word in re.findall(
                r"<label\b([^>]*)>(.*?)</label>", page, re.S):
            lid = re.search(r'id="([^"]*)"', attrs).group(1)
            color = re.search(r"color:\s*([^;\"]+)", attrs).group(1)
            m = re.search(r"h\(\[(.*?)\]\)", attrs)
            codes = tuple(c.strip().strip("'")
                          for c in m.group(1).split(",")) if m else ()
            _madd(out, ("label", doc, unescape(lid), unescape(word),
                        codes, color))
        for text in re.findall(r"<b>(.*?)</b>", page, re.S):
            # footer numbers: found-items count and the reference's
            # "report process time: <b>-1</b> ms"
            if not re.fullmatch(r"-?\d+", text):
                _madd(out, ("bold", doc, unescape(text)))
        for th in re.findall(r"<th[^>]*>(.*?)</th>", page, re.S):
            _madd(out, ("capq", doc, unescape(strip_tags(th))))
        for h3 in re.findall(r"<h3>(.*?)</h3>", page, re.S):
            _madd(out, ("h3", doc, unescape(strip_tags(h3))))
        m = re.search(r"found items: <b>(\d+)</b>", page)
        if m:
            _madd(out, ("found", doc, int(m.group(1))))
    return out


def run_reference_extract_html() -> "Counter":
    """RefExtract html mode → per-doc reports/<name>.html pages."""
    import shutil
    shutil.rmtree("/tmp/noble_terms_ext", ignore_errors=True)
    shutil.rmtree(EXT_OUT, ignore_errors=True)
    subprocess.run(
        ["java", "-cp", CP, "RefExtract", EXT_TEMPLATE, EXT_DOCS, EXT_OUT,
         CTX_OWL, "html"], check=True, capture_output=True)
    pages = {}
    rep = f"{EXT_OUT}/reports"
    for fn in sorted(os.listdir(rep)):
        if fn.endswith(".html") and fn != "index.html":
            pages[fn[:-5]] = open(f"{rep}/{fn}", encoding="utf-8").read()
    return _xhtml_struct(pages)


def run_local_extract_html(spark) -> "Counter":
    from nobletools_spark.index import build_index
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.context import context_index_from_owl
    from nobletools_spark.operators.extract_kernel import (
        extract_html, template_spec_from_xml)
    from nobletools_spark.sources.fixtures import SPANS_DDL

    xml = open(EXT_TEMPLATE).read()
    spec = template_spec_from_xml(xml)
    idx = build_index(spec.concept_records())
    ctx = context_index_from_owl(open(CTX_OWL).read())
    rows = [(fn[:-4], [("text", open(f"{EXT_DOCS}/{fn}",
                                     encoding="utf-8").read(), None, 0)])
            for fn in sorted(os.listdir(EXT_DOCS)) if fn.endswith(".txt")]
    docs = spark.createDataFrame(rows, SPANS_DDL)
    res = extract_html(docs, idx, spec,
                       cfg=MatchConfig(select_best_candidate=False),
                       context=ctx)
    return _xhtml_struct({r.doc_id: r.html for r in res.collect()})


def compare(ref, eng, label: str) -> dict:
    """Multiset precision/recall: tp counts each key min(ref_n, eng_n)
    times, so duplicate emissions on either side surface as <1.0."""
    ref, eng = Counter(ref), Counter(eng)
    n_ref, n_eng = sum(ref.values()), sum(eng.values())
    tp = sum(min(n, eng[k]) for k, n in ref.items())
    precision = tp / n_eng if n_eng else 0.0
    recall = tp / n_ref if n_ref else 0.0
    print(f"[{label}] reference: {n_ref}  engine: {n_eng}  tp: {tp}"
          f"  precision: {precision:.4f}  recall: {recall:.4f}")
    for side, diff in (("engine-only", eng - ref), ("ref-only", ref - eng)):
        for t in sorted(diff)[:8]:
            print(f"  {side}: {t} (x{diff[t]})")
    return {"ref_mentions": n_ref, "engine_mentions": n_eng,
            "tp": tp, "precision": round(precision, 4),
            "recall": round(recall, 4)}


def main() -> None:
    from nobletools_spark.session import get_spark

    if len(sys.argv) > 1 and sys.argv[1] == "extract":
        # standalone iteration mode: extract leg only, no artifact write
        compile_reference()
        emit_extract_fixture()
        spark = get_spark(cores=8)
        compare(run_reference_extract(), run_spark_extract(spark),
                "extract")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "owl":
        # standalone iteration mode: OWL-scan leg only
        compile_reference()
        emit_fixture(int(sys.argv[2]) if len(sys.argv) > 2 else 60)
        emit_owl_fixture()
        spark = get_spark(cores=8)
        compare(run_reference(term_src=OWL_SRC),
                run_spark(spark, term_src=OWL_SRC), "owl")
        compare(run_reference_owl_hierarchy(),
                run_local_owl_hierarchy(), "owl-hierarchy")
        emit_rrf_hier_fixture()
        compare(run_reference_rrf_hierarchy(),
                run_local_rrf_hierarchy(spark), "rrf-hierarchy")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "html":
        # standalone iteration mode: HTML-report leg only
        compile_reference()
        emit_fixture(int(sys.argv[2]) if len(sys.argv) > 2 else 60)
        spark = get_spark(cores=8)
        compare(run_reference_html(), run_local_html(spark), "html")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "xhtml":
        # standalone iteration mode: extract-report HTML leg only
        compile_reference()
        emit_extract_fixture()
        spark = get_spark(cores=8)
        compare(run_reference_extract_html(),
                run_local_extract_html(spark), "extract-html")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "csv":
        # standalone iteration mode: RESULTS.tsv leg only
        compile_reference()
        emit_fixture(int(sys.argv[2]) if len(sys.argv) > 2 else 60)
        spark = get_spark(cores=8)
        rh, ref = run_reference_csv()
        eh, eng = run_local_csv(spark)
        assert rh == eh, (rh, eh)
        compare(ref, eng, "csv")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "termtemplate":
        # standalone iteration mode: terminology-template leg only
        compile_reference()
        emit_extract_fixture()
        emit_termtemplate_fixture()
        spark = get_spark(cores=8)
        compare(run_reference_termtemplate(),
                run_spark_termtemplate(spark), "termtemplate")
        compare(run_reference_obo_hierarchy(),
                run_local_obo_hierarchy(), "obo-hierarchy")
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    compile_reference()
    emit_fixture(n_docs)
    spark = get_spark(cores=8)
    results = {"n_docs": n_docs, "adversarial_docs": len(ADVERSARIAL)}
    ref_m = run_reference()
    results["mentions"] = compare(ref_m, run_spark(spark), "mentions")
    # triple leg — the north metric stated literally: the (subj, pred,
    # obj) rows the ENGINE'S OWN emitters materialize (mention_triples
    # + salted cooccurrence_triples with doc counts) vs the same
    # derivation rule applied to the REFERENCE's mention stream
    results["triples"] = compare(ref_triples(ref_m),
                                 run_spark_triples(spark), "triples")
    # ConText leg: both engines load the SAME modifier ontology
    # (tests/test_context.py CONTEXT_OWL) and must agree on the full
    # (mention, sorted modifier set) tuples
    results["context"] = compare(run_reference("context"),
                                 run_spark(spark, "context"), "context")
    # NegEx leg: the verbatim .lst phrase lists vs tools/NegEx.java
    results["negex"] = compare(run_reference("negex"),
                               run_spark(spark, "negex"), "negex")
    # RRF scan leg: both engines build the terminology from the SAME
    # MRCONSO/MRSTY fixture directory (preferred-name choice, TS/ISPREF/
    # language/suppress handling all visible in the mention diff)
    results["rrf"] = compare(run_reference(term_src=RRF),
                             run_spark(spark, term_src=RRF), "rrf")
    # OWL scan leg: the same concepts as RDF/XML through the reference's
    # REAL OWL-API load path vs parse_owl
    emit_owl_fixture()
    results["owl"] = compare(run_reference(term_src=OWL_SRC),
                             run_spark(spark, term_src=OWL_SRC), "owl")
    # owl-hierarchy leg: Broader edges + roots as the reference's
    # structural reasoner stores them (intersection-defined classes
    # gain their named conjunct as parent; union members stay roots)
    results["owl-hierarchy"] = compare(run_reference_owl_hierarchy(),
                                       run_local_owl_hierarchy(),
                                       "owl-hierarchy")
    # rrf-hierarchy leg: MRREL direction/dedup/skip rules + the SRC V-*
    # root convention, compared EDGE/ROOT row for row
    emit_rrf_hier_fixture()
    results["rrf-hierarchy"] = compare(run_reference_rrf_hierarchy(),
                                       run_local_rrf_hierarchy(spark),
                                       "rrf-hierarchy")
    # every setupSearch strategy
    for m in ("all-match", "precise-match", "nonoverlap-match",
              "partial-match"):
        results[m] = compare(run_reference(method=m),
                             run_spark(spark, method=m), m)
    # compacted rare-word index (disk-backed import + ignoreUsedWords off)
    results["compact"] = compare(run_reference(method="compact"),
                                 run_spark(spark, method="compact"),
                                 "compact")
    # document-processor leg: sentence boundaries + types + section
    # assignment for EVERY sentence, mentions aside
    results["docproc"] = compare(run_reference_docproc(),
                                 run_local_docproc(), "docproc")
    # InformationExtractor leg: shared .template + synoptic corpus,
    # result-matrix cells compared verbatim (incl. a per-row column-
    # count guard), ConText driven by the shared fixture OWL
    emit_extract_fixture()
    results["extract"] = compare(run_reference_extract(),
                                 run_spark_extract(spark), "extract")
    results["extract"]["n_docs"] = len(EXTRACT_DOCS)
    # terminology-template leg: the factory's root enumeration + the
    # finding/self rendering, driven by the REAL importTerminologyTemplate
    # over a persisted OBO-built terminology
    emit_termtemplate_fixture()
    results["termtemplate"] = compare(run_reference_termtemplate(),
                                      run_spark_termtemplate(spark),
                                      "termtemplate")
    results["termtemplate"]["n_docs"] = len(EXTRACT_DOCS)
    # obo-hierarchy leg: is_a edges + no-Broader roots over the same OBO
    results["obo-hierarchy"] = compare(run_reference_obo_hierarchy(),
                                       run_local_obo_hierarchy(),
                                       "obo-hierarchy")
    # HTML-report leg: HTMLExporter.export structural parity — labels
    # (id/word/codes/color), Header bolds, legend rows, footer counts —
    # with ConText driving the color/N-prefix quirks
    results["html"] = compare(run_reference_html(),
                              run_local_html(spark), "html")
    # RESULTS.tsv leg: CSVExporter.export(Document) row-for-row —
    # surface text, code, concept name, semtypes, annotation renders,
    # all 8 modifier values — with the header line asserted equal
    rh, ref_csv = run_reference_csv()
    eh, eng_csv = run_local_csv(spark)
    assert rh == eh, (rh, eh)
    results["csv"] = compare(ref_csv, eng_csv, "csv")
    # extract-report HTML leg: HTMLExporter.export(TemplateDocument)
    # structural parity — coded report pane, cap-protocol table rows,
    # answer labels with their annotation wiring (incl. the negated
    # instances' modifier-trigger annotations), found-items footer
    results["extract-html"] = compare(run_reference_extract_html(),
                                      run_local_extract_html(spark),
                                      "extract-html")
    results["extract-html"]["n_docs"] = len(EXTRACT_DOCS)
    json.dump(results, open(f"{REPO}/JAVA_PARITY.json", "w"), indent=1)
    print("JAVA_PARITY.json written")


if __name__ == "__main__":
    main()
