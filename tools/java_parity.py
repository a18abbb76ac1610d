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
    drv_src = f"{REPO}/tools/javaref/RefDriver.java"
    cls = f"{CLS}/RefDriver.class"
    if os.path.exists(cls) and \
            os.path.getmtime(cls) >= os.path.getmtime(drv_src):
        return
    if os.path.exists(cls):   # driver changed: recompile just RefDriver
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-cp", CP, "-d", CLS, drv_src],
            check=True)
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
         f"{REPO}/tools/javaref/RefDriver.java"], check=True)
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
)


def run_reference(mode: str | None = None,
                  method: str = "-", term_src: str = OBO) -> set:
    """mode: None (mentions only) | 'context' | 'negex'."""
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    cmd = ["java", "-cp", CP, "RefDriver", term_src, DOCS, REF_TSV, method]
    if mode == "context":
        cmd += [CTX_OWL]
    elif mode == "negex":
        cmd += ["negex"]
    subprocess.run(cmd, check=True, capture_output=True)
    out = set()
    for line in open(REF_TSV):
        doc, st, en, code, _text, mods, score = \
            (line.rstrip("\n").split("\t") + ["", "0"])[:7]
        key = (doc[:-4], int(st), int(en), code,
               round(float(score or 0), 6))
        if mode is not None:
            key += (tuple(sorted(m for m in mods.split(";") if m)),)
        out.add(key)
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
    else:
        nc = NobleCoderSpark.from_rrf(spark, term_src, cfg=cfg, context=ctx)
    rows = []
    for fn in sorted(os.listdir(DOCS)):
        rows.append((fn[:-4],
                     [("text", open(f"{DOCS}/{fn}",
                                    encoding="utf-8").read(), None, 0)]))
    docs = spark.createDataFrame(rows, SPANS_DDL)
    out = set()
    for r in nc.annotate(docs, negex=(mode == "negex")).collect():
        key = (r.doc_id, r.start, r.end, r.cui, round(r.score, 6))
        if mode is not None:
            key += (tuple(sorted(f"{k}={v}"
                                 for k, v in r.modifiers.items())),)
        out.add(key)
    return out


def run_reference_docproc() -> set:
    import shutil
    shutil.rmtree("/tmp/noble_terms", ignore_errors=True)
    subprocess.run(["java", "-cp", CP, "RefDriver", OBO, DOCS, REF_TSV,
                    "-", "docproc"], check=True, capture_output=True)
    out = set()
    for line in open(REF_TSV):
        doc, off, typ, sec = (line.rstrip("\n").split("\t") + [""])[:4]
        out.add((doc[:-4], int(off), typ, sec))
    return out


def run_local_docproc() -> set:
    """Sentence boundaries, types, and section assignment from the SAME
    kernel the Spark UDF calls (functions/docproc) — mention offsets pin
    segmentation where mentions exist; this leg pins it everywhere."""
    from nobletools_spark.functions import docproc

    out = set()
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
            out.add((fn[:-4], off, typ, title))
    return out


def compare(ref: set, eng: set, label: str) -> dict:
    tp = len(ref & eng)
    precision = tp / len(eng) if eng else 0.0
    recall = tp / len(ref) if ref else 0.0
    print(f"[{label}] reference: {len(ref)}  engine: {len(eng)}  tp: {tp}"
          f"  precision: {precision:.4f}  recall: {recall:.4f}")
    for side, diff in (("engine-only", eng - ref), ("ref-only", ref - eng)):
        for t in sorted(diff)[:8]:
            print(f"  {side}: {t}")
    return {"ref_mentions": len(ref), "engine_mentions": len(eng),
            "tp": tp, "precision": round(precision, 4),
            "recall": round(recall, 4)}


def main() -> None:
    from nobletools_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    compile_reference()
    emit_fixture(n_docs)
    spark = get_spark(cores=8)
    results = {"n_docs": n_docs, "adversarial_docs": len(ADVERSARIAL)}
    results["mentions"] = compare(run_reference(), run_spark(spark),
                                  "mentions")
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
    json.dump(results, open(f"{REPO}/JAVA_PARITY.json", "w"), indent=1)
    print("JAVA_PARITY.json written")


if __name__ == "__main__":
    main()
