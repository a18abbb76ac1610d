"""Deterministic fixtures (FIXTURES.md): terminologies, the interleaved
documents table, and a synthetic scale corpus.

Three terminologies:
- ``builtin_concepts()``      — fixed concepts over the driver testdata's
  31-word vocabulary; used by ``__spark_entry__.queries()`` so every KG
  query has a DuckDB-expressible oracle. Terms are chosen to share no
  words across concepts, so greedy used-word marking never interacts and
  the oracle stays SQL-expressible (the interacting cases are covered by
  the pytest terminology + literal oracle instead).
- ``pytest_concepts()``       — adversarial fixture (subsumption traps,
  acronyms, regex synonyms, plural/diacritic/gap/order cases) for the
  matcher golden tests.
- ``synthetic_corpus()``      — Zipf-skewed planted-mention corpus with
  interleaved media spans for e2e P/R and the scaling bench.
"""

from __future__ import annotations

import numpy as np

from nobletools_spark.index import build_index
from nobletools_spark.model import TerminologyIndex

# ---------------------------------------------------------------------------
# Interleaved documents schema (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPANS_DDL = ("doc_id string, spans array<struct<kind:string, text:string, "
             "media_ref:string, offset:int>>")


def interleaved_docs(spark, sf_dir: str):
    """Derive the interleaved (doc_id, spans) table deterministically from
    the driver's documents.parquet: one text span holding the full text,
    plus a trailing media span for every third document (media spans are
    carried through the pipeline untouched; per-row invariant is
    span-sequence equality)."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return interleave_raw(raw)


def interleave_raw(raw):
    """The interleave rule itself over any (doc_id:int, text) frame —
    factored out so snapshot/mutation fixtures (incremental entries)
    apply the IDENTICAL rule to derived corpora."""
    from pyspark.sql import functions as F

    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("media://"), F.col("doc_id").cast("string")).alias("media_ref"),
        (F.length("text") + F.lit(1)).alias("offset"),
    )
    return raw.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.array(text_span, media_span))
         .otherwise(F.array(text_span)).alias("spans"),
    )


# ---------------------------------------------------------------------------
# Builtin terminology over the testdata vocabulary
# ---------------------------------------------------------------------------
# Vocabulary of documents.parquet: a agg batch big column customer data dup
# fast filter group hash join key line merge order part query row scan slow
# small sort spark stream table the value vector window.
# Porter stems that differ from surface: customer->custom, table->tabl,
# merge->merg, key->kei, query->queri, value->valu.

BUILTIN_CONCEPTS = (
    {"cui": "C101", "name": "Spark Engine", "synonyms": ("Spark Engine", "spark"),
     "semtypes": ("T002",), "sources": ("TST",)},
    {"cui": "C102", "name": "Vector Type", "synonyms": ("Vector Type", "vector"),
     "semtypes": ("T002",), "sources": ("TST", "ALT")},
    {"cui": "C103", "name": "Customer Entity", "synonyms": ("Customer Entity", "customer"),
     "semtypes": ("T002",), "sources": ("TST",)},
    {"cui": "C104", "name": "Hash Join", "synonyms": ("Hash Join", "hash join"),
     "semtypes": ("T001",), "sources": ("TST",)},
    {"cui": "C105", "name": "Table Scan", "synonyms": ("Table Scan", "table scan"),
     "semtypes": ("T001",), "sources": ("TST", "ALT")},
    {"cui": "C106", "name": "Sort Merge", "synonyms": ("Sort Merge", "sort merge"),
     "semtypes": ("T001",), "sources": ("TST",)},
    {"cui": "C107", "name": "Stream Batch", "synonyms": ("Stream Batch", "stream batch"),
     "semtypes": ("T001",), "sources": ("TST",)},
    {"cui": "C108", "name": "Window Group", "synonyms": ("Window Group", "window group"),
     "semtypes": ("T001",), "sources": ("TST",)},
)

# (child, parent) BROADER edges — MRREL PAR/RB shape
# (util/ConceptImporter.java:1117-1126)
BUILTIN_ISA_EDGES = (
    ("C104", "C100"), ("C106", "C100"),       # joins under Join Operator
    ("C105", "C110"),                          # scans under Scan Operator
    ("C100", "C120"), ("C110", "C120"),        # under Relational Operator
    ("C107", "C120"), ("C108", "C120"),
    ("C101", "C130"), ("C102", "C130"), ("C103", "C130"),  # entities
    ("C120", "C000"), ("C130", "C000"),        # root
)

# (cui, tui, sty_name) — MRSTY shape (ConceptImporter.java:1056-1067)
BUILTIN_SEMTYPES = tuple(
    (c["cui"], c["semtypes"][0],
     {"T001": "Operator Concept", "T002": "Entity Concept"}[c["semtypes"][0]])
    for c in BUILTIN_CONCEPTS
)

# Undirected synonym / cross-source-code edges for CUI canonicalization
# (codeMap many-codes-to-one shape, NobleCoderTerminology.java:1092-1095):
# chains, a fork, and a component merged through a shared alternate code.
BUILTIN_SYNONYM_EDGES = (
    ("C101", "C201"), ("C201", "C301"),
    ("C102", "C202"),
    ("C104", "C204"), ("C204", "C304"), ("C304", "C404"),
    ("C105", "C205"),
    ("C106", "C206"), ("C107", "C206"),  # C106–C107 merge via shared code
)

# (template_id, item, concept, section_filter, value_domain) — the
# minimal extraction-template fixture (TemplateItem.java:347-451 shape).
# 'scoped_scan' carries a section filter; the driver testdata has no
# section headers, so it contributes zero rows there (section semantics
# are pinned by tests/test_templates.py on the rich corpus instead).
BUILTIN_TEMPLATES = (
    ("synoptic", "relational_operator", "C120", None, "boolean"),
    ("synoptic", "join_operator", "C100", None, "boolean"),
    ("synoptic", "entity", "C130", None, "boolean"),
    ("synoptic", "operator_value", "C120", None, "value"),
    ("synoptic", "scoped_scan", "C110", "GROSS DESCRIPTION:?", "boolean"),
)

# surface word -> (term_word, cui) association used by the DuckDB oracle;
# kept here so fixture and oracle SQL are generated from one source.
BUILTIN_SINGLE_TERMS = (("spark", "C101"), ("vector", "C102"), ("custom", "C103"))
BUILTIN_PAIR_TERMS = (
    ("hash", "join", "C104"), ("tabl", "scan", "C105"),
    ("sort", "merg", "C106"), ("stream", "batch", "C107"),
    ("window", "group", "C108"),
)
# Porter stems for the full testdata vocabulary (pinned by tests against
# porter.stem — the oracle SQL carries the same mapping inline).
VOCAB_STEMS = {
    "a": "a", "agg": "agg", "batch": "batch", "big": "big", "column": "column",
    "customer": "custom", "data": "data", "dup": "dup", "fast": "fast",
    "filter": "filter", "group": "group", "hash": "hash", "join": "join",
    "key": "kei", "line": "line", "merge": "merg", "order": "order",
    "part": "part", "query": "queri", "row": "row", "scan": "scan",
    "slow": "slow", "small": "small", "sort": "sort", "spark": "spark",
    "stream": "stream", "table": "tabl", "the": "the", "value": "valu",
    "vector": "vector", "window": "window",
}


def builtin_index(**kw) -> TerminologyIndex:
    return build_index(BUILTIN_CONCEPTS, **kw)


# ---------------------------------------------------------------------------
# Adversarial pytest terminology (SURVEY.md §5.2 item 2)
# ---------------------------------------------------------------------------

PYTEST_CONCEPTS = (
    # subsumption trap: 'deep margin' must subsume 'deep' and 'margin'
    {"cui": "C001", "name": "Deep Margin", "synonyms": ("Deep Margin",),
     "semtypes": ("T047",), "sources": ("TST",)},
    {"cui": "C002", "name": "Deep", "synonyms": ("Deep",),
     "semtypes": ("T047",), "sources": ("TST",)},
    {"cui": "C003", "name": "Margin", "synonyms": ("Margin", "margins"),
     "semtypes": ("T047",), "sources": ("TST",)},
    # multiword with stopword + order variant
    {"cui": "C004", "name": "Nasal Septum",
     "synonyms": ("Nasal Septum", "Septum of Nose"),
     "semtypes": ("T023",), "sources": ("TST",)},
    # acronym case traps (reference main: FISH vs fish, DCIS vs dcis)
    {"cui": "C005", "name": "FISH Method", "synonyms": ("FISH Method", "FISH"),
     "semtypes": ("T059",), "sources": ("TST",)},
    {"cui": "C006", "name": "Fish", "synonyms": ("Fish",),
     "semtypes": ("T013",), "sources": ("TST", "ALT")},
    {"cui": "C007", "name": "Ductal Carcinoma In Situ",
     "synonyms": ("Ductal Carcinoma In Situ", "DCIS"),
     "semtypes": ("T191",), "sources": ("TST",)},
    # regex synonym
    {"cui": "C008", "name": "Tumor Stage", "synonyms": ("Tumor Stage", "/stage [ivx]+/"),
     "semtypes": ("T185",), "sources": ("TST",)},
    # acronym definition pair (WHO)
    {"cui": "C009", "name": "World Health Organization",
     "synonyms": ("World Health Organization",),
     "semtypes": ("T093",), "sources": ("TST",)},
    # plural/diacritic traps
    {"cui": "C010", "name": "Church", "synonyms": ("Church",),
     "semtypes": ("T073",), "sources": ("TST",)},
    {"cui": "C011", "name": "Protege Software", "synonyms": ("Protégé Software",),
     "semtypes": ("T073",), "sources": ("TST",)},
    # gap test: 'skin margin' with one intervening word
    {"cui": "C012", "name": "Skin Margin", "synonyms": ("Skin Margin",),
     "semtypes": ("T023",), "sources": ("TST",)},
    {"cui": "C013", "name": "Melanoma", "synonyms": ("Melanoma", "Malignant Melanoma"),
     "semtypes": ("T191",), "sources": ("TST", "ALT", "XYZ")},
)

PYTEST_ISA_EDGES = (
    ("C001", "C003"),            # deep margin isa margin (toy)
    ("C013", "C014"), ("C014", "C015"),  # melanoma isa neoplasm isa disease
    ("C005", "C016"), ("C016", "C015"),
    # diamond: C012 under both C003 and C017, both under C015
    ("C012", "C003"), ("C012", "C017"), ("C003", "C015"), ("C017", "C015"),
    # cycle guard: A PAR B, B PAR A
    ("C018", "C019"), ("C019", "C018"),
)


def pytest_index(**kw) -> TerminologyIndex:
    return build_index(PYTEST_CONCEPTS, **kw)


# ---------------------------------------------------------------------------
# Synthetic scale corpus (FIXTURES.md §5): Zipf-skewed planted mentions
# ---------------------------------------------------------------------------

_FILLER = ("patient", "noted", "without", "report", "level", "normal",
           "status", "finding", "seen", "left", "right", "upper", "lower",
           "today", "exam", "review", "clinic", "stable", "history")

_SENTENCE_TEMPLATES = (
    "The {m} was noted on exam.",
    "No change in {m} since prior review.",
    "Findings include {m} and {f} {f}.",
    "{f} {f} shows {m} today.",
    "Impression: {m}.",
)


def synthetic_corpus(n_docs: int, seed: int = 42,
                     media_frac: float = 0.05,
                     zipf_s: float = 1.2):
    """Deterministic corpus rows [(doc_id, spans)] planting pytest-fixture
    terminology mentions with Zipf-skewed concept frequencies (hot-concept
    skew for the co-occurrence salting path). Pure-Python generator —
    parallelized by the caller via spark.range + mapInPandas if needed."""
    rng = np.random.default_rng(seed)
    surfaces = [
        "deep margin", "nasal septum", "FISH", "fish", "DCIS", "melanoma",
        "churches", "skin margin", "stage iv", "World Health Organization (WHO)",
        "Protégé software", "margins",
    ]
    # Zipf ranks over surfaces
    probs = np.array([1.0 / (r + 1) ** zipf_s for r in range(len(surfaces))])
    probs /= probs.sum()
    rows = []
    for d in range(n_docs):
        n_sents = int(rng.integers(2, 6))
        parts = []
        offset = 0
        spans = []
        for _ in range(n_sents):
            m = surfaces[int(rng.choice(len(surfaces), p=probs))]
            tpl = _SENTENCE_TEMPLATES[int(rng.integers(0, len(_SENTENCE_TEMPLATES)))]
            f = _FILLER[int(rng.integers(0, len(_FILLER)))]
            parts.append(tpl.format(m=m, f=f))
        text = " ".join(parts)
        spans.append(("text", text, None, offset))
        offset += len(text)
        if rng.random() < media_frac:
            spans.append(("media", None, f"media://{d}", offset + 1))
        rows.append((f"doc-{d:06d}", spans))
    return rows


def _spans_table(spark, rows):
    """Fixture corpus as a JVM LocalRelation: span struct cells become
    dicts so the Arrow conversion applies (tuples would silently fall
    back to the pickled-Python-RDD path)."""
    from nobletools_spark.session import local_table

    keys = ("kind", "text", "media_ref", "offset")
    return local_table(
        spark,
        [(d, [dict(zip(keys, s)) for s in spans]) for d, spans in rows],
        SPANS_DDL)


def synthetic_corpus_df(spark, n_docs: int, seed: int = 42, **kw):
    return _spans_table(spark, synthetic_corpus(n_docs, seed, **kw))


# ---------------------------------------------------------------------------
# Rich structured corpus: sections, DeID tags, acronym definitions,
# negation, worksheets — exercises the FULL document pipeline
# (docproc + matcher + acronym pass + ConText) end-to-end.
# ---------------------------------------------------------------------------

_RICH_HEADERS = ("FINAL DIAGNOSIS:", "GROSS DESCRIPTION:", "MARGIN STATUS:",
                 "CLINICAL HISTORY:")
_RICH_PROSE = (
    "No evidence of {m} was identified. The margins are clear.",
    "Findings are consistent with {m} in the specimen.",
    "The {m} was excised; no residual tumor seen.",
    "Family history of {m} reported by the patient.",
    "Sections show {m} but no evidence of deep margin involvement.",
    "World Health Organization (WHO) criteria applied. WHO grade given.",
    "Possible {m} cannot be excluded.",
    "Severe {m} was noted with mild atypia elsewhere.",
    "Chronic {m} present; transient inflammation resolving.",
    "Intermittent episodes of {m} were reported by the patient.",
    "Newly diagnosed {m}; probable invasion, definite ulceration.",
)
_RICH_LINES = (
    "Tumor Size....{k}.5 cm",
    "Margins ( )  involved  (X)  not involved",
    "**NAME[Case-{k}] reviewed by **DATE[Jan {d} 2020] 1200",
)
_RICH_SURFACES = ("melanoma", "nasal septum", "FISH", "DCIS", "deep margin",
                  "skin margin", "stage iv", "margins", "churches")


def rich_corpus(n_docs: int, seed: int = 7,
                media_frac: float = 0.3) -> list[tuple]:
    """Deterministic structured documents: each doc = 2-3 sections with
    prose sentences (negation / hedging / acronym-definition traps from
    the pytest terminology) plus worksheet/DeID lines, and media spans
    interleaved for a third of documents."""
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        parts = []
        n_sections = int(rng.integers(2, 4))
        for s in range(n_sections):
            header = _RICH_HEADERS[int(rng.integers(0, len(_RICH_HEADERS)))]
            body = []
            for _ in range(int(rng.integers(1, 4))):
                tpl = _RICH_PROSE[int(rng.integers(0, len(_RICH_PROSE)))]
                m = _RICH_SURFACES[int(rng.integers(0, len(_RICH_SURFACES)))]
                body.append(tpl.format(m=m))
            section = f"{header}  " + " ".join(body)
            if rng.random() < 0.5:
                line = _RICH_LINES[int(rng.integers(0, len(_RICH_LINES)))]
                section += "\n" + line.format(k=int(rng.integers(1, 9)),
                                              d=int(rng.integers(1, 28)))
            parts.append(section)
        text = "\n\n".join(parts)
        spans = [("text", text, None, 0)]
        if rng.random() < media_frac:
            spans.append(("media", None, f"media://rich-{d}", len(text) + 1))
        rows.append((f"rdoc-{d:05d}", spans))
    return rows


def rich_corpus_df(spark, n_docs: int, seed: int = 7, **kw):
    return _spans_table(spark, rich_corpus(n_docs, seed, **kw))
