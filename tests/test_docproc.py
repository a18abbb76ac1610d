"""Document-structure goldens: sectioning, sentence typing, worksheet
detection, merge heuristic, properties, filters (reference:
coder/processor/DocumentProcessor.java, tools/SynopticReportDetector.java)."""

from nobletools_spark.functions.docproc import (
    DEFAULT_PROCESS_FILTER,
    FILTER_WORKSHEET,
    TYPE_MEDICAL_REPORT,
    TYPE_MEDLINE_RECORD,
    filter_sentence,
    is_deid_header,
    is_synoptic,
    process_document_text,
    process_report,
    split_sections,
    suggest_document_type,
)
from nobletools_spark.functions.textkit import (
    SENT_HEADER,
    SENT_LINE,
    SENT_PROSE,
    SENT_WORKSHEET,
    filter_deid_tags,
)

REPORT = """\
FINAL DIAGNOSIS:  Malignant melanoma of the skin.
The deep margin is negative. Additional sections show
tumor cells.

GROSS DESCRIPTION:  Specimen received fresh.
Tumor Size....3.5 cm
Margins ( )  involved  ( )  not involved
"""


def test_suggest_document_type():
    assert suggest_document_type("AB  - Some abstract") == TYPE_MEDLINE_RECORD
    assert suggest_document_type(REPORT) == TYPE_MEDICAL_REPORT


def test_split_sections():
    secs = split_sections(REPORT)
    titles = [s.title for s in secs]
    assert titles == ["FINAL DIAGNOSIS:", "GROSS DESCRIPTION:"]
    # greedy body clipped at the next section header
    assert "GROSS" not in secs[0].body
    assert REPORT[secs[0].body_offset:secs[0].body_offset + 9] == "Malignant"


def test_report_sentences():
    doc = process_report(REPORT)
    by_type = {}
    for t, o, ty in doc.sentences:
        by_type.setdefault(ty, []).append(t)
        # offsets preserved (newlines space-replaced, length-preserving)
        assert REPORT[o:o + len(t)].replace("\n", " ") == t.replace("\n", " ")
    assert any("deep margin is negative." in t for t in by_type[SENT_PROSE])
    assert any(t.startswith("FINAL DIAGNOSIS:") for t in by_type[SENT_HEADER])
    # worksheet lines detected (.... gaps, ( ) cells)
    assert any("Tumor Size" in t for t in by_type[SENT_WORKSHEET])
    assert any("( )" in t for t in by_type[SENT_WORKSHEET])


def test_line_merge():
    # line ending lowercase + next starting lowercase merge into prose
    txt = "The tumor was\nfound in the margin. It was removed.\n"
    doc = process_report(txt)
    prose = [t for t, _, ty in doc.sentences if ty == SENT_PROSE]
    assert prose and "found in the margin." in prose[0]


def test_properties():
    doc = process_report("Tumor Size....3.5 cm\n")
    assert doc.properties.get("Tumor Size") == "3.5 cm"


def test_medline():
    txt = ("TI  - A study of melanoma. In depth.\n"
           "AB  - We studied things. Results were good.\n"
           "MH  - Melanoma\n")
    doc = process_document_text(txt)
    assert suggest_document_type(txt) == TYPE_MEDLINE_RECORD
    types = {ty for _, _, ty in doc.sentences}
    assert SENT_PROSE in types


def test_synoptic_battery():
    assert is_synoptic("Tumor Size....3.5 cm")
    assert is_synoptic("Margins ( ) involved")
    assert is_synoptic("a\tb")
    assert is_synoptic("SYNOPTIC REPORT follows")
    assert is_synoptic("_X_ checked")
    assert not is_synoptic("The margin is negative.")
    assert not is_synoptic("PROCEDURE:     biopsy")


def test_deid():
    assert is_deid_header("E_O_H")
    assert is_deid_header("[Report de-identified by De-ID v1]")
    s = "**NAME[Smith] saw **DATE[Jan 1]."
    out = filter_deid_tags(s)
    assert len(out) == len(s)
    assert "Smith" not in out and "NAME" not in out


def test_filter_sentence():
    assert filter_sentence("", SENT_PROSE)
    assert filter_sentence("FINAL DIAGNOSIS:", SENT_HEADER)
    assert not filter_sentence("Tumor Size....3.5", SENT_WORKSHEET)  # default off
    assert filter_sentence("Tumor Size....3.5", SENT_WORKSHEET,
                           DEFAULT_PROCESS_FILTER | FILTER_WORKSHEET)
    assert filter_sentence("E_O_H", SENT_LINE)
    assert not filter_sentence("The margin is clear.", SENT_PROSE)


def test_headers_not_matched_in_pipeline():
    """End-to-end: section headers are filtered before matching, body
    mentions survive, worksheet text matched by default (filter off)."""
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.matcher import process_document
    from nobletools_spark.sources.fixtures import pytest_index

    text = ("MARGIN STATUS:  No evidence of deep margin involvement.\n"
            "The melanoma was excised.\n")
    rows = process_document(
        "d1", [("text", text, None, 0)], pytest_index(), MatchConfig())
    cuis = {r[2] for r in rows}
    assert "C001" in cuis and "C013" in cuis
    # offsets are document-absolute
    for r in rows:
        for a in r[8]:
            assert text[a["offset"]:a["offset"] + len(a["text"])] == a["text"]


def test_split_parts_multipart_report():
    """PartProcessor golden (PartProcessor.java:27-63): PART/PARTS
    markers sub-section a body; offsets are document-absolute; text
    before the first marker stays with the parent."""
    from nobletools_spark.functions.docproc import split_parts

    body = ("Three specimens received.\n"
            "PART 1: skin of the back with melanoma.\n"
            "PARTS 2 AND 3: two lymph nodes, negative.\n"
            "PART 4: margin tissue.")
    parts = split_parts(body, body_offset=100)
    assert [p.title for p in parts] == ["PART 1:", "PARTS 2 AND 3:",
                                       "PART 4:"]
    # each part's body runs from after its marker to the next marker
    assert parts[0].body == " skin of the back with melanoma.\n"
    assert parts[1].body == " two lymph nodes, negative.\n"
    assert parts[2].body == " margin tissue."
    # document-absolute offsets: title at marker, body right after it
    for p in parts:
        assert body[p.title_offset - 100:
                    p.title_offset - 100 + len(p.title)] == p.title
        assert body[p.body_offset - 100:
                    p.body_offset - 100 + len(p.body)] == p.body
    # preamble before the first marker is not a part
    assert all("Three specimens" not in p.body for p in parts)


def test_split_parts_no_markers():
    from nobletools_spark.functions.docproc import split_parts

    assert split_parts("FINAL DIAGNOSIS: benign nevus.") == []


def test_split_sections_thousand_headers_iterative():
    """A ~1200-section document must parse (the recursive formulation
    hit Python's recursion limit and killed the whole Spark task)."""
    from nobletools_spark.functions.docproc import split_sections

    text = "".join(f"SECTION HEAD {i:04d}A: body {i}\n".replace(
        str(i % 10), "X") for i in range(1200))
    # titles must match ^[A-Z/\- ]{5,40}: — build them accordingly
    text = "".join(f"HEADER {'AB'[i % 2]} PART: body line {i}\n"
                   for i in range(1200))
    secs = split_sections(text)
    assert len(secs) >= 1199
    assert secs[0].title.startswith("HEADER")


def test_process_report_whitespace_and_empty_docs():
    """Final-flush fidelity (DocumentProcessor.processReport :217-224,
    parity-pinned on the compiled reference): the reference's last-buffer
    check is str.length(), NOT trimmed length, and Java's String.split
    drops trailing empty fields ("\\n" → []) while "".split returns [""].
    So a whitespace-only doc emits ONE Line sentence, the empty doc emits
    a single "\\n" Line sentence, a newline-only doc emits nothing, and a
    trailing whitespace-only line after real content still emits."""
    from nobletools_spark.functions.docproc import process_document_text

    assert process_document_text("   ").sentences == [("   \n", 0, "Line")]
    assert process_document_text("").sentences == [("\n", 0, "Line")]
    assert process_document_text("\n").sentences == []
    assert process_document_text("a b.\n   ").sentences == \
        [("a b.\n", 0, "Line"), ("   \n", 5, "Line")]
    # \n-terminated docs are unchanged: no phantom trailing sentence
    assert process_document_text("a b.\nc d.\n").sentences == \
        [("a b.\n", 0, "Line"), ("c d.\n", 5, "Line")]
