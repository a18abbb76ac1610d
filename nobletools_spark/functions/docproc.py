"""Document structure kernel — sectioning, sentence typing, worksheet
detection, property extraction (reference:
coder/processor/DocumentProcessor.java, tools/SynopticReportDetector.java,
coder/NobleCoder.filterSentence :415-435, util/DeIDUtils.java).

Pure functions over strings (vectorizable inside the annotate UDF and
reusable by the pytest oracle). A "sentence" here is (text, offset,
type) with type ∈ {Prose, Line, Header, Worksheet}.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from nobletools_spark.functions.textkit import (
    SENT_HEADER,
    SENT_LINE,
    SENT_PROSE,
    SENT_WORKSHEET,
    split_sentences,
)

TYPE_MEDICAL_REPORT = "Medical Report"
TYPE_MEDLINE_RECORD = "Medline Record"

# DocumentProcessor.java:16
_PROSE_RE = re.compile(r".*\b[a-z]+\.\s+[A-Z][a-z]+\b.*", re.DOTALL)
# sectioning patterns (DocumentProcessor.java:34-36)
_SECTION_RES = {
    TYPE_MEDICAL_REPORT: re.compile(r"^([A-Z/\- ]{5,40}:)\s+(.*)",
                                    re.DOTALL | re.MULTILINE),
    TYPE_MEDLINE_RECORD: re.compile(r"^([A-Z]{2})\s+\-\s+(.*)",
                                    re.DOTALL | re.MULTILINE),
}
_LEADING_WS_RE = re.compile(r"^(\s+)\w.*", re.DOTALL)
_PROP_RE = re.compile(r"([A-Z][A-Za-z /]{3,25})(?:\.{2,}|\:)(.{2,25})")
_LAST_PROSE_RE = re.compile(r"[a-z]\.\s*[A-Z]")
# mergeLines (DocumentProcessor.java:330-342)
_MERGE_PREV_RE = re.compile(r".+\s([A-Z]?[a-z]+|\d+),?")
_MERGE_NEXT_RE = re.compile(r"([A-Z]?[a-z]+)\b.+")

# SynopticReportDetector.getSynopticDetectors (:25-100)
_SYNOPTIC_RES = (
    re.compile(r"[^\s]+[\._]{4,}[^\s]+"),        # ....... gaps
    re.compile(r"\(\s*\)"),                      # empty click cells ( )
    re.compile(r"[^\s]+[\t]+[^\s]+"),            # tabs between words
    re.compile(r"^_[xX_]_"),                     # _X_ worksheet markers
)
_SYNOPTIC_PREFIX_RE = re.compile(r"^\s*synoptic\b")
_SYNOPTIC_NUMBERED_RE = re.compile(r"^[A-Z0-9]\.\s*.*:\s*(\d|#)$")
_SYNOPTIC_COLS_RE = re.compile(r"^[A-Z ]+:\s{4,}.*$")
_SYNOPTIC_FALSE_RE = re.compile(r"^(PROCEDURE|POST-OP).*")
_SYNOPTIC_LEAD_RE = re.compile(r"[a-z0A-Z0-9]{1,2}\.?[\s-]+(.*)")
_SYNOPTIC_GAP_RE = re.compile(r"[^\s]+[\s]{4,}[^\s]+")
# DeIDUtils.isDeIDHeader (:40-42)
_DEID_HEADER_RE1 = re.compile(r"\[.* de\-identified.*De\-ID.*\]")
_DEID_HEADER_RE2 = re.compile(r"[SE]_O_[HR]")

FILTER_DEID = 1      # NobleCoder.java:37-39
FILTER_HEADER = 2
FILTER_WORKSHEET = 4
DEFAULT_PROCESS_FILTER = FILTER_DEID | FILTER_HEADER  # NobleCoder.java:48


def suggest_document_type(text: str) -> str:
    """DocumentProcessor.suggestDocumentType (:63-67)."""
    if re.match(r"^[A-Z]{2}  - ", text):
        return TYPE_MEDLINE_RECORD
    return TYPE_MEDICAL_REPORT


def is_synoptic(line: str) -> bool:
    """SynopticReportDetector.detect (:25-100) — worksheet line battery."""
    for rx in _SYNOPTIC_RES:
        if rx.search(line):
            return True
    if _SYNOPTIC_PREFIX_RE.search(line.lower()):
        return True
    if _SYNOPTIC_NUMBERED_RE.fullmatch(line):
        return True
    if _SYNOPTIC_COLS_RE.fullmatch(line):
        return not _SYNOPTIC_FALSE_RE.fullmatch(line)
    probe = line
    m = _SYNOPTIC_LEAD_RE.fullmatch(line)
    if m:
        probe = m.group(1)
    if _SYNOPTIC_GAP_RE.search(probe):
        alpha = len(re.sub(r"[^A-Za-z]", "", probe))
        return len(probe) > 0 and alpha / len(probe) < 0.6
    return False


def is_deid_header(line: str) -> bool:
    return bool(_DEID_HEADER_RE1.fullmatch(line.strip())
                or _DEID_HEADER_RE2.fullmatch(line))


@dataclass
class SectionSpan:
    title: str
    title_offset: int
    body: str
    body_offset: int


@dataclass
class ParsedDocument:
    sentences: list[tuple[str, int, str]] = field(default_factory=list)
    sections: list[SectionSpan] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)


def split_sections(text: str, doc_type: str = TYPE_MEDICAL_REPORT,
                   offset: int = 0) -> list[SectionSpan]:
    """DocumentProcessor.section (:344-377): MULTILINE+DOTALL header
    pattern is greedy (body runs to end of text), then the body is
    re-probed for the next header and clipped; recursion collects the
    nested matches."""
    pat = _SECTION_RES[doc_type]
    out: list[SectionSpan] = []
    # ITERATIVE walk (one step per header): the greedy body swallows
    # every remaining header, so each step emits one section and
    # descends into its unclipped body — a recursive formulation hits
    # Python's recursion limit on ~1000-section documents, killing the
    # whole mapInPandas task
    start_in_doc, chunk = offset, text
    while True:
        mt = pat.search(chunk)
        if mt is None:
            break
        st = start_in_doc + mt.start()
        bst = start_in_doc + mt.start(2)
        body = mt.group(2)  # greedy: runs to end of chunk
        m = pat.search(body)
        clipped = body[:m.start()] if m else body
        out.append(SectionSpan(mt.group(1), st, clipped, bst))
        start_in_doc, chunk = bst, body
    return out


_PART_RE = re.compile(r"PARTS?\s+\d+(\s+AND\s+\d+)?:",
                      re.MULTILINE | re.DOTALL)  # PartProcessor.java:12


def split_parts(body: str, body_offset: int = 0) -> list[SectionSpan]:
    """PartProcessor.process (coder/processor/PartProcessor.java:27-63):
    sub-section a section body at ``PART(S) <n>[ AND <m>]:`` markers —
    multi-part pathology reports ("PART 1:", "PARTS 2 AND 3:"). Each
    part spans from its marker to the next marker (or end of body);
    the part title is the marker text, the part body starts right after
    the marker. Offsets are document-absolute via ``body_offset``
    (updateOffset parity). Text before the first marker belongs to the
    parent section, as in the reference.

    Like the reference's PartProcessor — which no pipeline in the
    reference invokes (zero call sites outside its own main) — this is
    a standalone API, deliberately NOT wired into process_document; the
    docproc parity leg confirms the default chain matches without it."""
    parts: list[SectionSpan] = []
    prev: tuple[str, int, int] | None = None  # (title, t_off, b_off)
    for mt in _PART_RE.finditer(body):
        if prev is not None:
            title, t_off, b_off = prev
            parts.append(SectionSpan(title, body_offset + t_off,
                                     body[b_off:mt.start()],
                                     body_offset + b_off))
        prev = (mt.group(), mt.start(), mt.end())
    if prev is not None:
        title, t_off, b_off = prev
        parts.append(SectionSpan(title, body_offset + t_off,
                                 body[b_off:], body_offset + b_off))
    return parts


def _merge_lines(last: str | None, s: str) -> bool:
    if last is None:
        return False
    if is_synoptic(last):
        return False
    return bool(_MERGE_PREV_RE.fullmatch(last) and _MERGE_NEXT_RE.fullmatch(s))


def _parse_region(doc: ParsedDocument, text: str, offset: int, stype: str,
                  sections: list[SectionSpan]) -> None:
    """DocumentProcessor.parseSentences (:252-312): strip leading
    whitespace, split prose via the sentence detector or keep the line
    whole (typed Line/Worksheet), then split a leading section header
    into its own Header sentence."""
    m = _LEADING_WS_RE.fullmatch(text)
    if m:
        prefix = m.group(1)
        text = text[len(prefix):]
        offset += len(prefix)
    if stype == SENT_PROSE:
        sentences = [(t, o, SENT_PROSE) for t, o in split_sentences(text, offset)]
    else:
        for pm in _PROP_RE.finditer(text):
            doc.properties[pm.group(1).strip()] = pm.group(2).strip()
        # regions keep their trailing '\n', which defeats the
        # fullmatch-style synoptic detectors — EXACTLY like the
        # reference: Java String.matches over the same
        # newline-carrying region text also fails the full match
        # (SynopticReportDetector.detect is handed parseSentences'
        # raw region). Pinned by the docproc parity leg; do not
        # "fix" by stripping the newline.
        t = SENT_WORKSHEET if is_synoptic(text) else SENT_LINE
        sentences = [(text, offset, t)] if text else []
    if sentences:
        first_text, first_off, first_type = sentences[0]
        sec = next((s for s in sections
                    if s.title_offset >= first_off
                    and s.title_offset + len(s.title) <= first_off + len(first_text)),
                   None)
        if sec is not None:
            en = sec.title_offset + len(sec.title) - first_off
            head, rest = first_text[:en], first_text[en:]
            if rest.strip():
                sentences = ([(head, first_off, SENT_HEADER),
                              (rest, first_off + en, first_type)]
                             + sentences[1:])
            else:
                sentences[0] = (first_text, first_off, SENT_HEADER)
    doc.sentences.extend(sentences)


def process_report(text: str, offset: int = 0) -> ParsedDocument:
    """DocumentProcessor.processReport (:183-229): line-merge buffering,
    prose-vs-line classification per buffered region."""
    doc = ParsedDocument()
    doc.sections = split_sections(text, TYPE_MEDICAL_REPORT, offset)
    buf: list[str] = []
    off = offset
    buf_off = offset
    last: str | None = None
    # Java's String.split drops TRAILING empty strings ("a\n\n" → ["a"],
    # "\n" → []) but returns [""] for the empty string itself — mirror
    # both, so the last real region reaches the FINAL flush below (whose
    # prose test and no-blank-guard differ from the in-loop flush)
    lines = text.split("\n")
    if text:
        while lines and lines[-1] == "":
            lines.pop()
    for s in lines:
        if not _merge_lines(last, s):
            joined = "".join(x + "\n" for x in buf)
            if joined.strip():
                js = joined.strip()
                # "." pre-screen: _PROSE_RE needs a period and backtracks
                # quadratically on long period-free lines
                stype = (SENT_PROSE if "\n" in js
                         or ("." in js and _PROSE_RE.fullmatch(js))
                         else SENT_LINE)
                _parse_region(doc, joined, buf_off, stype, doc.sections)
            buf = []
            buf_off = off
        buf.append(s)
        off += len(s) + 1
        last = s
    joined = "".join(x + "\n" for x in buf)
    if joined:
        # the reference's final flush checks str.length(), NOT trimmed
        # length (processReport :217-224) — an all-whitespace trailing
        # buffer still emits one Line sentence (docproc parity leg)
        stype = (SENT_PROSE if "\n" in joined.strip()
                 or ("." in joined and _LAST_PROSE_RE.search(joined))
                 else SENT_LINE)
        _parse_region(doc, joined, buf_off, stype, doc.sections)
    return doc


def process_medline(text: str, offset: int = 0) -> ParsedDocument:
    """DocumentProcessor.processMedline (:131-176)."""
    doc = ParsedDocument()
    doc.sections = split_sections(text, TYPE_MEDLINE_RECORD, offset)
    for sec in doc.sections:
        if "." in sec.body and _PROSE_RE.fullmatch(sec.body.strip()):
            _parse_region(doc, sec.body, sec.body_offset, SENT_PROSE,
                          doc.sections)
        else:
            offs = sec.body_offset
            for s in sec.body.split("\n"):
                if s:
                    _parse_region(doc, s, offs, SENT_LINE, doc.sections)
                offs += len(s) + 1
    return doc


def process_document_text(text: str, offset: int = 0,
                          doc_type: str | None = None) -> ParsedDocument:
    dt = doc_type or suggest_document_type(text)
    if dt == TYPE_MEDLINE_RECORD:
        return process_medline(text, offset)
    return process_report(text, offset)


def filter_sentence(text: str, stype: str,
                    process_filter: int = DEFAULT_PROCESS_FILTER) -> bool:
    """NobleCoder.filterSentence (:415-435): True = skip."""
    if len(text) == 0:
        return True
    if process_filter & FILTER_HEADER and stype == SENT_HEADER:
        return True
    if process_filter & FILTER_WORKSHEET and stype == SENT_WORKSHEET:
        return True
    if process_filter & FILTER_DEID and is_deid_header(text):
        return True
    return False


def apply_document_filter(text: str, pattern: str,
                          invert: bool = False) -> str:
    """DocumentFilter.filter (extract/model/DocumentFilter.java
    :137-158): length-preserving regex mask. invert=False KEEPS matched
    regions and blanks the text between them; invert=True blanks the
    matched regions. Reference quirks preserved exactly: MULTILINE
    compilation, and in keep-matches mode the tail AFTER the last match
    is appended UNMASKED (the reference appends the raw remainder)."""
    if pattern is None:
        return text
    out = []
    offset = 0
    for m in re.finditer(pattern, text, re.MULTILINE):
        if invert:
            out.append(text[offset:m.start()])
            out.append(" " * (m.end() - m.start()))
        else:
            out.append(" " * (m.start() - offset))
            out.append(m.group())
        offset = m.end()
    out.append(text[offset:])
    return "".join(out)
