"""Core data model: terminology index (the broadcastable artifact) and
match configuration.

Reference parity: the index reproduces NobleCoderTerminology.Storage's
hot maps (terminology/impl/NobleCoderTerminology.java:151-235) — wordMap,
termMap, conceptMap, wordStatMap, regexMap, blacklist — as plain Python
dicts pickled into a Spark broadcast variable. The reference persists
these as mmap'd JDBM B-trees; at Spark scale the dictionary (≤ a few
million terms) is small relative to the 10^12-document corpus, so a
broadcast probed inside Arrow-batched UDFs keeps the matcher stage
map-only (zero shuffle).

MatchConfig mirrors the flag block at NobleCoderTerminology.java:136-141
and setupSearch(...) at :1168-1211.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple


class ConceptMeta(NamedTuple):
    """Compact concept payload needed by matching + scoring
    (terminology/Concept.java:23-43, scoring NobleCoderTerminology.java:2388-2495)."""

    cui: str
    name: str                      # preferred name
    synonyms: tuple[str, ...]      # original surface forms (incl. name)
    semtypes: tuple[str, ...]      # TUIs
    sources: tuple[str, ...]       # SABs
    codes: tuple[tuple[str, str], ...] = ()  # (source, code) alt codes
    #   (Concept.getCodes; cross-source codes ConceptImporter.java:877)


_FOR_SEARCH_CACHE: dict = {}  # frozen dataclass ⇒ hashable key

BEST_MATCH = "best-match"
ALL_MATCH = "all-match"
PRECISE_MATCH = "precise-match"
NONOVERLAP_MATCH = "nonoverlap-match"
PARTIAL_MATCH = "partial-match"


@dataclass(frozen=True)
class MatchConfig:
    """Defaults per NobleCoderTerminology.java:136-148; the batch coding
    pipeline additionally sets select_best_candidate=True
    (coder/NobleCoder.java:61)."""

    search_method: str = BEST_MATCH
    strip_digits: bool = False
    stem_words: bool = True
    strip_stop_words: bool = True
    ignore_small_words: bool = True
    ignore_common_words: bool = False
    select_best_candidate: bool = True
    score_concepts: bool = True
    ignore_used_words: bool = True
    subsumption_mode: bool = True
    overlap_mode: bool = True
    ordered_mode: bool = False
    contiguous_mode: bool = False
    partial_mode: bool = False
    max_word_gap: int = 1
    window_size: int = -1
    partial_match_threshold: float = 0.5
    max_words_in_term: int = 10
    compacted: bool = False
    # search-time result filters (isFilteredOut,
    # NobleCoderTerminology.java:1706-1782): applied AFTER best-candidate
    # selection; a concept with an empty source/semtype list always passes
    source_filter: tuple[str, ...] = ()
    semtype_filter: tuple[str, ...] = ()

    def for_search(self) -> "MatchConfig":
        """Apply setupSearch flag fixing (NobleCoderTerminology.java:
        1168-1211). Memoized per config value — the kernel calls this
        once per sentence and the dataclasses.replace chain costs ~15%%
        of matcher CPU otherwise."""
        hit = _FOR_SEARCH_CACHE.get(self)
        if hit is not None:
            return hit
        out = self._compute_for_search()
        _FOR_SEARCH_CACHE[self] = out
        return out

    def _compute_for_search(self) -> "MatchConfig":
        m = self.search_method
        if m == BEST_MATCH:
            cfg = replace(self, subsumption_mode=True, overlap_mode=True,
                          contiguous_mode=True, ordered_mode=False,
                          partial_mode=False, max_word_gap=1)
        elif m == ALL_MATCH:
            cfg = replace(self, subsumption_mode=False, overlap_mode=True,
                          contiguous_mode=False, ordered_mode=False,
                          partial_mode=False, ignore_used_words=False)
        elif m == PRECISE_MATCH:
            cfg = replace(self, subsumption_mode=True, overlap_mode=True,
                          contiguous_mode=True, ordered_mode=True,
                          partial_mode=False, max_word_gap=0)
        elif m == NONOVERLAP_MATCH:
            cfg = replace(self, subsumption_mode=True, overlap_mode=False,
                          contiguous_mode=False, ordered_mode=False,
                          partial_mode=False)
        elif m == PARTIAL_MATCH:
            cfg = replace(self, subsumption_mode=False, overlap_mode=False,
                          contiguous_mode=False, ordered_mode=False,
                          partial_mode=True)
        else:
            cfg = self
        if cfg.compacted:
            cfg = replace(cfg, ignore_used_words=False)
        return cfg


@dataclass
class TerminologyIndex:
    """Broadcastable terminology index (Storage parity, see module doc).

    word_terms:  normalized word -> tuple of normalized terms containing it
    term_cuis:   normalized term -> tuple of CUIs
    word_term_count: word -> number of distinct terms containing it
                 (WordStat.termCount, NobleCoderTerminology.java:398-401)
    concepts:    cui -> ConceptMeta
    regex_terms: ((pattern_source, cui), ...) for /regex/ synonyms
                 (NobleCoderTerminology.java:1063-1070,1495-1549)
    blacklist:   word -> restricted tuple of terms (BlacklistHandler.java:82-106)
    """

    word_terms: dict[str, tuple[str, ...]] = field(default_factory=dict)
    term_cuis: dict[str, tuple[str, ...]] = field(default_factory=dict)
    word_term_count: dict[str, int] = field(default_factory=dict)
    concepts: dict[str, ConceptMeta] = field(default_factory=dict)
    regex_terms: tuple[tuple[str, str], ...] = ()
    blacklist: dict[str, tuple[str, ...]] = field(default_factory=dict)
    compacted: bool = False
    # any-code -> CUI (Storage.codeMap, NobleCoderTerminology.java:163,
    # populated first-wins at addConcept :1092-1095); lookup fallback in
    # lookup_by_code below (:1901-1913 lookupConcept)
    code_map: dict[str, str] = field(default_factory=dict)

    def lookup_by_code(self, code: str) -> ConceptMeta | None:
        """lookupConcept parity (NobleCoderTerminology.java:1901-1913):
        try the concept map, then resolve through codeMap."""
        c = self.concepts.get(code)
        if c is None and code in self.code_map:
            c = self.concepts.get(self.code_map[code])
        return c

    def save(self, path: str) -> None:
        """Persist the index artifact (terminology persistence sink,
        NobleCoderTerminology.Storage.save :265-306 — here one pickled
        blob; on a cluster also ship via SparkFiles for executor-local
        mmap when too big to broadcast)."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def load(path: str) -> "TerminologyIndex":
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    def stats(self) -> dict[str, float]:
        """Global index stats (ConceptImporter.java:963-969)."""
        tpw = [len(v) for v in self.word_terms.values()]
        return {
            "word_count": len(self.word_terms),
            "term_count": len(self.term_cuis),
            "concept_count": len(self.concepts),
            "avg_terms_per_word": (sum(tpw) / len(tpw)) if tpw else 0.0,
            "max_terms_per_word": max(tpw) if tpw else 0,
        }
