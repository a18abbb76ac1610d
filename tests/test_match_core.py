"""Matcher golden tests (SURVEY.md §5.2 item 2): hand-computed expected
mentions over the adversarial pytest terminology, exercising each flag
combo of setupSearch (NobleCoderTerminology.java:1168-1211) plus scoring,
subsumption, gaps, regex synonyms, acronym doc-pass, plural/diacritic and
case traps (seed strings from the reference's own main() drivers)."""

import pytest

from nobletools_spark.index import build_index
from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.match_core import acronym_pass, match_sentence
from nobletools_spark.sources.fixtures import pytest_index

IDX = pytest_index()


def cuis(mentions):
    return sorted(m.cui for m in mentions)


def match(text, **cfg_kw):
    return match_sentence(text, IDX, MatchConfig(**cfg_kw))


def test_best_match_subsumption():
    # 'deep margin' subsumes 'deep' and 'margin'
    # (NobleCoderTerminology.java:138 doc comment example)
    ms = match("The deep margin is clear.")
    assert cuis(ms) == ["C001"]
    m = ms[0]
    assert m.matched_term == "deep margin"
    assert [a[0] for a in m.annotations] == ["deep", "margin"]
    # offsets are sentence-relative positions of the original words
    assert m.annotations[0][1] == 4 and m.annotations[1][1] == 9


def test_all_match_keeps_subsumed():
    ms = match("The deep margin is clear.", search_method="all-match")
    assert cuis(ms) == ["C001", "C002", "C003"]


def test_case_trap_acronym_scoring():
    # FISH (method) vs fish (animal) — reference main commented cases
    # (NobleCoderTerminology.java:2509-2532)
    ms = match("FISH was performed.")
    assert cuis(ms) == ["C005"]
    ms = match("They caught fish.")
    assert cuis(ms) == ["C006"]


def test_word_gap_allows_one_intervening_word():
    # best-match: contiguous with maxWordGap=1
    ms = match("skin deep margin")
    assert cuis(ms) == ["C001", "C012"]
    # two intervening words -> no skin-margin match
    ms = match("skin very deep excised margin")
    assert "C012" not in cuis(ms)


def test_precise_match_requires_order_and_adjacency():
    # unordered text matches best-match but not precise-match
    ms_best = match("margin skin sample")
    assert "C012" in cuis(ms_best)
    ms_precise = match("margin skin sample", search_method="precise-match")
    assert "C012" not in cuis(ms_precise)
    # ordered adjacent matches precise-match
    ms = match("skin margin sample", search_method="precise-match")
    assert "C012" in cuis(ms)


def test_stopword_inside_term():
    # 'Septum of Nose' normalizes to 'septum nose'; stopword 'of' in text
    # is stripped, closing the gap
    ms = match("The septum of nose deviates to the left.")
    assert "C004" in cuis(ms)


def test_regex_synonym():
    ms = match("Pathologic stage iv present.")
    assert cuis(ms) == ["C008"]
    assert ms[0].score == 1.0
    assert ms[0].annotations[0] == ("stage iv", 11)
    # case-insensitive
    assert "C008" in cuis(match("Pathologic Stage IV present."))


def test_plural_and_diacritics():
    ms = match("Two churches were seen.")
    assert cuis(ms) == ["C010"]
    assert ms[0].matched_term == "churches"
    ms = match("The Protégé software crashed.")
    assert cuis(ms) == ["C011"]


def test_nasal_septum_from_reference_main():
    ms = match("The nasal septum deviates to the left.")
    assert cuis(ms) == ["C004"]
    assert ms[0].matched_term == "nasal septum"


def test_melanoma_subsumption_bonus_and_best_candidate():
    # 'malignant melanoma' (2 words) subsumes 'melanoma' term; both map to
    # C013; subsumption sweep keeps only the longer term
    ms = match("Findings consistent with malignant melanoma.")
    assert cuis(ms) == ["C013"]
    assert ms[0].term_norm == "malign melanoma"


def test_acronym_doc_pass_propagates():
    cfg = MatchConfig()
    s1 = "World Health Organization (WHO) announced new rules."
    s2 = "WHO raised concerns."
    sents = [(s1, 0, match_sentence(s1, IDX, cfg)),
             (s2, 100, match_sentence(s2, IDX, cfg))]
    assert cuis(sents[0][2]) == ["C009"]
    assert sents[1][2] == []  # 'WHO' alone is not a dictionary term
    acr = acronym_pass(sents)
    assert acr == {"WHO": "C009"}
    # acronym annotation added to the defining mention
    assert ("WHO", s1.find("WHO")) in sents[0][2][0].annotations
    # later bare 'WHO' becomes a C009 mention
    assert cuis(sents[1][2]) == ["C009"]
    assert sents[1][2][0].annotations == [("WHO", 0)]


def test_mention_rechunk_on_repeated_term():
    # same concept twice in one sentence -> two mentions
    # (Mention.getMentions coder/model/Mention.java:117-179)
    ms = match("fish and more fish today")
    assert cuis(ms) == ["C006", "C006"]
    starts = sorted(m.start for m in ms)
    assert starts == [0, 14]


def test_ignore_used_words_greedy():
    # margin consumed by 'deep margin' via rarest-first greedy; the bare
    # 'margin' term is not separately emitted in best-match
    ms = match("deep margin and another margin")
    by_cui = {m.cui for m in ms}
    assert "C001" in by_cui
    # C003 'margin' is subsumed (global sweep) even though margin repeats
    assert "C003" not in by_cui


def test_all_match_no_used_words():
    ms = match("deep margin and another margin", search_method="all-match")
    assert {m.cui for m in ms} == {"C001", "C002", "C003"}


def test_partial_match():
    # 'nasal septum' at 50% threshold: one of two words present
    ms = match("the septum only", search_method="partial-match")
    assert "C004" in cuis(ms)


def test_compacted_index_same_results():
    idx_c = pytest_index(compact=True)
    for text in ["The deep margin is clear.", "skin deep margin",
                 "Findings consistent with malignant melanoma.",
                 "The nasal septum deviates to the left."]:
        a = sorted((m.cui, m.term_norm) for m in match(text))
        b = sorted((m.cui, m.term_norm)
                   for m in match_sentence(text, idx_c, MatchConfig()))
        assert a == b, text


def test_scoring_positive_filter():
    # a mention whose every candidate scores < 0 is dropped entirely:
    # C005 FISH on lowercase non-abbrev context loses; C006 wins instead
    ms = match("They caught fish.", select_best_candidate=False)
    assert "C005" not in cuis(ms) and "C006" in cuis(ms)


def test_empty_and_unknown():
    assert match("") == []
    assert match("nothing matches here at all") == []


def test_index_stats():
    st = IDX.stats()
    assert st["concept_count"] == len(pytest_index().concepts)
    assert st["term_count"] > 10
    assert st["max_terms_per_word"] >= 2  # 'margin' in 3 terms


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_window_size_limits_span():
    """getTextWords (:1350-1361): with windowSize set (and
    ignoreUsedWords off — the reference disables the window under it),
    term words further apart than the window can't combine."""
    # 'skin ... margin' with the pair split beyond a 3-word window
    text = "skin was very clearly near margin"
    # all-match sets ignore_used_words False; contiguity off
    far = match(text, search_method="all-match", window_size=3)
    assert "C012" not in cuis(far)
    near = match("skin margin", search_method="all-match", window_size=3)
    assert "C012" in cuis(near)
    # window disabled → word-set match succeeds at any distance
    nolimit = match(text, search_method="all-match")
    assert "C012" in cuis(nolimit)


def test_blacklist_restricts_hot_words():
    """BlacklistHandler (:82-106): blacklisted word probes consult the
    restricted term list instead of the full wordMap."""
    idx = pytest_index()
    # force 'margin' onto the blacklist with an empty allowed-term list
    idx.blacklist = {"margin": ()}
    got = match_sentence("A margin was seen.", idx, MatchConfig())
    assert "C003" not in [m.cui for m in got]
    # non-blacklisted probes unaffected
    got2 = match_sentence("Melanoma was seen.", idx, MatchConfig())
    assert "C013" in [m.cui for m in got2]


def test_source_semtype_filter_core():
    got = match_sentence("Melanoma near the deep margin.", IDX,
                         MatchConfig(semtype_filter=("T191",)))
    assert set(cuis(got)) == {"C013"}
    got = match_sentence("Melanoma near the deep margin.", IDX,
                         MatchConfig(source_filter=("NOPE",)))
    assert got == []


def test_regex_synonym_respects_result_filters():
    """process() wraps searchRegExp results in the SAME isFilteredOut
    source/semtype check as dictionary matches
    (NobleCoderTerminology.java:2263-2268) — a regex-synonym concept
    outside the active source filter must not leak into results."""
    text = "Pathologic stage iv present."
    assert "C008" in cuis(match(text))                      # unfiltered
    got = match_sentence(text, IDX, MatchConfig(source_filter=("NOPE",)))
    assert "C008" not in [m.cui for m in got]
    got2 = match_sentence(text, IDX,
                          MatchConfig(semtype_filter=("T999",)))
    assert "C008" not in [m.cui for m in got2]


def test_acronym_offsets_with_decomposed_unicode():
    """fold_diacritics is length-preserving: acronym offsets computed
    on the folded sentence must be valid in the ORIGINAL even when the
    input carries decomposed (NFD) accents before the definition."""
    import unicodedata

    cfg = MatchConfig()
    s1 = unicodedata.normalize(
        "NFD", "Protégé étude World Health Organization (WHO) rules.")
    sents = [(s1, 0, match_sentence(s1, IDX, cfg))]
    exp = [m for m in sents[0][2] if m.cui == "C009"]
    assert exp
    acronym_pass(sents)
    anns = dict(exp[0].annotations)
    assert "WHO" in anns
    # the recorded offset must point at 'WHO' in the ORIGINAL string
    assert s1[anns["WHO"]:anns["WHO"] + 3] == "WHO"


def test_acronym_duplicate_same_code_mentions_removed():
    """AcronymDetector:166-176 nulls the shared `code` after the first
    same-code mention, so later same-text mentions are REMOVED — a
    sentence with two bare acronym occurrences yields ONE propagated
    mention, not two."""
    from nobletools_spark.operators.match_core import Mention

    cfg = MatchConfig()
    s1 = "World Health Organization (WHO) announced new rules."
    s2 = "WHO said WHO applies."
    sents = [(s1, 0, match_sentence(s1, IDX, cfg)),
             (s2, 100, match_sentence(s2, IDX, cfg))]
    acronym_pass(sents)
    who = [m for m in sents[1][2] if m.cui == "C009"]
    assert len(who) == 1
    assert who[0].annotations == [("WHO", 0)]
    # PRE-EXISTING duplicate same-code mentions (a dictionary term
    # re-chunked twice): the first survives, the second is removed —
    # the never-nulled-code port kept both
    dup = [Mention("C009", "WHO", "who", 1.0, [("WHO", 0)], s2),
           Mention("C009", "WHO", "who", 1.0, [("WHO", 9)], s2)]
    sents2 = [(s1, 0, match_sentence(s1, IDX, cfg)),
              (s2, 100, dup[:])]
    _, _, out = sents2[1]
    acronym_pass(sents2)
    who2 = [m for m in out if m.cui == "C009"]
    assert len(who2) == 1 and who2[0].annotations == [("WHO", 0)]


def test_single_word_stem_only_penalty():
    """scoreConcept (NobleCoderTerminology.java:2388-2495): a single
    word matching a synonym ONLY via stemming (surface 'custom' vs
    synonym 'customer', not a plural) takes the -10 penalty and drops
    below the mention gate; the exact surface, the plural surface
    ('customs' — is_plural exempts it), and the multi-word term all
    match. Pins the quirk the DuckDB oracle's LIKE replay cannot see
    (see __spark_entry__._mentions_ctes_body scope note)."""
    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.match_core import match_sentence
    from nobletools_spark.sources.fixtures import builtin_index

    idx = builtin_index()
    cfg = MatchConfig().for_search()
    assert match_sentence("a custom row", idx, cfg) == []
    assert [m.cui for m in match_sentence("the customer ordered",
                                          idx, cfg)] == ["C103"]
    assert [m.cui for m in match_sentence("customs", idx, cfg)] == ["C103"]
    assert [m.cui for m in match_sentence("custom entity here",
                                          idx, cfg)] == ["C103"]


def test_original_term_trim_dedup():
    """getOriginalTerm's TreeSet comparator compares last-char-TRIMMED
    forms on position ties (NobleCoderTerminology.java:1384-1395), so
    two term words sharing a trimmed form and a sentence position
    ('her2'/'her3' → 'her') count as EQUAL — the first inserted wins
    and the other drops from the original term."""
    from nobletools_spark.operators.match_core import _original_term

    # both trim to 'her'; txt.find('her') is the same position for both
    assert _original_term("her2 and her3 amplification",
                          "her2 her3", {}) == "her2"
    # distinct trimmed forms keep both, position-ordered
    assert _original_term("deep margin noted",
                          "margin deep", {}) == "deep margin"


def test_filter_drops_concepts_with_no_sources_or_semtypes():
    """isFilteredOut keep-if-null is dead code: Concept.getSources /
    getSemanticTypes never return null (Concept.java:615-617), so under
    an active filter a concept carrying NO sources / semtypes is
    dropped, not kept."""
    from nobletools_spark.index import build_index
    from nobletools_spark.model import MatchConfig

    bare = [{"cui": "C1", "name": "melanoma", "synonyms": ("melanoma",),
             "semtypes": (), "sources": ()}]
    idx = build_index(bare)
    assert match_sentence("melanoma seen", idx, MatchConfig())
    assert match_sentence("melanoma seen", idx,
                          MatchConfig(semtype_filter=("T047",))) == []
    assert match_sentence("melanoma seen", idx,
                          MatchConfig(source_filter=("NCI",))) == []
