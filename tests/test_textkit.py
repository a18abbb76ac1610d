"""Golden tests for the normalization kernel (SURVEY.md §5.2 item 1).

Expected values pin the reference contract: tokenizer
(tools/TextTools.java:315-333), normalizeWords (:700-765), Porter stem,
isLikelyAbbreviation (:774-789), sentence splitter
(tools/SentenceDetector.java:91-137). Test strings seeded from the
reference's own main() smoke drivers (NobleCoderTerminology.java:2509-2532).
"""

import pytest

from nobletools_spark.functions.porter import porter_stem, stem
from nobletools_spark.functions.textkit import (
    filter_deid_tags,
    get_words,
    is_likely_abbreviation,
    is_plural,
    normalize,
    normalize_words,
    split_sentences,
    strip_diacritics,
)

PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "digitizer": "digit",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "formaliti": "formal", "triplicate": "triplic",
    "formative": "form", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "adjustable": "adjust",
    "replacement": "replac", "adoption": "adopt", "activate": "activ",
    "probate": "probat", "rate": "rate", "cease": "ceas", "roll": "roll",
    "generalization": "gener", "oscillators": "oscil",
    # domain words used by fixtures
    "tables": "tabl", "merge": "merg", "queries": "queri",
    "customer": "custom", "melanoma": "melanoma", "deviates": "deviat",
}


def test_porter_vectors():
    for word, expect in PORTER_VECTORS.items():
        assert porter_stem(word) == expect, word


def test_stem_lowercases_and_empty():
    assert stem("Tables") == "tabl"
    assert stem("") == ""
    assert stem(None) == ""


def test_get_words_delimiters_and_trailing_periods():
    # '.' is not a delimiter; only trailing periods are stripped
    assert get_words("The nasal septum deviates to the left.") == [
        "The", "nasal", "septum", "deviates", "to", "the", "left"]
    assert get_words("a-b c/d|e_f (g) [h] \"i\" j<k>l") == list("abcdefghijkl")
    assert get_words("1.5 cm margin") == ["1.5", "cm", "margin"]
    assert get_words("Dr. Smith vs. Jones") == ["Dr", "Smith", "vs", "Jones"]
    assert get_words("  ") == []
    assert get_words("skin, hello") == ["skin", "hello"]


def test_normalize_words_chain():
    # stopword removal + stemming
    assert normalize_words("The nasal septum deviates to the left") == [
        "nasal", "septum", "deviat", "left"]
    # genitive removal
    assert normalize_words("crohn's disease") == ["crohn", "diseas"]
    # parenthetic plural removal
    assert normalize_words("finding(s) of margin(es)") == ["find", "margin"]
    # decimal protection: 1.5 survives as one token
    assert normalize_words("margin of 1.5 cm") == ["margin", "1.5", "cm"]
    # digits kept when strip_digits=False (matcher default,
    # NobleCoderTerminology.java "don't strip digits" at :2232)
    assert normalize_words("stage 3 tumor") == ["stage", "3", "tumor"]
    assert normalize_words("stage 3 tumor", strip_digits=True) == ["stage", "tumor"]
    # diacritics fold
    assert normalize_words("Protégé") == ["proteg"]


def test_normalize_words_abbreviation_not_stemmed():
    # all-caps short token is likely abbreviation -> not stemmed...
    # but normalize_words lowercases FIRST (TextTools.java:713), so 'DCIS'
    # arrives at the stemming stage as 'dcis' (not an abbreviation shape).
    assert normalize_words("DCIS") == [stem("dcis")]


def test_normalize_term_storage_form():
    # term storage uses unique=True, sort=False (NobleCoderTerminology.java:1820)
    assert normalize("Deep Margin", unique_words=True, sort_words=False) == "deep margin"
    assert normalize("margin deep margin", unique_words=True, sort_words=False) == "margin deep"


def test_is_likely_abbreviation():
    assert is_likely_abbreviation("DCIS")          # <=5 all upper
    assert is_likely_abbreviation("FISH")
    assert not is_likely_abbreviation("fish")
    assert not is_likely_abbreviation("Fish")      # capitalized
    assert is_likely_abbreviation("pT3a")          # digit + letters
    assert is_likely_abbreviation("BRCA1")
    assert is_likely_abbreviation("mRNA")          # mixed, not capitalized
    assert not is_likely_abbreviation("melanoma")
    assert is_likely_abbreviation("IL-2(a)")       # junk chars + letters


def test_is_plural():
    assert is_plural("margins")
    assert is_plural("churches")
    assert is_plural("bacteria")   # 'a' suffix from on->a/um->a rows
    assert not is_plural("margin")


def test_split_sentences():
    s = split_sentences("First sentence. Second one! Third?")
    assert [t for t, _ in s] == ["First sentence.", " Second one!", " Third?"]
    assert [o for _, o in s] == [0, 15, 27]
    # decimal point does not split
    s = split_sentences("Margin is 1.5 cm. Next.")
    assert [t for t, _ in s] == ["Margin is 1.5 cm.", " Next."]
    # known abbreviations do not split
    s = split_sentences("Smith et al. found it. Done.")
    assert [t for t, _ in s] == ["Smith et al. found it.", " Done."]
    # single-capital initials mid-sentence do not split; note the
    # reference's exception regex (SentenceDetector.java:19) requires a
    # \W BEFORE the abbreviation, so a sentence-initial "Dr." does split.
    s = split_sentences("He saw Dr. A. Smith agree. Done.")
    assert [t for t, _ in s] == ["He saw Dr. A. Smith agree.", " Done."]
    # trailing text without terminator is kept
    s = split_sentences("No terminator here")
    assert [t for t, _ in s] == ["No terminator here"]
    # newlines replaced by spaces, offsets preserved
    s = split_sentences("One\ntwo. Three.")
    assert s[0] == ("One two.", 0)
    # non-whitespace after period -> no split
    s = split_sentences("see www.site.org now. End.")
    assert [t for t, _ in s] == ["see www.site.org now.", " End."]


def test_offsets_roundtrip():
    text = "Alpha beta. Gamma delta! Eps."
    for sent, off in split_sentences(text):
        assert text[off:off + len(sent)].replace("\n", " ") == sent


def test_filter_deid_tags_length_preserving():
    t = "**NAME[John Smith] was seen on **DATE[Oct 15 2007]."
    out = filter_deid_tags(t)
    assert len(out) == len(t)
    assert "John" not in out and "DATE" not in out
    assert out.endswith(".")


def test_strip_diacritics():
    assert strip_diacritics("Protégé") == "Protege"
    assert strip_diacritics("naïve café") == "naive cafe"
    assert strip_diacritics("ascii") == "ascii"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_get_ngrams():
    from nobletools_spark.functions.textkit import get_ngrams
    assert get_ngrams("a b c", 2) == ["a", "b", "c", "a b", "b c"]
    assert get_ngrams("one", 3) == ["one"]


def test_parse_deid_date():
    from nobletools_spark.functions.textkit import parse_deid_date
    dt = parse_deid_date("**DATE[Oct 15 2007] 1453")
    assert (dt.year, dt.month, dt.day, dt.hour, dt.minute) == (2007, 10, 15, 14, 53)
    assert parse_deid_date("**DATE[10/15/2007]").day == 15
    assert parse_deid_date("no tag here") is None


def test_index_save_load(tmp_path):
    from nobletools_spark.sources.fixtures import pytest_index
    p = str(tmp_path / "idx.pkl")
    idx = pytest_index()
    idx.save(p)
    from nobletools_spark.model import TerminologyIndex
    back = TerminologyIndex.load(p)
    assert back.term_cuis == idx.term_cuis
    assert back.word_terms == idx.word_terms


def test_root_paths():
    from nobletools_spark.operators.triples import root_paths
    from nobletools_spark.sources.fixtures import PYTEST_ISA_EDGES
    paths = root_paths(list(PYTEST_ISA_EDGES), "C012")
    # diamond: two paths to C015
    assert ["C012", "C003", "C015"] in paths
    assert ["C012", "C017", "C015"] in paths
    # a pure cycle has no parentless goal: the depth gate bounds the
    # expansion and NO path is returned (PathHelper.findPaths has no
    # cycle guard and never emits a path ending at a non-root)
    assert root_paths([("A", "B"), ("B", "A")], "A") == []
    # a root at path length limit+1 still lands (7 hops with limit 7):
    # the goal test precedes the depth gate (findPaths :363-371)
    chain = [(f"c{i}", f"c{i+1}") for i in range(7)]   # c0→…→c7, 7 hops
    assert root_paths(chain, "c0") == [
        ["c0"] + [f"c{i}" for i in range(1, 8)]]
    # one hop deeper is dropped, not truncated
    chain8 = [(f"c{i}", f"c{i+1}") for i in range(8)]
    assert root_paths(chain8, "c0") == []


def test_string_stats_exact_java_semantics():
    """TextTools.java:1261-1263 EXACT: isUppercase/isLowercase require
    EVERY char to be that case — 'A.B' is neither; isCapitalized needs
    lowerCase == alphabetic-1."""
    from nobletools_spark.functions.textkit import (StringStats,
                                                    is_likely_abbreviation)

    assert not StringStats("A.B").is_uppercase        # 2 upper, 3 chars
    assert StringStats("WHO").is_uppercase
    assert not StringStats("abc.").is_lowercase       # '.' breaks it
    assert StringStats("abc").is_lowercase
    assert StringStats("Abc").is_capitalized
    assert not StringStats("McDonald").is_capitalized
    # 'T.B' has junk? no digits/parens — and is NOT all-uppercase, so
    # the short-caps abbreviation branch must not fire
    assert not is_likely_abbreviation("T.B")
    assert is_likely_abbreviation("WHO")


def test_is_common_word_unstemmed():
    """TextTools.isCommonWord (:263-269) normalizes WITHOUT stemming:
    'only'/'very' are common; their stems 'onli'/'veri' are not in the
    list and must not be consulted."""
    from nobletools_spark.functions.textkit import is_common_word

    assert is_common_word("only")
    assert is_common_word("very")
    assert is_common_word("Only ")


def test_common_word_entries_normalize_and_deid_colon_time():
    """getCommonWords normalizes its LIST entries too (:108) — 'I'/'i'
    must hit; and the DeID date's optional military time accepts both
    '1453' and '14:53' (DeIDUtils.java:18 `\\d{2}\\:?\\d{2}`)."""
    from nobletools_spark.functions.textkit import (
        is_common_word, parse_deid_date)

    assert is_common_word("I") and is_common_word("i")
    a = parse_deid_date("**DATE[Oct 15 2007] 14:53")
    b = parse_deid_date("**DATE[Oct 15 2007] 1453")
    assert a == b and a is not None and a.hour == 14 and a.minute == 53
