"""NegEx goldens (reference tools/NegEx.java; Chapman 2001 semantics)."""

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.match_core import match_sentence
from nobletools_spark.operators.negex import negex
from nobletools_spark.sources.fixtures import pytest_index

IDX = pytest_index()


def _mods(text: str, cui: str) -> dict:
    mentions = match_sentence(text, IDX, MatchConfig())
    negex(text, mentions)
    for m in mentions:
        if m.cui == cui:
            return m.modifiers
    raise AssertionError(cui)


def test_pre_negation():
    assert _mods("No evidence of melanoma.", "C013")["Polarity"] == \
        "Negative_Polarity"
    assert _mods("Denies melanoma.", "C013")["Polarity"] == \
        "Negative_Polarity"


def test_post_negation_retroactive():
    assert _mods("Melanoma was ruled out.", "C013")["Polarity"] == \
        "Negative_Polarity"


def test_affirmed_untouched():
    assert "Polarity" not in _mods("Melanoma was seen.", "C013")


def test_conjunction_stops_scope():
    text = "No evidence of margins but melanoma was seen."
    assert _mods(text, "C003")["Polarity"] == "Negative_Polarity"
    assert "Polarity" not in _mods(text, "C013")


def test_window_bounds_pre_negation():
    text = "No evidence in any of the several previously archived slides of melanoma."
    assert "Polarity" not in _mods(text, "C013")


def test_indeterminate_hedges_retroactively():
    text = "Melanoma cannot be evaluated."
    assert _mods(text, "C013")["ContextualModality"] == \
        "Hedged_ContextualModality"


def test_pseudo_negation_not_negated():
    assert "Polarity" not in _mods("No change in melanoma.", "C013")
