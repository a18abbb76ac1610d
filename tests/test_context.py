"""ConText modifier assignment goldens (reference semantics:
tools/ConText.java:385-409,428-516,562-586) + Spark integration."""

import pytest

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.context import (
    apply_context,
    default_context_index,
)
from nobletools_spark.operators.match_core import match_sentence
from nobletools_spark.sources.fixtures import pytest_index

CFG = MatchConfig()
CTX = default_context_index()
IDX = pytest_index()


def _mods(text: str, want_cui: str) -> dict:
    mentions = match_sentence(text, IDX, CFG)
    apply_context(text, mentions, CTX)
    for m in mentions:
        if m.cui == want_cui:
            return m.modifiers
    raise AssertionError(f"{want_cui} not found in {text!r}: "
                         f"{[m.cui for m in mentions]}")


def test_defaults_applied():
    mods = _mods("Melanoma was seen.", "C013")
    assert mods["Polarity"] == "Positive_Polarity"
    assert mods["Experiencer"] == "Patient_Experiencer"


def test_forward_negation():
    mods = _mods("No evidence of melanoma.", "C013")
    assert mods["Polarity"] == "Negative_Polarity"


def test_backward_negation():
    mods = _mods("Melanoma is ruled out.", "C013")
    assert mods["Polarity"] == "Negative_Polarity"


def test_terminator_clips_forward_scope():
    # negation applies to septum only: "but" terminates before melanoma
    text = "No evidence of nasal septum deviation but melanoma was seen."
    assert _mods(text, "C004")["Polarity"] == "Negative_Polarity"
    assert _mods(text, "C013")["Polarity"] == "Positive_Polarity"


def test_forward_scope_does_not_reach_backward():
    text = "Melanoma was seen without any margins."
    assert _mods(text, "C013")["Polarity"] == "Positive_Polarity"
    assert _mods(text, "C003")["Polarity"] == "Negative_Polarity"


def test_pseudo_suppression():
    # "no change" is pseudo-negation: cancels the "no" trigger it overlaps
    mods = _mods("No change in melanoma today.", "C013")
    assert mods["Polarity"] == "Positive_Polarity"


def test_word_window_limit():
    # modifier more than 8 words before the target: out of scope
    text = ("No evidence right now in any of the reviewed and archived "
            "slides of melanoma.")
    assert _mods(text, "C013")["Polarity"] == "Positive_Polarity"


def test_family_and_history():
    mods = _mods("Family history of melanoma.", "C013")
    assert mods["Experiencer"] == "FamilyMember_Experiencer"
    # greedy used-word marking (ignoreUsedWords, default in the reference
    # ConText terminology too): "family history of" consumes
    # history+of, so the narrower "history of" trigger never fires
    assert mods["Temporality"] == "Recent_Temporality"


def test_history_alone():
    mods = _mods("History of melanoma.", "C013")
    assert mods["Temporality"] == "Before_DocTimeRel"
    assert mods["Experiencer"] == "Patient_Experiencer"


def test_hedging():
    mods = _mods("Findings suggestive of melanoma.", "C013")
    assert mods["ContextualModality"] == "Hedged_ContextualModality"


def test_certainty():
    mods = _mods("Probable melanoma in the specimen.", "C013")
    assert mods["Certainty"] == "Moderate_Certainty"
    # 'probable' also carries the modality hedge (shared trigger)
    assert mods["ContextualModality"] == "Hedged_ContextualModality"
    assert _mods("Definite melanoma identified.",
                 "C013")["Certainty"] == "High_Certainty"
    # backward low-certainty
    assert _mods("Melanoma cannot be excluded.",
                 "C013")["Certainty"] == "Low_Certainty"
    # default applies when nothing fires
    assert _mods("Melanoma was seen.", "C013")["Certainty"] == \
        "Certain_Certainty"


def test_contextual_aspect():
    assert _mods("Recurrent melanoma was found.",
                 "C013")["ContextualAspect"] == \
        "Intermittent_ContextualAspect"
    assert _mods("Newly diagnosed melanoma.",
                 "C013")["ContextualAspect"] == "Novel_ContextualAspect"
    # no THYME default: absent unless a rule fires
    assert "ContextualAspect" not in _mods("Melanoma was seen.", "C013")


def test_degree():
    assert _mods("Severe melanoma was found.", "C013")["Degree"] == \
        "Most_Degree"
    assert _mods("Mild melanoma was found.", "C013")["Degree"] == \
        "Little_Degree"
    assert "Degree" not in _mods("Melanoma was seen.", "C013")


def test_permanence():
    assert _mods("Chronic melanoma noted.", "C013")["Permanence"] == \
        "Permanent_Permanence"
    assert _mods("Transient melanoma noted.", "C013")["Permanence"] == \
        "Finite_Permanence"
    assert "Permanence" not in _mods("Melanoma was seen.", "C013")


def test_new_type_terminator_clipping():
    # 'but' clips the forward degree scope like any other modifier
    text = "Severe margins but melanoma was seen."
    assert _mods(text, "C003")["Degree"] == "Most_Degree"
    assert "Degree" not in _mods(text, "C013")


def test_spark_annotate_with_context(spark):
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.fixtures import SPANS_DDL

    docs = spark.createDataFrame(
        [("d1", [("text", "No evidence of melanoma. FISH was positive.",
                  None, 0)])], SPANS_DDL)
    rows = annotate(docs, IDX, CFG, context=CTX).collect()
    by_cui = {r.cui: r for r in rows}
    assert by_cui["C013"].modifiers["Polarity"] == "Negative_Polarity"
    assert by_cui["C005"].modifiers["Polarity"] == "Positive_Polarity"


def test_modifiers_column_empty_without_context(spark):
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.sources.fixtures import SPANS_DDL

    docs = spark.createDataFrame(
        [("d1", [("text", "No evidence of melanoma.", None, 0)])], SPANS_DDL)
    rows = annotate(docs, IDX, CFG).collect()
    assert rows and all(r.modifiers == {} for r in rows)


CONTEXT_OWL = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ctx="http://example.org/ConText.owl#"
         xml:base="http://example.org/ConText.owl">
  <owl:Ontology rdf:about="http://example.org/ConText.owl"/>
  <owl:ObjectProperty rdf:about="#hasActionEn"/>
  <owl:ObjectProperty rdf:about="#hasTermination"/>
  <owl:ObjectProperty rdf:about="#hasPseudo"/>
  <owl:Class rdf:about="#LinguisticModifier"/>
  <owl:Class rdf:about="#Pseudo"/>
  <owl:Class rdf:about="#Closure"/>

  <owl:Class rdf:about="#Polarity">
    <rdfs:subClassOf rdf:resource="#LinguisticModifier"/>
  </owl:Class>
  <owl:Class rdf:about="#Negative_Polarity">
    <rdfs:subClassOf rdf:resource="#Polarity"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasActionEn"/>
      <owl:hasValue>forward</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasTermination"/>
      <owl:someValuesFrom rdf:resource="#Conjunction_Closure"/>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasPseudo"/>
      <owl:someValuesFrom rdf:resource="#Pseudo_Negation"/>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="#Positive_Polarity">
    <rdfs:subClassOf rdf:resource="#Polarity"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#isDefaultValue"/>
      <owl:hasValue>true</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>

  <owl:Class rdf:about="#Temporality">
    <rdfs:subClassOf rdf:resource="#LinguisticModifier"/>
  </owl:Class>
  <owl:Class rdf:about="#Before_DocTimeRel">
    <rdfs:subClassOf rdf:resource="#Temporality"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasActionEn"/>
      <owl:hasValue>forward</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#windowSize"/>
      <owl:hasValue>2</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>

  <owl:Class rdf:about="#Pseudo_Negation">
    <rdfs:subClassOf rdf:resource="#Pseudo"/>
  </owl:Class>
  <owl:Class rdf:about="#Conjunction_Closure">
    <rdfs:subClassOf rdf:resource="#Closure"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasActionEn"/>
      <owl:hasValue>terminate</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>

  <owl:NamedIndividual rdf:about="#forward"/>
  <owl:NamedIndividual rdf:about="#terminate"/>
  <owl:NamedIndividual rdf:about="#no_evidence_of">
    <rdf:type rdf:resource="#Negative_Polarity"/>
    <rdfs:label>no evidence of</rdfs:label>
    <ctx:hasActionEn rdf:resource="#forward"/>
  </owl:NamedIndividual>
  <owl:NamedIndividual rdf:about="#history_of">
    <rdf:type rdf:resource="#Before_DocTimeRel"/>
    <rdfs:label>history of</rdfs:label>
    <ctx:hasActionEn rdf:resource="#forward"/>
  </owl:NamedIndividual>
  <owl:NamedIndividual rdf:about="#no_change">
    <rdf:type rdf:resource="#Pseudo_Negation"/>
    <rdfs:label>no change</rdfs:label>
  </owl:NamedIndividual>
  <owl:NamedIndividual rdf:about="#but">
    <rdf:type rdf:resource="#Conjunction_Closure"/>
    <rdfs:label>but</rdfs:label>
    <ctx:hasActionEn rdf:resource="#terminate"/>
  </owl:NamedIndividual>
</rdf:RDF>
"""


def test_default_lexicon_reuses_published_negex_lists_verbatim():
    """r2 verdict task #4 parity gate: the default Polarity layer must
    be EXACTLY the published NegEx phrase lists (already .lst-diffed
    against the reference resources in test_negex.py) — forward ==
    pre-negation, backward == post-negation, pseudo == pseudo-negation,
    and the termination group == the conjunction list, all verbatim
    including order."""
    from nobletools_spark.operators import negex
    from nobletools_spark.operators.context import (
        ACTION_BACKWARD,
        ACTION_FORWARD,
        ACTION_TERMINATE,
        DEFAULT_RULES,
    )

    def phrases(pred):
        return tuple(r.terms[0] for r in DEFAULT_RULES if pred(r))

    fwd = phrases(lambda r: r.group == "negation"
                  and r.action == ACTION_FORWARD)
    bwd = phrases(lambda r: r.group == "negation"
                  and r.action == ACTION_BACKWARD)
    pseudo = phrases(lambda r: r.group == "pseudoneg")
    conj = phrases(lambda r: r.group == "conj"
                   and r.action == ACTION_TERMINATE)
    assert fwd == negex.PRE_NEGATION       # 133 entries, file order
    assert bwd == negex.POST_NEGATION      # 24
    assert pseudo == negex.PSEUDO_NEGATION  # 20
    assert conj == negex.CONJUNCTIONS      # 89


def test_widened_negation_phrases_fire():
    """Phrases absent from the r2 compact set must now fire: NegEx pre
    ('fails to reveal'), post ('not identified'), and pseudo ('no
    interval change' must NOT negate)."""
    assert _mods("Biopsy fails to reveal melanoma.",
                 "C013")["Polarity"] == "Negative_Polarity"
    assert _mods("Melanoma not identified.",
                 "C013")["Polarity"] == "Negative_Polarity"
    assert _mods("No interval change in melanoma.",
                 "C013")["Polarity"] == "Positive_Polarity"


def test_experiencer_family_nouns_fire():
    assert _mods("Sister was treated for melanoma.",
                 "C013")["Experiencer"] == "FamilyMember_Experiencer"
    assert _mods("Maternal aunt with melanoma.",
                 "C013")["Experiencer"] == "FamilyMember_Experiencer"


def test_historical_trigger_and_pseudo_history():
    assert _mods("Previous melanoma was excised.",
                 "C013")["Temporality"] == "Before_DocTimeRel"
    # 'social history' / 'history of present illness' are pseudo-history
    assert _mods("Social history melanoma discussion.",
                 "C013")["Temporality"] == "Recent_Temporality"
    # 'family history of' marks the EXPERIENCER, not temporality
    mods = _mods("Family history of melanoma.", "C013")
    assert mods["Experiencer"] == "FamilyMember_Experiencer"
    assert mods["Temporality"] == "Recent_Temporality"


def test_hypothetical_trigger_and_pseudo():
    assert _mods("Return if melanoma recurs.",
                 "C013")["Temporality"] == "Hypothetical_Temporality"
    assert _mods("If positive melanoma margins are found, call.",
                 "C013")["Temporality"] == "Recent_Temporality"


MULTI_PARENT_OWL = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xml:base="http://example.org/ConText.owl">
  <owl:Ontology rdf:about="http://example.org/ConText.owl"/>
  <owl:Class rdf:about="#LinguisticModifier"/>
  <owl:Class rdf:about="#Annotation"/>
  <owl:Class rdf:about="#Experiencer">
    <rdfs:subClassOf rdf:resource="#LinguisticModifier"/>
  </owl:Class>
  <owl:Class rdf:about="#Patient_Experiencer">
    <rdfs:subClassOf rdf:resource="#Annotation"/>
    <rdfs:subClassOf rdf:resource="#Experiencer"/>
  </owl:Class>
  <owl:NamedIndividual rdf:about="#patient">
    <rdf:type rdf:resource="#Patient_Experiencer"/>
    <rdfs:label>patient</rdfs:label>
  </owl:NamedIndividual>
</rdf:RDF>
"""


def test_context_owl_multi_parent_value_class():
    """A value class with an extra non-modifier parent (listed first)
    must still resolve (type=Experiencer, value=Patient_Experiencer):
    indexing into the flattened BFS ancestor list used to return the
    sibling-branch class ('Annotation') as the value."""
    from nobletools_spark.operators.context import context_index_from_owl

    ctx = context_index_from_owl(MULTI_PARENT_OWL)
    rule = ctx.rules["patient"]
    assert rule.mod_type == "Experiencer"
    assert rule.value == "Patient_Experiencer"


def _mods_owl(ctx, text, want_cui):
    mentions = match_sentence(text, IDX, CFG)
    apply_context(text, mentions, ctx)
    for m in mentions:
        if m.cui == want_cui:
            return m.modifiers
    raise AssertionError(want_cui)


def test_context_index_from_owl():
    """OWL-distributed modifier lexicon (ConText(IOntology) parity,
    ConText.java:113-344): rules, defaults, pseudo, terminators, and
    per-class windowSize all derive from the ontology axioms."""
    from nobletools_spark.operators.context import context_index_from_owl

    ctx = context_index_from_owl(CONTEXT_OWL)
    # rule derivation: type/value from the class chain
    r = ctx.rules["no_evidence_of"]
    assert (r.mod_type, r.value) == ("Polarity", "Negative_Polarity")
    assert r.action == "forward"
    assert r.terminated_by == ("Conjunction_Closure",)
    assert r.pseudo == ("Pseudo_Negation",)
    assert ctx.rules["no_change"].is_pseudo
    assert ctx.rules["but"].action == "terminate"
    # defaults via isDefaultValue restriction
    assert ctx.defaults == {"Polarity": "Positive_Polarity"}
    # behavior: negation fires, default applies elsewhere
    assert _mods_owl(ctx, "No evidence of melanoma.", "C013")["Polarity"] \
        == "Negative_Polarity"
    assert _mods_owl(ctx, "Melanoma was seen.", "C013")["Polarity"] \
        == "Positive_Polarity"
    # pseudo suppression
    assert _mods_owl(ctx, "No change in melanoma.", "C013")["Polarity"] \
        == "Positive_Polarity"
    # terminator clipping
    text = "No evidence of margins but melanoma was seen."
    assert _mods_owl(ctx, text, "C003")["Polarity"] == "Negative_Polarity"
    assert _mods_owl(ctx, text, "C013")["Polarity"] == "Positive_Polarity"
    # per-class windowSize=2: history within 2 words only
    assert _mods_owl(ctx, "History of melanoma.",
                     "C013")["Temporality"] == "Before_DocTimeRel"
    assert "Temporality" not in _mods_owl(
        ctx, "History of quite old resolved melanoma.", "C013")


def test_explicit_empty_defaults_not_replaced():
    """An EXPLICITLY empty defaults dict (ontology with no
    isDefaultValue subclasses) must stay empty — `defaults or
    DEFAULT_VALUES` silently substituted the built-in THYME defaults,
    seeding mentions with values the ontology doesn't define."""
    from nobletools_spark.operators.context import (DEFAULT_VALUES,
                                                    build_context_index)

    idx = build_context_index([], defaults={})
    assert idx.defaults == {}
    assert build_context_index([]).defaults == dict(DEFAULT_VALUES)


INHERITED_TERM_OWL = CONTEXT_OWL.replace(
    # move the termination/pseudo restrictions from Negative_Polarity up
    # to its PARENT class Polarity — the reference inherits them through
    # getNecessaryRestrictions (OClass.java:177-186), consumed via the
    # value class's related concepts (ConText.addConcept :300-308)
    """  <owl:Class rdf:about="#Polarity">
    <rdfs:subClassOf rdf:resource="#LinguisticModifier"/>
  </owl:Class>
  <owl:Class rdf:about="#Negative_Polarity">
    <rdfs:subClassOf rdf:resource="#Polarity"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasActionEn"/>
      <owl:hasValue>forward</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasTermination"/>
      <owl:someValuesFrom rdf:resource="#Conjunction_Closure"/>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasPseudo"/>
      <owl:someValuesFrom rdf:resource="#Pseudo_Negation"/>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>""",
    """  <owl:Class rdf:about="#Polarity">
    <rdfs:subClassOf rdf:resource="#LinguisticModifier"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasTermination"/>
      <owl:someValuesFrom rdf:resource="#Conjunction_Closure"/>
    </owl:Restriction></rdfs:subClassOf>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasPseudo"/>
      <owl:someValuesFrom rdf:resource="#Pseudo_Negation"/>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="#Negative_Polarity">
    <rdfs:subClassOf rdf:resource="#Polarity"/>
    <rdfs:subClassOf><owl:Restriction>
      <owl:onProperty rdf:resource="#hasActionEn"/>
      <owl:hasValue>forward</owl:hasValue>
    </owl:Restriction></rdfs:subClassOf>
  </owl:Class>""")


def test_context_owl_inherits_terminations_from_ancestors():
    """hasTermination/hasPseudo declared on an ANCESTOR of the value
    class still clip/suppress: the reference folds superclass
    restrictions into the value concept's related concepts
    (getNecessaryRestrictions), so a termination declared once on
    Polarity governs every polarity value beneath it."""
    from nobletools_spark.operators.context import context_index_from_owl

    ctx = context_index_from_owl(INHERITED_TERM_OWL)
    r = ctx.rules["no_evidence_of"]
    assert r.terminated_by == ("Conjunction_Closure",)
    assert r.pseudo == ("Pseudo_Negation",)
    # behavior: the inherited terminator clips the negation scope
    text = "No evidence of margins but melanoma was seen."
    assert _mods_owl(ctx, text, "C013")["Polarity"] == "Positive_Polarity"
    # and the inherited pseudo phrase suppresses
    assert _mods_owl(ctx, "No change in melanoma.", "C013")["Polarity"] \
        == "Positive_Polarity"


def test_context_owl_actionless_instance_assigns_nothing():
    """An instance with NO hasActionEn assertion matches as a modifier
    but assigns to nothing: the reference reads the action only from
    instance-level properties (ConText.getAction :589-596), and with
    none both forward and backward are false (getTargetMentions
    :431-434) — mentions keep their default values."""
    from nobletools_spark.operators.context import context_index_from_owl

    owl = CONTEXT_OWL.replace(
        '    <ctx:hasActionEn rdf:resource="#forward"/>\n'
        '  </owl:NamedIndividual>\n'
        '  <owl:NamedIndividual rdf:about="#history_of">',
        '  </owl:NamedIndividual>\n'
        '  <owl:NamedIndividual rdf:about="#history_of">', 1)
    ctx = context_index_from_owl(owl)
    assert ctx.rules["no_evidence_of"].action == "none"
    assert _mods_owl(ctx, "No evidence of melanoma.", "C013")["Polarity"] \
        == "Positive_Polarity"
