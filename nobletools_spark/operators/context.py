"""ConText modifier detection — negation / experiencer / temporality /
certainty qualification of concept mentions (reference:
tools/ConText.java; algorithm: Harkema et al., J Biomed Inform 2009).

The reference drives a second NobleCoder terminology (built from
ConText.owl) over each sentence with custom flags (ConText.java:133-146:
contiguous, ordered, gap 0, no stemming, no stop-word stripping, no
scoring), then assigns each non-pseudo linguistic-modifier mention to
concept mentions inside a directional word window (default 8,
ConText.java:55), clipped by terminator mentions (ConText.java:428-471,
getWordWindowIndex :473-499), with per-type default values
(ConText.java:364-375) and pseudo-modifier suppression (:562-586).

Spark shape: the modifier lexicon compiles into a second broadcast
TerminologyIndex + rule table; the whole assignment is sentence-local,
so it runs inside the same mapInPandas batch as the matcher — zero extra
shuffle, linear scale-out. Rules come from flat records (FIXTURES.md §3)
or an OWL-distributed modifier ontology via ``context_index_from_owl``
(ConText(IOntology) parity); DEFAULT_RULES carries a compact built-in
lexicon following the published ConText phrase sets (the web-hosted
Modifier.owl is not bundled with the reference either).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from nobletools_spark.index import build_index
from nobletools_spark.model import MatchConfig, TerminologyIndex
from nobletools_spark.operators.match_core import Mention, match_sentence

ACTION_FORWARD = "forward"
ACTION_BACKWARD = "backward"
ACTION_BIDIRECTIONAL = "bidirectional"
ACTION_TERMINATE = "terminate"
ACTION_DISCONTINUOUS = "discontinuous"

DEFAULT_WINDOW_SIZE = 8  # ConText.java:55

# terminology flags per ConText.load (ConText.java:133-146): CUSTOM
# search, contiguous+ordered, gap 0, overlap, no subsumption, no scoring,
# no stemming/stop-stripping, keep small words
CONTEXT_MATCH_CFG = MatchConfig(
    search_method="custom", stem_words=False, strip_stop_words=False,
    ignore_small_words=False, score_concepts=False,
    select_best_candidate=False, subsumption_mode=False, overlap_mode=True,
    ordered_mode=True, contiguous_mode=True, partial_mode=False,
    max_word_gap=0)


@dataclass(frozen=True)
class ModifierRule:
    """One modifier concept of the lexicon. ``group`` plays the role of
    the OWL parent class code — terminator/pseudo references point at
    groups (ConText.getTerminators matches terminator parents against
    the modifier's termination list, ConText.java:502-516)."""

    code: str
    terms: tuple[str, ...]
    mod_type: str                    # Polarity / Experiencer / ... (ConText.java:58-83)
    value: str                       # e.g. Negative_Polarity
    action: str = ACTION_FORWARD
    window: int = DEFAULT_WINDOW_SIZE
    group: str = ""
    terminated_by: tuple[str, ...] = ()
    pseudo: tuple[str, ...] = ()     # pseudo groups that cancel this rule
    is_pseudo: bool = False


@dataclass
class ContextIndex:
    """Broadcastable compiled lexicon: matcher index + rule lookup +
    per-type defaults (getDefaultValues, ConText.java:364-375)."""

    index: TerminologyIndex
    rules: dict[str, ModifierRule]
    defaults: dict[str, str] = field(default_factory=dict)
    cfg: MatchConfig = CONTEXT_MATCH_CFG


def build_context_index(rules: list[ModifierRule] | tuple[ModifierRule, ...],
                        defaults: dict[str, str] | None = None) -> ContextIndex:
    concepts = [{"cui": r.code, "name": r.terms[0], "synonyms": r.terms,
                 "semtypes": (), "sources": ("CTX",)} for r in rules]
    # lexicon index normalization must match the match config: no
    # stemming, keep stop words (build-time flags mirror search flags)
    idx = _build_unstemmed_index(concepts)
    # `defaults or ...` would silently swap an EXPLICITLY EMPTY dict
    # (an ontology declaring no isDefaultValue subclasses) for the
    # built-in THYME defaults — reference getDefaultValues returns
    # empty there
    return ContextIndex(index=idx, rules={r.code: r for r in rules},
                        defaults=dict(DEFAULT_VALUES if defaults is None
                                      else defaults))


def _build_unstemmed_index(concepts) -> TerminologyIndex:
    """build_index with the ConText normalization flags (no stem, keep
    stop words) — mirrors NobleCoderTerminology.getTerms honoring the
    terminology's own stemWords/stripStopWords settings."""
    from nobletools_spark.functions.textkit import normalize
    from nobletools_spark.index import MAX_WORDS_IN_TERM, is_regexp
    from nobletools_spark.model import ConceptMeta
    from collections import defaultdict

    metas: dict[str, ConceptMeta] = {}
    term_cuis: dict[str, set] = defaultdict(set)
    for c in concepts:
        meta = ConceptMeta(c["cui"], c["name"], tuple(c["synonyms"]),
                           tuple(c["semtypes"]), tuple(c["sources"]))
        metas[meta.cui] = meta
        for s in {c["name"], *c["synonyms"]}:
            if is_regexp(s) or s.count(" ") > MAX_WORDS_IN_TERM:
                continue
            t = normalize(s, do_stem=False, strip_digits=False,
                          strip_stop_words=False, unique_words=True,
                          sort_words=False)
            if t:
                term_cuis[t].add(meta.cui)
    # filterTerms substring semantics per concept (saveWordTerms,
    # ConceptImporter.java:1299-1355) — matters for sweep order when a
    # lexicon word is a substring of a sibling term ('no' / 'no change')
    word_terms: dict[str, set] = defaultdict(set)
    for c in concepts:
        cterms = set()
        for s in {c["name"], *c["synonyms"]}:
            if is_regexp(s) or s.count(" ") > MAX_WORDS_IN_TERM:
                continue
            t = normalize(s, do_stem=False, strip_digits=False,
                          strip_stop_words=False, unique_words=True,
                          sort_words=False)
            if t:
                cterms.add(t)
        for t in cterms:
            for w in t.split(" "):
                word_terms[w].update(x for x in cterms if w in x)
    return TerminologyIndex(
        word_terms={w: tuple(sorted(ts)) for w, ts in word_terms.items()},
        term_cuis={t: tuple(sorted(cs)) for t, cs in term_cuis.items()},
        word_term_count={w: len(ts) for w, ts in word_terms.items()},
        concepts=metas)


def _word_window_end(text: str, pos: int, window: int) -> int:
    """getWordWindowIndex beforeModifier=true (ConText.java:473-486):
    scan spaces forward from the modifier end; cut after `window`."""
    offs = len(text)
    i, j = pos, 0
    while 0 <= i < len(text):
        if j >= window:
            return i
        i = text.find(" ", i + 1)
        j += 1
    return offs


def _word_window_start(text: str, pos: int, window: int) -> int:
    """getWordWindowIndex beforeModifier=false (ConText.java:487-499)."""
    i, j = pos, 0
    while i >= 0:
        if j > window:
            return i
        i = text.rfind(" ", 0, i) if i > 0 else -1
        j += 1
    return 0


def apply_context(text: str, mentions: list[Mention],
                  ctx: ContextIndex) -> None:
    """Assign modifier values to ``mentions`` (sentence-relative offsets),
    mutating each mention's ``modifiers`` dict — ConText.process
    (ConText.java:385-409)."""
    for m in mentions:
        m.modifiers = dict(ctx.defaults)
        m.modifier_anns = {}

    matched = match_sentence(text, ctx.index, ctx.cfg)
    if not matched:
        return
    with_rules = [(mm, ctx.rules[mm.cui]) for mm in matched
                  if mm.cui in ctx.rules]

    pseudo = [(mm, r) for mm, r in with_rules if r.is_pseudo]
    terminators = [(mm, r) for mm, r in with_rules
                   if r.action == ACTION_TERMINATE]

    for mm, rule in with_rules:
        if rule.is_pseudo or rule.action == ACTION_TERMINATE:
            continue
        # pseudo suppression: intersecting pseudo whose group is listed
        # (ConText.isPseudo :562-586)
        if any(not (mm.end < pm.start or pm.end < mm.start)
               and pr.group in rule.pseudo for pm, pr in pseudo):
            continue
        # a discontinuous-only action yields forward=backward=False →
        # zero targets, exactly like the reference (getTargetMentions
        # :431-434 derives forward/backward from FORWARD/BACKWARD/
        # BIDIRECTIONAL only; ACTION_DISCONTINUOUS never assigns)
        forward = rule.action in (ACTION_FORWARD, ACTION_BIDIRECTIONAL)
        backward = rule.action in (ACTION_BACKWARD, ACTION_BIDIRECTIONAL)
        start = _word_window_start(text, mm.start, rule.window)
        end = _word_window_end(text, mm.end, rule.window)
        # terminator clipping (getTargetMentions :437-446)
        for tm, tr in terminators:
            if tr.group not in rule.terminated_by and tr.code not in rule.terminated_by:
                continue
            if forward and mm.end <= tm.start and tm.start < end:
                end = tm.start
            if backward and tm.end <= mm.start and tm.start > start:
                start = tm.start
        for target in mentions:
            hit = (forward and mm.start <= target.start <= end) or \
                  (backward and mm.start >= target.start >= start)
            if hit:
                target.modifiers[rule.mod_type] = rule.value
                # the assigning trigger phrase's annotations — what
                # Mention.getModifierAnnotations exposes (consumed by
                # ItemInstance's negated branch and the HTML report)
                target.modifier_anns[rule.mod_type] = list(mm.annotations)


# ---------------------------------------------------------------------------
# Default lexicon — the published ConText trigger sets (Harkema et al.,
# J Biomed Inform 2009, 42(5):839-851). The reference loads its phrase
# sets from a web-hosted Modifier.owl that is NOT bundled with the repo,
# so the no-OWL default path carries the published lists instead:
#
# - Polarity + termination come VERBATIM from the NegEx phrase lists
#   (operators/negex.py — themselves .lst-parity-tested against the
#   reference resources): ConText's negation layer is NegEx's published
#   trigger set (Harkema 2009 §2.2 builds on Chapman 2001), with
#   pre-negation → forward, post-negation → backward, pseudo-negation
#   → pseudo, and the conjunction list as scope terminators. A diff
#   test (tests/test_context.py) pins this reuse exactly.
# - Experiencer / Temporality (historical, hypothetical) carry the
#   ConText trigger/pseudo-trigger conventions from the paper (family-
#   member nouns; history-of triggers with the history-of-present-
#   illness/social-history pseudo set; if/return hypotheticals).
# - Certainty / ContextualAspect / Degree / Permanence have no
#   published ConText list (they exist only in the reference's OWL
#   convention), so they keep compact THYME-convention phrase sets.
#
# Extend/replace any of this via build_context_index(rules) or the
# OWL path (context_index_from_owl).
# ---------------------------------------------------------------------------

# All 8 modifier types (ConText.MODIFIER_TYPES, ConText.java:58-83).
# Defaults mirror getDefaultValues (ConText.java:364-375): only types
# whose lexicon class carries hasDefaultValue contribute a default —
# ContextualAspect / Degree / Permanence have N/A defaults in the THYME
# convention the reference's value names follow (Before_DocTimeRel,
# Actual/Hedged_ContextualModality), so they appear only when a rule
# fires; the RESULTS.tsv sink renders them as empty columns otherwise.
DEFAULT_VALUES = {
    "Polarity": "Positive_Polarity",
    "Experiencer": "Patient_Experiencer",
    "Temporality": "Recent_Temporality",
    "ContextualModality": "Actual_ContextualModality",
    "Certainty": "Certain_Certainty",
}

from nobletools_spark.operators.negex import (  # noqa: E402 — data reuse
    CONJUNCTIONS as _TERM_CONJ,
    POST_NEGATION as _NEG_BWD,
    PRE_NEGATION as _NEG_FWD,
    PSEUDO_NEGATION as _NEG_PSEUDO,
)

# Experiencer: family-member trigger nouns (Harkema 2009 experiencer
# conventions; possessive forms kept verbatim even where the matcher's
# \W normalization makes them redundant — same policy as the NegEx
# punctuation entries).
_FAMILY = (
    "family history of", "family history", "family", "mother", "mother's",
    "father", "father's", "brother", "brother's", "sister", "sister's",
    "aunt", "aunt's", "uncle", "uncle's", "grandmother", "grandmother's",
    "grandfather", "grandfather's", "grandparent", "grandparents", "cousin",
    "cousin's", "sibling", "siblings", "son", "son's", "daughter",
    "daughter's", "wife", "wife's", "husband", "husband's", "mom", "dad",
    "grandma", "grandpa", "maternal", "paternal",
)

# Temporality=historical triggers + the published pseudo-history set
# (phrases where the word 'history' does NOT mark the concept as
# historical: Harkema 2009 pseudo-trigger convention).
_HIST = (
    "history", "history of", "past history", "past history of",
    "past medical history", "past medical history of",
    "past surgical history", "previous", "previously", "prior",
    "h/o", "hx", "hx of", "status post", "s/p",
)
_HIST_PSEUDO = (
    "history of present illness", "history of chief complaint",
    "history and physical", "history and examination", "history taking",
    "history, physical", "history, examination", "poor history",
    "social history", "family history", "sudden onset of",
)

# Temporality=hypothetical triggers ('if the patient returns...') and
# their pseudo set ('if negative' describes a test result, not a
# hypothetical concept).
_HYPO = (
    "if", "if patient", "if the patient", "return", "returns", "returned",
    "should", "should the patient", "should there", "as needed",
    "come back", "comes back", "came back",
)
_HYPO_PSEUDO = ("if negative", "if positive", "even if")

_HEDGE = ("possible", "probable", "suspected", "suggestive of",
          "consistent with", "may represent", "questionable")
# The 4 remaining ConText types (ConText.java:61-65). The reference loads
# their phrase sets from the external web-hosted ConText.owl (not bundled
# in the repo), so these are compact published phrase sets in the same
# THYME value convention; replace via build_context_index(rules).
_CERT_HIGH = ("definite", "definitive", "unequivocal", "diagnostic of")
_CERT_MOD = ("probable", "probably", "likely", "presumed")
_CERT_LOW_F = ("doubt", "doubtful", "low suspicion for")
_CERT_LOW_B = ("cannot be excluded", "cannot be ruled out")
_ASPECT_INTERMITTENT = ("intermittent", "episodic", "recurrent",
                        "waxing and waning")
_ASPECT_NOVEL = ("new onset", "newly diagnosed", "newly identified")
_DEGREE_MOST = ("severe", "extensive", "marked", "widespread")
_DEGREE_LITTLE = ("mild", "slight", "minimal", "focal")
_PERM_PERMANENT = ("chronic", "longstanding", "permanent", "lifelong")
_PERM_FINITE = ("transient", "temporary", "resolving")

DEFAULT_RULES: tuple[ModifierRule, ...] = tuple(
    [ModifierRule(f"neg_f_{i}", (t,), "Polarity", "Negative_Polarity",
                  ACTION_FORWARD, group="negation",
                  terminated_by=("conj",), pseudo=("pseudoneg",))
     for i, t in enumerate(_NEG_FWD)]
    + [ModifierRule(f"neg_b_{i}", (t,), "Polarity", "Negative_Polarity",
                    ACTION_BACKWARD, group="negation",
                    terminated_by=("conj",), pseudo=("pseudoneg",))
       for i, t in enumerate(_NEG_BWD)]
    + [ModifierRule(f"neg_p_{i}", (t,), "Polarity", "Positive_Polarity",
                    group="pseudoneg", is_pseudo=True)
       for i, t in enumerate(_NEG_PSEUDO)]
    + [ModifierRule(f"term_{i}", (t,), "", "", ACTION_TERMINATE,
                    group="conj")
       for i, t in enumerate(_TERM_CONJ)]
    + [ModifierRule(f"fam_{i}", (t,), "Experiencer",
                    "FamilyMember_Experiencer", ACTION_FORWARD,
                    group="experiencer", terminated_by=("conj",))
       for i, t in enumerate(_FAMILY)]
    + [ModifierRule(f"hist_{i}", (t,), "Temporality", "Before_DocTimeRel",
                    ACTION_FORWARD, group="temporality",
                    terminated_by=("conj",), pseudo=("pseudohist",))
       for i, t in enumerate(_HIST)]
    + [ModifierRule(f"hist_p_{i}", (t,), "Temporality",
                    "Recent_Temporality", group="pseudohist",
                    is_pseudo=True)
       for i, t in enumerate(_HIST_PSEUDO)]
    + [ModifierRule(f"hypo_{i}", (t,), "Temporality",
                    "Hypothetical_Temporality", ACTION_FORWARD,
                    group="hypothetical", terminated_by=("conj",),
                    pseudo=("pseudohypo",))
       for i, t in enumerate(_HYPO)]
    + [ModifierRule(f"hypo_p_{i}", (t,), "Temporality",
                    "Recent_Temporality", group="pseudohypo",
                    is_pseudo=True)
       for i, t in enumerate(_HYPO_PSEUDO)]
    + [ModifierRule(f"hedge_{i}", (t,), "ContextualModality",
                    "Hedged_ContextualModality", ACTION_FORWARD,
                    group="modality", terminated_by=("conj",))
       for i, t in enumerate(_HEDGE)]
    + [ModifierRule(f"cert_h_{i}", (t,), "Certainty", "High_Certainty",
                    ACTION_FORWARD, group="certainty",
                    terminated_by=("conj",))
       for i, t in enumerate(_CERT_HIGH)]
    + [ModifierRule(f"cert_m_{i}", (t,), "Certainty", "Moderate_Certainty",
                    ACTION_FORWARD, group="certainty",
                    terminated_by=("conj",))
       for i, t in enumerate(_CERT_MOD)]
    + [ModifierRule(f"cert_lf_{i}", (t,), "Certainty", "Low_Certainty",
                    ACTION_FORWARD, group="certainty",
                    terminated_by=("conj",))
       for i, t in enumerate(_CERT_LOW_F)]
    + [ModifierRule(f"cert_lb_{i}", (t,), "Certainty", "Low_Certainty",
                    ACTION_BACKWARD, group="certainty",
                    terminated_by=("conj",))
       for i, t in enumerate(_CERT_LOW_B)]
    + [ModifierRule(f"asp_i_{i}", (t,), "ContextualAspect",
                    "Intermittent_ContextualAspect", ACTION_FORWARD,
                    group="aspect", terminated_by=("conj",))
       for i, t in enumerate(_ASPECT_INTERMITTENT)]
    + [ModifierRule(f"asp_n_{i}", (t,), "ContextualAspect",
                    "Novel_ContextualAspect", ACTION_FORWARD,
                    group="aspect", terminated_by=("conj",))
       for i, t in enumerate(_ASPECT_NOVEL)]
    + [ModifierRule(f"deg_m_{i}", (t,), "Degree", "Most_Degree",
                    ACTION_FORWARD, group="degree", terminated_by=("conj",))
       for i, t in enumerate(_DEGREE_MOST)]
    + [ModifierRule(f"deg_l_{i}", (t,), "Degree", "Little_Degree",
                    ACTION_FORWARD, group="degree", terminated_by=("conj",))
       for i, t in enumerate(_DEGREE_LITTLE)]
    + [ModifierRule(f"perm_p_{i}", (t,), "Permanence",
                    "Permanent_Permanence", ACTION_FORWARD,
                    group="permanence", terminated_by=("conj",))
       for i, t in enumerate(_PERM_PERMANENT)]
    + [ModifierRule(f"perm_f_{i}", (t,), "Permanence", "Finite_Permanence",
                    ACTION_FORWARD, group="permanence",
                    terminated_by=("conj",))
       for i, t in enumerate(_PERM_FINITE)]
)


def default_context_index() -> ContextIndex:
    return build_context_index(DEFAULT_RULES, DEFAULT_VALUES)


# ---------------------------------------------------------------------------
# OWL-distributed lexicon loading (ConText(IOntology), ConText.java:113-344)
# — the reference's actual ConText/Modifier.owl path, rebuilt over
# parse_owl_graph. Rules are derived with the reference's resolution:
#   mod_type / value : getModifierValue (:222-233) — the ancestor chain
#     from the instance's class up to a direct child of LinguisticModifier
#     gives the TYPE (that child's name is the semantic-type the reference
#     attaches) and the VALUE (the class on the path whose direct parent
#     is the type class).
#   action   : hasActionEn restriction, inherited up the chain (:589-596)
#   window   : windowSize, inherited, default 8 (:605-611)
#   terminated_by / pseudo : hasTermination / hasPseudo restrictions on
#     the instance's direct class (:639-657 walk the instance's parents)
#   pseudo rules : instances under the Pseudo root; terminate rules:
#     action == terminate (Closure root) (:502-516,544-586)
#   defaults : the subclass of each type class carrying an
#     isDefaultValue=true restriction (:364-375 via addConcept :264-269)
# ---------------------------------------------------------------------------

CONTEXT_ROOTS = ("Closure", "Pseudo", "LinguisticModifier")  # ConText.java:36


def context_index_from_owl(owl_xml: str) -> ContextIndex:
    """Build a ContextIndex from a ConText-style modifier ontology
    (RDF/XML). Lexical entries are the owl:NamedIndividuals; their
    classes carry the rule attributes as owl:Restriction axioms."""
    from nobletools_spark.sources.owl import parse_owl_graph

    classes, instances = parse_owl_graph(owl_xml)

    def ancestors_of(cname: str) -> list[str]:
        out, stack = [], list(classes.get(cname, {}).get("parents", []))
        while stack:
            p = stack.pop(0)
            if p in out:
                continue
            out.append(p)
            stack.extend(classes.get(p, {}).get("parents", []))
        return out

    def inherited(cname: str, prop: str) -> str | None:
        cur = [cname]
        seen = set()
        while cur:
            nxt = []
            for c in cur:
                if c in seen or c not in classes:
                    continue
                seen.add(c)
                for p, v, _ in classes[c]["restrictions"]:
                    if p == prop:
                        return v
                if prop in classes[c]["props"]:
                    return classes[c]["props"][prop][0]
                nxt.extend(classes[c]["parents"])
            cur = nxt
        return None

    def type_and_value(cname: str) -> tuple[str, str] | None:
        """Walk up from the instance's class to a direct child of
        LinguisticModifier: (type, value-class-on-path). BFS with
        predecessor tracking so multi-parent ontologies resolve the
        value class on the ACTUAL chain to the type class (indexing
        into a flattened ancestor list could pick a sibling branch)."""
        prev: dict[str, str | None] = {cname: None}
        queue = [cname]
        while queue:
            c = queue.pop(0)
            parents = classes.get(c, {}).get("parents", [])
            if "LinguisticModifier" in parents:
                # c is the TYPE class; the value is the direct child
                # through which this chain reached c
                child = prev[c]
                return (c, child) if child is not None else (c, c)
            for p in parents:
                if p not in prev:
                    prev[p] = c
                    queue.append(p)
        return None

    def restriction_values(cname: str, prop: str) -> tuple:
        """Class-valued restriction fillers of ``prop`` on ``cname`` AND
        every ancestor class: the reference stores related concepts
        through getNecessaryRestrictions (ConText.addConcept :300-308),
        which folds in all superclass restrictions (OClass.java
        :177-186) — a hasTermination declared once on a parent class
        must clip the scope of every value beneath it."""
        out: list[str] = []
        seen = {cname}
        queue = [cname]
        while queue:
            c = queue.pop(0)
            for p, v, _ in classes.get(c, {}).get("restrictions", []):
                if p == prop and v not in out:
                    out.append(v)
            for par in classes.get(c, {}).get("parents", []):
                if par not in seen:
                    seen.add(par)
                    queue.append(par)
        return tuple(out)

    rules: list[ModifierRule] = []
    for iname, inst in instances.items():
        terms = tuple(dict.fromkeys(inst["labels"] + inst["synonyms"]))
        if not terms or not inst["types"]:
            continue
        vclass = inst["types"][0]
        anc = ancestors_of(vclass)
        is_pseudo = "Pseudo" in anc
        # action comes ONLY from an instance-level hasActionEn assertion
        # (ConText.getAction :589-596 reads the instance concept's
        # properties, which addConcept(IInstance) :200-207 fills from
        # instance assertions alone) — with none, forward and backward
        # are both false and the modifier assigns to nothing
        inst_action = (inst.get("props", {}).get("hasActionEn") or [None])[0]
        action = (inst_action or "none").lower()
        window = int(inherited(vclass, "windowSize")
                     or DEFAULT_WINDOW_SIZE)
        terminated = restriction_values(vclass, "hasTermination")
        pseudo = restriction_values(vclass, "hasPseudo")
        tv = type_and_value(vclass)
        if is_pseudo or action == ACTION_TERMINATE or tv is None:
            mod_type, value = "", ""
        else:
            mod_type, value = tv
        rules.append(ModifierRule(
            code=iname, terms=terms, mod_type=mod_type, value=value,
            action=action,
            window=window, group=vclass, terminated_by=terminated,
            pseudo=pseudo, is_pseudo=is_pseudo))

    defaults: dict[str, str] = {}
    for cname, c in classes.items():
        if "LinguisticModifier" in c.get("parents", []):
            for sub, sc in classes.items():
                if cname in sc.get("parents", []) and any(
                        p == "isDefaultValue" and str(v).lower() == "true"
                        for p, v, _ in sc["restrictions"]):
                    defaults[cname] = sub
                    break
    return build_context_index(rules, defaults)
