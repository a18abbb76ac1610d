"""NegEx 1.0 — the alternative negation detector (reference:
tools/NegEx.java; algorithm: Chapman et al., J Biomed Inform 2001, whose
published phrase lists these are). The default coding path uses ConText
(coder/NobleCoder.java:386-389); NegEx is the lighter fallback.

Sentence-local (runs inside the annotate UDF like ConText): tokens are
scanned left→right with list-order prefix matching
(NegEx.findMatch :125-140 — FIRST list entry that prefixes wins, so list
order is semantic); matched elements are typed indeterminate → pseudo →
post-negation → pre-negation → conjunction-stop → concept → plain
(parse :199-330); then a 6-token window pass assigns Negative_Polarity
forward from pre-negation triggers and retroactively from post-negation
triggers, with conjunctions clearing scope (process :442-545).
"""

from __future__ import annotations

import re

from nobletools_spark.operators.match_core import Mention

WINDOW_SIZE = 6  # NegEx.java:459

# Phrase lists transcribed VERBATIM (content and order) from the reference
# resource files (src/main/resources/resources/NegEx*.lst), loaded with
# loadResourceAsList semantics (TextTools.java:169-199: trim, skip blanks
# and '#'). Order is semantic: findMatch is first-prefix-wins
# (NegEx.java:125-140). Entries with punctuation ('w/o evidence of',
# ': no') can never match because parse() strips the sentence with
# \W->space BEFORE matching (NegEx.java:207) while phrases keep their
# punctuation — dead in the reference too; kept verbatim for parity.
# (NegExPossibilityPhrase.lst is commented out in the reference,
# NegEx.java:55 — intentionally not loaded here either.)

PRE_NEGATION = (  # NegExPreNegationPhrases.lst, 133 entries, file order
    'absence of', 'cannot', 'cannot see', 'checked for', 'declined',
    'declines', 'denied', 'denies', 'denying', 'fails to reveal',
    'free of', 'negative for', 'never developed', 'never had',
    'no abnormal', 'no cause of', 'no complaints of', 'no evidence',
    'no evidence of', 'no new evidence', 'no other evidence',
    'no evidence to suggest', 'no findings of', 'no findings to indicate',
    'no mammographic evidence of', 'no new', 'no radiographic evidence of',
    'no sign of', 'no significant', 'no signs of', 'no suggestion of',
    'no suspicious', 'no', 'not appear', 'not appreciate',
    'not associated with', 'not complain of', 'not demonstrate',
    'not exhibit', 'not feel', 'not had', 'not have', 'not know of',
    'not known to have', 'not reveal', 'not see', 'not to be', 'not',
    'non', 'patient was not', 'rather than', 'resolved', 'test for',
    'to exclude', 'unremarkable for', 'with no', 'with no evidence of',
    'w/o evidence of', 'without', 'without any evidence of',
    'without evidence', 'without evidence of', 'without indication of',
    'without sign of', 'lacks', 'rule out', 'rules out', 'rules him out',
    'rules her out', 'rules the patient out', 'rules out for',
    'rules him out for', 'rules her out for', 'rules the patient out for',
    'ruled out', 'ruled him out', 'ruled her out', 'ruled the patient out',
    'ruled out for', 'ruled him out for', 'ruled her out for',
    'ruled the patient out for', 'ruled out against',
    'ruled him out against', 'ruled her out against',
    'ruled the patient out against', 'did rule out', 'did rule out for',
    'did rule out against', 'did rule him out', 'did rule her out',
    'did rule the patient out', 'did rule him out for',
    'did rule her out for', 'did rule him out against',
    'did rule her out against', 'did rule the patient out for',
    'did rule the patient out against', 'can rule out', 'can rule out for',
    'can rule out against', 'can rule him out', 'can rule her out',
    'can rule the patient out', 'can rule him out for',
    'can rule her out for', 'can rule the patinet out for',
    'can rule him out against', 'can rule her out against',
    'can rule the patinet out against', 'adequate to rule out',
    'adequate to rule him out', 'adequate to rule her out',
    'adequate to rule the patient out', 'adequate to rule out for',
    'adequate to rule him out for', 'adequate to rule her out for',
    'adequate to rule the patient out for',
    'adequate to rule the patient out against', 'sufficient to rule out',
    'sufficient to rule him out', 'sufficient to rule her out',
    'sufficient to rule the patient out', 'sufficient to rule out for',
    'sufficient to rule him out for', 'sufficient to rule her out for',
    'sufficient to rule the patient out for',
    'sufficient to rule out against', 'sufficient to rule him out against',
    'sufficient to rule her out against',
    'sufficient to rule the patient out against', 'neither', 'nor',
)

POST_NEGATION = (  # NegExPostNegationPhrases.lst, 24 entries, file order
    'is absent', 'are absent', 'unlikely', 'free', 'was ruled out',
    'is ruled out', 'are ruled out', 'have been ruled out',
    'has been ruled out', 'is not seen', 'are not seen', 'not seen',
    'can be ruled out', 'ruled out', 'not identified', 'not observed',
    'not visible', 'not detected', 'not been found', 'not found',
    'not present', ': no', 'none', 'negative',
)

INDETERMINATE = (  # NegExIndeterminatePhrases.lst, 9 entries, file order
    'cannot be determined', 'cannot be evaluated', 'cannot be assessed',
    'cannot be seen', 'cannot be found', 'not evaluable',
    'cannot determine', 'cannot evaluate', 'unable to assess',
)

PSEUDO_NEGATION = (  # NegExPseudoNegationPhrases.lst, 20 entries, file order
    'no increase', 'no suspicious change', 'no significant change',
    'no change', 'no interval change', 'no definite change',
    'no significant interval change', 'not extend', 'not cause',
    'not drain', 'not certain if', 'not certain whether', 'gram negative',
    'without difficulty', 'not necessarily', 'not only',
    'impossible to rule out', 'no interpretation', 'cannot be ruled out',
    'can not be ruled out',
)

CONJUNCTIONS = (  # NegExPseudoConjunctions.lst, 89 entries, file order
    'but', 'however', 'nevertheless', 'yet', 'though', 'although', 'still',
    'aside from', 'except', 'apart from', 'secondary to',
    'as the cause of', 'as the source of', 'as the reason of',
    'as the etiology of', 'as the origin of', 'as the cause for',
    'as the source for', 'as the reason for', 'as the etiology for',
    'as the origin for', 'as the secondary cause of',
    'as the secondary source of', 'as the secondary reason of',
    'as the secondary etiology of', 'as the secondary origin of',
    'as the secondary cause for', 'as the secondary source for',
    'as the secondary reason for', 'as the secondary etiology for',
    'as the secondary origin for', 'as a cause of', 'as a source of',
    'as a reason of', 'as a etiology of', 'as a cause for',
    'as a source for', 'as a reason for', 'as a etiology for',
    'as a secondary cause of', 'as a secondary source of',
    'as a secondary reason of', 'as a secondary etiology of',
    'as a secondary origin of', 'as a secondary cause for',
    'as a secondary source for', 'as a secondary reason for',
    'as a secondary etiology for', 'as a secondary origin for',
    'as an cause of', 'as an source of', 'as an reason of',
    'as an etiology of', 'as an origin of', 'as an cause for',
    'as an source for', 'as an reason for', 'as an etiology for',
    'as an origin for', 'as an secondary cause of',
    'as an secondary source of', 'as an secondary reason of',
    'as an secondary etiology of', 'as an secondary origin of',
    'as an secondary cause for', 'as an secondary source for',
    'as an secondary reason for', 'as an secondary etiology for',
    'as an secondary origin for', 'cause of', 'cause for', 'causes of',
    'causes for', 'source of', 'source for', 'sources of', 'sources for',
    'reason of', 'reason for', 'reasons of', 'reasons for', 'etiology of',
    'etiology for', 'trigger event for', 'origin of', 'origin for',
    'origins of', 'origins for', 'other possibilities of',
)

# ASCII like Java's \W (replaceAll in parse :207): accented chars
# are NON-word to the reference and blank to spaces
_NONWORD = re.compile(r"\W", re.ASCII)

_PLAIN, _PRE, _POST, _PSEUDO, _STOP, _CONCEPT, _INDET = range(7)

_TYPED_LISTS = (
    (INDETERMINATE, _INDET),   # match priority order (parse :232-290)
    (PSEUDO_NEGATION, _PSEUDO),
    (POST_NEGATION, _POST),
    (PRE_NEGATION, _PRE),
    (CONJUNCTIONS, _STOP),
)


def _find_match(text: str, phrases: tuple[str, ...]) -> str | None:
    """findMatch (:125-140): first list entry that prefixes text at a
    word boundary (list order wins, not longest-match); text is
    lowercased AND trimmed before the length comparisons."""
    low = text.lower().strip()
    for term in phrases:
        if len(low) > len(term):
            if low.startswith(term + " "):
                return text[:len(term)]
        elif len(low) == len(term) and low.startswith(term):
            return text[:len(term)]
    return None


def _find_concept_match(tmp: str,
                        mentions: list[Mention]) -> Mention | None:
    """findConceptMatch (:146-173): first mention (list order) whose
    cleaned surface text prefixes ``tmp`` at a word boundary — note it
    string-matches ANY mention's text, not the mention at this offset,
    so with duplicate surfaces the first occurrence's Mention object
    receives the modifier (reference behavior)."""
    low = tmp.lower()
    for m in mentions:
        # Mention.getText() = annotation WORDS joined by single spaces
        # (gap words excluded) — NOT the sentence span (:151)
        ttext = m.text
        if not ttext:
            continue
        term_text = _NONWORD.sub(" ", ttext.lower())
        if len(low) > len(ttext):
            # Java: text.matches(term_text+"\\b.*") — term_text is all
            # word chars/spaces after the \W cleanup, so safe as regex
            if re.match(term_text + r"\b", low, re.ASCII):
                return m
        elif len(low) == len(ttext) and low.startswith(term_text):
            return m
    return None


def negex(text: str, mentions: list[Mention]) -> None:
    """Mutate each mention's ``modifiers``: Polarity=Negative_Polarity
    for negated concepts, ContextualModality=Hedged_ContextualModality
    for indeterminate scope (getNegativeMention/getHedgedMention usage,
    NegEx.java:475-495)."""
    clean = _NONWORD.sub(" ", text)
    by_start = sorted(mentions, key=lambda m: (m.start, m.end))

    # tokenize with offsets and type each position (parse :199-330).
    # Tokenization reproduces the reference's quirks EXACTLY: each word
    # gets the offset of its FIRST substring occurrence in the sentence
    # (parse :216 ``text.indexOf(word)`` — so a trigger word that also
    # appears as a substring earlier, e.g. 'no' inside 'melanoma', lands
    # behind the consumed offset and is dropped), and the consumed
    # offset advances by the matched length from its PREVIOUS value
    # (:237 ``offset = offset+t.length()``), not from the token start.
    elements: list[tuple[int, str, int, Mention | None]] = []
    offset = 0
    for word in clean.split():
        start = clean.find(word)
        if start < offset:
            continue
        tmp = clean[start:]
        typed = None
        for phrases, etype in _TYPED_LISTS:
            t = _find_match(tmp, phrases)
            if t is not None:
                typed = (start, t, etype, None)
                offset = offset + len(t)
                break
        if typed is None:
            men = _find_concept_match(tmp, by_start)
            if men is not None:
                # offset advances by Mention.getText()'s length (:312)
                ctext = men.text
                typed = (start, ctext, _CONCEPT, men)
                offset = offset + len(ctext)
            else:
                typed = (start, word, _PLAIN, None)
                offset = start + len(word)
        elements.append(typed)

    # scope pass (process :455-545)
    negation = None
    window = 0
    retro: list[tuple[int, str, int, Mention | None]] = []
    for el in elements:
        _off, _txt, etype, men = el
        if etype in (_PRE, _POST, _INDET):
            negation = None
            window = 0
            if etype == _PRE:
                negation = el
            else:
                for r in retro:
                    if r[2] == _CONCEPT and r[3] is not None:
                        key = ("Polarity" if etype == _POST
                               else "ContextualModality")
                        val = ("Negative_Polarity" if etype == _POST
                               else "Hedged_ContextualModality")
                        r[3].modifiers[key] = val
            retro.clear()
        elif etype == _STOP:
            negation = None
            retro.clear()
            window = 0
        elif etype == _CONCEPT:
            if negation is not None and men is not None:
                men.modifiers["Polarity"] = "Negative_Polarity"
            else:
                retro.append(el)
            window += 1
        else:
            if negation is None:
                retro.append(el)
            window += 1
        if window >= WINDOW_SIZE:
            if negation is not None:
                window = 0
                negation = None
                retro.clear()
            else:
                window -= 1
                if retro:
                    retro.pop(0)
