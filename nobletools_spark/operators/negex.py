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

PRE_NEGATION = tuple(p.strip() for p in """
absence of|cannot|cannot see|checked for|declined|declines|denied|denies
|denying|fails to reveal|free of|negative for|never developed|never had
|no abnormal|no cause of|no complaints of|no evidence|no evidence of
|no new evidence|no other evidence|no evidence to suggest|no findings of
|no findings to indicate|no sign of|no significant|no signs of
|no suggestion of|no suspicious|no new|no|not appear|not appreciate
|not associated with|not complain of|not demonstrate|not exhibit
|not feel|not had|not have|not know of|not known to have|not reveal
|not see|not to be|not|non|patient was not|rather than|resolved|test for
|to exclude|unremarkable for|with no|without|w/o evidence of
|without any evidence of|without evidence|without evidence of
|without indication of|without sign of|lacks|rule out|rules out
|ruled out|ruled out for|did rule out|can rule out|adequate to rule out
|sufficient to rule out|neither|nor""".replace("\n", "").split("|"))

POST_NEGATION = tuple(p.strip() for p in """
is absent|are absent|unlikely|free|was ruled out|is ruled out
|are ruled out|have been ruled out|has been ruled out|is not seen
|are not seen|not seen|can be ruled out|ruled out|not identified
|not observed|not visible|not detected|not been found|not found
|not present|: no|none|negative""".replace("\n", "").split("|"))

INDETERMINATE = tuple(p.strip() for p in """
cannot be determined|cannot be evaluated|cannot be assessed
|cannot be seen|cannot be found|not evaluable|cannot determine
|cannot evaluate|unable to assess""".replace("\n", "").split("|"))

PSEUDO_NEGATION = tuple(p.strip() for p in """
no increase|no suspicious change|no significant change|no change
|no interval change|no definite change|no significant interval change
|not extend|not cause|not drain|not certain if|not certain whether
|gram negative|without difficulty|not necessarily|not only
|impossible to rule out|no interpretation|cannot be ruled out
|can not be ruled out""".replace("\n", "").split("|"))

CONJUNCTIONS = tuple(p.strip() for p in """
but|however|nevertheless|yet|though|although|still|aside from|except
|apart from|secondary to|as the cause of|as the source of
|as the reason of|as a cause of|as a source of|as a reason
of""".replace("\n", "").split("|"))

_NONWORD = re.compile(r"\W")

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
    word boundary (list order wins, not longest-match)."""
    low = text.lower()
    for term in phrases:
        if len(low) > len(term):
            if low.startswith(term + " "):
                return text[:len(term)]
        elif len(low) == len(term) and low.startswith(term):
            return text[:len(term)]
    return None


def negex(text: str, mentions: list[Mention]) -> None:
    """Mutate each mention's ``modifiers``: Polarity=Negative_Polarity
    for negated concepts, ContextualModality=Hedged_ContextualModality
    for indeterminate scope (getNegativeMention/getHedgedMention usage,
    NegEx.java:475-495)."""
    clean = _NONWORD.sub(" ", text)
    by_start = sorted(mentions, key=lambda m: m.start)

    # tokenize with offsets and type each position (parse :199-330)
    elements: list[tuple[int, str, int, Mention | None]] = []
    consumed_until = 0
    for wm in re.finditer(r"\S+", clean):
        off = wm.start()
        if off < consumed_until:
            continue
        rest = clean[off:]
        typed = None
        for phrases, etype in _TYPED_LISTS:
            t = _find_match(rest, phrases)
            if t is not None:
                typed = (off, t, etype, None)
                consumed_until = off + len(t)
                break
        if typed is None:
            men = next((m for m in by_start if m.start == off), None)
            if men is not None:
                typed = (off, clean[men.start:men.end], _CONCEPT, men)
                consumed_until = men.end
            else:
                typed = (off, wm.group(), _PLAIN, None)
                consumed_until = wm.end()
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
