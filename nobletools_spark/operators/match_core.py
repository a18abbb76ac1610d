"""Per-sentence concept matcher — faithful reimplementation of the
reference's IndexFinder-style word-set matching.

This is deliberately a *pure Python* kernel: it runs batched inside
``mapInPandas`` on executors (one call per sentence, thousands of
sentences per Arrow batch) and doubles as the behavior the pytest
oracle pins. All heavy state (the terminology index) is read-only and
shared via a Spark broadcast.

Reference parity (terminology/impl/NobleCoderTerminology.java):
- process(Sentence)            :2223-2374  (main loop)
- getNormalizedWordMap         :1254-1268
- getBestTerms                 :1557-1637
- checkContiguity              :1645-1666
- checkWordOrder               :1682-1697
- getUsedWords                 :1459-1487
- searchRegExp                 :1495-1549
- scoreConcept                 :2388-2495
- getBestCandidates            :1414-1440
- getOriginalTerm              :1381-1405
- getAnnotations               :1277-1292
- Mention.getMentions          coder/model/Mention.java:117-179
- AcronymDetector              tools/AcronymDetector.java:118-196
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterable, Optional

from nobletools_spark.functions.porter import stem
from nobletools_spark.functions.textkit import (
    StringStats,
    get_words,
    is_common_word,
    is_likely_abbreviation,
    is_plural,
    is_stop_word,
    normalize_word_cached,
    normalize_words,
    fold_diacritics,
    strip_diacritics,
)
from nobletools_spark.model import ConceptMeta, MatchConfig, TerminologyIndex


class Mention:
    """One detected concept mention within a sentence.

    Offsets are sentence-relative; the caller promotes them to document
    offsets by adding the sentence offset (coder/model/Mention.java:41-46).
    """

    __slots__ = ("cui", "matched_term", "term_norm", "score", "annotations",
                 "search_string", "modifiers", "modifier_anns")

    def __init__(self, cui: str, matched_term: str, term_norm: str,
                 score: float, annotations: list[tuple[str, int]],
                 search_string: str):
        self.cui = cui
        self.matched_term = matched_term
        self.term_norm = term_norm
        self.score = score
        self.annotations = annotations  # [(word, sentence_rel_offset)]
        self.search_string = search_string
        self.modifiers: dict[str, str] = {}  # type -> value (ConText)
        # type -> trigger-phrase annotations [(word, sent_rel_off)] of
        # the ASSIGNING modifier mention (Modifier.getAnnotations;
        # assignment order = the reference's LinkedHashMap order)
        self.modifier_anns: dict[str, list] = {}

    @property
    def start(self) -> int:
        return min(o for _, o in self.annotations)

    @property
    def end(self) -> int:
        return max(o + len(w) for w, o in self.annotations)

    @property
    def text(self) -> str:
        return " ".join(w for w, _ in self.annotations)


# term-string tokenizations, memoized: the matcher re-tokenizes the
# SAME index-static term strings once per candidate visit (getBestTerms
# :1574 re-calls TextTools.getWords each pass); the vocabulary of keys
# is bounded by the terminology (sentence text never flows through
# here), so the memo is index-sized per executor — the same order as
# the broadcast index itself.
_TERM_WORDS: dict[str, tuple[str, ...]] = {}


def _term_words(term: str) -> tuple[str, ...]:
    tw = _TERM_WORDS.get(term)
    if tw is None:
        tw = tuple(get_words(term))
        _TERM_WORDS[term] = tw
    return tw


@lru_cache(maxsize=65536)
def _surface_words(term: str) -> tuple[str, ...]:
    """Like :func:`_term_words` but LRU-bounded: ``_re_chunk`` feeds it
    SENTENCE surface forms (``oterm`` — corpus-derived, unbounded
    vocabulary), so the unbounded index-static memo above must not see
    them or a long-lived executor's memo grows with corpus text. Hot
    repeated surface forms still hit the cache; evictions only cost a
    re-tokenize (same as the reference, Mention.java:117-179)."""
    return tuple(get_words(term))


def _normalized_word_map(text: str, cfg: MatchConfig):
    """getNormalizedWordMap (:1254-1268): tokenize, then normalize each
    original word; map first normalized form -> original (first wins)."""
    original_words = get_words(text)
    norm_map: dict[str, str] = {}
    norm_list: list[str] = []
    for w in original_words:
        ws = normalize_word_cached(w, cfg.stem_words, cfg.strip_digits,
                                   cfg.strip_stop_words)
        if ws and ws[0] not in norm_map:
            norm_map[ws[0]] = w
        norm_list.extend(ws)
    return original_words, norm_list, norm_map


def _iteration_order(words: list[str], idx: TerminologyIndex,
                     cfg: MatchConfig) -> list[str]:
    """Word iteration order (:2242-2259): with ignoreUsedWords, words with
    index statistics sort by (termCount asc, lexicographic), de-duplicated;
    unknown words follow in occurrence order WITHOUT de-duplication (the
    reference's inconsistent comparator keeps duplicates). Otherwise a
    LinkedHashSet: unique words in first-occurrence order."""
    if cfg.ignore_used_words:
        stats = idx.word_term_count
        known: dict[str, int] = {}
        unknown: list[str] = []
        for w in words:
            c = stats.get(w)
            if c is not None:
                known.setdefault(w, c)
            else:
                unknown.append(w)
        ordered = sorted(known, key=lambda w: (known[w], w))
        ordered.extend(unknown)
        return ordered
    seen: dict[str, None] = {}
    for w in words:
        seen.setdefault(w)
    return list(seen)


def _check_contiguity(words: list[str], twords: list[str], gap: int) -> bool:
    """checkContiguity (:1645-1666)."""
    tset = set(twords)
    span = (gap + 1) * (len(twords) - 1) + 1
    for i, w in enumerate(words):
        if w in tset:
            window = words[i:i + span]
            if all(t in window for t in twords):
                return True
    return False


def _check_word_order(words: list[str], twords: list[str]) -> bool:
    """checkWordOrder (:1682-1697)."""
    last = 0
    for tw in twords:
        try:
            i = words.index(tw, last)
        except ValueError:
            i = -1
        if i < last:
            return False
        last = i
    return True


def _get_best_terms(words: list[str], swords: set[str], used: set[str],
                    word: str, idx: TerminologyIndex,
                    cfg: MatchConfig) -> list[str]:
    """getBestTerms (:1557-1637)."""
    terms: Optional[Iterable[str]] = idx.blacklist.get(word)
    if terms is None:
        terms = idx.word_terms.get(word)
    if not terms or not words:
        return []
    best: list[str] = []
    best_count = 0
    for term in terms:
        all_match = True
        hits = 0
        # TextTools.getWords, NOT a plain split: regex pseudo-terms from
        # the word map (e.g. '/stage [ivx]+/') tokenize through the same
        # delimiter set as the reference (getBestTerms :1574); memoized
        # (index-static keys)
        twords = _term_words(term)
        for tword in twords:
            if tword not in swords:
                all_match = False
                if not cfg.partial_mode:
                    break
            else:
                if not cfg.overlap_mode and tword in used:
                    all_match = False
                    hits -= 1
                    if not cfg.partial_mode:
                        break
                hits += 1
        if cfg.partial_mode and not all_match and hits > 0:
            all_match = (hits / len(twords)) >= cfg.partial_match_threshold
        if all_match and cfg.contiguous_mode and len(twords) > 1:
            all_match = _check_contiguity(words, twords, cfg.max_word_gap)
        if all_match and cfg.ordered_mode and len(twords) > 1:
            all_match = _check_word_order(words, twords)
        if all_match:
            if cfg.subsumption_mode:
                if len(twords) > best_count:
                    best = [term]
                    best_count = len(twords)
                elif len(twords) == best_count:
                    best.append(term)
            else:
                best.append(term)
    return best


def _get_used_words(words: list[str], term: str, cfg: MatchConfig) -> list[str]:
    """getUsedWords (:1459-1487)."""
    if not cfg.ignore_used_words and cfg.overlap_mode:
        return []
    twords = _term_words(term)
    used: list[str] = []
    if cfg.overlap_mode:
        used.extend(twords)
    else:
        remaining = list(twords)
        span = False
        for w in words:
            if w in remaining:
                used.append(w)
                remaining.remove(w)
                span = True
            if not remaining:
                break
            if span:
                used.append(w)
    return used


def _original_term(text: str, term: str, norm_map: dict[str, str]) -> str:
    """getOriginalTerm (:1381-1405): order term words by position of
    their (last-char-trimmed if len>3) form in the lowercased sentence,
    then map back to original surface forms. The reference's TreeSet
    comparator compares the TRIMMED forms on position ties, so two
    distinct words sharing a trimmed form and a sentence position
    ('her2'/'her3' → 'her') count as EQUAL — the first inserted
    survives and the other is dropped from the original term."""
    txt = text.lower()

    def trim(w: str) -> str:
        return w[:-1] if len(w) > 3 else w

    chosen: dict[tuple[int, str], str] = {}
    for w in term.split(" "):
        k = (txt.find(trim(w)), trim(w))
        if k not in chosen:            # TreeSet.add: first insert wins
            chosen[k] = w
    words = [chosen[k] for k in sorted(chosen)]
    return " ".join(norm_map.get(w, w) for w in words)


def _annotations_for(oterm: str, original_words: list[str],
                     text: str) -> list[tuple[str, int]]:
    """getAnnotations (:1277-1292): sentence-relative offsets."""
    matched = set(get_words(oterm))
    out: list[tuple[str, int]] = []
    n = 0
    for w in original_words:
        if w in matched:
            out.append((w, text.find(w, n)))
        n += len(w) + 1
    return out


def _score_concept(meta: ConceptMeta, term_norm: str, oterm: str,
                   search_string: str, result_terms: set[str]) -> float:
    """scoreConcept (:2388-2495). The filtered source/semtype priority
    blocks are dead code in the reference (its indexOf compares objects to
    the integer 0 and always returns -1, :2501-2504), so they are omitted."""
    single_word = " " not in term_norm
    exact_match = case_match = stemmed_match = False
    synonym_term: Optional[str] = None
    weight = 1.0
    if not single_word:
        wt = term_norm.split(" ")
        wt_set = set(wt)
        for t in result_terms:
            if t != term_norm and all(x in wt_set for x in t.split(" ")):
                weight += 5.0
    else:
        for s in meta.synonyms:
            if term_norm.lower() == stem(s).lower():
                synonym_term = s
                stemmed_match = True
                exact_match = s.lower() == oterm.lower()
                if exact_match:
                    case_match = s == oterm
                break
    if single_word and not case_match and (
        (synonym_term is None or is_likely_abbreviation(synonym_term))
        ^ is_likely_abbreviation(oterm)
    ):
        st = StringStats(search_string)
        if not (st.upper > st.lower and st.whitespace > 0 and st.length > 5):
            weight -= 10.0
    if single_word and not exact_match and stemmed_match and not is_plural(oterm):
        weight -= 10.0
    weight += 0.05 * min(len(meta.sources), 10)
    if meta.name.lower() == oterm.lower():
        weight += 2.0
    return weight


def _re_chunk(annotations: list[tuple[str, int]], matched_terms: list[str],
              search_string: str, gap: int,
              words: Optional[list[str]] = None) -> list[list[tuple[str, int]]]:
    """Mention.getMentions re-chunking (coder/model/Mention.java:117-179):
    one concept whose term repeats across the sentence becomes multiple
    mentions, each covering a contiguous span. ``words`` is the caller's
    pre-tokenized search string (pure perf: avoids re-tokenizing the
    sentence once per mention)."""
    if not annotations:
        return []
    if len(matched_terms) == 1 and len(annotations) == len(_surface_words(matched_terms[0])):
        return [annotations]
    if words is None:
        words = get_words(search_string)
    chunks: list[list[tuple[str, int]]] = []
    for term in matched_terms:
        twords = _surface_words(term)
        tset = set(twords)
        offs = 0
        for i, w in enumerate(words):
            if w in tset:
                n = i + (gap + 1) * (len(twords) - 1) + 1
                if n >= len(words):
                    n = len(words) - 1
                window = words[i:n]
                if all(t in window for t in twords):
                    # NOTE: 'en' is the START offset of words[n] (the word
                    # after the window) — reference quirk, Mention.java:152.
                    st = search_string.find(words[i], offs)
                    en = search_string.find(words[n], offs)
                    alist = [(aw, ao) for aw, ao in annotations
                             if st <= ao and (ao + len(aw)) <= en]
                    if alist:
                        chunks.append(alist)
            offs += len(w) + 1
    if not chunks:
        chunks = [annotations]
    return chunks


def match_sentence(text: str, idx: TerminologyIndex,
                   cfg: MatchConfig) -> list[Mention]:
    """process(Sentence) (:2223-2374) over one sentence's text."""
    cfg = cfg.for_search()
    original_words, words, norm_map = _normalized_word_map(text, cfg)
    result: list[Mention] = []
    result_terms: dict[str, None] = {}  # insertion-ordered set

    # regex synonyms first (:2263-2268) — the reference wraps
    # searchRegExp results in the SAME isFilteredOut source/semtype
    # check as dictionary matches
    for m in _search_regexp(text, idx):
        meta = idx.concepts.get(m.cui)
        if meta is not None and _is_filtered_out(meta, cfg):
            continue
        result.append(m)

    swords = _iteration_order(words, idx, cfg)
    used: set[str] = set()
    hash_words = set(words)
    count = 0
    for word in swords:
        count += 1
        if cfg.ignore_small_words and len(word) <= 1:
            continue
        if cfg.ignore_common_words and is_common_word(word):
            continue
        if cfg.ignore_used_words and word in used:
            continue
        text_words, text_hash = _text_words(words, hash_words, count, cfg)
        for term in _get_best_terms(text_words, text_hash, used, word, idx, cfg):
            result_terms.setdefault(term)
            if cfg.ignore_used_words:
                used.update(_get_used_words(text_words, term, cfg))

    # global subsumption sweep (:2309-2323)
    if cfg.subsumption_mode:
        terms_list = list(result_terms)
        to_remove = set()
        for a in terms_list:
            aa = a.split(" ")
            aset = set(aa)
            for b in terms_list:
                if len(a) > len(b):
                    bb = b.split(" ")
                    if len(aa) > len(bb) and all(x in aset for x in bb):
                        to_remove.add(b)
        for b in to_remove:
            del result_terms[b]

    # hydrate concepts, score, select, re-chunk (:2329-2372)
    rt_set = set(result_terms)
    for term in result_terms:
        cuis = idx.term_cuis.get(term)
        if not cuis:
            continue
        oterm = _original_term(text, term, norm_map)
        candidates: list[tuple[ConceptMeta, float]] = []
        for cui in cuis:
            meta = idx.concepts.get(cui) or ConceptMeta(cui, term, (), (), ())
            score = (_score_concept(meta, term, oterm, text, rt_set)
                     if cfg.score_concepts else 1.0)
            candidates.append((meta, score))
        # getBestCandidates (:1414-1440), threshold 0.0
        if cfg.score_concepts:
            if cfg.select_best_candidate:
                best = max(candidates, key=lambda t: t[1])
                candidates = [best] if best[1] >= 0.0 else []
            else:
                candidates = [c for c in candidates if c[1] >= 0.0]
        annotations = _annotations_for(oterm, original_words, text)
        for meta, score in candidates:
            # source/semtype result filter AFTER best-candidate selection
            # (:2361-2364 → isFilteredOut :1706-1782): a filtered best
            # candidate is dropped, not replaced by the runner-up
            if _is_filtered_out(meta, cfg):
                continue
            for chunk in _re_chunk(annotations, [oterm], text,
                                   cfg.max_word_gap, original_words):
                result.append(Mention(meta.cui, oterm, term, score, chunk, text))
    # Sentence.setMentions sorts by (start, end) — Collections.sort is
    # stable, ties keep discovery order (NobleCoderTerminology.java:2370
    # → Sentence.java:70, Mention.compareTo:90-100). Downstream
    # order-sensitive consumers (acronym pass appends AFTER this sort,
    # extract kernel's addInstance keeps sibling instances in mention
    # order) depend on it; pinned by the extract parity leg (e031).
    result.sort(key=lambda m: (m.start, m.end))
    return result


def _is_filtered_out(meta: ConceptMeta, cfg: MatchConfig) -> bool:
    """isFilteredOut (NobleCoderTerminology.java:1706-1782): with a
    non-empty filter, keep the concept iff it has at least one matching
    source/semtype. A concept carrying NONE is dropped: the keep-if-null
    branch (:1722-1726) is dead code — Concept.getSources /
    getSemanticTypes never return null (Concept.java:615-617), so an
    empty array leaves filteredOut=true."""
    if cfg.source_filter:
        if not set(meta.sources or ()) & set(cfg.source_filter):
            return True
    if cfg.semtype_filter:
        if not set(meta.semtypes or ()) & set(cfg.semtype_filter):
            return True
    return False


def _text_words(words: list[str], hash_words: set[str], count: int,
                cfg: MatchConfig) -> tuple[list[str], set[str]]:
    """getTextWords (:1350-1361): optional sliding window limiting the
    candidate span for very long inputs; disabled under ignoreUsedWords
    (reference comment: 'currently there is a bug')."""
    if cfg.ignore_used_words or cfg.window_size <= 0:
        return words, hash_words
    c = count - 1
    if len(words) > cfg.window_size and c < len(words):
        end = min(c + cfg.window_size, len(words))
        sub = words[c:end]
        return sub, set(sub)
    return words, hash_words


def _search_regexp(text: str, idx: TerminologyIndex) -> list[Mention]:
    """searchRegExp (:1495-1549) incl. containment dedup. Regex synonyms
    are stored as /src/ and matched as \\b(src)\\b case-insensitive
    (addTerm :1063-1070)."""
    if not idx.regex_terms:
        return []
    result: list[Mention] = []
    for pattern, cui in idx.regex_terms:
        for m in re.finditer(pattern, text, re.IGNORECASE):
            txt = m.group(1)
            st, en = m.start(), m.start() + len(txt)
            to_add = True
            kept: list[Mention] = []
            for b in result:
                stb, enb = b.start, b.end
                if st <= stb and enb <= en:
                    continue  # b inside new -> drop b
                if stb <= st and en <= enb:
                    to_add = False
                kept.append(b)
            result = kept
            if to_add:
                result.append(Mention(cui, txt, pattern, 1.0, [(txt, st)], text))
    return result


# ---------------------------------------------------------------------------
# Document-local acronym pass (tools/AcronymDetector.java)
# ---------------------------------------------------------------------------

_ACRO_RE = re.compile(r"(([A-Z]?[a-z-0-9]+ )+)\(([A-Z-0-9]+s?)\)")
_NON_ALPHA_SPLIT = re.compile(r"[^A-Za-z]+")


def _acronym_expanded_form(expanded: str, acronym: str) -> Optional[str]:
    """getAcronymExapndedForm (AcronymDetector.java:74-112)."""
    words = _NON_ALPHA_SPLIT.split(expanded.strip())
    acronym = re.sub(r"[^A-Z]", "", acronym)
    k = 0
    s = 0
    for i in range(len(acronym) - 1, -1, -1):
        c = acronym[i]
        j = (len(words) - len(acronym)) + i - s
        if j >= len(words) or j < 0:
            return None
        if len(words[j]) == 0 or is_stop_word(words[j]):
            j -= 1
            s += 1
        if j < 0:
            return None
        if len(words[j]) > 0 and c.lower() != words[j][0].lower():
            if c.lower() in words[j].lower():
                s -= 1
            else:
                return None
        k = expanded.rfind(words[j])
    return expanded[k:]


def _mention_matches_phrase(m: Mention, phrase: str) -> bool:
    """AcronymDetector.matches (:53-64): mention annotation words cover all
    non-stop words of the phrase."""
    need = [w for w in _NON_ALPHA_SPLIT.split(phrase.strip())
            if w and not is_stop_word(w)]
    have = [w for w, _ in m.annotations]
    return all(w in have for w in need)


def acronym_pass(sentences: list[tuple[str, int, list[Mention]]],
                 acronyms: Optional[dict[str, str]] = None) -> dict[str, str]:
    """Document-scoped acronym detection & mention rewriting
    (AcronymDetector.process :118-196). Mutates the per-sentence mention
    lists in place; returns the accumulated acronym->cui table.

    ``sentences``: [(text, offset, mentions)] in document order — the
    document-local state is why the Spark matcher groups by doc_id.
    """
    acronyms = acronyms if acronyms is not None else {}
    for text, _off, mentions in sentences:
        # cheap pre-screen: the acronym pattern needs parentheses, and
        # backtracks quadratically on long paren-free sentences
        # fold_diacritics is length-preserving, so m.start() offsets are
        # valid in the ORIGINAL sentence even for decomposed input
        m = _ACRO_RE.search(fold_diacritics(text)) if "(" in text else None
        if m:
            expanded = m.group(1)
            acronym = m.group(3)
            expanded = _acronym_expanded_form(expanded, acronym)
            if expanded is not None and len(acronym) > 1 and not acronym.isdigit():
                exp: Optional[Mention] = None
                acr: list[Mention] = []
                for mn in mentions:
                    if _mention_matches_phrase(mn, expanded):
                        exp = mn
                    elif _mention_matches_phrase(mn, acronym):
                        acr.append(mn)
                if exp is not None:
                    exp.annotations.append((acronym, m.start(3)))
                    acronyms[acronym] = exp.cui
                    for a in acr:
                        if a.cui != exp.cui:
                            mentions.remove(a)
        else:
            for acronym, code in list(acronyms.items()):
                for am in re.finditer(r"\b" + re.escape(acronym) + r"\b", text):
                    # the reference NULLS the shared `code` var on the
                    # first same-code mention (AcronymDetector:166-176),
                    # so every LATER same-text mention fails
                    # getCode().equals(null) and is removed — duplicate
                    # same-code mentions must not survive
                    code_to_add: Optional[str] = code
                    for c in list(mentions):
                        if acronym == c.text:
                            if code_to_add is None or c.cui != code_to_add:
                                mentions.remove(c)
                            else:
                                code_to_add = None
                    if code_to_add is not None:
                        # propagated mentions carry the fresh concept's
                        # default score 0.0 (AcronymDetector builds the
                        # Mention from an unscored Concept) — verified
                        # against the compiled reference (score leg)
                        mentions.append(Mention(
                            code_to_add, acronym, acronym, 0.0,
                            [(acronym, am.start())], text))
    return acronyms
