"""Text normalization kernel — reproduces the reference's normalization
contract (reference: tools/TextTools.java) as pure, vectorizable Python
functions. These are used both inside pandas/Arrow UDFs on executors and
by the pytest oracle, so engine and oracle share one contract with golden
tests pinning each primitive.

Parity citations (all into /root/reference/src/main/java/edu/pitt/dbmi/nlp/noble/):
- tokenizer delimiters + trailing-period strip: tools/TextTools.java:315-333
- normalizeWords chain:                         tools/TextTools.java:700-765
- isLikelyAbbreviation:                         tools/TextTools.java:774-789
- StringStats:                                  tools/TextTools.java:50-58,1245-1262
- stop words:           src/main/resources/resources/StopWords.lst
- plural suffix table:  src/main/resources/resources/PluralTable.lst
  (loaded plural->singular with later lines overwriting, per
   TextTools.loadResourceAsMap tools/TextTools.java:121-148)
- stripDiacritics:                              tools/TextTools.java:395-430
- sentence splitting:                           tools/SentenceDetector.java:91-137
- DeID scrub:                                   util/DeIDUtils.java:45-62
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from nobletools_spark.functions.porter import stem

# ---------------------------------------------------------------------------
# word lists (data contracts from the reference's resource files)
# ---------------------------------------------------------------------------

# resources/StopWords.lst (comment lines skipped; duplicates collapse in a set)
STOP_WORDS = frozenset(
    """a about an are as at be by for from how in is it la like of on or
    that the this to was what when where who will with und which there and
    around within along per had has too but""".split()
)

# resources/PluralTable.lst rows in file order as (singular, plural);
# loaded into plural->singular with later rows overwriting earlier ones.
_PLURAL_ROWS = (
    ("a", "ae"), ("a", "as"), ("an", "en"), ("ch", "ches"), ("eau", "eaus"),
    ("en", "ens"), ("ex", "ices"), ("ex", "exes"), ("f", "ves"), ("fe", "ves"),
    ("ieu", "ieus"), ("ieu", "ieux"), ("is", "es"), ("is", "ises"),
    ("ix", "ixes"), ("ix", "ices"), ("nx", "nxes"), ("k", "ks"), ("o", "oes"),
    ("o", "os"), ("on", "a"), ("on", "ons"), ("oo", "ee"), ("oof", "oofs"),
    ("oof", "ooves"), ("s", "ses"), ("sh", "shes"), ("um", "a"), ("um", "ums"),
    ("us", "era"), ("us", "i"), ("us", "uses"), ("us", "ora"), ("x", "xes"),
    ("y", "ies"), ("s", "s"), ("e", "es"), ("n", "ns"),
)
PLURAL_TO_SINGULAR: dict[str, str] = {}
for _sing, _plur in _PLURAL_ROWS:
    PLURAL_TO_SINGULAR[_plur] = _sing

# resources/CommonWords.lst (one word per line, # comments skipped);
# only consulted when ignore_common_words is enabled (off in best-match).
COMMON_WORDS = frozenset(
    """the be of and a in to have it for I that you he on with do at by not
    this but from they his she or which as we an say will would can if their
    go what there all get her make who out up see know time take them some
    could so him year into its then think my come than more about now last
    your me no other give just should these people also well any only new
    very when may way look like use such how because good find even most our
    over us de un""".split()
)

# ---------------------------------------------------------------------------
# character-level primitives
# ---------------------------------------------------------------------------

# TextTools.getWords delimiter set (tools/TextTools.java:320):
# " ,!?;:-–—~_\/|\t\n\r<>()[]\"" — note '.' is NOT a delimiter; trailing
# periods are stripped from each token instead.
_WORD_DELIMS = " ,!?;:-–—~_\\/|\t\n\r<>()[]\""
_WORD_SPLIT_RE = re.compile("[" + re.escape(_WORD_DELIMS) + "]+")


def get_words(text: str) -> list[str]:
    """Tokenize per TextTools.getWords (tools/TextTools.java:315-333)."""
    out = []
    for tok in _WORD_SPLIT_RE.split(text):
        tok = tok.rstrip(".")
        if tok:
            out.append(tok)
    return out


def strip_diacritics(s: str) -> str:
    """ASCII-fold accents (tools/TextTools.java:395-430). The reference
    maps a fixed accent table; NFD-strip of combining marks is a superset
    that agrees on the reference's table."""
    if s is None:
        return s
    if s.isascii():
        return s
    decomposed = unicodedata.normalize("NFD", s)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def fold_diacritics(s: str | None) -> str | None:
    """LENGTH-PRESERVING accent fold — the exact shape of the
    reference's char-table stripDiacritics (TextTools.java:395-430):
    each precomposed accented char maps to its base letter IN PLACE;
    decomposed combining marks (and everything else) pass through
    unchanged. Use this wherever match OFFSETS on the folded string are
    interpreted against the original (acronym detection) —
    strip_diacritics deletes combining marks and shifts offsets on
    decomposed (NFD) input."""
    if s is None or s.isascii():
        return s
    out = []
    for ch in s:
        d = unicodedata.normalize("NFD", ch)
        out.append(d[0] if len(d) > 1 and not unicodedata.combining(d[0])
                   else ch)
    return "".join(out)


class StringStats:
    __slots__ = ("upper", "lower", "digits", "whitespace", "length",
                 "is_capitalized", "is_lowercase", "is_uppercase")

    def __init__(self, text: str):
        self.length = len(text)
        self.upper = sum(1 for c in text if c.isupper())
        self.lower = sum(1 for c in text if c.islower())
        self.digits = sum(1 for c in text if c.isdigit())
        self.whitespace = sum(1 for c in text if c.isspace())
        alphabetic = sum(1 for c in text if c.isalpha())
        # TextTools.java:1255-1263 EXACT: upper/lower must equal the
        # FULL length — 'A.B' is NOT uppercase (2 upper, 3 chars), so
        # short caps-with-punctuation tokens are not abbreviation-like
        self.is_capitalized = (bool(text) and text[0].isupper()
                               and self.lower == alphabetic - 1)
        self.is_lowercase = self.length > 0 and self.lower == self.length
        self.is_uppercase = self.length > 0 and self.upper == self.length


@lru_cache(maxsize=262144)
def is_likely_abbreviation(text: str) -> bool:
    """tools/TextTools.java:774-789."""
    has_junk = re.search(r"[()\[\]+,0-9]", text) is not None
    has_alpha = re.search(r"[A-Za-z]", text) is not None
    if has_junk and has_alpha:
        return True
    st = StringStats(text)
    if len(text) <= 5 and st.is_uppercase:
        return True
    if not st.is_capitalized and st.lower > 0 and st.upper > 0:
        return True
    return False


def is_plural(word: str) -> bool:
    """tools/TextTools.java:226-235 — ends with any plural suffix."""
    return any(word.endswith(sfx) for sfx in PLURAL_TO_SINGULAR)


def to_singular(word: str) -> str:
    """tools/TextTools.java:274-290 — possessive strip then first
    matching plural-suffix substitution in table iteration order."""
    if word.endswith("'s"):
        return word[:-2]
    for plur, sing in PLURAL_TO_SINGULAR.items():
        if word.endswith(plur):
            return word[: len(word) - len(plur)] + sing
    return word


def is_stop_word(word: str) -> bool:
    return word.strip() in STOP_WORDS


_COMMON_NORM: "frozenset[str] | None" = None


def is_common_word(word: str) -> bool:
    # TextTools.isCommonWord (:263-269) uses the 1-arg normalize =
    # normalize(word, stem=FALSE): the CommonWords list is unstemmed
    # ('only'/'very' must hit; 'onli'/'veri' must not). The LIST
    # entries normalize too (getCommonWords :108) — 'I' must hit via
    # its lowercased form, not sit unreachable in the set
    global _COMMON_NORM
    if _COMMON_NORM is None:
        _COMMON_NORM = frozenset(
            n for w in COMMON_WORDS
            for n in (normalize(w, do_stem=False),) if n)
    return normalize(word.strip(), do_stem=False) in _COMMON_NORM


# ---------------------------------------------------------------------------
# normalizeWords / normalize (tools/TextTools.java:700-765,577-591)
# ---------------------------------------------------------------------------

# re.ASCII: Java's \b/\d/\w are ASCII-only — a Unicode \b would
# (e.g.) fail to strip the genitive after a non-ASCII letter, and a
# Unicode \d would strip Arabic-Indic digits Java keeps
_GENITIVE_RE = re.compile(r"\b([a-z]+)'s?", re.ASCII)
_PAREN_PLURAL_RE = re.compile(r"\(i?e?s\)")
_FLOAT_PROTECT1 = re.compile(r"(\d+)\.(\d+)", re.ASCII)
_FLOAT_PROTECT2 = re.compile(r"\.(\d+)", re.ASCII)
_FLOAT_RESTORE1 = re.compile(r"(\d+)_(\d+)", re.ASCII)
_FLOAT_RESTORE2 = re.compile(r"_(\d+)", re.ASCII)
_DIGITS_RE = re.compile(r"\d+", re.ASCII)


def _replace_nonword(text: str) -> str:
    # Java: text.replaceAll("\\s*\\W\\s*"," ") — \W is any non-[a-zA-Z0-9_];
    # each non-word char plus surrounding whitespace becomes one space.
    return re.sub(r"\s*[^a-zA-Z0-9_\s]\s*", " ", text)


def normalize_words(
    text: str,
    do_stem: bool = True,
    strip_digits: bool = False,
    strip_stop_words: bool = True,
) -> list[str]:
    """tools/TextTools.java:700-765 — the exact chain, in order."""
    text = text.strip()
    text = strip_diacritics(text)
    text = text.lower()
    text = _GENITIVE_RE.sub(r"\1", text)
    text = _PAREN_PLURAL_RE.sub("", text)
    # protect decimal points: 1.5 -> 1_5 and .5 -> _5
    text = _FLOAT_PROTECT1.sub(r"\1_\2", text)
    text = _FLOAT_PROTECT2.sub(r"_\1", text)
    # punctuation (and surrounding space) -> single space
    text = _replace_nonword(text)
    # restore decimals
    text = _FLOAT_RESTORE1.sub(r"\1.\2", text)
    text = _FLOAT_RESTORE2.sub(r".\1", text)
    # Java String.split("\\s+") keeps a leading empty token but drops
    # trailing ones; "" splits to [""].
    words = re.split(r"\s+", text)
    while len(words) > 1 and words[-1] == "":
        words.pop()
    if strip_stop_words:
        words = [
            w
            for w in words
            if not (w in STOP_WORDS or (strip_digits and _DIGITS_RE.fullmatch(w)))
        ]
    if do_stem:
        words = [w if is_likely_abbreviation(w) else stem(w) for w in words]
    return words


@lru_cache(maxsize=262144)
def normalize_word_cached(word: str, do_stem: bool = True,
                          strip_digits: bool = False,
                          strip_stop_words: bool = True) -> tuple[str, ...]:
    """Per-token normalize_words with memoization — the matcher calls
    this once per corpus token and natural-language word frequencies are
    Zipf, so the cache hit rate is ~99%+; turns the 7-regex chain into a
    dict probe on the hot path."""
    return tuple(normalize_words(word, do_stem, strip_digits,
                                 strip_stop_words))


def normalize(
    text: str,
    do_stem: bool = True,
    strip_digits: bool = True,
    strip_stop_words: bool = True,
    unique_words: bool = False,
    sort_words: bool = True,
) -> str:
    """tools/TextTools.java:577-591. NOTE: term storage in the index uses
    unique=True, sort=False (NobleCoderTerminology.java:1820) so synonym
    word order is preserved."""
    words = normalize_words(text, do_stem, strip_digits, strip_stop_words)
    if unique_words:
        if sort_words:
            words = sorted(set(words))
        else:
            seen: dict[str, None] = {}
            for w in words:
                seen.setdefault(w)
            words = list(seen)
    elif sort_words:
        words = sorted(words)
    return " ".join(words).strip()


# ---------------------------------------------------------------------------
# sentence splitting (tools/SentenceDetector.java:91-137)
# ---------------------------------------------------------------------------

_SENT_EXC_1 = re.compile(r".*\W(vs|Fig|al|etc)\.", re.DOTALL)
_SENT_EXC_2 = re.compile(r".*\W[A-Z][a-z]?\.", re.DOTALL)

SENT_PROSE = "Prose"
SENT_LINE = "Line"
SENT_HEADER = "Header"
SENT_WORKSHEET = "Worksheet"


def _is_sentence_exception(s: str) -> bool:
    return bool(_SENT_EXC_1.fullmatch(s)) or bool(_SENT_EXC_2.fullmatch(s))


def split_sentences(text: str, offset: int = 0) -> list[tuple[str, int]]:
    """Return [(sentence_text, absolute_offset)] per SentenceDetector.
    Newlines inside a sentence are replaced with spaces (length preserved)."""
    out: list[tuple[str, int]] = []
    buf: list[str] = []
    start = offset
    n = len(text)
    for i, ch in enumerate(text):
        buf.append(" " if ch in "\n\r" else ch)
        if ch in ".!?":
            if i + 1 < n and text[i + 1].isdigit():
                continue
            if i + 1 < n and not (text[i + 1].isspace() or text[i + 1] == ","):
                continue
            s = "".join(buf)
            if _is_sentence_exception(s):
                continue
            out.append((s, start))
            buf = []
            start = offset + i + 1
    tail = "".join(buf)
    if tail.strip():
        out.append((tail, start))
    return out


# ---------------------------------------------------------------------------
# DeID scrub (util/DeIDUtils.java:45-62) — length-preserving blank-out of
# **TAG[...] patterns so downstream offsets stay valid.
# ---------------------------------------------------------------------------

# exact reference pattern (DeIDUtils.java:55): greedy bracket body — two
# tags on one line are blanked as one span, including the text between
_DEID_RE = re.compile(r"\*?\*\*[A-Z\-]+(\[.*\])?")
# optional trailing military time accepts BOTH '1453' and '14:53'
# (DeIDUtils.java:18 `(?:\s(\d{2})\:?(\d{2}))?`)
_DEID_DATE_RE = re.compile(
    r"\*\*DATE\[(.*?)\](\s+(\d{1,2}):?(\d{2}))?")


def get_ngrams(text: str, n: int) -> list[str]:
    """All contiguous 1..n-grams of the token stream
    (TextTools.getNGrams tools/TextTools.java:346-364)."""
    words = get_words(text)
    out: list[str] = []
    for size in range(1, n + 1):
        for i in range(len(words) - size + 1):
            out.append(" ".join(words[i:i + size]))
    return out


def parse_deid_date(text: str):
    """DeID date tag → datetime (util/DeIDUtils.java:15-33):
    '**DATE[Oct 15 2007] 1453' — optional trailing military time."""
    from datetime import datetime

    m = _DEID_DATE_RE.search(text)
    if not m:
        return None
    body = m.group(1).strip()
    for fmt in ("%b %d %Y", "%b %d, %Y", "%m/%d/%Y", "%m/%d/%y", "%b %Y",
                "%Y"):
        try:
            dt = datetime.strptime(body, fmt)
            break
        except ValueError:
            continue
    else:
        return None
    if m.group(3) is not None:
        dt = dt.replace(hour=int(m.group(3)) % 24, minute=int(m.group(4)))
    return dt


def filter_deid_tags(text: str) -> str:
    return _DEID_RE.sub(lambda m: " " * len(m.group(0)), text)
