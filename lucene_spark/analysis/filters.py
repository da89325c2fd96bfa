"""Pluggable token filters (the reference's TokenFilter extension point).

Demonstrates the §2.10 analyzer extension contract: a filter is a pure
``str -> str | None`` function (None drops the token) applied after
lowercasing and before stop removal in :class:`StandardAnalyzer`'s chain.

Implemented (each a from-scratch re-expression of the cited filter's
*behavior*, not its code):

* :func:`english_possessive` — ``en/EnglishPossessiveFilter.java``: strips
  a trailing ``'s`` (ASCII or typographic apostrophe),
* :func:`ascii_fold` — ``miscellaneous/ASCIIFoldingFilter.java`` (the
  Unicode-decomposition subset): NFKD-decompose and drop combining marks,
  so ``café`` → ``cafe``; tokens that remain non-ASCII pass through
  unchanged,
* :func:`porter_stem` — ``PorterStemFilter``: the classic Porter (1980)
  algorithm, steps 1a–5b, implemented from the published description.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = [
    "english_possessive",
    "ascii_fold",
    "porter_stem",
    "token_offset_payload",
    "position_payload",
    "token_length_payload",
]


# ------------------------------------------------------- payload producers
#
# The PayloadAttribute producer shape (``analysis/common/.../payloads/``):
# a pure ``(term, pos, start_offset, end_offset) -> float`` attached to
# :class:`~lucene_spark.analysis.analyzer.StandardAnalyzer` via
# ``payload_fn``.  Payloads are stored per position as float32 (the decoded
# form of Lucene's 4-byte-float payload convention, ``queries/payloads/
# PayloadDecoder.java:34``).


def token_offset_payload(term: str, pos: int, so: int, eo: int) -> float:
    """Payload = the token's start character offset
    (``TokenOffsetPayloadTokenFilter.java`` behavior, float-decoded):
    lets queries score or filter by where in the document a term occurs."""
    return float(so)


def position_payload(term: str, pos: int, so: int, eo: int) -> float:
    """Payload = the token's position (increment-accumulated, stop holes
    included) — a positional variant of the same producer shape."""
    return float(pos)


def token_length_payload(term: str, pos: int, so: int, eo: int) -> float:
    """Payload = the raw surface length in chars (offset span; a
    ``NumericPayloadTokenFilter``-style constant-per-class producer's
    simplest useful cousin)."""
    return float(eo - so)


def english_possessive(token: str) -> str:
    if len(token) >= 2 and token[-1] in "sS" and token[-2] in "'’’":
        return token[:-2]
    return token


def ascii_fold(token: str) -> str:
    if token.isascii():
        return token
    decomposed = unicodedata.normalize("NFKD", token)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped if stripped else token


# ------------------------------------------------------------- Porter stemmer

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC){m}[V]."""
    forms = "".join("C" if _is_cons(stem, i) else "V" for i in range(len(stem)))
    return len(re.findall("VC", forms))


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(token: str) -> str:
    w = token
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _step1b_fixup(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _step1b_fixup(w)

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion"):
            stem = w[:-3]
            if stem and stem[-1] in "st" and _measure(stem) > 1:
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _step1b_fixup(w: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _ends_cvc(w):
        return w + "e"
    return w


# ------------------------------------------------------- multi-token emitters


def make_shingle_filter(
    size: int = 2,
    sep: str = " ",
    filler: str = "_",
    output_unigrams: bool = True,
):
    """Word-shingle stream filter (``shingle/ShingleFilter.java`` behavior
    spec): emits ``size``-grams over the position stream; stop/overlong
    *holes* inside a shingle are filled with the ``filler`` token (Lucene's
    filler-token insertion).  Shingles start at every real-token position
    whose window fits before the last real token.  Ordering: at each start
    position the unigram (if kept) precedes its shingle."""

    def f(pairs: list[tuple[str, int]]) -> list[tuple[str, int]]:
        if not pairs:
            return pairs
        posmap = dict((p, t) for t, p in pairs)
        maxp = max(posmap)
        out: list[tuple[str, int]] = []
        for t, p in pairs:
            if output_unigrams:
                out.append((t, p))
            if p + size - 1 <= maxp:
                window = [posmap.get(p + i, filler) for i in range(size)]
                out.append((sep.join(window), p))
        return out

    return f


def make_edge_ngram_filter(min_gram: int = 1, max_gram: int = 2):
    """Edge n-gram stream filter (``ngram/EdgeNGramTokenFilter.java``):
    each token emits its leading prefixes of length min..max (at the same
    position) — the classic index-time autocomplete setup."""

    def f(pairs: list[tuple[str, int]]) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for t, p in pairs:
            for n in range(min_gram, max_gram + 1):
                if n > len(t):
                    break
                out.append((t[:n], p))
        return out

    return f


def make_ngram_filter(min_gram: int = 1, max_gram: int = 2):
    """N-gram stream filter (``ngram/NGramTokenFilter.java``): every
    substring of length min..max of each token, in (start, length) order,
    all at the token's position."""

    def f(pairs: list[tuple[str, int]]) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for t, p in pairs:
            for i in range(len(t)):
                for n in range(min_gram, max_gram + 1):
                    if i + n > len(t):
                        break
                    out.append((t[i : i + n], p))
        return out

    return f
