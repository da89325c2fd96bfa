"""Standard analysis chain: tokenizer -> lowercase -> stop filter.

Parity target is the reference's ``StandardAnalyzer``
(``lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:86-95``):
``StandardTokenizer`` (UAX#29 word break,
``analysis/standard/StandardTokenizerImpl.jflex``) -> ``LowerCaseFilter``
(per-codepoint ``Character.toLowerCase``, ``analysis/LowerCaseFilter.java:36-43``)
-> ``StopFilter`` (``analysis/StopFilter.java:96-98``; the default stop set is
EMPTY, StandardAnalyzer.java:51-53).

The tokenizer is a full transcription of the reference jflex grammar
(``StandardTokenizerImpl.jflex:51-100,205-286``) over GENERATED true
WordBreak/Script/LineBreak/UTS#51 property tables
(:mod:`lucene_spark.analysis.unicode_wb`): WB4 absorption on every base
character, the complete MidLetter/MidNumLet/MidNum/ExtendNumLet sets,
Hebrew quote rules WB7a-c, NUM = ``\\p{WB:Numeric}``, the CJK per-char and
katakana-run classes, the SOUTHEAST_ASIAN (``LB:Complex_Context``) class
— runs are one token like the reference, or dictionary-segmented when a
``sea_segmenter`` is configured (:func:`make_dictionary_segmenter`, the
``ThaiTokenizer`` analog) — and the EMOJI class over the real
Extended_Pictographic table (ZWJ sequences, modifiers, flag pairs, keycap
and subdivision-flag tag sequences).  Covers the ``TestStandardAnalyzer``
suite (the 40-language analyzer zoo stays out of scope).  Tokens longer
than ``max_token_length`` (default 255) are skipped, not truncated
(``StandardTokenizer.java:152-175``).

Conformance envelope (documented divergences from the jflex scanner):
property tables follow the ``regex`` module's current Unicode version,
not the reference's pinned 12.1 (newer scripts/emoji tokenize; no 12.1
member was removed for the classes used here — spot-asserted in tests);
a leading ExtendNumLet run absorbs only non-token-starting extend chars
(see ``_ENL_LEADX``); repeated FE0F presentation selectors ride one
element; absorption between a Hebrew letter and its WB7a-c quote is not
recognized.

Lowercase parity: Java ``Character.toLowerCase`` is a per-codepoint 1:1 map;
Python ``str.lower()`` applies full mappings (U+0130 -> "i"+combining dot) and
contextual final sigma.  We pre-translate the two divergent codepoints so the
result matches Java.

Everything is vectorized over pandas Series for use in Arrow UDFs.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

from lucene_spark.analysis.unicode_wb import (
    EMOJI_MOD_CLASS,
    EXT_PICT_ASTRAL_CLASS,
    EXT_PICT_BMP_CLASS,
    WB_AH_ASTRAL_CLASS,
    WB_AH_BMP_CLASS,
    WB_ENL_CLASS,
    WB_EXT_ASTRAL_CLASS,
    WB_EXT_BMP_CLASS,
    WB_EXT_SANS_PRESSEL_CLASS,
    WB_EXT_SANS_PRESSEL_ZWJ_CLASS,
    WB_HEB_CLASS,
    WB_HIRA_ASTRAL_CLASS,
    WB_HIRA_BMP_CLASS,
    WB_IDEO_ASTRAL_CLASS,
    WB_IDEO_BMP_CLASS,
    WB_KATA_ASTRAL_CLASS,
    WB_KATA_BMP_CLASS,
    WB_MIDL_CLASS,
    WB_MIDN_CLASS,
    WB_NUM_ASTRAL_CLASS,
    WB_NUM_BMP_CLASS,
    WB_RI_CLASS,
    WB_SEA_CLASS,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "StandardAnalyzer",
    "tokenize",
    "analyze_series",
]

# The canonical 33-word English stop set
# (analysis/common/.../en/EnglishAnalyzer.java:43-53).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# UAX#29 word-break transcription of the reference grammar
# (StandardTokenizerImpl.jflex:83-100,205-286).  Script classes mirror
# StandardTokenizer's token types (StandardTokenizer.java:43-64):
#   ALPHANUM   letter/digit runs with MidLetter/MidNum/MidNumLet joins
#              (hangul is WB:ALetter, so hangul runs - and mixed
#              hangul+latin runs - ride this class, like the jflex
#              word rule whose {HangulEx}+ twin exists for typing only),
#   KATAKANA   katakana runs (WB13), joinable to other segments via
#              ExtendNumLet (WB13a/b),
#   HIRAGANA   ONE hiragana codepoint per token (WB:Other),
#   IDEOGRAPHIC ONE CJK ideograph per token (WB999).
# Every base character absorbs [\p{WB:Format}\p{WB:Extend}\p{WB:ZWJ}]*
# per UAX#29 WB4 (jflex {ExtFmtZwj}, :83-85) - combining marks, format
# controls, ZWJ, and variation selectors stay INSIDE the token text, so
# "moͤchte" is one token (TestStandardAnalyzer.testLUCENE1545) and
# "3︎" is the NUM "3︎" (testEmojiVariationSequence).
# Per-char script token classes, from the generated property tables
# (true \p{Script=Hiragana}/\p{Script=Han} per jflex HiraganaEx/HanEx
# :94-95, minus WB4 absorption chars and the AH-classified Lm iteration
# marks - see the generator).  KATAKANA is the true \p{WB:Katakana}
# (halfwidth voiced sound marks FF9E/FF9F are WB:Extend, i.e. absorption,
# NOT katakana bases).
_HIRA = WB_HIRA_BMP_CLASS
_KATA = WB_KATA_BMP_CLASS
_IDEO = WB_IDEO_BMP_CLASS
# SOUTHEAST_ASIAN class: the true \p{LB:Complex_Context} (jflex
# ComplexContextEx :100) - scripts with no inter-word spaces; a
# contiguous run is ONE token unless a dictionary segmenter is
# configured.  Includes the scripts' combining marks (they are LB:SA and
# WB:Extend both - run continuation either way).
_SEA = WB_SEA_CLASS
# BMP/astral split (generated): a class containing astral ranges costs a
# linear range-tail scan on every NON-member test in CPython's sre; the
# split form is an O(1) BIGCHARSET test for the BMP (virtually every
# character of real text), with the astral tail behind a single
# range-test lookahead.  The EXT/AH classes are tested at every character
# position, so this is the tokenizer's hottest micro-decision.
_ASTRAL = "(?=[\U00010000-\U0010ffff])"
_EXT = f"(?:[{WB_EXT_BMP_CLASS}]|{_ASTRAL}[{WB_EXT_ASTRAL_CLASS}])"
# Absorption is possessive (*+): in every rule below, the character
# required after an absorption run is never itself in the absorbed class
# (the generator ASSERTS this disjointness), so giving absorbed chars
# back can never rescue a failing match - and possessiveness removes the
# nested-quantifier backtracking that made adversarial ENL/Extend runs
# quadratic-to-exponential (the LUCENE-5897 pathology; jflex is DFA-based
# and immune, Python re is not).  The one exception is the keycap rule,
# whose required U+20E3 IS in the absorption class - it keeps a
# backtracking star.
_EXTX = f"{_EXT}*+"
_SPSX = f"[{WB_EXT_SANS_PRESSEL_CLASS}]*"
_SPSZ = f"[{WB_EXT_SANS_PRESSEL_ZWJ_CLASS}]"

# Word-rule character classes (jflex :87-100), all from the generated
# true WordBreak property tables: AH = [\p{WB:ALetter}
# \p{WB:Hebrew_Letter}] (hangul is ALetter and stays in), NUM =
# \p{WB:Numeric} (includes the Cf prepended signs U+0600.. and the
# Arabic decimal separator - NOT the same set as \d), ENL =
# \p{WB:ExtendNumLet}, MIDL = MidLetter|MidNumLet|Single_Quote (':'
# joins letters - TestStandardAnalyzer.testMid), MIDN =
# MidNum|MidNumLet|Single_Quote.  Freezing generated tables also pins
# tokenization against interpreter unicodedata drift, so every executor
# on a heterogeneous cluster tokenizes identically.
_AH = f"(?:[{WB_AH_BMP_CLASS}]|{_ASTRAL}[{WB_AH_ASTRAL_CLASS}])"
_NUM = f"(?:[{WB_NUM_BMP_CLASS}]|{_ASTRAL}[{WB_NUM_ASTRAL_CLASS}])"
_ENL = f"[{WB_ENL_CLASS}]"
_MIDL = f"[{WB_MIDL_CLASS}]"
_MIDN = f"[{WB_MIDN_CLASS}]"
# WB:Hebrew_Letter, bracketless (for the WB7a-c quote rules; subset of AH)
_HEB1 = WB_HEB_CLASS
_SQ = "'"
_DQ = '"'

# Run forms: the seg iterations below consume one "base + absorption"
# unit per step, but a RUN of k bases with interleaved absorption is the
# same language as k iterations with empty joiners - and since the base
# class and the absorption class are disjoint, the run continuation can
# be ONE merged character class (a single BIGCHARSET test per character,
# the tokenizer's inner loop) instead of base-test + absorption-test +
# branch machinery per character (~2.3x measured on non-ASCII text).
_AH_EXT_CONT = (
    f"(?:[{WB_AH_BMP_CLASS}{WB_EXT_BMP_CLASS}]"
    f"|{_ASTRAL}[{WB_AH_ASTRAL_CLASS}{WB_EXT_ASTRAL_CLASS}])"
)
_AHX = f"{_AH}{_AH_EXT_CONT}*+"
_NUMX = (
    f"{_NUM}(?:[{WB_NUM_BMP_CLASS}{WB_EXT_BMP_CLASS}]"
    f"|{_ASTRAL}[{WB_NUM_ASTRAL_CLASS}{WB_EXT_ASTRAL_CLASS}])*+"
)
_ENLX = f"(?:{_ENL}{_EXTX})"
_KATAX = (
    f"(?:[{WB_KATA_BMP_CLASS}]|{_ASTRAL}[{WB_KATA_ASTRAL_CLASS}])"
    f"(?:[{WB_KATA_BMP_CLASS}{WB_EXT_BMP_CLASS}]"
    f"|{_ASTRAL}[{WB_KATA_ASTRAL_CLASS}{WB_EXT_ASTRAL_CLASS}])*+"
)

# jflex :238-252 word rule, one segment each:
#   AH seg:  {AHLetterEx} (({ExtendNumLetEx}*|{MidLetterEx}) {AHLetterEx})*
#            plus WB7b/c (Hebrew DQ Hebrew, inline branch with a 1-char
#            lookbehind - absorption between the letter and the quote is
#            out of envelope) and WB7a (trailing single quote after a
#            Hebrew letter).
#   NUM seg: {NumericEx} (({ExtendNumLetEx}*|{MidNumericEx}) {NumericEx})*
#   KATA seg:{KatakanaEx} ({ExtendNumLetEx}* {KatakanaEx})*
# (ENLx* is spelled (ENLx+|MIDx)? - same language, no nullable branch
# inside a star for the backtracking engine.)
_AHSEG = (
    f"{_AHX}"
    f"(?:(?:{_ENLX}++|{_MIDL}{_EXTX})?{_AHX}|(?<=[{_HEB1}]){_DQ}{_EXTX}(?=[{_HEB1}]){_AHX})*"
    f"(?:(?<=[{_HEB1}]){_SQ}{_EXTX})?"
)
_NUMSEG = f"{_NUMX}(?:(?:{_ENLX}++|{_MIDN}{_EXTX})?{_NUMX})*"
_KATASEG = f"{_KATAX}(?:{_ENLX}*+{_KATAX})*"
# Branch order within the alternations is frequency-based (letters >>
# digits >> katakana in real text; branches have disjoint first-char
# classes, so order never changes the match, only the test count).
_CORE = f"(?:{_AHSEG}|{_NUMSEG})+"
# ENLx* (KATA-seg | CORE) (ENLx+ (KATA-seg | CORE))* ENLx* - ExtendNumLet
# joins segments (WB13a/b) and may lead/trail, but never stands alone.
# ENL quantifiers are possessive too: no segment starts with an ENL char,
# so a shorter ENL run never rescues a failing segment match.
_SEG = f"(?:{_CORE}|{_KATASEG})"
# Guarded absorption for the LEADING ENL run and the skip rule below: it
# stops before any absorption char that can START a token (ZWJ opens a
# leading-ZWJ emoji sequence, U+1F3FB-FF a lone-modifier emoji, SEA
# combining marks a ComplexContext run).  The word rule's leading run
# must use it for linear scanning: with FULL absorption, a dead run like
# "_ZWJ_ZWJ..." costs O(run) at every ENL offset = O(run^2) (the
# LUCENE-5897 shape; measured 18 s at 20k chars) because the skip rule
# below legitimately stops at those chars - each of which IS a reference
# token or 1-char break, so finditer restarts inside the run.  Envelope:
# a word whose leading ENL absorption contains such a char directly
# before the first segment char ("_<U+1F3FC>a") tokenizes as
# skip+EMOJI+word instead of the reference's single word token; interior
# and trailing ENL runs keep FULL absorption, so "a_<ZWJ>b" stays exact.
_SKIP_EXT = f"(?:(?![{_SEA}\u200d{EMOJI_MOD_CLASS}]){_EXT})"
_ENL_LEADX = f"(?:{_ENL}{_SKIP_EXT}*+)"
_WORD = f"{_ENL_LEADX}*+{_SEG}(?:{_ENLX}++{_SEG})*{_ENLX}*+"
# Dead ExtendNumLet runs ("___", "_ZWNJ_ZWNJ...") match NO rule - the
# reference's fallback [^] silently breaks them char by char.  This skip
# alternative - tried LAST, so only where every token rule already
# failed - consumes the run in one pass instead of retrying the word
# rule at every offset.  Skip matches are recognized by capture group 1
# being empty.
_ENL_SKIP = f"{_ENL_LEADX}++"

# EMOJI token class (jflex :56-77,205-208).  An element is an
# Extended_Pictographic base (true generated \p{Extended_Pictographic};
# the jflex EmojiChar also unions \p{Emoji}-minus-RKAM, which the
# generator ASSERTS adds nothing) OR a lone skin-tone modifier (the
# EmojiCharOrPresSeqOrModSeq second branch - a standalone U+1F3FB-FF is
# an EMOJI token; with a base present the modifier is simply absorbed,
# the same language).  Elements absorb presentation selectors / skin
# tones / tag characters (subdivision flags) and chain on ZWJ;
# regional-indicator PAIRS are one token; keycap sequences
# ``[0-9#*] FE0F? 20E3`` are EMOJI.  The word rule is tried FIRST: at
# equal length the choice only affects the (unemitted) token type, and
# where the word rule reaches further it must win (jflex maximal munch -
# "12(FE0F)(20E3)" is a single NUM token whose ExtFmtZwj absorbs the
# keycap marks; only a keycap that STARTS a token comes out of the EMOJI
# rule, with identical text either way).
_KEYCAP_SEQ = f"[0-9#*]{_SPSX}\ufe0f?\u20e3{_SPSX}"
_EMOJI_ELEM = (
    f"(?:[{EXT_PICT_BMP_CLASS}]|{_ASTRAL}[{EXT_PICT_ASTRAL_CLASS}]"
    f"|[{EMOJI_MOD_CLASS}])(?:\ufe0f|{_SPSZ})*+"
)
_EMOJI_SEQ = f"\u200d*+{_EMOJI_ELEM}(?:\u200d++{_EMOJI_ELEM})*+\u200d*+"
_REGIONAL = f"[{WB_RI_CLASS}]"

# Group 1 wraps every real token rule; the ENL-run skip alternative sits
# outside it, so skip matches surface as empty group-1 strings that
# ``findall`` callers drop (and ``finditer`` callers test ``m.group(1)``).
_TOKEN_RE = re.compile(
    rf"({_WORD}"
    rf"|(?:[{_HIRA}]|{_ASTRAL}[{WB_HIRA_ASTRAL_CLASS}]){_EXTX}"  # single HIRAGANA
    rf"|(?:[{_IDEO}]|{_ASTRAL}[{WB_IDEO_ASTRAL_CLASS}]){_EXTX}"  # single IDEOGRAPHIC
    rf"|[{_SEA}](?:[{_SEA}{WB_EXT_BMP_CLASS}]"
    rf"|{_ASTRAL}[{WB_EXT_ASTRAL_CLASS}])*+"  # SOUTHEAST_ASIAN runs
    rf"|{_KEYCAP_SEQ}"  # EMOJI keycap sequence starting a token
    rf"|{_REGIONAL}{_EXTX}{_REGIONAL}{_EXTX}"  # flag = regional-indicator pair
    rf"|{_EMOJI_SEQ})"  # EMOJI (ZWJ sequences, modifiers, tag sequences)
    rf"|{_ENL_SKIP}",  # dead ExtendNumLet run - no token (see above)
    re.UNICODE,
)

# ASCII fast path: on pure-ASCII text (one C-level str.isascii test) the
# grammar above collapses to this lookaround pattern - no absorption class
# can fire (no absorption chars below U+0080 - the generator asserts the
# exact ASCII cross-section of every class), no Hebrew/katakana/emoji,
# ENL is '_' alone, and the Mid sets reduce to their ASCII members.  The
# leading lookahead keeps pure-'_' runs from becoming tokens
# (ExtendNumLet never stands alone); the trailing ``_++`` skip
# alternative consumes dead underscore runs in one pass (same group-1
# scheme as above).  Byte-identical to _TOKEN_RE on ASCII input (asserted
# by test) at single-class-star speed.
_ASCII_RE = re.compile(
    r"((?=_*+[0-9A-Za-z])[0-9A-Za-z_]++"
    r"(?:"
    r"(?<=[A-Za-z])[:'.](?=[A-Za-z])[0-9A-Za-z_]++"  # ALetter Mid ALetter
    r"|(?<=\d)[,.;'](?=\d)[0-9A-Za-z_]++"  # Numeric Mid Numeric
    r")*+)"
    r"|_++"  # dead underscore run - no token
)


def _token_re_for(text: str) -> "re.Pattern":
    return _ASCII_RE if text.isascii() else _TOKEN_RE

# Java Character.toLowerCase divergences from Python str.lower():
#   U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE -> 'i' (Python: "i̇")
#   U+03A3 GREEK CAPITAL SIGMA -> always U+03C3 (Python: contextual final sigma)
_LOWER_EXCEPTIONS = {0x0130: "i", 0x03A3: "σ"}

DEFAULT_MAX_TOKEN_LENGTH = 255


def java_lower(s: str) -> str:
    """Per-codepoint lowercase matching ``Character.toLowerCase``."""
    return s.translate(_LOWER_EXCEPTIONS).lower()


_SEA_START = re.compile(rf"[{_SEA}]")


def make_dictionary_segmenter(words: Iterable[str]):
    """Greedy longest-match word break for SOUTHEAST_ASIAN runs — the
    dictionary-driven segmentation the reference delegates to a
    BreakIterator dictionary (``analysis/th/ThaiTokenizer.java``;
    ``StandardTokenizerImpl.jflex`` SOUTHEAST_ASIAN keeps the run whole).
    Maximal matching from the left; characters no dictionary word covers
    are emitted as single-character tokens (each consuming a position) —
    the standard fallback, so downstream stats stay total."""
    vocab = frozenset(words)
    maxlen = max((len(w) for w in vocab), default=1)

    def segment(run: str) -> list[str]:
        out, i, n = [], 0, len(run)
        while i < n:
            for ln in range(min(maxlen, n - i), 0, -1):
                if run[i : i + ln] in vocab:
                    out.append(run[i : i + ln])
                    i += ln
                    break
            else:
                out.append(run[i])
                i += 1
        return out

    return segment


def tokenize(text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH) -> list[str]:
    """UAX#29-subset word tokens of ``text`` (no case folding, no stops)."""
    if not text:
        return []
    # findall yields group 1: the token text, or '' for skip-rule matches
    toks = _token_re_for(text).findall(text)
    return [t for t in toks if t and len(t) <= max_token_length]


class KeywordAnalyzer:
    """``analysis/core/KeywordAnalyzer.java``: the entire input as ONE
    untokenized, uncased token (``KeywordTokenizer``); empty input yields
    no tokens.  The analyzer for fields whose values are identifiers —
    class labels, ids, enum-ish strings — where any tokenization would
    corrupt the term (``BM25NBClassifier.java:74-75``: the class field
    "must not be heavely analyzed")."""

    def analyze(self, text: str) -> list[str]:
        return [text] if text else []

    def analyze_series(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: [t] if isinstance(t, str) and t else [])


class StandardAnalyzer:
    """tokenize -> java_lower -> stop-filter, vectorized over Series.

    ``stop_words=None`` reproduces StandardAnalyzer's empty default set;
    pass :data:`ENGLISH_STOP_WORDS` for EnglishAnalyzer-style stopping.
    """

    def __init__(
        self,
        stop_words: Iterable[str] | None = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        token_filters: tuple = (),
        post_stop_filters: tuple = (),
        stream_filters: tuple = (),
        sea_segmenter=None,
        payload_fn=None,
    ):
        """``token_filters`` / ``post_stop_filters``: extra ``str -> str |
        None`` filters (the TokenFilter extension point,
        ``analysis/Analyzer.java:85-95``).  Chain order mirrors
        EnglishAnalyzer: lowercase → token_filters (possessive, folding) →
        stop removal → post_stop_filters (stemming) — stemming must run
        after stops or "was" would stem to the non-stopword "wa".  See
        :mod:`lucene_spark.analysis.filters` for implementations.

        ``stream_filters``: whole-stream filters ``list[(token, pos)] ->
        list[(token, pos)]`` applied last — the multi-token-emitting
        TokenFilter shape (shingles, n-grams; see
        :func:`lucene_spark.analysis.filters.make_shingle_filter`).

        ``sea_segmenter``: optional ``str -> list[str]`` word-break for
        SOUTHEAST_ASIAN runs (see :func:`make_dictionary_segmenter`);
        without it a run is one token, StandardTokenizer's behavior.

        ``payload_fn``: optional ``(term, pos, start_offset, end_offset) ->
        float`` — the PayloadAttribute producer
        (``analysis/tokenattributes/PayloadAttribute.java``; producer
        filters live in ``analysis/common/.../payloads/``, e.g.
        ``TokenOffsetPayloadTokenFilter.java``).  Lucene payloads are
        opaque per-position ``byte[]`` that scoring consumers decode —
        almost always as a 4-byte float (``queries/payloads/
        PayloadDecoder.java:34`` FLOAT_DECODER); this engine stores the
        decoded float32 directly (same 4 bytes, no encode/decode hop).
        See :mod:`lucene_spark.analysis.filters` for stock producers."""
        self.stop_words = frozenset(stop_words) if stop_words else frozenset()
        self.max_token_length = max_token_length
        self.token_filters = tuple(token_filters)
        self.post_stop_filters = tuple(post_stop_filters)
        self.stream_filters = tuple(stream_filters)
        self.sea_segmenter = sea_segmenter
        self.payload_fn = payload_fn

    def _iter_raw(self, text: str):
        """(raw_token, start, end) stream — the tokenizer with the optional
        SEA dictionary word-break applied (segments keep exact offsets)."""
        for m in _token_re_for(text).finditer(text):
            t = m.group(1)
            if not t:  # ENL-run skip rule: no token, no position
                continue
            if self.sea_segmenter is not None and _SEA_START.match(t):
                s = m.start()
                for seg in self.sea_segmenter(t):
                    yield seg, s, s + len(seg)
                    s += len(seg)
            else:
                yield t, m.start(), m.end()

    def _post(self, token: str) -> str | None:
        t = java_lower(token)
        for f in self.token_filters:
            t = f(t)
            if t is None:
                return None
        if t in self.stop_words:
            return None
        for f in self.post_stop_filters:
            t = f(t)
            if t is None:
                return None
        return t

    def analyze(self, text: str) -> list[str]:
        if self.stream_filters:
            return [t for t, _p in self.analyze_with_positions(text)]
        if self.sea_segmenter is not None:
            if not isinstance(text, str) or not text:
                return []
            toks = [
                t
                for t, _s, _e in self._iter_raw(text)
                if len(t) <= self.max_token_length
            ]
        else:
            toks = tokenize(text, self.max_token_length)
        if not self.token_filters and not self.post_stop_filters and not self.stop_words:
            return [java_lower(x) for x in toks]
        out = []
        for x in toks:
            t = self._post(x)
            if t is not None:
                out.append(t)
        return out

    def analyze_series(self, texts: pd.Series) -> pd.Series:
        """Vectorized batch form for pandas/Arrow UDFs."""
        analyze = self.analyze
        return texts.map(lambda t: analyze(t) if isinstance(t, str) else [])

    def analyze_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(token, position) pairs with Lucene position-increment semantics:
        stopped tokens (StopFilter via FilteringTokenFilter) and over-long
        tokens (StandardTokenizer.java:163-174) leave *holes* — the position
        counter advances for every raw tokenizer emission."""
        if not isinstance(text, str) or not text:
            return []
        out = []
        for pos, (t, _s, _e) in enumerate(self._iter_raw(text)):
            if len(t) > self.max_token_length:
                continue
            lt = self._post(t)
            if lt is None:
                continue
            out.append((lt, pos))
        for sf in self.stream_filters:
            out = sf(out)
        return out

    def analyze_with_positions_series(self, texts: pd.Series) -> pd.Series:
        f = self.analyze_with_positions
        return texts.map(f)

    def analyze_with_offsets(self, text: str) -> list[tuple[str, int, int, int]]:
        """(token, position, start_offset, end_offset) — the
        ``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS`` stream
        (``index/PostingsEnum.java:51-58``).  Offsets are character offsets
        into the *raw* text (OffsetAttribute semantics: set by the tokenizer,
        unchanged by downstream filters, so a lowercased/stemmed token still
        points at its original surface span).  Stream filters (shingles,
        n-grams) synthesize multi-token spans and are out of envelope here.
        """
        if self.stream_filters:
            raise ValueError(
                "offsets are not supported with whole-stream filters"
            )
        if not isinstance(text, str) or not text:
            return []
        out = []
        for pos, (t, so, eo) in enumerate(self._iter_raw(text)):
            if len(t) > self.max_token_length:
                continue
            lt = self._post(t)
            if lt is None:
                continue
            out.append((lt, pos, so, eo))
        return out

    def analyze_with_offsets_series(self, texts: pd.Series) -> pd.Series:
        f = self.analyze_with_offsets
        return texts.map(f)

    def analyze_with_payloads(
        self, text: str
    ) -> list[tuple[str, int, int, int, float]]:
        """(token, position, start_offset, end_offset, payload) — the
        positions+offsets stream with the per-position payload attached
        (``IndexOptions`` positions + ``FieldInfo.storePayloads``,
        ``index/PostingsEnum.java:58`` PAYLOADS).  The payload is computed
        by ``payload_fn`` on the POST-FILTER term and the tokenizer's raw
        offsets — the attribute-pipeline order (offset/payload attributes
        survive downstream filters untouched)."""
        if self.payload_fn is None:
            raise ValueError("analyzer has no payload_fn configured")
        if self.stream_filters:
            raise ValueError("payloads are not supported with whole-stream filters")
        if not isinstance(text, str) or not text:
            return []
        pf = self.payload_fn
        out = []
        for pos, (t, so, eo) in enumerate(self._iter_raw(text)):
            if len(t) > self.max_token_length:
                continue
            lt = self._post(t)
            if lt is None:
                continue
            out.append((lt, pos, so, eo, float(pf(lt, pos, so, eo))))
        return out

    def analyze_with_payloads_series(self, texts: pd.Series) -> pd.Series:
        f = self.analyze_with_payloads
        return texts.map(f)


def analyze_series(texts: pd.Series, stop_words: Iterable[str] | None = None) -> pd.Series:
    return StandardAnalyzer(stop_words).analyze_series(texts)
