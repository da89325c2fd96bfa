"""Standard analysis chain: tokenizer -> lowercase -> stop filter.

Parity target is the reference's ``StandardAnalyzer``
(``lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:86-95``):
``StandardTokenizer`` (UAX#29 word break,
``analysis/standard/StandardTokenizerImpl.jflex``) -> ``LowerCaseFilter``
(per-codepoint ``Character.toLowerCase``, ``analysis/LowerCaseFilter.java:36-43``)
-> ``StopFilter`` (``analysis/StopFilter.java:96-98``; the default stop set is
EMPTY, StandardAnalyzer.java:51-53).

Conformance envelope (documented, mirrors SURVEY.md §7.2): the tokenizer
implements the ALPHANUM/NUM subset of UAX#29 — letter runs joined by
MidLetter/MidNumLet (``'``, ``’``, ``.``, ``·``), digit runs joined by
MidNum/MidNumLet (``,``, ``.``, ``;``, ``'``), ExtendNumLet (``_``) folding —
plus the CJK (ideographic/hiragana/katakana/hangul) and EMOJI classes
(ZWJ sequences, modifiers, flag pairs; round 5 adds keycap sequences and
subdivision-flag tag sequences), and (round 4) the
SOUTHEAST_ASIAN class — Thai/Lao/Myanmar/Khmer runs are one token like
``StandardTokenizerImpl.jflex``, or dictionary-segmented when a
``sea_segmenter`` is configured (:func:`make_dictionary_segmenter`, the
``ThaiTokenizer`` analog with a caller-supplied wordlist) — which covers
the ALPHANUM/NUM/CJK/emoji/SEA test cases of ``TestStandardAnalyzer``
(the 40-language analyzer zoo stays out of scope).  Tokens longer than
``max_token_length`` (default 255) are skipped, not truncated
(``StandardTokenizer.java:152-175``).

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

# UAX#29 word-break subset.  Script classes mirror StandardTokenizer's token
# types (StandardTokenizer.java:43-64, StandardTokenizerImpl.jflex):
#   ALPHANUM   letter/digit runs with MidLetter/MidNum/MidNumLet joins,
#   KATAKANA   katakana runs (WB13 Katakana × Katakana),
#   HANGUL     hangul-syllable runs,
#   HIRAGANA   ONE hiragana codepoint per token,
#   IDEOGRAPHIC ONE CJK ideograph per token.
# The CJK classes are excluded from \w so an ideograph run splits into
# per-character tokens exactly as the JFlex grammar does.
_HIRA = "ぁ-ゖゝ-ゟ"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾟ"
_HANGUL = "ᄀ-ᇿ㄰-㆏ꥠ-꥿가-힣ힰ-퟿"
_IDEO = (
    "々〇〡-〩〸-〻㐀-䶿一-鿿"
    "豈-﫿\U00020000-\U0002fa1f"
)
_CJK = _HIRA + _KATA + _HANGUL + _IDEO
# SOUTHEAST_ASIAN class (StandardTokenizerImpl.jflex): scripts with no
# inter-word spaces — a contiguous run is ONE token unless a dictionary
# segmenter is configured.  Core letter+mark ranges of Thai / Lao /
# Myanmar / Khmer (digits stay in the NUM class); including the combining
# vowel/tone marks here also keeps a run whole, which plain ``\w`` would
# split (marks are not alphanumeric).
_SEA = (
    "ก-๎"  # Thai
    "ກ-ໍ"  # Lao
    "က-ဿၐ-႟"  # Myanmar
    "ក-៓"  # Khmer
)
# EMOJI keycap sequence ``[0-9#*] (FE0F) 20E3``.  A word run must give its
# FINAL digit back when a keycap mark follows ("12️⃣" is the number "1"
# then the keycap emoji "2️⃣", not the number "12") — enforced by a
# one-per-token trailing guard on the ALPHANUM/NUM alternative.  The guard
# measurably taxes the hot path (~5% on digit-heavy text; a per-CHAR
# lookahead in the word class cost ~20%), so TWO compiled patterns exist
# and the tokenizer picks per text: the guarded one only when the text
# contains U+20E3 at all (one C-level ``in`` scan), the plain one —
# byte-identical behavior on keycap-free text — otherwise.
_KEYCAP = "[0-9#*]️?⃣"
# last char digit ⇒ no keycap mark may follow; the not-a-keycap-mark branch
# first (true for essentially every token, one fast class test)
_KEYCAP_GUARD = r"(?:(?!️?⃣)|(?<!\d))"
_W = rf"(?:(?![{_CJK}{_SEA}])\w)"  # \w minus the CJK/SEA script classes
# EMOJI token class (StandardTokenizer.java:43-64 EMOJI type): an emoji
# base + optional skin-tone modifier / VS16, extended by ZWJ joins and
# (r5) Unicode tag characters (subdivision-flag tag sequences, e.g. the
# England flag 1F3F4 + E0067..E007F) into one token; regional-indicator
# PAIRS (flags) are one token; (r5) keycap sequences ``[0-9#*] (FE0F)
# 20E3`` are one EMOJI token (``TestStandardAnalyzer.testEmojiVariation
# Sequence``), tried before the NUM class so "3️⃣" does not split as a
# number.  (Envelope: the common pictographic blocks stand in for the
# Extended_Pictographic property; text-presentation selectors FE0E after
# a base are left untokenized — "⭕︎" still yields the EMOJI "⭕" — but
# WB:Extend absorption into ALPHANUM/NUM tokens ("3︎" keeping its FE0E)
# is out of scope.)
_EMOJI_BASE = "[\U0001f000-\U0001faff☀-➿⬀-⯿①-⓿]"
_EMOJI_MOD = "[\U0001f3fb-\U0001f3ff️]"
_EMOJI_TAGS = "[\U000e0020-\U000e007f]*"
_EMOJI_SEQ = (
    rf"{_EMOJI_BASE}{_EMOJI_MOD}*{_EMOJI_TAGS}"
    rf"(?:‍{_EMOJI_BASE}{_EMOJI_MOD}*{_EMOJI_TAGS})*"
)
_REGIONAL = "[\U0001f1e6-\U0001f1ff]"
def _compile_token_re(keycap_guard: str) -> "re.Pattern":
    return re.compile(
        rf"{_KEYCAP}"  # EMOJI keycap sequence (before NUM: "3️⃣" is one emoji)
        rf"|{_W}+"
        r"(?:"
        rf"(?<=[^\W\d_])['’.·](?=[^\W\d_]){_W}+"  # ALetter MidLetter/MidNumLet ALetter
        rf"|(?<=\d)[,.;'’](?=\d){_W}+"  # Numeric MidNum/MidNumLet Numeric
        r")*"
        rf"{keycap_guard}"  # give the final digit to a following keycap
        rf"|[{_KATA}]+"  # KATAKANA runs
        rf"|[{_HANGUL}]+"  # HANGUL runs
        rf"|[{_HIRA}]"  # single HIRAGANA
        rf"|[{_IDEO}]"  # single IDEOGRAPHIC
        rf"|[{_SEA}]+"  # SOUTHEAST_ASIAN runs (dictionary-segmentable)
        rf"|{_REGIONAL}{_REGIONAL}"  # flag = regional-indicator pair
        rf"|{_EMOJI_SEQ}",  # EMOJI (ZWJ sequences, modifiers, tag sequences)
        re.UNICODE,
    )


_TOKEN_RE = _compile_token_re("")  # hot path: no keycap marks in the text
_TOKEN_RE_KEYCAP = _compile_token_re(_KEYCAP_GUARD)


def _token_re_for(text: str) -> "re.Pattern":
    return _TOKEN_RE_KEYCAP if "⃣" in text else _TOKEN_RE

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
    toks = _token_re_for(text).findall(text)
    return [t for t in toks if len(t) <= max_token_length]


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
            t = m.group(0)
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
