#!/usr/bin/env python
"""Generate ``lucene_spark/analysis/unicode_wb.py`` — the Unicode
word-break property tables the tokenizer's regex grammar is built from.

The reference grammar (``lucene/core/src/java/org/apache/lucene/analysis/
standard/StandardTokenizerImpl.jflex:51-100``) is written directly against
UAX#29 WordBreak properties (``\\p{WB:ALetter}``, ``\\p{WB:Extend}``, ...),
Script properties (Han/Hiragana), LineBreak Complex_Context, and UTS#51
emoji properties.  Python's stdlib ``re`` has no ``\\p{..}``, so this
generator derives each class from the third-party ``regex`` module's
property tables (generation-time dependency ONLY — the emitted module is
committed and the engine never imports ``regex`` at runtime) and emits
them as explicit character-class range literals.

Freezing the tables has an independent scale benefit: tokenization no
longer depends on the interpreter's unicodedata version, so every
executor on a heterogeneous cluster tokenizes identically — the per-turn
text-equality invariant depends on that determinism.

Each hot class is also emitted as a BMP/astral pair: CPython's sre
compiles an all-BMP class to a BIGCHARSET (O(1) membership), but any
astral range forces a linear RANGE-opcode tail that every NON-member
test scans (~600 ns/char at every space during tokenization).  The
analyzer therefore matches ``(?:[BMP]|(?=[\\U00010000-\\U0010FFFF])
[ASTRAL])``: O(1) for BMP members and non-members, the short linear tail
only for rare astral members.

The generator ASSERTS the structural facts the analyzer's possessive
quantifiers and ASCII fast path rely on (absorption-class disjointness,
exact ASCII cross-sections); a Unicode version where these break fails
generation instead of silently miscompiling the grammar.

Run ``python tools/gen_unicode_wb.py`` and commit the regenerated module.
"""

from __future__ import annotations

import sys
from pathlib import Path

import regex

OUT = (
    Path(__file__).resolve().parent.parent
    / "lucene_spark"
    / "analysis"
    / "unicode_wb.py"
)

# One string holding every codepoint (surrogates excluded: not reachable
# from decoded text); class membership = one findall per property.
_ALL = "".join(
    chr(cp) for cp in range(0x110000) if not 0xD800 <= cp <= 0xDFFF
)


def members(prop_pattern: str) -> set[int]:
    """Codepoints matching a single-char ``regex`` pattern."""
    return {ord(c) for c in regex.compile(prop_pattern).findall(_ALL)}


def to_ranges(cps: set[int]) -> list[tuple[int, int]]:
    ranges: list[tuple[int, int]] = []
    for cp in sorted(cps):
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], cp)
        else:
            ranges.append((cp, cp))
    return ranges


def esc(cp: int) -> str:
    return f"\\U{cp:08X}" if cp > 0xFFFF else f"\\u{cp:04X}"


def class_literal(name: str, cps: set[int]) -> str:
    parts = []
    for lo, hi in to_ranges(cps):
        if lo == hi:
            parts.append(esc(lo))
        elif hi == lo + 1:
            parts.append(esc(lo) + esc(hi))
        else:
            parts.append(f"{esc(lo)}-{esc(hi)}")
    lines, cur = [], ""
    for p in parts:
        if cur and len(cur) + len(p) > 72:
            lines.append(f'    "{cur}"')
            cur = ""
        cur += p
    if cur:
        lines.append(f'    "{cur}"')
    if not lines:
        lines = ['    ""']
    return f"{name} = (\n" + "\n".join(lines) + "\n)\n"


def expand_class_literal(lit: str) -> set[int]:
    """Expand a regex-class body ("a-zXY") into a codepoint set (used by
    the conformance tests to cross-check emitted literals)."""
    out: set[int] = set()
    i = 0
    while i < len(lit):
        if i + 2 < len(lit) and lit[i + 1] == "-":
            out.update(range(ord(lit[i]), ord(lit[i + 2]) + 1))
            i += 3
        else:
            out.add(ord(lit[i]))
            i += 1
    return out


def main() -> None:
    wb = lambda v: members(rf"\p{{WordBreak={v}}}")  # noqa: E731

    extend = wb("Extend")
    fmt = wb("Format")
    zwj = {0x200D}
    ext = extend | fmt | zwj  # jflex ExtFmtZwj (:83-85)
    aletter = wb("ALetter")
    hebrew = wb("Hebrew_Letter")
    ah = aletter | hebrew  # jflex AHLetterEx base (:88-89)
    numeric = wb("Numeric")
    katakana = wb("Katakana")
    enl = wb("ExtendNumLet")
    sq = wb("Single_Quote")
    dq = wb("Double_Quote")
    midletter = wb("MidLetter")
    midnum = wb("MidNum")
    midnumlet = wb("MidNumLet")
    midl = midletter | midnumlet | sq  # jflex MidLetterEx (:91)
    midn = midnum | midnumlet | sq  # jflex MidNumericEx (:92)
    ri = wb("Regional_Indicator")
    # Combining marks with Script=Han/Hiragana (e.g. U+16FF0 Vietnamese
    # alternate reading marks, Mc, post-12.1) are WB:Extend — absorption
    # chars, not token bases; WB4 takes precedence, so subtract.  The Lm
    # iteration marks 々 U+3005 / U+303B / U+16FE3 are Script=Han but
    # WB:ALetter: the jflex word rule precedes HanEx, so at equal length
    # ALetter wins and they ride (and join) word runs — subtract AH too.
    hiragana = members(r"\p{Script=Hiragana}") - ext - ah  # HiraganaEx (:95)
    han = members(r"\p{Script=Han}") - ext - ah  # jflex HanEx (:94)
    sea = members(r"\p{LineBreak=Complex_Context}")  # ComplexContextEx (:100)
    ext_pict = members(r"\p{Extended_Pictographic}")
    emoji = members(r"\p{Emoji}")
    emoji_mod = members(r"\p{Emoji_Modifier}")

    # jflex EmojiChar = ExtPict | (Emoji -- EmojiRKAM) (:65-69).  Assert
    # the subtraction adds nothing beyond ExtPict, so the analyzer's
    # element class can be ExtPict | Emoji_Modifier alone.
    rkam = ri | set(map(ord, "0123456789#*")) | set(map(ord, "©®™〰〽")) | emoji_mod
    assert (emoji - rkam) <= ext_pict, sorted(
        hex(c) for c in (emoji - rkam) - ext_pict
    )[:10]

    # Token classes must be pairwise start-disjoint where the analyzer's
    # alternation order assumes it, and the WB4 absorption class must be
    # disjoint from every base class reached right after an absorption
    # star (possessive-quantifier soundness).
    for name, cls in [
        ("ah", ah),
        ("numeric", numeric),
        ("katakana", katakana),
        ("enl", enl),
        ("midl", midl),
        ("midn", midn),
        ("hiragana", hiragana),
        ("han", han),
        ("dq", dq),
    ]:
        overlap = cls & ext
        assert not overlap, (name, sorted(hex(c) for c in overlap)[:10])
    assert not ah & (hiragana | katakana | han | sea), "AH overlaps CJK/SEA"
    assert not numeric & (ah | sea | katakana), "Numeric overlaps letters"

    # ASCII cross-sections: the analyzer's isascii() fast-path pattern
    # hard-codes these; regeneration must fail if they ever drift.
    ascii_of = lambda s: {c for c in s if c < 0x80}  # noqa: E731
    assert ascii_of(ah) == set(range(0x41, 0x5B)) | set(range(0x61, 0x7B))
    assert ascii_of(numeric) == set(range(0x30, 0x3A))
    assert ascii_of(enl) == {0x5F}
    assert ascii_of(midl) == {0x3A, 0x27, 0x2E}
    assert ascii_of(midn) == {0x2C, 0x2E, 0x3B, 0x27}
    assert not ascii_of(ext)
    assert not ascii_of(
        katakana | hiragana | han | sea | ri | ext_pict | emoji_mod
    )
    assert sq == {0x27} and dq == {0x22}

    bmp = lambda cps: {c for c in cps if c <= 0xFFFF}  # noqa: E731
    astral = lambda cps: {c for c in cps if c > 0xFFFF}  # noqa: E731

    uver = regex.__version__
    code = f'''"""Unicode word-break property tables — GENERATED by
tools/gen_unicode_wb.py (regex module {uver}); do not edit by hand,
rerun the generator.

Regex character-class BODIES (no brackets) for the UAX#29 WordBreak /
Script / LineBreak / UTS#51 properties the reference jflex grammar uses
(``StandardTokenizerImpl.jflex:51-100``).  ``*_BMP_CLASS`` /
``*_ASTRAL_CLASS`` pairs split a class at U+FFFF so the analyzer can keep
CPython's BIGCHARSET O(1) membership for BMP text (see the generator
docstring).  ``WB_EXT_*`` is the WB4 absorption union
``[\\\\p{{WB:Extend}}\\\\p{{WB:Format}}\\\\p{{WB:ZWJ}}]``; the SANS variants
drop the FE0E/FE0F presentation selectors (jflex ExtFmtZwjSansPresSel)
and additionally ZWJ (within an emoji element, so the sequence chain can
see its joiner).
"""

'''
    emit: list[tuple[str, set[int]]] = [
        ("WB_EXT_CLASS", ext),
        ("WB_EXT_BMP_CLASS", bmp(ext)),
        ("WB_EXT_ASTRAL_CLASS", astral(ext)),
        ("WB_EXT_SANS_PRESSEL_CLASS", ext - {0xFE0E, 0xFE0F}),
        ("WB_EXT_SANS_PRESSEL_ZWJ_CLASS", ext - {0xFE0E, 0xFE0F, 0x200D}),
        ("WB_AH_CLASS", ah),
        ("WB_AH_BMP_CLASS", bmp(ah)),
        ("WB_AH_ASTRAL_CLASS", astral(ah)),
        ("WB_NUM_CLASS", numeric),
        ("WB_NUM_BMP_CLASS", bmp(numeric)),
        ("WB_NUM_ASTRAL_CLASS", astral(numeric)),
        ("WB_KATA_CLASS", katakana),
        ("WB_KATA_BMP_CLASS", bmp(katakana)),
        ("WB_KATA_ASTRAL_CLASS", astral(katakana)),
        ("WB_HIRA_CLASS", hiragana),
        ("WB_HIRA_BMP_CLASS", bmp(hiragana)),
        ("WB_HIRA_ASTRAL_CLASS", astral(hiragana)),
        ("WB_IDEO_CLASS", han),
        ("WB_IDEO_BMP_CLASS", bmp(han)),
        ("WB_IDEO_ASTRAL_CLASS", astral(han)),
        ("WB_SEA_CLASS", sea),
        ("WB_SEA_BMP_CLASS", bmp(sea)),
        ("WB_SEA_ASTRAL_CLASS", astral(sea)),
        ("WB_ENL_CLASS", enl),
        ("WB_MIDL_CLASS", midl),
        ("WB_MIDN_CLASS", midn),
        ("WB_HEB_CLASS", hebrew),
        ("WB_RI_CLASS", ri),
        ("EXT_PICT_CLASS", ext_pict),
        ("EXT_PICT_BMP_CLASS", bmp(ext_pict)),
        ("EXT_PICT_ASTRAL_CLASS", astral(ext_pict)),
        ("EMOJI_MOD_CLASS", emoji_mod),
    ]
    for name, cps in emit:
        code += class_literal(name, cps)
        code += "\n"
    OUT.write_text(code)
    summary = ", ".join(f"{n} {len(to_ranges(c))}r/{len(c)}cp" for n, c in emit[:6])
    print(f"wrote {OUT}: {summary}, ... ({len(emit)} classes)", file=sys.stderr)


if __name__ == "__main__":
    main()
