#!/usr/bin/env python
"""Generate ``lucene_spark/analysis/unicode_wb.py`` — the UAX#29 WB4
absorption class ``[\\p{WB:Format}\\p{WB:Extend}\\p{WB:ZWJ}]`` as a regex
character-class body, derived from this interpreter's ``unicodedata``.

The reference grammar
(``lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.jflex:51-56,83-85``) appends
``{ExtFmtZwj} = [\\p{WB:Format}\\p{WB:Extend}\\p{WB:ZWJ}]*`` to every base
character so combining marks / format controls / ZWJ are absorbed into the
preceding token (UAX#29 WB4: ``X (Extend | Format | ZWJ)* -> X``).

Python's ``re`` has no ``\\p{..}`` and ``unicodedata`` does not expose the
WordBreak property, so we approximate the union from general categories —
the standard derivation (UAX#29 §4.1 property definitions):

  WB:Extend ≈ Grapheme_Extend ∪ Spacing_Marks  ≈  Mn ∪ Me ∪ Mc
             (plus Emoji_Modifier U+1F3FB..FF since Unicode 11 — added
              explicitly below; they are category So)
  WB:Format  = Cf − (ZWSP U+200B? — ZWSP is WB:Other; ZWNJ/ZWJ carved out
               but ZWNJ is WB:Extend and ZWJ is WB:ZWJ, so both stay in
               the UNION this class represents)
  WB:ZWJ     = U+200D (Cf, already included)

Net: ``(Mn ∪ Me ∪ Mc ∪ Cf ∪ U+1F3FB..U+1F3FF) − U+200B``.

Run ``python tools/gen_unicode_wb.py`` and commit the regenerated module;
the output is deterministic for a given unicodedata version.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "lucene_spark" / "analysis" / "unicode_wb.py"

INCLUDE_CATEGORIES = {"Mn", "Me", "Mc", "Cf"}
# Emoji_Modifier (skin tones) are WB:Extend since Unicode 11 but category So.
EXTRA = set(range(0x1F3FB, 0x1F400))
# ZERO WIDTH SPACE is Cf but WB:Other — it must stay a token boundary.
EXCLUDE = {0x200B}


def collect(exclude: set[int]) -> list[tuple[int, int]]:
    members = sorted(
        cp
        for cp in range(0x110000)
        if (
            cp in EXTRA
            or (cp not in exclude and unicodedata.category(chr(cp)) in INCLUDE_CATEGORIES)
        )
    )
    ranges: list[tuple[int, int]] = []
    for cp in members:
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], cp)
        else:
            ranges.append((cp, cp))
    return ranges


# The analyzer's per-char CJK / SEA token classes (MUST mirror
# analyzer.py _HIRA/_KATA/_IDEO/_SEA — asserted equal by
# tests/test_unicode_wordbreak.py): these are subtracted from the AH
# (ALetter|Hebrew_Letter) class so ideographs/kana/SEA runs fall through
# to their own rules.
# Escapes, not raw glyphs: editor/tool Unicode normalization can silently
# rewrite compatibility ideographs (U+F900 "豈" -> U+8C48), corrupting
# range endpoints.
CJK_SEA_LITERALS = (
    "\u3041-\u3096\u309D-\u309F"  # _HIRA
    "\u30A1-\u30FA\u30FC-\u30FF\u31F0-\u31FF\uFF66-\uFF9F"  # _KATA
    "\u3005\u3007\u3021-\u3029\u3038-\u303B"  # _IDEO
    "\u3400-\u4DBF\u4E00-\u9FFF\uF900-\uFAFF\U00020000-\U0002FA1F"
    "\u0E01-\u0E4E\u0E81-\u0ECD\u1000-\u103F\u1050-\u109F"  # _SEA
    "\u1780-\u17D3"
)


def expand_class_literal(lit: str) -> set[int]:
    """Expand a regex-class body ("a-zXY") into a codepoint set."""
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


def collect_ah() -> list[tuple[int, int]]:
    """AH ~ [\\p{WB:ALetter}\\p{WB:Hebrew_Letter}]: Python word-letters
    (``[^\\W\\d_]``) minus the per-char CJK classes and the SEA
    (Complex_Context) class.  Emitting it as an explicit range table (a)
    replaces a per-character negative lookahead with one C-level class
    test (~3x tokenizer speedup on non-ASCII text, measured) and (b)
    freezes the class against interpreter unicodedata drift, so every
    executor on a heterogeneous cluster tokenizes identically."""
    letter = re.compile(r"[^\W\d_]")
    cjk_sea = expand_class_literal(CJK_SEA_LITERALS)
    members = sorted(
        cp
        for cp in range(0x110000)
        if cp not in cjk_sea and letter.match(chr(cp))
    )
    ranges: list[tuple[int, int]] = []
    for cp in members:
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], cp)
        else:
            ranges.append((cp, cp))
    return ranges


def esc(cp: int) -> str:
    return f"\\U{cp:08X}" if cp > 0xFFFF else f"\\u{cp:04X}"


def split_bmp_astral(
    ranges: list[tuple[int, int]],
) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """Split ranges at the BMP boundary.  CPython's sre compiles a class
    whose members all fit the BMP into a BIGCHARSET (O(1) table lookup),
    but any astral range forces a linear RANGE-opcode tail that every
    NON-member test scans (~600 ns/char for a 57-range tail — paid at
    every space/punctuation position during tokenization).  The analyzer
    therefore matches ``(?:[BMP]|(?=[\\U00010000-\\U0010FFFF])[ASTRAL])``:
    O(1) for BMP members and non-members, the linear tail only for the
    rare astral member."""
    bmp = [(lo, min(hi, 0xFFFF)) for lo, hi in ranges if lo <= 0xFFFF]
    astral = [(max(lo, 0x10000), hi) for lo, hi in ranges if hi > 0xFFFF]
    return bmp, astral


def class_literal(name: str, ranges: list[tuple[int, int]]) -> str:
    parts = []
    for lo, hi in ranges:
        if lo == hi:
            parts.append(esc(lo))
        elif hi == lo + 1:
            parts.append(esc(lo) + esc(hi))
        else:
            parts.append(f"{esc(lo)}-{esc(hi)}")
    # split the literal into readable chunks at range boundaries
    lines, cur = [], ""
    for p in parts:
        if cur and len(cur) + len(p) > 72:
            lines.append(f'    "{cur}"')
            cur = ""
        cur += p
    if cur:
        lines.append(f'    "{cur}"')
    return f"{name} = (\n" + "\n".join(lines) + "\n)\n"


def main() -> None:
    full = collect(EXCLUDE)
    # jflex ExtFmtZwjSansPresSel (StandardTokenizerImpl.jflex:51-56): the
    # same class minus the text/emoji presentation selectors FE0E/FE0F, so
    # emoji-position absorption never eats a presentation selector.
    sans_ps = collect(EXCLUDE | {0xFE0E, 0xFE0F})
    # Same minus ZWJ, for WITHIN an emoji element: the ZWJ must stay visible
    # to the emoji-sequence chain (jflex gets this via maximal munch; a
    # backtracking regex needs the absorption class to not eat the joiner).
    sans_ps_zwj = collect(EXCLUDE | {0xFE0E, 0xFE0F, 0x200D})
    n = sum(hi - lo + 1 for lo, hi in full)
    code = f'''"""UAX#29 WB4 absorption classes — GENERATED by tools/gen_unicode_wb.py.

``WB_EXT_CLASS`` is the regex character-class BODY (no brackets) for
``[\\\\p{{WB:Format}}\\\\p{{WB:Extend}}\\\\p{{WB:ZWJ}}]`` — the characters every
token-base character absorbs under UAX#29 WB4, per the reference grammar
``StandardTokenizerImpl.jflex:51-56,83-85``.  ``WB_EXT_SANS_PRESSEL_CLASS``
is the same class minus U+FE0E/U+FE0F (the jflex ``ExtFmtZwjSansPresSel``),
used at emoji positions.  Derived from general categories Mn|Me|Mc|Cf plus
Emoji_Modifier, minus ZWSP (see the generator for the derivation);
unicodedata {unicodedata.unidata_version}, {len(full)} ranges / {n} code points.

Do not edit by hand — rerun the generator.
"""

'''
    code += class_literal("WB_EXT_CLASS", full)
    code += "\n"
    code += class_literal("WB_EXT_SANS_PRESSEL_CLASS", sans_ps)
    code += "\n"
    code += class_literal("WB_EXT_SANS_PRESSEL_ZWJ_CLASS", sans_ps_zwj)
    code += "\n"
    ah = collect_ah()
    code += (
        "# AH ~ [\\p{WB:ALetter}\\p{WB:Hebrew_Letter}]: word-letters minus the\n"
        "# per-char CJK/SEA classes (see the generator's collect_ah for the\n"
        "# derivation and why it is a frozen table).\n"
    )
    code += class_literal("WB_AH_CLASS", ah)
    code += (
        "\n# BMP/astral splits of the two hot classes (see the generator's\n"
        "# split_bmp_astral for why: BIGCHARSET vs linear astral tail).\n"
    )
    for name, ranges in (("WB_EXT", full), ("WB_AH", ah)):
        bmp, astral = split_bmp_astral(ranges)
        code += class_literal(f"{name}_BMP_CLASS", bmp)
        code += class_literal(f"{name}_ASTRAL_CLASS", astral)
    OUT.write_text(code)
    print(
        f"wrote {OUT}: ext {len(full)} ranges / {n} cps, ah {len(ah)} ranges",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
