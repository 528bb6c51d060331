"""Character-state maps for nucleotide and amino-acid data.

TPU-native analog of the reference's char->state bitmap tables
(``src/maps.c:26`` ``pll_map_nt``, ``src/maps.c:126`` ``pll_map_aa``):
each character maps to a bitmask over states; ambiguity codes set
multiple bits.  Downstream, tip partial vectors are the bitmask expanded
to 0/1 over states, so the maps here are the single source of truth.
"""

from __future__ import annotations

import numpy as np

# --- nucleotides: 4 states A,C,G,T -> bits 1,2,4,8 ---------------------------

NT_STATES = 4

_NT_CODES = {
    "A": 0b0001, "C": 0b0010, "G": 0b0100, "T": 0b1000, "U": 0b1000,
    "R": 0b0101, "Y": 0b1010, "S": 0b0110, "W": 0b1001,
    "K": 0b1100, "M": 0b0011,
    "B": 0b1110, "D": 0b1101, "H": 0b1011, "V": 0b0111,
    "N": 0b1111, "X": 0b1111, "O": 0b1111, "-": 0b1111, "?": 0b1111,
    "*": 0b1111,
}

# 256-entry lookup: ascii -> 4-bit mask, 0 = invalid character
NT_MAP = np.zeros(256, dtype=np.uint8)
for _c, _m in _NT_CODES.items():
    NT_MAP[ord(_c)] = _m
    NT_MAP[ord(_c.lower())] = _m

# tip partial table: mask (0..15) -> 0/1 vector over 4 states
NT_PARTIALS = np.zeros((16, 4), dtype=np.float64)
for _m in range(16):
    for _s in range(4):
        if _m >> _s & 1:
            NT_PARTIALS[_m, _s] = 1.0


def nt_is_ambiguous(mask: int) -> bool:
    """True if the mask covers more than one state (incl. gaps/N)."""
    return bin(int(mask)).count("1") != 1


# --- amino acids: 20 states, order ARNDCQEGHILKMFPSTWYV ----------------------

AA_STATES = 20
AA_ORDER = "ARNDCQEGHILKMFPSTWYV"

_AA_CODES = {c: 1 << i for i, c in enumerate(AA_ORDER)}
_AA_CODES["B"] = _AA_CODES["N"] | _AA_CODES["D"]
_AA_CODES["Z"] = _AA_CODES["Q"] | _AA_CODES["E"]
_AA_CODES["J"] = _AA_CODES["I"] | _AA_CODES["L"]
_ALL_AA = (1 << 20) - 1
for _c in "X-?*":
    _AA_CODES[_c] = _ALL_AA

AA_MAP = np.zeros(256, dtype=np.uint32)
for _c, _m in _AA_CODES.items():
    AA_MAP[ord(_c)] = _m
    AA_MAP[ord(_c.lower())] = _m

def encode_aa(seq: str) -> np.ndarray:
    """Encode an amino-acid string to uint32 20-bit ambiguity masks."""
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    codes = AA_MAP[arr]
    if (codes == 0).any():
        bad = sorted({chr(c) for c in arr[codes == 0]})
        raise ValueError(f"invalid amino-acid character(s): {bad!r}")
    return codes


def encode_nt(seq: str) -> np.ndarray:
    """Encode a nucleotide string to uint8 4-bit ambiguity masks.

    Raises ValueError on characters outside the map (mask 0).
    """
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    codes = NT_MAP[arr]
    if (codes == 0).any():
        bad = sorted({chr(c) for c in arr[codes == 0]})
        raise ValueError(f"invalid nucleotide character(s): {bad!r}")
    return codes
