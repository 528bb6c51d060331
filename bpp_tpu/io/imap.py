"""Imap (individual -> species) and tip-date file parsing.

Equivalent of the reference's ``src/parsemap.c`` (``parse_mapfile:227``)
and ``src/mapping.c`` (``parse_date_mapfile:163``).
"""

from __future__ import annotations


def parse_imap(path: str) -> dict[str, str]:
    """Parse an Imap file: lines of ``individual species``."""
    mapping: dict[str, str] = {}
    with open(path) as fh:
        for ln, line in enumerate(fh, 1):
            line = line.strip()
            if not line or line.startswith(("#", "*", "//")):
                continue
            parts = line.split()
            if len(parts) < 2:
                raise ValueError(f"{path}:{ln}: expected 'individual species'")
            ind, sp = parts[0], parts[1]
            # an individual tag may itself carry a '^' (mapping.c:105)
            if "^" in ind:
                ind = ind.split("^", 1)[1]
            if ind in mapping and mapping[ind] != sp:
                raise ValueError(f"{path}:{ln}: conflicting mapping for {ind!r}")
            mapping[ind] = sp
    return mapping


def parse_datefile(path: str) -> dict[str, float]:
    """Parse a tip-date file: lines of ``individual date``."""
    dates: dict[str, float] = {}
    with open(path) as fh:
        for ln, line in enumerate(fh, 1):
            line = line.strip()
            if not line or line.startswith(("#", "*", "//")):
                continue
            parts = line.split()
            if len(parts) < 2:
                raise ValueError(f"{path}:{ln}: expected 'individual date'")
            ind = parts[0]
            if "^" in ind:
                ind = ind.split("^", 1)[1]
            dates[ind] = float(parts[1])
    return dates
