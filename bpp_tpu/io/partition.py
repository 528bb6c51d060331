"""Partition-file parser for per-locus substitution models.

Re-derives the reference's ``model = custom <file>`` support
(``parse_partition_line`` cfile.c:1090, ``validate_partitions``
cfile.c:1217, ``parse_partition_file`` cfile.c:1285): each line assigns
a contiguous 1-based locus range a datatype (DNA/AA) and a substitution
model, e.g.::

    1 - 10, DNA, HKY
    11,     DNA, JC69
    12 - 20, AA, WAG

Ranges must start at locus 1, cover a contiguous span, and not overlap.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import SubstModel

_DNA_MODELS = {m.name: m for m in SubstModel
               if not m.is_aa and m != SubstModel.CUSTOM}
_AA_MODELS = {m.name: m for m in SubstModel if m.is_aa}


@dataclass(frozen=True)
class Partition:
    start: int          # 1-based, inclusive
    end: int            # inclusive
    model: SubstModel


def _parse_line(line: str, path: str, lineno: int) -> Partition:
    # strip comments (cfile grammar: '*' and '#' start comments)
    for c in "*#":
        if c in line:
            line = line[: line.index(c)]
    fields = [f.strip() for f in line.split(",")]
    if len(fields) != 3:
        raise ValueError(
            f"Invalid partition format in file {path} (line {lineno}): "
            "expected 'start [- end], DATATYPE, MODEL'")
    rng, dtype, model = fields
    if "-" in rng:
        a, _, b = rng.partition("-")
        start, end = int(a), int(b)
    else:
        start = end = int(rng)
    if end < start:
        raise ValueError(
            f"Invalid partition range in file {path} (line {lineno})")
    d = dtype.upper()
    m = model.upper()
    if d == "DNA":
        if m not in _DNA_MODELS:
            raise ValueError(
                f"Unknown DNA model {model!r} in file {path} "
                f"(line {lineno})")
        sm = _DNA_MODELS[m]
    elif d == "AA":
        if m not in _AA_MODELS:
            raise ValueError(
                f"Unknown AA model {model!r} in file {path} "
                f"(line {lineno})")
        sm = _AA_MODELS[m]
    else:
        raise ValueError(
            f"Unknown datatype {dtype!r} in file {path} (line {lineno}); "
            "must be DNA or AA")
    return Partition(start, end, sm)


def parse_partition_file(path: str) -> list[Partition]:
    """Parse and validate; returns partitions in file order."""
    parts: list[Partition] = []
    with open(path) as fp:
        for lineno, raw in enumerate(fp, 1):
            line = raw.strip()
            if not line or line.startswith(("*", "#")):
                continue
            parts.append(_parse_line(line, path, lineno))
    if not parts:
        raise ValueError(f"No partitions found in file {path}")

    start = min(p.start for p in parts)
    end = max(p.end for p in parts)
    if start != 1:
        raise ValueError(
            f"Partitions in partition file {path} must start from locus 1")
    owner = [0] * end
    for ln, p in enumerate(parts, 1):
        for i in range(p.start, p.end + 1):
            if owner[i - 1]:
                raise ValueError(
                    f"Partition on line {ln} contains locus {i} which is "
                    f"already in partition on line {owner[i-1]} "
                    f"(file {path})")
            owner[i - 1] = ln
    for i, o in enumerate(owner):
        if not o:
            raise ValueError(
                f"Locus {i+1} not contained in any partition (file {path})")
    return parts


def locus_models(parts: list[Partition], n_loci: int,
                 path: str = "") -> list[SubstModel]:
    """Expand validated partitions to one model per locus.

    Mirrors method.c:3320-3352: the last partition's end must equal the
    locus count.
    """
    end = max(p.end for p in parts)
    if end != n_loci:
        raise ValueError(
            f"Partition file {path} differs in number of partitions "
            f"({end}) to the specified number of loci ({n_loci})")
    out: list[SubstModel | None] = [None] * n_loci
    for p in parts:
        for i in range(p.start, p.end + 1):
            out[i - 1] = p.model
    return out  # type: ignore[return-value]
