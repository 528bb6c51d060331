"""Multi-locus sequential PHYLIP reader.

Behavioral equivalent of the reference's ``phylip_parse_multisequential``
(``src/phylip.c``): a file holds one or more alignments back-to-back,
each starting with a ``<count> <length>`` header followed by ``count``
records of ``label sequence``, where the sequence may span lines and
contain arbitrary whitespace.  Labels carrying a ``^`` separate the
(optional) sequence name from the individual tag used by the Imap
(``src/gtree.c:636-646``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Alignment:
    """One locus: raw labels and sequences (strings, unencoded)."""

    labels: list[str]
    sequences: list[str]
    index: int = 0  # locus index in file order

    @property
    def count(self) -> int:
        return len(self.sequences)

    @property
    def length(self) -> int:
        return len(self.sequences[0]) if self.sequences else 0

    def individual_tags(self) -> list[str]:
        """The per-sequence individual tag: text after '^', else the label."""
        out = []
        for lab in self.labels:
            if "^" in lab:
                out.append(lab.split("^", 1)[1])
            else:
                out.append(lab)
        return out


_SEQ_CHARS = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz-?*.")


def parse_phylip(path: str, max_loci: int | None = None) -> list[Alignment]:
    """Parse a multi-alignment sequential PHYLIP file."""
    with open(path) as fh:
        text = fh.read()
    return parse_phylip_string(text, max_loci=max_loci)


def parse_phylip_string(text: str, max_loci: int | None = None) -> list[Alignment]:
    tokens = text.split()
    pos = 0
    loci: list[Alignment] = []

    def next_token() -> str | None:
        nonlocal pos
        if pos >= len(tokens):
            return None
        t = tokens[pos]
        pos += 1
        return t

    while True:
        if max_loci is not None and len(loci) >= max_loci:
            break
        t = next_token()
        if t is None:
            break
        try:
            count = int(t)
            length = int(tokens[pos])
        except (ValueError, IndexError):
            if loci:
                # trailing non-alignment content (extra sequences/comments
                # beyond the declared headers) — the reference reader also
                # only consumes what the headers declare
                break
            raise ValueError(
                f"expected alignment header '<count> <length>', got {t!r} near "
                f"token {pos} (locus {len(loci)})"
            )
        pos += 1
        labels: list[str] = []
        seqs: list[str] = []
        for _ in range(count):
            lab = next_token()
            if lab is None:
                raise ValueError(f"unexpected EOF reading labels in locus {len(loci)}")
            chunks: list[str] = []
            have = 0
            while have < length:
                t = next_token()
                if t is None:
                    raise ValueError(
                        f"unexpected EOF in sequence {lab!r} of locus {len(loci)}: "
                        f"got {have}/{length} characters"
                    )
                chunks.append(t)
                have += len(t)
            seq = "".join(chunks)
            if len(seq) != length:
                raise ValueError(
                    f"sequence {lab!r} of locus {len(loci)} has {len(seq)} "
                    f"characters, expected {length}"
                )
            labels.append(lab)
            seqs.append(seq)
        loci.append(Alignment(labels=labels, sequences=seqs, index=len(loci)))

    if not loci:
        raise ValueError("no alignments found")
    return loci
