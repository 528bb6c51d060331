"""Per-locus alignment processing: encoding, cleaning, species mapping.

Mirrors the data path in the reference's ``init`` (``src/method.c:
3303-3455``): PHYLIP parse -> remove all-missing sequences -> optional
removal of ambiguous sites (``cleandata``, ``src/msa.c:229``) ->
site-pattern compression -> per-sequence species assignment via the
Imap (``src/gtree.c:632-690``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io import maps
from ..io.phylip import Alignment
from .compress import compress_patterns


@dataclass
class ProcessedLocus:
    """Device-ready arrays for one locus."""

    index: int
    labels: list[str]
    codes: np.ndarray       # [n_seq, n_patterns] uint8 ambiguity masks
    weights: np.ndarray     # [n_patterns] int32 pattern multiplicities
    tip_species: np.ndarray  # [n_seq] int32 species-tip index
    n_sites: int            # original (uncompressed, post-clean) length

    @property
    def n_seq(self) -> int:
        return self.codes.shape[0]

    @property
    def n_patterns(self) -> int:
        return self.codes.shape[1]


def process_locus(
    aln: Alignment,
    species_of_individual: dict[str, str] | None,
    species_index: dict[str, int],
    cleandata: bool = False,
    jc69_fold: bool = False,
) -> ProcessedLocus:
    codes = np.stack([maps.encode_nt(s) for s in aln.sequences])

    # remove sequences that are entirely missing data (method.c:3387)
    missing = (maps.NT_PARTIALS[codes].sum(-1) == 4).all(axis=1)
    keep = ~missing
    codes = codes[keep]
    labels = [lab for lab, k in zip(aln.labels, keep) if k]
    tags = [t for t, k in zip(aln.individual_tags(), keep) if k]
    if codes.shape[0] == 0:
        raise ValueError(f"locus {aln.index}: all sequences are missing data")

    if cleandata:
        # drop any column containing an ambiguity (msa.c:229)
        unamb = np.isin(codes, (1, 2, 4, 8)).all(axis=0)
        if not unamb.any():
            raise ValueError(f"locus {aln.index}: all sites ambiguous")
        codes = codes[:, unamb]

    n_sites = codes.shape[1]
    patterns, weights = compress_patterns(codes, jc69_fold=jc69_fold)

    if len(species_index) == 1:
        tip_species = np.zeros(codes.shape[0], dtype=np.int32)
    else:
        if species_of_individual is None:
            raise ValueError("multi-species run requires an Imap file")
        sp = []
        for lab, tag in zip(labels, tags):
            if tag not in species_of_individual:
                raise ValueError(
                    f"locus {aln.index}: no Imap entry for individual {tag!r} "
                    f"(sequence {lab!r})")
            sp_name = species_of_individual[tag]
            if sp_name not in species_index:
                raise ValueError(
                    f"locus {aln.index}: Imap species {sp_name!r} not in "
                    f"species&tree")
            sp.append(species_index[sp_name])
        tip_species = np.asarray(sp, dtype=np.int32)

    return ProcessedLocus(
        index=aln.index, labels=labels, codes=patterns, weights=weights,
        tip_species=tip_species, n_sites=n_sites)
