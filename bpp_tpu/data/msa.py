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
from .diploid import resolve_locus


@dataclass
class ProcessedLocus:
    """Device-ready arrays for one locus.

    For unphased-diploid loci, ``codes`` holds the expanded+compressed
    resolution patterns while ``weights`` stays on the original site
    patterns; ``res_map``/``res_count`` link each original pattern to
    its resolution columns in ``codes`` (likelihood averages them,
    locus.c:2587-2614).  Haploid loci use an identity mapping.
    """

    index: int
    labels: list[str]
    codes: np.ndarray       # [n_seq, n_patterns] uint8 ambiguity masks
    weights: np.ndarray     # [n_wpat] int32 pattern multiplicities
    tip_species: np.ndarray  # [n_seq] int32 species-tip index
    n_sites: int            # original (uncompressed, post-clean) length
    res_map: np.ndarray | None = None    # [n_wpat, Rmax] -> codes column
    res_count: np.ndarray | None = None  # [n_wpat]

    @property
    def n_seq(self) -> int:
        return self.codes.shape[0]

    @property
    def n_patterns(self) -> int:
        return self.codes.shape[1]

    @property
    def n_wpatterns(self) -> int:
        return self.weights.shape[0]

    @property
    def max_res(self) -> int:
        return 1 if self.res_map is None else self.res_map.shape[1]


def process_locus(
    aln: Alignment,
    species_of_individual: dict[str, str] | None,
    species_index: dict[str, int],
    cleandata: bool = False,
    jc69_fold: bool = False,
    phase: tuple[int, ...] = (),
    aa: bool = False,
) -> ProcessedLocus:
    if aa:
        codes = np.stack([maps.encode_aa(s) for s in aln.sequences])
        full = np.uint32((1 << maps.AA_STATES) - 1)
    else:
        codes = np.stack([maps.encode_nt(s) for s in aln.sequences])
        full = np.uint8(0b1111)

    # remove sequences that are entirely missing data (method.c:3387)
    missing = (codes == full).all(axis=1)
    keep = ~missing
    codes = codes[keep]
    labels = [lab for lab, k in zip(aln.labels, keep) if k]
    tags = [t for t, k in zip(aln.individual_tags(), keep) if k]
    if codes.shape[0] == 0:
        raise ValueError(f"locus {aln.index}: all sequences are missing data")

    if cleandata:
        # drop any column containing an ambiguity (msa.c:229):
        # keep only single-bit masks
        unamb = ((codes & (codes - 1)) == 0).all(axis=0)
        if not unamb.any():
            raise ValueError(f"locus {aln.index}: all sites ambiguous")
        codes = codes[:, unamb]

    n_sites = codes.shape[1]

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

    diploid = np.zeros(codes.shape[0], bool)
    if phase and any(phase):
        if aa:
            raise NotImplementedError(
                "unphased-diploid resolution applies to nucleotide data "
                "only")
        for i, spi in enumerate(tip_species):
            if phase[spi]:
                diploid[i] = True

    if diploid.any():
        # compress first (diploid variant keeps the A1 patterns), expand
        # resolutions, then recompress the expanded alignment; sorted
        # pattern order reproduces the reference's het-pinning walk
        patterns1, weights = compress_patterns(codes, jc69_fold=False,
                                               sorted_order=True)
        res = resolve_locus(patterns1, weights, diploid)
        patterns2, _ = None, None
        cols = res.codes2
        # unique expanded columns, track inverse mapping
        colsT = np.ascontiguousarray(cols.T)
        view = colsT.view([("", colsT.dtype)] * colsT.shape[1]).ravel()
        _, idx, inverse = np.unique(view, return_index=True,
                                    return_inverse=True)
        order = np.argsort(idx, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        inverse = rank[inverse]
        patterns2 = cols[:, idx[order]]
        S1 = weights.shape[0]
        rmax = int(res.res_count.max())
        res_map = np.zeros((S1, rmax), np.int32)
        res_cnt = res.res_count.astype(np.int32)
        fill = np.zeros(S1, np.int64)
        for col2, s in enumerate(res.res_index):
            res_map[s, fill[s]] = inverse[col2]
            fill[s] += 1
        assert (fill == res_cnt).all()
        new_labels = []
        for r, si in enumerate(res.seq_of_row):
            if diploid[si]:
                suffix = ".1" if (r == 0 or res.seq_of_row[r - 1] != si) else ".2"
                new_labels.append(labels[si] + suffix)
            else:
                new_labels.append(labels[si])
        return ProcessedLocus(
            index=aln.index, labels=new_labels,
            codes=patterns2.astype(np.uint8), weights=weights,
            tip_species=tip_species[res.seq_of_row].astype(np.int32),
            n_sites=n_sites, res_map=res_map, res_count=res_cnt)

    patterns, weights = compress_patterns(codes, jc69_fold=jc69_fold)
    return ProcessedLocus(
        index=aln.index, labels=labels, codes=patterns, weights=weights,
        tip_species=tip_species, n_sites=n_sites)
