"""Packing processed loci into fixed-shape batched tensors.

The reference assigns loci to threads with a zigzag load balancer
(``src/threads.c:265`` ``load_balance_zigzag``).  The TPU-native
equivalent is a static packing pass: all loci are padded to a common
``[L, T_max, S_max]`` shape (pattern axis rounded to ``site_block``) so
every MCMC move is one fixed-shape batched kernel, and the locus axis
shards evenly across the device mesh (padded with zero-weight dummy
loci when needed).

Two pattern axes exist to support unphased-diploid loci: ``tip_codes``
runs over likelihood patterns (expanded resolutions), while ``weights``
runs over the original site patterns, linked by ``res_map`` /
``res_count`` (identity for haploid loci).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .msa import ProcessedLocus


@dataclass
class LocusBatch:
    """Fixed-shape batch of loci (host numpy; engine converts to jnp)."""

    tip_codes: np.ndarray    # [L, T, S] uint8 ambiguity masks (15 in padding)
    weights: np.ndarray      # [L, W] float64 pattern weights (0 in padding)
    res_map: np.ndarray      # [L, W, R] int32 -> tip_codes pattern column
    res_count: np.ndarray    # [L, W] int32 resolutions per weight pattern
    n_seq: np.ndarray        # [L] int32 (>=2 even for padded dummy loci)
    n_pat: np.ndarray        # [L] int32 likelihood patterns per locus
    tip_pop: np.ndarray      # [L, T] int32 species tip of each sequence
    n_sites: np.ndarray      # [L] int32 original site counts
    locus_mask: np.ndarray   # [L] bool, False for padding loci
    labels: list[list[str]]  # per real locus

    @property
    def n_loci(self) -> int:
        return self.tip_codes.shape[0]

    @property
    def max_tips(self) -> int:
        return self.tip_codes.shape[1]

    @property
    def max_patterns(self) -> int:
        return self.tip_codes.shape[2]

    @property
    def max_nodes(self) -> int:
        """Gene-tree node capacity: 2*T-1 (tips then inner nodes)."""
        return 2 * self.max_tips - 1

    @property
    def identity_resolution(self) -> bool:
        return self.res_map.shape[2] == 1


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_loci(
    loci: list[ProcessedLocus],
    site_block: int = 16,
    pad_loci_to: int | None = None,
) -> LocusBatch:
    n_real = len(loci)
    if n_real == 0:
        raise ValueError("no loci to pack")
    L = pad_loci_to or n_real
    if L < n_real:
        raise ValueError("pad_loci_to smaller than locus count")
    T = max(max(p.n_seq for p in loci), 2)
    S = _round_up(max(p.n_patterns for p in loci), site_block)
    W = _round_up(max(p.n_wpatterns for p in loci), site_block)
    R = max(p.max_res for p in loci)

    # padding cells are all-ambiguous (all-ones masks); the code dtype
    # follows the data (uint8 4-bit nt masks / uint32 20-bit aa masks);
    # mixed DNA/AA batches (model = custom) promote to uint32 and embed
    # the 4-bit nt masks in the low bits of the 20-state alphabet
    dtypes = {p.codes.dtype for p in loci}
    code_dtype = np.dtype(np.uint8) if dtypes == {np.dtype(np.uint8)} \
        else np.dtype(np.uint32)
    pad = np.array(15 if code_dtype == np.uint8 else (1 << 20) - 1,
                   dtype=code_dtype)
    tip_codes = np.full((L, T, S), pad, dtype=code_dtype)
    weights = np.zeros((L, W), dtype=np.float64)
    res_map = np.zeros((L, W, R), dtype=np.int32)
    res_count = np.ones((L, W), dtype=np.int32)
    n_seq = np.full(L, 2, dtype=np.int32)
    n_pat = np.zeros(L, dtype=np.int32)
    tip_pop = np.zeros((L, T), dtype=np.int32)
    n_sites = np.zeros(L, dtype=np.int32)
    mask = np.zeros(L, dtype=bool)
    labels: list[list[str]] = []

    for i, p in enumerate(loci):
        tip_codes[i, : p.n_seq, : p.n_patterns] = p.codes
        weights[i, : p.n_wpatterns] = p.weights
        if p.res_map is not None:
            res_map[i, : p.n_wpatterns, : p.max_res] = p.res_map
            res_count[i, : p.n_wpatterns] = p.res_count
        else:
            res_map[i, : p.n_wpatterns, 0] = np.arange(p.n_wpatterns)
        n_seq[i] = p.n_seq
        n_pat[i] = p.n_patterns
        tip_pop[i, : p.n_seq] = p.tip_species
        n_sites[i] = p.n_sites
        mask[i] = True
        labels.append(p.labels)

    return LocusBatch(
        tip_codes=tip_codes, weights=weights, res_map=res_map,
        res_count=res_count, n_seq=n_seq, n_pat=n_pat, tip_pop=tip_pop,
        n_sites=n_sites, locus_mask=mask, labels=labels)
