"""Simulation control-file parser (MCcoal-style).

Equivalent of the reference's ``src/cfile_sim.c`` (``load_cfile_sim``):
``keyword = value`` lines plus the annotated ``species&tree`` block in
which branch lengths are speciation times (tau) and ``#x`` annotations
give per-population thetas.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import SubstModel
from .ctl import _strip_comment


@dataclass
class SimConfig:
    seed: int = -1
    seqfile: str = "out.txt"
    treefile: str | None = None
    imapfile: str | None = None
    concatfile: str | None = None
    modelparafile: str | None = None
    species_names: tuple[str, ...] = ()
    n_per_species: tuple[int, ...] = ()
    newick: str | None = None        # annotated; None for one species
    theta_single: float | None = None  # single-population theta
    n_loci: int = 1
    length: int = 100
    model: SubstModel = SubstModel.JC69
    basefreqs: tuple[float, ...] = (0.25, 0.25, 0.25, 0.25)
    qrates: tuple[float, ...] = (1, 1, 1, 1, 1, 1)
    kappa: float = 2.0               # ts/tv for K80/HKY (extension keyword)
    alpha: float = 0.0               # gamma rate het shape (0 = off)
    ncatG: int = 4
    locusrate_alpha: float = 0.0     # per-locus rate variation
    clock: int = 1
    diploid: tuple[int, ...] = ()
    # MSC-M: (source, target, rate w) routes (cfile_sim.c:692
    # parse_migration: 'migration = K' + 'src dst M' lines)
    migration: tuple = ()
    # seqerr = read_depth base_err a_samples a_sites (cfile_sim.c:1367):
    # ML genotype-calling error machine for unphased-diploid output
    read_depth: int = 0
    base_err: float = 0.0
    a_samples: float = 0.0
    a_sites: float = 0.0


def parse_sim_ctl(path: str) -> SimConfig:
    with open(path) as fh:
        lines = fh.readlines()
    cfg = SimConfig()
    i = 0
    n = len(lines)
    kw: dict[str, str] = {}

    def next_content(j):
        # inside the species&tree block '#' is the theta annotation, not a
        # comment (cfile_sim.c parses the tree with the newick tokenizer),
        # so only strip '*' comments here
        while j < n:
            s = lines[j]
            m = re.search(r"(^|\s)\*", s)
            if m:
                s = s[: m.start()]
            s = s.strip()
            j += 1
            if s:
                return s, j
        raise ValueError("unexpected EOF in species&tree block")

    while i < n:
        raw = _strip_comment(lines[i])
        i += 1
        if not raw or "=" not in raw:
            continue
        key, value = raw.split("=", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "species&tree":
            toks = value.split()
            count = int(toks[0])
            cfg.species_names = tuple(toks[1:])
            line, i = next_content(i)
            cfg.n_per_species = tuple(int(t) for t in line.split())
            chunks = []
            while True:
                line, i = next_content(i)
                chunks.append(line)
                if ";" in line:
                    break
            nwk = " ".join(chunks)
            if count > 1:
                cfg.newick = nwk
            else:
                m = re.search(r"#\s*([0-9.eE+-]+)", nwk)
                if m:
                    cfg.theta_single = float(m.group(1))
        elif key == "migration":
            routes = []
            for _ in range(int(value.split()[0])):
                line, i = next_content(i)
                toks = line.replace(",", " ").split()
                routes.append((toks[0], toks[1], float(toks[2])))
            cfg.migration = tuple(routes)
        else:
            kw[key] = value

    if v := kw.pop("seed", None):
        cfg.seed = int(float(v))
    if v := kw.pop("seqfile", None):
        cfg.seqfile = v
    if v := kw.pop("treefile", None):
        cfg.treefile = v
    if v := kw.pop("imapfile", None):
        cfg.imapfile = v
    if v := kw.pop("concatfile", None):
        cfg.concatfile = v
    if v := kw.pop("modelparafile", None):
        cfg.modelparafile = v
    if v := kw.pop("loci&length", None):
        a, b = v.split()[:2]
        cfg.n_loci, cfg.length = int(a), int(b)
    if v := kw.pop("model", None):
        tok = v.split()[0]
        cfg.model = (SubstModel(int(tok)) if tok.isdigit()
                     else SubstModel[tok.upper()])
    if v := kw.pop("basefreqs", None):
        nums = [float(t) for t in v.split()]
        # 'basefreqs = 0 f1 f2 f3 f4' (leading flag) or plain 4 numbers
        if len(nums) == 5:
            nums = nums[1:]
        cfg.basefreqs = tuple(nums)
    if v := kw.pop("qrates", None):
        nums = [float(t) for t in v.split()]
        if len(nums) == 7:
            nums = nums[1:]
        cfg.qrates = tuple(nums)
    if v := kw.pop("alpha_siterate", None) or kw.pop("alphasiterate", None):
        nums = [float(t) for t in v.split()]
        cfg.alpha = nums[-2] if len(nums) > 2 else nums[0]
    if v := kw.pop("locusrate", None):
        toks = v.split()
        if int(float(toks[0])) == 1 and len(toks) > 1:
            cfg.locusrate_alpha = float(toks[1])
    if v := kw.pop("kappa", None):
        cfg.kappa = float(v.split()[0])
    if v := kw.pop("clock", None):
        cfg.clock = int(v.split()[0])
    if v := kw.pop("seqerr", None) or kw.pop("sequenceerror", None):
        toks = v.split()
        cfg.read_depth = int(toks[0])
        cfg.base_err, cfg.a_samples, cfg.a_sites = (float(t)
                                                    for t in toks[1:4])
        if not (0 < cfg.base_err < 1) or not 1 <= cfg.read_depth <= 300 \
                or cfg.a_samples < 0.005 or cfg.a_sites < 0.005:
            raise ValueError(
                "seqerr expects 'depth base_err a_samples a_sites' "
                "(cfile_sim.c:1370 bounds)")
    if v := kw.pop("diploid", None) or kw.pop("phase", None):
        cfg.diploid = tuple(int(t) for t in v.split())
    return cfg
