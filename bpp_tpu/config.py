"""Immutable run configuration.

Replaces the reference's ~200 ``opt_*`` globals (``src/bpp.c:37-247``)
with one frozen dataclass produced by the control-file parser
(:mod:`bpp_tpu.io.ctl`, mirroring ``src/cfile.c`` ``load_cfile:2971``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum


class Method(Enum):
    """Inference method (src/bpp.h:399-403 METHOD_00..METHOD_11)."""

    A00 = 0   # parameter estimation on fixed tree
    A01 = 1   # species tree inference
    A10 = 2   # species delimitation (rjMCMC) on guide tree
    A11 = 3   # joint tree + delimitation


class PriorDist(Enum):
    INVGAMMA = 0
    GAMMA = 1
    BETA = 2
    DIRICHLET = 3
    EXP = 4


class SubstModel(Enum):
    """Substitution models (src/bpp.h:213-247 model constants).

    0-7 are nucleotide models; 9-27 the empirical amino-acid models
    (fixed exchangeabilities+frequencies, no free parameters)."""

    JC69 = 0
    K80 = 1
    F81 = 2
    HKY = 3
    T92 = 4
    TN93 = 5
    F84 = 6
    GTR = 7
    # per-locus models from a partition file (BPP_DNA_MODEL_CUSTOM,
    # bpp.h: sits between the DNA and AA ranges; cfile.c:1374)
    CUSTOM = 8
    DAYHOFF = 9
    LG = 10
    DCMUT = 11
    JTT = 12
    MTREV = 13
    WAG = 14
    RTREV = 15
    CPREV = 16
    VT = 17
    BLOSUM62 = 18
    MTMAM = 19
    MTART = 20
    MTZOA = 21
    PMB = 22
    HIVB = 23
    HIVW = 24
    JTTDCMUT = 25
    FLU = 26
    STMTREV = 27

    @property
    def is_aa(self) -> bool:
        return self.value >= 9

    @property
    def n_states(self) -> int:
        return 20 if self.is_aa else 4


class Clock(Enum):
    GLOBAL = 1
    IID = 2
    CORRELATED = 3
    SIMPLE = 4


@dataclass(frozen=True)
class Prior:
    dist: PriorDist
    alpha: float
    beta: float
    # extra params for beta priors (p q min max)
    p3: float = 0.0
    p4: float = 0.0

    def mean(self) -> float:
        if self.dist == PriorDist.GAMMA:
            return self.alpha / self.beta
        if self.dist == PriorDist.INVGAMMA:
            return self.beta / (self.alpha - 1.0)
        raise ValueError(f"no closed-form mean for {self.dist}")


@dataclass(frozen=True)
class Finetune:
    """Initial proposal step sizes (cfile.c:3199 'finetune').

    ``auto`` mirrors ``finetune = 1: ...`` — step sizes are adapted
    during burn-in (method.c:1122-1204 reset_finetune).
    """

    auto: bool = True
    gtage: float = 5.0
    gtspr: float = 0.001
    theta: float = 0.001
    tau: float = 0.001
    mix: float = 0.3
    locusrate: float = 0.33
    seqerr: float = 1.0
    phi: float = 0.2
    freqs: float = 0.1
    qrates: float = 0.1
    alpha: float = 0.1
    migrates: float = 0.2
    mig_ages: float = 0.3
    # relaxed-clock / hierarchical-rate steps (bpp.c:527-545 defaults)
    mui: float = 0.1
    nui: float = 0.1
    mubar: float = 0.1
    nubar: float = 0.1
    branchrate: float = 0.1
    brate_m: float = 0.1       # trait branch rates (bpp.c:528)


@dataclass(frozen=True)
class MigSpec:
    """One allowed migration route (cfile.c:2289 parse_migration line:
    ``source target [alpha beta [am [pseudo_a pseudo_b]]]`` or
    ``source target am``).  Names may be tip or ancestral-population
    labels.  alpha/beta default to the ``wprior`` Gamma when 0."""

    source: str
    target: str
    alpha: float = 0.0
    beta: float = 0.0
    am: float = 0.0          # >0: per-locus variable rates Mi ~ G(am, am/M)
    pseudo_a: float = 0.0    # pseudo-prior (geneflow rjMCMC)
    pseudo_b: float = 0.0


@dataclass(frozen=True)
class SpeciesTreeSpec:
    """The species&tree block (cfile.c:3322)."""

    count: int
    names: tuple[str, ...]
    max_seqs: tuple[int, ...]
    newick: str | None          # None for single-species runs


@dataclass(frozen=True)
class BppConfig:
    # files
    seqfile: str = ""
    imapfile: str | None = None
    jobname: str = "out"
    mcmcfile: str | None = None         # default: <jobname>.mcmc.txt
    datefile: str | None = None
    traitfile: str | None = None        # morphological traits (morph.c)
    # iid Gamma prior on trait branch rates (bpp.c:451-452 defaults;
    # no ctl keyword in the reference either)
    trait_brate_alpha: float = 1.0
    trait_brate_beta: float = 1.0
    constraintfile: str | None = None
    heredity_file: str | None = None
    locusrate_file: str | None = None

    # method selection
    est_delimit: bool = False           # speciesdelimitation = 1 ...
    est_stree: bool = False             # speciestree = 1 ...
    rjmcmc_method: int = 0              # 0: epsilon, 1: (alpha, m)
    rjmcmc_epsilon: float = 2.0
    rjmcmc_alpha: float = 2.0
    rjmcmc_mean: float = 1.0
    prob_snl: float = 0.2               # speciestree = 1 pSNL pShrink ...
    prob_snl_shrink: float = 0.333      # bpp.c:608-609 defaults
    snl_lambda_expand: float = 0.1      # bpp.c:638-639
    snl_lambda_shrink: float = 0.2
    delimit_prior: int = 1              # speciesmodelprior

    # thetamodel (cfile.c:1460): 0 none, 1 linked-all, 2 linked-inner,
    # 3 linked-msci, 4 linked-mscm
    linked_theta: int = 0

    # data
    species: SpeciesTreeSpec | None = None
    phase: tuple[int, ...] = ()         # per-species unphased-diploid flags
    usedata: bool = True
    # usedata = 2 (cfile.c:3131-3134 opt_usedata_fix_gtree): gene trees
    # are frozen at their MSC-prior initialization, likelihood is off,
    # and the gene-tree / tau / mixing moves are skipped — the standard
    # conditional-validation mode for the theta/migration-rate samplers
    usedata_fix_gtree: bool = False
    nloci: int | None = None
    cleandata: bool = False

    # substitution model
    model: SubstModel = SubstModel.JC69
    # 'model = custom <file>' (cfile.c:1374): per-locus models
    partition_file: str | None = None
    alpha_cats: int = 1                 # gamma rate categories (alphaprior ... ncat)
    alphaprior: Prior | None = None     # gamma-shape prior; None = no rate het.
    basefreqs_fixed: bool = True
    qrates_fixed: bool = True

    # priors
    thetaprior: Prior = Prior(PriorDist.GAMMA, 2.0, 2000.0)
    theta_integrated: bool = False      # 'e' flag: integrate theta out analytically
    tauprior: Prior = Prior(PriorDist.GAMMA, 2.0, 1000.0)
    phiprior: Prior = Prior(PriorDist.BETA, 1.0, 1.0)
    theta_slide_prob: float = 0.1       # bpp.c default opt_theta_slide_prob
    phi_slide_prob: float = 0.1

    # rate variation across loci / clock
    clock: Clock = Clock.GLOBAL
    # relaxed-clock hyperpriors (cfile.c parse_clock: clock = 2/3
    # a_vbar b_vbar a_vi [prior [dist]]); nubar ~ Gamma(a_vbar, b_vbar),
    # nu_i ~ Gamma(a_vi, a_vi/nubar) (hierarchical) or Gamma-Dirichlet
    clock_vbar_a: float = 0.0
    clock_vbar_b: float = 0.0
    clock_vi_alpha: float = 0.0
    clock_rate_prior: int = 1           # branch-rate dist given (mu_i, nu_i):
                                        # 0 lognormal, 1 gamma (bpp.h:262-264;
                                        # bpp.c:616 default GAMMA)
    clock_alpha: float = 0.0            # clock = 4 (SIMPLE): brate ~ G(a, a)
    locusrate_prior: int = 0            # 0 GammaDir, 1 hierarchical, 2 none,
                                        # 3 Dir (bpp.h:255-260)
    est_locusrate: int = 0              # 0 off, 1 estimate, 2 from file, 3 only hered
    locusrate_mubar: float = 1.0        # fixed/initial mean rate
    locusrate_mubar_a: float = 0.0      # Gamma(a, b) prior on mubar (0 0 =
    locusrate_mubar_b: float = 0.0      #   fixed mubar)
    locusrate_alpha: float = 0.0        # a_mui (Dirichlet/conditional shape)
    est_heredity: int = 0
    heredity_alpha: float = 4.0
    heredity_beta: float = 4.0

    # migration / introgression
    migration: bool = False
    mig_specs: tuple = ()               # tuple[MigSpec, ...] routes
    geneflow: bool = False
    migprior: Prior | None = None
    wprior: Prior | None = None

    # mcmc control
    seed: int = -1
    burnin: int = 0
    sampfreq: int = 1
    nsample: int = 0
    finetune: Finetune = Finetune()
    print_samples: int = 1
    print_locusrate: int = 0
    print_hscalars: int = 0
    # printlocus = N i1..iN: restrict per-locus output files to these
    # 1-based locus numbers (cfile.c:2169); empty = all loci
    print_locus: tuple[int, ...] = ()
    print_genetrees: int = 0
    print_rates: int = 0
    scaling: bool = False
    checkpoint: tuple[int, int] | None = None   # (initial, step)
    # runtime invariant mode (``check = N [tol]``): every N iterations
    # recompute the cached per-locus logl / logpr (and the notheta
    # coal/T2h caches, trait logl) from scratch through the
    # independent full path and hard-fail on drift — the user-visible
    # analog of the reference's compile-time CHECK_LOGL/CHECK_LOGPR
    # validators (method.c:4699 check_logl, debug.c:1688
    # debug_validate_logpg).  tol 0 = auto by dtype.
    check_every: int = 0
    check_tol: float = 0.0
    # OUR extension (no reference analog; the reference runs one chain,
    # method.c:5343): `chains = K` batches K independent replicate
    # chains per chip via vmap over the chain axis — TPU-native
    # throughput win; between-chain split-R-hat is reported at summary
    n_chains: int = 1
    threads: tuple[int, int, int] | None = None  # (count, start, step) — advisory
    bfbeta: float = 1.0                  # power-posterior beta (bfdriver)

    # framework-specific knobs (no reference analog)
    dtype: str = "float32"              # clv dtype; "float64" for oracle checks
    # pattern-axis padding granularity.  16 keeps the batch arrays
    # tight (the measured padding waste on small-locus data like
    # mammoth drops from 94% to ~30%); the Pallas kernel's 128-lane
    # tile padding is applied internally to its own A-major array only
    # (driver._build_tips_am), not to the whole batch
    site_block: int = 16

    @property
    def method(self) -> Method:
        # cfile.c:3452-3458 (est_delimit, est_stree) -> method
        if self.est_delimit and self.est_stree:
            return Method.A11
        if self.est_delimit:
            return Method.A10
        if self.est_stree:
            return Method.A01
        return Method.A00

    @property
    def gamma_cats(self) -> int:
        return self.alpha_cats if self.alphaprior is not None else 1

    @property
    def locusrate_mubar_est(self) -> bool:
        """mubar is random iff its Gamma prior is set (cfile.c:2903-2907)."""
        return self.locusrate_mubar_a > 0 or self.locusrate_mubar_b > 0

    def replace(self, **kw) -> "BppConfig":
        return dataclasses.replace(self, **kw)
