"""MCMC driver: the cmd_run equivalent (src/method.c:4939).

Composes the per-iteration move schedule (method.c:5343-6275 order),
auto-tunes step lengths during burn-in (reset_finetune,
method.c:1122-1204), logs samples to ``<jobname>.mcmc.txt`` and returns
posterior sample arrays.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BppConfig, Method
from ..core import felsenstein as fe
from ..loader import RunData, init_tau_theta
from ..trees import coalescent as coalmod
from ..trees.gtree import GTrees, init_gtrees, species_arrays
from . import moves, subst_moves
from .state import (
    Ctx, FT_ALPHA, FT_BRATE, FT_BRATE_M, FT_FREQS, FT_GTAGE, FT_GTSPR,
    FT_LRHT, FT_MIX, FT_MUBAR, FT_MUI, FT_NUBAR, FT_NUI, FT_QRATES, FT_TAU,
    FT_THETA, MV_ALPHA, MV_BRATE, MV_FREQS, MV_GTAGE, MV_GTSPR, MV_LRHT,
    MV_MIX, MV_MUBAR, MV_MUI, MV_NUBAR, MV_NUI, MV_QRATES, MV_RJ, MV_SSPR,
    MV_TAU, MV_THETA, MV_TRAIT, N_MOVES, McmcState, SubstState,
    finetune_array, make_logl_fn, make_logpr_fn, refresh_eigen,
)

PJ_OPTIMUM = 0.30     # method.c:45 target pjump


def _root_age_scale(cfg: BppConfig, run: RunData) -> float:
    """Beta-proposal scale for rjMCMC at the root (stree.c:7534-7642).

    Prior-based: 0.9 gamma quantile, or 4*beta/(alpha-1) for invgamma.
    With data: mean cross-root pairwise divergence md minus theta/2, where
    theta solves the within-population diversity from the across-locus
    variance vd of the divergences.
    """
    from ..config import PriorDist
    tp = cfg.tauprior
    if tp.dist == PriorDist.INVGAMMA:
        prior_age = tp.beta / (tp.alpha - 1.0) * 4.0
    else:
        from scipy.stats import gamma as sgamma
        prior_age = float(sgamma.ppf(0.9, tp.alpha, scale=1.0 / tp.beta))
    if not cfg.usedata:
        return prior_age
    st, batch = run.stree, run.batch
    anc = st.pptable()
    lroot = st.left[st.root]
    md = vd = 0.0
    used = 0
    for li in range(batch.n_loci):
        if not batch.locus_mask[li]:
            continue
        ns = int(batch.n_seq[li])
        codes = batch.tip_codes[li, :ns]               # [T, S] masks
        w = batch.weights[li]
        # diploid data: the weight patterns index EXPANDED (A3) code
        # columns through res_map; take each weight pattern's first
        # resolution so the divergence estimate aligns with w.  (The
        # old code relied on S == W padding and silently mis-paired
        # columns for diploid loci.)
        if codes.shape[1] != w.shape[0]:
            codes = codes[:, batch.res_map[li, :, 0]]
        pops = batch.tip_pop[li, :ns]
        on_left = anc[pops, lroot]                     # [T] bool
        # vectorized pairwise weighted mismatch: D[j,k] = sum_s w_s *
        # [codes_j != codes_k]; only cross-root upper-triangle pairs
        # count (was an O(n^2) Python loop -- minutes at 10k loci)
        cross = np.triu(on_left[:, None] != on_left[None, :], 1)
        diff_count = int(cross.sum())
        if not diff_count:
            continue
        # [T, T, S] broadcast; chunk the leading axis when a large
        # locus would spike memory (ns^2 * S bytes)
        w64 = np.asarray(w, np.float64)
        if codes.shape[0] * codes.shape[0] * codes.shape[1] <= 5e7:
            D = (codes[:, None, :] != codes[None, :, :]) @ w64
        else:
            D = np.empty((ns, ns))
            step = max(1, int(5e7 // (ns * codes.shape[1])))
            for j0 in range(0, ns, step):
                D[j0:j0 + step] = (codes[j0:j0 + step, None, :]
                                   != codes[None, :, :]) @ w64
        diff_locus = float(D[cross].sum()) / float(batch.n_sites[li])
        used += 1
        diff_locus /= 2 * diff_count
        vd += (diff_locus - md) ** 2 * (used - 1) / used
        md = (md * (used - 1) + diff_locus) / used
    if not used:
        return prior_age
    n_real = int(batch.locus_mask.sum())
    vd /= max(n_real, 1)
    if used >= 2:
        theta = (2 * np.sqrt(vd) + np.sqrt(vd * 4 + 1) - 1) / 2
        if md - theta / 2 > 0:
            return float(md - theta / 2)
    # plain python float: np scalars are strongly typed and would promote
    # the whole rubber-band to float64 under x64
    return float(md)
from .state import FT_MIG_AGES, MV_MIG_AGES  # noqa: E402

MOVE_TO_FT = {
    MV_MIG_AGES: FT_MIG_AGES,
    MV_GTAGE: FT_GTAGE,
    MV_GTSPR: FT_GTSPR,
    MV_THETA: FT_THETA,
    MV_TAU: FT_TAU,
    MV_MIX: FT_MIX,
    MV_LRHT: FT_LRHT,
    MV_FREQS: FT_FREQS,
    MV_QRATES: FT_QRATES,
    MV_ALPHA: FT_ALPHA,
    MV_MUI: FT_MUI,
    MV_NUI: FT_NUI,
    MV_MUBAR: FT_MUBAR,
    MV_NUBAR: FT_NUBAR,
    MV_BRATE: FT_BRATE,
    MV_TRAIT: FT_BRATE_M,
}


def prior_a11_masses(n: int, delimit_prior: int) -> np.ndarray:
    """Normalized per-species-count prior masses for A11
    (partition_fast + print_pinfo, delimit.c:88-215).

    masses[k-1] = sum over integer partitions a of n with k parts of
      nd(a) * #rooted_trees(k) * prod_{a_i>2} #rooted_trees(a_i) * wlh
    where nd(a) = n! / prod a_i! / prod mult(a)! (#set partitions of
    that shape), and wlh = mean labeled histories per k-taxon tree for
    the SLH prior (delimit.c:118-123, prior 2 only, k > 3).
    """
    from math import factorial

    def trees(k):       # rooted labeled topologies: (2k-3)!!
        if k < 3:
            return 1.0
        out = 1.0
        for i in range(3, 2 * k - 2, 2):
            out *= i
        return out

    def lh(k):          # total labeled histories: k! (k-1)! / 2^(k-1)
        return factorial(k) * factorial(k - 1) / 2.0 ** (k - 1)

    masses = np.zeros(n)

    def partitions(total, maxpart):
        if total == 0:
            yield []
            return
        for first in range(min(total, maxpart), 0, -1):
            for rest in partitions(total - first, first):
                yield [first] + rest

    for a in partitions(n, n):
        k = len(a)
        nd = float(factorial(n))
        for ai in a:
            nd /= factorial(ai)
        for v in set(a):
            nd /= factorial(a.count(v))
        guide = 1.0
        for ai in a:
            if ai > 2:
                guide *= trees(ai)
        wlh = 1.0
        if k > 3 and delimit_prior == 2:
            wlh = lh(k) / trees(k)
        masses[k - 1] += nd * trees(k) * guide * wlh
    return masses / masses.sum()


def reset_finetune_onestep(pjump: float, val: float) -> float:
    """method.c:1122 reset_finetune_onestep."""
    maxstep = 99.0
    minstep = 1e-10        # repeated /100 must not underflow eps to 0.0
    if pjump < 0.001:
        return max(minstep, val / 100.0)
    if pjump > 0.999:
        return min(maxstep, val * 100.0)
    return min(maxstep, max(minstep, val * np.tan(np.pi / 2 * pjump)
                            / np.tan(np.pi / 2 * PJ_OPTIMUM)))


@dataclass
class SampleLog:
    """Posterior samples collected on host."""

    gen: list = field(default_factory=list)
    theta: list = field(default_factory=list)     # [H]
    tau: list = field(default_factory=list)       # [H]
    lnL: list = field(default_factory=list)
    logpr: list = field(default_factory=list)
    sptrees: list = field(default_factory=list)   # (left, right, parent) per
                                                  # sample; A01/A11 only
    phi: list = field(default_factory=list)       # [H]; MSC-I only
    migM: list = field(default_factory=list)      # [K]; MSC-M only
    mubar: list = field(default_factory=list)     # scalar; tip dating only

    def arrays(self):
        return (np.asarray(self.gen), np.stack(self.theta),
                np.stack(self.tau), np.asarray(self.lnL),
                np.asarray(self.logpr))


class Engine:
    """Owns device data + jitted step for one inference run."""

    def __init__(self, run: RunData, seed: int | None = None):
        self.run = run
        self.cfg = run.cfg
        cfg = self.cfg
        if cfg.est_delimit and not 0 <= cfg.delimit_prior <= 3:
            raise ValueError("speciesmodelprior must be 0..3 (bpp.h:190)")
        if run.stree.n_hybrids > 0 and (cfg.est_delimit or cfg.est_stree):
            # matches the reference: `init: Assertion 'opt_msci == 0'
            # failed` (method.c:3871, verified live on 4.8.7 with a
            # yeast MSci ctl + speciesdelimitation, round 5)
            raise NotImplementedError(
                "species delimitation / species-tree search cannot be "
                "combined with an MSC-I network (reference asserts, "
                "method.c:3871)")
        from ..config import Clock
        if cfg.clock != Clock.GLOBAL:
            if run.stree.n_hybrids > 0:
                if cfg.clock == Clock.CORRELATED:
                    # the reference fatals on this combination too
                    # (method.c:3291 "MSC-I model with auto-correlated
                    # relaxed clock is not currently implemented")
                    raise NotImplementedError(
                        "MSC-I networks with the auto-correlated relaxed "
                        "clock are not supported (matches the reference, "
                        "method.c:3291)")
                # BDI x iid/simple clocks: supported — mirror segments
                # read their hinner partner's rate (rate_owner gather in
                # felsenstein.relaxed_branch_lengths), matching the
                # reference, which skips mirrors in both rate init and
                # proposals (method.c:4235, stree.c:10298)
            if cfg.est_delimit and cfg.clock == Clock.CORRELATED:
                # A10/A11 x iid/simple clocks are exact: the guide tree
                # keeps every branch-rate parameter alive across
                # delimitation models (collapsed tau=0 segments are
                # likelihood-inert but still prior-distributed), so the
                # rj split/join never changes dimension in the rates.
                # The CORRELATED prior however depends on the taus
                # (branch-midpoint terms, stree.c:8929-9025), and the
                # reference's prop_rj.c ignores that delta — it samples
                # a subtly wrong target there (verified: prop_rj.c has
                # no lnprior_rates recomputation).  Block only corr.
                raise NotImplementedError(
                    "the auto-correlated clock (clock=3) cannot be "
                    "combined with rjMCMC species delimitation: the "
                    "correlated rate prior depends on the taus the rj "
                    "move changes (the reference ignores this delta; "
                    "see VALIDATION.md round 3). Use clock = 2 or 4.")
        if (cfg.est_locusrate == 1 and cfg.locusrate_prior == 3
                and cfg.clock != Clock.GLOBAL):
            # matches the reference: cfile.c fatals with "prior = IID
            # ... in 'clock' does not match prior = DIR ... in
            # 'locusrate'" (verified on 4.8.7, round 4)
            raise NotImplementedError(
                "locusrate Dir prior cannot be combined with a relaxed "
                "clock (matches the reference's cfile fatal); use the "
                "Gamma-Dirichlet or hierarchical prior instead")
        if cfg.usedata_fix_gtree and (cfg.est_stree or cfg.est_delimit):
            # method.c:3279 fatal: "opt_usedata = 2 (fixing gene trees)
            # works with MSC-A00, no gene flow, only"
            raise NotImplementedError(
                "usedata = 2 (fixed gene trees) works with A00 only "
                "(method.c:3279)")
        if cfg.usedata_fix_gtree and run.stree.n_hybrids > 0:
            raise NotImplementedError(
                "usedata = 2 (fixed gene trees) is not supported with "
                "MSC-I networks (method.c:3279: MSC-A00 only)")
        if cfg.usedata_fix_gtree and cfg.geneflow:
            # method.c:3279: "... no gene flow, only" — the route rjMCMC
            # would have to delete migration events living on the FIXED
            # gene trees
            raise NotImplementedError(
                "usedata = 2 cannot be combined with geneflow route "
                "rjMCMC (method.c:3279)")
        self.routes = None
        if cfg.migration:
            from ..trees import migration as mgmod
            if cfg.est_stree:
                # cfile.c:2884 fatal: "Species tree estimation under
                # the MSC-M model not available" (delimitation on a
                # fixed guide tree IS available: prop_rj.c:599-656)
                raise NotImplementedError(
                    "species-tree search (A01/A11) is not available "
                    "under the MSC-M model (cfile.c:2884)")
            if cfg.est_delimit and cfg.geneflow:
                raise NotImplementedError(
                    "geneflow route rjMCMC with species delimitation is "
                    "not yet supported in bpp_tpu (the route windows "
                    "change under a moving delimitation; fixed-route "
                    "migration with A10 is supported)")
            if run.stree.n_hybrids > 0:
                raise NotImplementedError(
                    "MSC-I networks cannot be combined with MSC-M "
                    "migration (reference: assert in stree.c:7452)")
            from ..config import Clock
            if cfg.clock == Clock.CORRELATED:
                # correlated rates need the species-topology midpoint
                # machinery; reference behavior under migration is
                # untested there — keep the conservative block
                raise NotImplementedError(
                    "the auto-correlated clock with migration is not "
                    "supported; use clock = 2 (iid) or 4 (simple)")
            if cfg.theta_integrated:
                raise NotImplementedError(
                    "thetas cannot be integrated out under migration "
                    "(gtree.c:9271 fatal)")
            self.routes = mgmod.build_routes(cfg, run.stree)
            root = run.stree.root
            if (self.routes.si == root).any() or \
                    (self.routes.ti == root).any():
                raise ValueError("migration to/from the root population "
                                 "is impossible (no contemporaries)")
            anc = run.stree.pptable()
            for k in range(self.routes.n_routes):
                s, t = int(self.routes.si[k]), int(self.routes.ti[k])
                if anc[s, t] or anc[t, s]:
                    raise ValueError(
                        "migration route between ancestor and descendant "
                        "populations: they never coexist")
            self.route_on0 = None
            if cfg.geneflow:
                # geneflow rjMCMC: switch to the saturated candidate
                # table; configured routes start active
                if (self.routes.am > 0).any():
                    raise NotImplementedError(
                        "variable-rates routes (am > 0) cannot be "
                        "combined with geneflow rjMCMC (the reference "
                        "disables rate variation on rj-managed routes, "
                        "stree.c:14194)")
                self.routes, self.route_on0 = \
                    mgmod.build_routes_geneflow(cfg, run.stree)
        if cfg.theta_integrated:
            from ..config import PriorDist
            if cfg.thetaprior.dist != PriorDist.INVGAMMA:
                raise ValueError(
                    "theta integration ('e' flag) requires an inverse-"
                    "gamma thetaprior (the conjugate form the analytic "
                    "marginalization uses)")
        if cfg.datefile:
            # reference restrictions (cfile.c:2878-2891, 3486-3490):
            # A00 only, global clock, locusrate = 3 (MUTRATE_ONLY)
            if cfg.est_stree or cfg.est_delimit:
                raise NotImplementedError(
                    "tip dating (datefile) requires a fixed species tree "
                    "(A00)")
            if cfg.clock != Clock.GLOBAL:
                raise NotImplementedError(
                    "tip dating requires the strict molecular clock")
            if cfg.est_locusrate != 3:
                raise ValueError(
                    "tip dating requires 'locusrate = 3 a_mubar b_mubar' "
                    "(mutation-rate-only mode)")
            if run.stree.n_hybrids > 0 or cfg.migration:
                raise NotImplementedError(
                    "tip dating with MSC-I/MSC-M not yet supported")
            if run.stree.n_tips < 2:
                # stree.c:9426 "Mu proposal not yet implemented for
                # single population"
                raise NotImplementedError(
                    "tip dating needs at least two species")
            if run.tip_dates is None:
                raise ValueError("datefile given but no dates were loaded")
        self.seed = seed if seed is not None else (
            cfg.seed if cfg.seed > 0 else np.random.SeedSequence().entropy % (2**31))
        batch = run.batch

        dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.dtype = dtype

        prior_a11_log = None
        if cfg.est_delimit and cfg.est_stree and cfg.delimit_prior >= 2:
            prior_a11_log = jnp.asarray(np.log(prior_a11_masses(
                run.stree.n_tips, cfg.delimit_prior)))

        theta_link = None
        if cfg.linked_theta:
            if (cfg.est_stree or cfg.est_delimit) \
                    and cfg.linked_theta not in (1, 2):
                raise NotImplementedError(
                    "species-tree search / delimitation support "
                    "thetamodel = linked-all / linked-inner only")
            # est_stree (A01) with linked-all/linked-inner is safe: the
            # owner map is defined by node-index CLASSES (tips vs inner)
            # and the root, none of which the SPR/SNL topology moves
            # change — the link map stays valid across proposals
            if cfg.theta_integrated:
                raise NotImplementedError(
                    "thetamodel cannot be combined with analytically "
                    "integrated-out thetas")
            if cfg.migration and cfg.linked_theta != 4:
                raise NotImplementedError(
                    "use thetamodel = linked-mscm with migration")
            from ..trees.stree import theta_link_map
            theta_link = jnp.asarray(
                theta_link_map(run.stree, cfg.linked_theta), jnp.int32)

        sp_constraint = None
        if cfg.constraintfile and cfg.est_stree:
            if cfg.prob_snl > 0:
                # stree.c:11395: SNL has no constraint support
                raise NotImplementedError(
                    "constraints are not implemented for the SNL move; "
                    "use 'speciestree = 1 0' to disable SNL")
            from ..io.constraints import build_constraint_ids
            sp_constraint = jnp.asarray(
                build_constraint_ids(run.stree, cfg.constraintfile))

        trait_fn = None
        trait_fn_topo = None
        self.trait_data = None
        if cfg.traitfile:
            # trait likelihood is wired into tau/mixing/rj AND the
            # species SPR/SNL moves (the latter re-score the proposed
            # topology through trait_fn_topo, stree.c:727-736 analog);
            # under A11 the rj split/join re-scores traits on the
            # current sampled topology through trait_fn_topo
            # (prop_rj.c:727-774 analog)
            if run.stree.n_hybrids > 0:
                # the reference's contrast recursion (morph.c:888) is
                # defined on a TREE; mirror-node networks have no
                # documented trait semantics — traits with MSC-M are
                # supported (the trait likelihood sees only the taus)
                raise NotImplementedError(
                    "traits with MSC-I networks are not supported")
            from ..trees import traits as trmod
            parts = trmod.parse_traitfile(cfg.traitfile)
            self.trait_data = trmod.build_trait_data(parts, run.stree,
                                                     dtype)
            if cfg.est_stree:
                trait_fn_topo = trmod.make_trait_logl_topo(
                    run.stree.n_tips, run.stree.n_nodes, self.trait_data)
            else:
                trait_fn = trmod.make_trait_logl(run.stree,
                                                 self.trait_data)
        custom = None
        if run.locus_models is not None:
            from .state import build_custom_models
            custom = build_custom_models(run.locus_models, batch.n_loci,
                                         dtype)
        self.n_states = custom.n_states if custom is not None \
            else cfg.model.n_states
        tip_partials = fe.tip_partials_from_codes(
            jnp.asarray(batch.tip_codes), dtype=dtype,
            n_states=self.n_states)
        # non-diploid batches carry an IDENTITY resolution map (one
        # column per weight pattern, packing.py:110); gathering through
        # it costs a pathological ~1 ms per [1000, 128] row-gather on
        # TPU (8 likelihood passes/iter = ~8 ms/iter, ~20% of the whole
        # step) — drop it so reduce_root takes the weights-dot fast path
        rm, rcnt = batch.res_map, batch.res_count
        if rm.shape[2] == 1 and rm.shape[1] == batch.tip_codes.shape[-1]:
            ident = (rm[..., 0] == np.arange(rm.shape[1])[None, :])
            if (ident | (batch.weights == 0)).all():
                rm = rcnt = None
        tips_am = self._build_tips_am(tip_partials)
        pack = None
        if tips_am is not None and rm is None and self.n_states == 4 \
                and os.environ.get("BPP_TPU_PACK", "auto") != "0":
            # lane-packed likelihood layout (core.pallas_pack): packs
            # ~10-40 loci per 256-lane tile; supersedes the per-locus
            # kernel for non-diploid DNA f32 runs (diploid resolution
            # maps and AA/custom models keep the other paths).  NOTE:
            # pack arrays are not locus-sharded — run_mcmc(mesh=...)
            # drops the pack and rebuilds tips_am so mesh/multihost
            # runs ride the locus-sharded paths.
            from ..core.pallas_pack import build_pack_layout
            pack = build_pack_layout(
                np.asarray(tip_partials), batch.weights, batch.n_pat,
                batch.n_seq, batch.locus_mask)
            if pack is not None:
                tips_am = None          # packed path replaces it
        self.ctx = Ctx(
            tip_partials=tip_partials,
            weights=jnp.asarray(batch.weights, dtype),
            res_map=None if rm is None else jnp.asarray(rm),
            res_count=None if rcnt is None else jnp.asarray(rcnt),
            n_seq=jnp.asarray(batch.n_seq),
            tip_pop=jnp.asarray(batch.tip_pop),
            locus_mask=jnp.asarray(batch.locus_mask),
            tips_am=tips_am,
            pack=pack,
            # BPP_TPU_PALLAS_NOSKIP=1 disables the kernel's padding-tile
            # skip (A/B benchmarking of the zigzag-analog only)
            n_pat=None
            if os.environ.get("BPP_TPU_PALLAS_NOSKIP", "0") not in
            ("0", "", "false")
            else jnp.asarray(batch.n_pat, jnp.int32),
            tip_dates=None if run.tip_dates is None
            else jnp.asarray(run.tip_dates, dtype),
            date_lmax=None if run.date_lmax is None
            else jnp.asarray(run.date_lmax, dtype),
            trait_fn=trait_fn,
            trait_fn_topo=trait_fn_topo,
            sp_constraint=sp_constraint,
            theta_link=theta_link,
            prior_a11_log=prior_a11_log,
            custom=custom,
            integrated=bool(cfg.theta_integrated),
        )
        self._logl_fn = make_logl_fn(self.ctx, cfg)
        self._logpr_fn = make_logpr_fn(self.ctx)
        # jitted wrappers for host-driven evaluations (init_state,
        # validate_state): the unjitted closures cost ~27 ms/op over
        # the axon tunnel (~80 s at 1000 loci, measured round 5).  ONE
        # fused program for init (remote compiles are ~40+ s each).
        self._logl_jit = jax.jit(self._logl_fn)
        self._logpr_jit = jax.jit(self._logpr_fn)

        def _init_eval(gt, subst, sp, clock):
            return (self._logl_fn(gt, subst, sp, clock),
                    self._logpr_fn(gt, sp, subst.heredity))

        self._init_eval_jit = jax.jit(_init_eval)
        if cfg.migration:
            # jitted once: validate_state (check = N) recomputes the
            # MSC-M density per check; eager op-by-op execution would
            # cost dozens of dispatches over the remote tunnel
            from .mig_moves import make_logpr_fn_mig
            self._logpr_mig_jit = jax.jit(
                make_logpr_fn_mig(self.ctx, self.routes))
        self._step_jit = jax.jit(self._step)
        self._chunk_jit = jax.jit(self._chunk, static_argnums=2)

    def _build_tips_am(self, tip_partials):
        """A-major, 128-padded tip partials for the Pallas likelihood
        kernel, or None when the XLA path should be used.

        Pallas runs on the TPU backend with float32 state only (TPU f64
        is unsupported in Mosaic); BPP_TPU_PALLAS=0 forces XLA off it,
        =interpret enables the kernel in interpreter mode on CPU (tests).
        """
        import os
        knob = os.environ.get("BPP_TPU_PALLAS", "auto")
        from ..config import SubstModel
        if knob == "0" or not self.cfg.usedata or self.cfg.model.is_aa \
                or self.cfg.model == SubstModel.CUSTOM:
            return None
        on_tpu = jax.default_backend() == "tpu"
        if not (knob == "interpret" or (on_tpu and self.dtype == jnp.float32)):
            return None
        L, T, S, A = tip_partials.shape
        S128 = -(-S // 128) * 128
        am = jnp.transpose(tip_partials, (0, 1, 3, 2))       # [L, T, A, S]
        # padding columns behave like all-ambiguous sites (all-ones
        # partials); they are never gathered by res_map
        return jnp.pad(am, ((0, 0), (0, 0), (0, 0), (0, S128 - S)),
                       constant_values=1.0)

    # --- state construction ---------------------------------------------------

    def _parse_doubles_file(self, path: str, what: str) -> np.ndarray:
        """Whitespace-separated per-locus doubles (parsefile_doubles,
        method.c:3942/3986); must match the real locus count exactly."""
        vals = np.asarray([float(t) for t in open(path).read().split()])
        n_real = int(np.asarray(self.run.batch.locus_mask).sum())
        if len(vals) > n_real:
            raise ValueError(f"{path} contains more {what} than loci "
                             f"({len(vals)} > {n_real})")
        if len(vals) < n_real:
            raise ValueError(f"{path} contains fewer {what} ({len(vals)}) "
                             f"than loci ({n_real})")
        return vals

    def _init_mu(self, L: int) -> np.ndarray:
        cfg = self.cfg
        if cfg.est_locusrate == 2 and cfg.locusrate_file:
            # fixed rates from file, normalized to mean 1
            # (MUTRATE_FROMFILE, method.c:3984-4008)
            vals = self._parse_doubles_file(cfg.locusrate_file, "rates")
            vals = vals / vals.mean()
            out = np.ones(L)
            out[:len(vals)] = vals
            return out
        if cfg.est_locusrate == 1:
            return np.full(L, cfg.locusrate_mubar)
        return np.ones(L)

    def _init_heredity(self, L: int) -> np.ndarray:
        cfg = self.cfg
        if cfg.est_heredity == 2 and cfg.heredity_file:
            # fixed heredity scalars (HEREDITY_FROMFILE, method.c:3938)
            vals = self._parse_doubles_file(cfg.heredity_file, "scalars")
            out = np.ones(L)
            out[:len(vals)] = vals
            return out
        return np.ones(L)

    def init_state(self) -> McmcState:
        cfg, run = self.cfg, self.run
        rng = np.random.default_rng(self.seed)
        mubar0 = None
        tip_ages0 = None
        if run.tip_dates is not None:
            mubar0 = cfg.locusrate_mubar_a / cfg.locusrate_mubar_b
            tip_ages0 = run.tip_dates * mubar0
            init_tau_theta(cfg, run.stree, rng,
                           lconstraint=run.date_lmax * mubar0)
        else:
            init_tau_theta(cfg, run.stree, rng)
        # root-age scale for the rjMCMC Beta proposal at the root
        # (prop_rj.c:431-435): the 0.9 prior quantile (gamma) or
        # 4*beta/(alpha-1) (invgamma), refined by mean cross-root sequence
        # divergence when data is used (stree.c:7534-7642) — NOT the
        # sampled initial root tau, which would make root joins
        # infeasible once tau drifts above 0.6x it.
        self.root_age0 = _root_age_scale(cfg, run)
        gt = init_gtrees(int(rng.integers(2**31)), run.batch, run.stree,
                         dtype=self.dtype, tip_ages=tip_ages0)
        sp = species_arrays(run.stree, dtype=self.dtype)
        L = run.batch.n_loci
        C = cfg.gamma_cats
        # near-uniform random starting freqs/qrates (locus.c:961-975);
        # AA models use their fixed empirical frequencies (locus.c:985)
        from ..config import SubstModel
        S = self.n_states
        if cfg.model == SubstModel.CUSTOM:
            from ..core.pmatrix import aa_eigen
            freqs = np.zeros((L, S))
            freqs[:, :4] = 0.25
            qrates = np.ones((L, 6))
            for i, m in enumerate(run.locus_models):
                if m.is_aa:
                    freqs[i] = aa_eigen(m.name)[3]
                elif m in subst_moves.FREQS_MODELS:
                    f = 0.8 + 0.4 * rng.random(4)
                    freqs[i, :4] = f / f.sum()
                    freqs[i, 4:] = 0.0
                if m in subst_moves.QRATES_COUNT:
                    cnt, _ = subst_moves.QRATES_COUNT[m]
                    q = 0.8 + 0.4 * rng.random(cnt)
                    qrates[i, :cnt] = q / q.sum()
        elif cfg.model.is_aa:
            from ..core.pmatrix import aa_eigen
            freqs = np.tile(aa_eigen(cfg.model.name)[3], (L, 1))
            qrates = np.ones((L, 6))
        elif cfg.model in subst_moves.FREQS_MODELS:
            f = 0.8 + 0.4 * rng.random((L, 4))
            freqs = f / f.sum(1, keepdims=True)
            qrates = np.ones((L, 6))
        else:
            freqs = np.full((L, 4), 0.25)
            qrates = np.ones((L, 6))
        if cfg.model in subst_moves.QRATES_COUNT:
            cnt, _ = subst_moves.QRATES_COUNT[cfg.model]
            q = 0.8 + 0.4 * rng.random((L, cnt))
            qrates[:, :cnt] = q / q.sum(1, keepdims=True)
        alpha0 = cfg.alphaprior.mean() if cfg.alphaprior else 0.0
        if cfg.alphaprior and C > 1:
            from ..core.gammarates import discrete_gamma_rates
            rates0 = np.tile(
                np.asarray(discrete_gamma_rates(jnp.float64(alpha0), C)),
                (L, 1))
        else:
            rates0 = np.ones((L, C))
        subst = SubstState(
            freqs=jnp.asarray(freqs, self.dtype),
            kappa1=jnp.ones((L,), self.dtype),
            kappa2=jnp.ones((L,), self.dtype),
            qrates=jnp.asarray(qrates, self.dtype),
            alpha=jnp.full((L,), alpha0, self.dtype),
            rates=jnp.asarray(rates0, self.dtype),
            # with tip dating (locusrate = 3) gene-node ages already
            # carry mubar (substitution units), so the per-locus rate
            # multiplier is 1 (stree.c:4212 rate_mui commented out)
            mu=jnp.asarray(self._init_mu(L), self.dtype),
            heredity=jnp.asarray(self._init_heredity(L), self.dtype),
            eigw=jnp.zeros((L, S), self.dtype),
            eigT=jnp.zeros((L, S, S), self.dtype),
            eigTi=jnp.zeros((L, S, S), self.dtype),
        )
        subst = subst_moves._derive_kappas(subst, cfg.model, self.ctx.custom)
        subst = refresh_eigen(subst, cfg.model, self.ctx.custom)
        from ..config import Clock
        clock = None
        if cfg.clock != Clock.GLOBAL or (
                cfg.est_locusrate == 1 and cfg.locusrate_prior in (0, 1)):
            from . import clock_moves
            if cfg.clock != Clock.GLOBAL and cfg.est_locusrate == 1 and \
                    cfg.locusrate_prior == 1:
                # hierarchical start: mu_i jittered around mubar
                # (method.c:4212-4214)
                mubar0 = (cfg.locusrate_mubar_a / cfg.locusrate_mubar_b
                          if cfg.locusrate_mubar_b > 0
                          else cfg.locusrate_mubar)
                subst = subst._replace(mu=jnp.asarray(
                    mubar0 * (0.9 + 0.2 * rng.random(L)), self.dtype))
            clock = clock_moves.init_clock_state(
                cfg, sp, subst.mu, rng, L, self.dtype)
        trait = None
        if self.ctx.trait_fn is not None or \
                self.ctx.trait_fn_topo is not None:
            # brates start at 1 (trait_init morph.c:832)
            from ..trees.traits import TraitState
            brate0 = jnp.ones((len(self.trait_data), run.stree.n_nodes),
                              self.dtype)
            tl0 = (self.ctx.trait_fn(sp.tau, brate0)
                   if self.ctx.trait_fn is not None else
                   self.ctx.trait_fn_topo(sp.left, sp.right, sp.parent,
                                          sp.tau, brate0))
            trait = TraitState(brate=brate0, logl=tl0)
        mig = None
        if cfg.migration:
            # start event-free (a valid support point; the sim-SPR move
            # introduces events) with rates at their prior means
            from ..trees import migration as mgmod
            ME = max(16, 2 * run.batch.max_tips)
            M0 = self.routes.alpha / self.routes.beta
            mig = mgmod.empty_mig_state(L, ME, self.routes.n_routes, M0,
                                        self.dtype,
                                        on=getattr(self, "route_on0", None))
            # jitted: eager op-by-op evaluation costs ~80 s of ~27 ms
            # dispatches over the axon tunnel at 1000 loci (measured
            # round 5); one jit compile amortizes across chain inits
            logl = self._logl_jit(gt, subst, sp, clock, mig=mig)
            logpr, *_ = self._logpr_mig_jit(gt, sp, mig, subst.heredity)
            return McmcState(
                gt=gt, sp=sp, subst=subst, logl=logl, logpr=logpr,
                finetune=finetune_array(cfg, self.dtype), clock=clock,
                mig=mig, trait=trait)
        logl, (logpr, c0, t20) = self._init_eval_jit(gt, subst, sp, clock)
        coal = t2h = None
        if cfg.theta_integrated:
            # logpr holds the theta-FREE per-locus part (MSC-I phi
            # terms; zeros for trees) — see make_logpr_fn
            coal, t2h = c0, t20
        return McmcState(
            gt=gt, sp=sp, subst=subst, logl=logl, logpr=logpr,
            finetune=finetune_array(cfg, self.dtype), clock=clock,
            coal=coal, t2h=t2h,
            mubar=None if mubar0 is None
            else jnp.asarray(mubar0, self.dtype),
            trait=trait)

    # --- one iteration --------------------------------------------------------

    def _step(self, state: McmcState, key, ctx=None):
        # ctx arrives as a jit ARGUMENT (multihost-sharded arrays may
        # not be closure constants); None = single-process direct call
        cfg = self.cfg
        if ctx is None:
            ctx = self.ctx
        stats = jnp.zeros((N_MOVES, 2), jnp.int32)
        keys = jax.random.split(key, 10)
        if cfg.migration:
            return self._step_mig(state, keys, stats, ctx)

        # move #0a: rjMCMC split/join (A10/A11; method.c:5420-5435)
        if cfg.est_delimit:
            from . import rj_moves
            state, (p, a) = rj_moves.rj_move(ctx, cfg, state, keys[9],
                                             self.root_age0)
            stats = stats.at[MV_RJ].add(jnp.stack([p, a]))

        # move #0b: species-tree SPR or SNL (A01/A11; method.c:5438-5477
        # picks SNL with probability opt_prob_snl); with < 3 species
        # there is no alternative rooted topology
        if cfg.est_stree and self.run.stree.n_tips >= 3:
            from . import stree_moves
            from .state import MV_SNL
            ksel, kmove = jax.random.split(keys[8])
            if cfg.prob_snl > 0:
                use_snl = jax.random.uniform(ksel) < cfg.prob_snl

                def do_snl(st):
                    return stree_moves.snl_move(ctx, cfg, st, kmove)

                def do_spr(st):
                    return stree_moves.species_spr_move(ctx, cfg, st, kmove)

                state, (p, a) = jax.lax.cond(use_snl, do_snl, do_spr, state)
                stats = stats.at[MV_SSPR].add(
                    jnp.stack([jnp.where(use_snl, 0, p),
                               jnp.where(use_snl, 0, a)]))
                stats = stats.at[MV_SNL].add(
                    jnp.stack([jnp.where(use_snl, p, 0),
                               jnp.where(use_snl, a, 0)]))
            else:
                state, (p, a) = stree_moves.species_spr_move(
                    ctx, cfg, state, kmove)
                stats = stats.at[MV_SSPR].add(jnp.stack([p, a]))

        # gene-tree moves: blocked full-recompute variants (see moves.py
        # "blocked" section — per-op overhead makes the full batched
        # Felsenstein pass cheaper than one incremental path walk).
        # usedata = 2 freezes the gene trees (method.c:5490,5524 skip
        # the age/SPR moves under opt_usedata_fix_gtree)
        if not cfg.usedata_fix_gtree:
            state, (p, a) = moves.age_block_move(ctx, cfg, state, keys[0])
            stats = stats.at[MV_GTAGE].add(jnp.stack([p, a]))

            # the 3 SPR rounds ride ONE lax.scan so the round body (a
            # full likelihood pass) is compiled once, not inlined 3x —
            # same RNG streams (fold_in of the traced round index), ~25%
            # smaller HLO for the megastep (round-5 compile-cost fix)
            def _spr_round(st, r):
                st, pa = moves.spr_round_move(
                    ctx, cfg, st, jax.random.fold_in(keys[1], r))
                return st, jnp.stack(pa)

            state, pa3 = jax.lax.scan(_spr_round, state, jnp.arange(3))
            stats = stats.at[MV_GTSPR].add(pa3.sum(0))

        if not cfg.theta_integrated:
            state, (p, a) = moves.theta_move(ctx, cfg, state, keys[2])
            stats = stats.at[MV_THETA].add(jnp.stack([p, a]))

        if self.run.stree.n_hybrids > 0:
            from . import msci_moves
            from .state import MV_HPATH, MV_PHI
            state, (p, a) = msci_moves.tau_move_net(ctx, cfg, state, keys[3])
            stats = stats.at[MV_TAU].add(jnp.stack([p, a]))
            state, (p, a) = msci_moves.repath_move(
                ctx, cfg, state, jax.random.fold_in(keys[3], 1))
            stats = stats.at[MV_HPATH].add(jnp.stack([p, a]))
            state, (p, a) = msci_moves.phi_gibbs_move(
                ctx, cfg, state, jax.random.fold_in(keys[3], 2))
            stats = stats.at[MV_PHI].add(jnp.stack([p, a]))
        elif not cfg.usedata_fix_gtree:
            # tau rubber band rescales gene-node ages, so usedata = 2
            # holds the taus fixed too (method.c:5572-5574)
            state, (p, a) = moves.tau_move(ctx, cfg, state, keys[3])
            stats = stats.at[MV_TAU].add(jnp.stack([p, a]))

        # mixing is incompatible with fixed tip dates (method.c:5600
        # skips it under opt_datefile AND opt_usedata_fix_gtree); the
        # mubar move fills the global-rescaling role there
        if cfg.usedata_fix_gtree:
            pass
        elif ctx.tip_dates is None:
            state, (p, a) = moves.mixing_move(ctx, cfg, state, keys[4])
            stats = stats.at[MV_MIX].add(jnp.stack([p, a]))
        else:
            from . import clock_moves
            state, (p, a) = clock_moves.tipdate_mubar_move(
                ctx, cfg, state, keys[4])
            stats = stats.at[MV_MUBAR].add(jnp.stack([p, a]))

        # moves #8/#11-13 (method.c:5616-5736); inclusion is static per cfg.
        # Dir prior (3) uses the pairwise-compensating Dirichlet move
        # (prop_locusrate_and_heredity); GammaDir (0) / hierarchical (1)
        # use the mu_i log-slide (prop_locusrate_mui, method.c:5745)
        if cfg.est_locusrate == 1 and cfg.locusrate_prior == 3:
            state, (p, a) = subst_moves.locusrate_move(ctx, cfg, state, keys[5])
            stats = stats.at[MV_LRHT].add(jnp.stack([p, a]))
        if cfg.est_heredity == 1:
            state, (p, a) = subst_moves.heredity_move(
                ctx, cfg, state, jax.random.fold_in(keys[5], 1))
            stats = stats.at[MV_LRHT].add(jnp.stack([p, a]))
        if cfg.model in subst_moves.FREQS_MODELS or (
                ctx.custom is not None and ctx.custom.any_freqs):
            state, (p, a) = subst_moves.freqs_move(ctx, cfg, state, keys[6])
            stats = stats.at[MV_FREQS].add(jnp.stack([p, a]))
        if cfg.model in subst_moves.QRATES_COUNT or (
                ctx.custom is not None and ctx.custom.q_slots):
            state, (p, a) = subst_moves.qrates_move(
                ctx, cfg, state, jax.random.fold_in(keys[6], 1))
            stats = stats.at[MV_QRATES].add(jnp.stack([p, a]))
        if cfg.alphaprior is not None:
            state, (p, a) = subst_moves.alpha_move(ctx, cfg, state, keys[7])
            stats = stats.at[MV_ALPHA].add(jnp.stack([p, a]))

        # moves #8 (hierarchical/GammaDir mu_i) and #14 (relaxed-clock
        # nu_i / nubar / branch rates), method.c:5745-5835 order
        from ..config import Clock
        if cfg.est_locusrate == 1 and cfg.locusrate_prior in (0, 1):
            from . import clock_moves
            kmu = jax.random.fold_in(keys[5], 7)
            state, (p, a) = clock_moves.mui_move(ctx, cfg, state, kmu)
            stats = stats.at[MV_MUI].add(jnp.stack([p, a]))
            if cfg.locusrate_prior == 1 and cfg.locusrate_mubar_est:
                state, (p, a) = clock_moves.mubar_move(
                    ctx, cfg, state, jax.random.fold_in(kmu, 1))
                stats = stats.at[MV_MUBAR].add(jnp.stack([p, a]))
        if cfg.clock != Clock.GLOBAL:
            from . import clock_moves
            kck = jax.random.fold_in(keys[5], 8)
            if cfg.clock != Clock.SIMPLE:
                state, (p, a) = clock_moves.nui_move(ctx, cfg, state, kck)
                stats = stats.at[MV_NUI].add(jnp.stack([p, a]))
                if cfg.locusrate_prior == 1:
                    state, (p, a) = clock_moves.nubar_move(
                        ctx, cfg, state, jax.random.fold_in(kck, 1))
                    stats = stats.at[MV_NUBAR].add(jnp.stack([p, a]))
                state, (p, a) = clock_moves.brate_move(
                    ctx, cfg, state, jax.random.fold_in(kck, 2))
            else:
                state, (p, a) = clock_moves.brate_simple_move(
                    ctx, cfg, state, jax.random.fold_in(kck, 2))
            stats = stats.at[MV_BRATE].add(jnp.stack([p, a]))

        # move #16: trait branch rates (method.c:5838, morph.c:1177)
        if ctx.trait_fn is not None or ctx.trait_fn_topo is not None:
            from .state import MV_TRAIT
            from . import trait_moves
            state, (p, a) = trait_moves.trait_brate_move(
                ctx, cfg, state, jax.random.fold_in(keys[9], 1))
            stats = stats.at[MV_TRAIT].add(jnp.stack([p, a]))

        # float32 ties (rubber-band maps collapsing parent-child gaps
        # below one ulp) are tolerated rather than repaired: the
        # age-sorted traversal breaks ties by depth (inner_order) and
        # the age move skips degenerate windows, so the next proposal
        # separates them again
        return state, stats

    def _step_mig(self, state: McmcState, keys, stats, ctx=None):
        """MSC-M move schedule (method.c order with migration variants)."""
        from . import mig_moves, subst_moves
        from .state import MV_MIG_AGES, MV_MIGRATES
        cfg, routes = self.cfg, self.routes
        if ctx is None:
            ctx = self.ctx

        # move #0a: rjMCMC split/join under the IM model (A10 x MSC-M;
        # method.c:5420-5435 with prop_rj.c's migration-aware density)
        if cfg.est_delimit:
            from . import rj_moves
            state, (p, a) = rj_moves.rj_move(ctx, cfg, state, keys[9],
                                             self.root_age0, routes=routes)
            stats = stats.at[MV_RJ].add(jnp.stack([p, a]))

        # usedata = 2 freezes gene trees, migration-event ages and taus
        # (method.c:5490,5515,5524,5572 skip under opt_usedata_fix_gtree)
        if not cfg.usedata_fix_gtree:
            state, (p, a) = mig_moves.age_block_mig(ctx, cfg, routes, state,
                                                    keys[0])
            stats = stats.at[MV_GTAGE].add(jnp.stack([p, a]))

            state, (p, a) = mig_moves.migevent_age_move(
                ctx, cfg, routes, state, jax.random.fold_in(keys[0], 1))
            stats = stats.at[MV_MIG_AGES].add(jnp.stack([p, a]))

            def _spr_round_mig(st, r):
                st, pa = mig_moves.spr_sim_move(
                    ctx, cfg, routes, st, jax.random.fold_in(keys[1], r))
                return st, jnp.stack(pa)

            state, pa3 = jax.lax.scan(_spr_round_mig, state,
                                      jnp.arange(3))
            stats = stats.at[MV_GTSPR].add(pa3.sum(0))

        state, (p, a) = mig_moves.theta_move_mig(ctx, cfg, routes, state,
                                                 keys[2])
        stats = stats.at[MV_THETA].add(jnp.stack([p, a]))

        if not cfg.usedata_fix_gtree:
            state, (p, a) = mig_moves.tau_move_mig(ctx, cfg, routes, state,
                                                   keys[3])
            stats = stats.at[MV_TAU].add(jnp.stack([p, a]))

        state, (p, a) = mig_moves.migrate_move(
            ctx, cfg, routes, state, jax.random.fold_in(keys[3], 1))
        stats = stats.at[MV_MIGRATES].add(jnp.stack([p, a]))

        # variable-rates routes (am > 0): per-locus Mi slides + the
        # Mbar hyper-rate slide (prop_mig_vrates stree.c:11932,
        # migrate_mbar_slide stree.c:11676)
        if (routes.am > 0).any():
            state, (p, a) = mig_moves.mig_vrates_move(
                ctx, cfg, routes, state, jax.random.fold_in(keys[3], 2))
            stats = stats.at[MV_MIGRATES].add(jnp.stack([p, a]))
            state, (p, a) = mig_moves.mig_mbar_move(
                ctx, cfg, routes, state, jax.random.fold_in(keys[3], 3))
            stats = stats.at[MV_MIGRATES].add(jnp.stack([p, a]))

        if not cfg.usedata_fix_gtree:
            state, (p, a) = mig_moves.mixing_mig(ctx, cfg, routes, state,
                                                 keys[4])
            stats = stats.at[MV_MIX].add(jnp.stack([p, a]))

        # move #10: geneflow rjMCMC — flip then add/remove
        # (method.c:5658-5695 order)
        if cfg.geneflow:
            from .state import MV_GFRJ
            kgf = jax.random.fold_in(keys[4], 11)
            state, (p, a) = mig_moves.geneflow_flip_move(
                ctx, cfg, routes, state, kgf)
            stats = stats.at[MV_GFRJ].add(jnp.stack([p, a]))
            state, (p, a) = mig_moves.geneflow_rj_move(
                ctx, cfg, routes, state, jax.random.fold_in(kgf, 1))
            stats = stats.at[MV_GFRJ].add(jnp.stack([p, a]))

        if cfg.model in subst_moves.FREQS_MODELS or (
                ctx.custom is not None and ctx.custom.any_freqs):
            state, (p, a) = subst_moves.freqs_move(ctx, cfg, state, keys[6])
            stats = stats.at[MV_FREQS].add(jnp.stack([p, a]))
        if cfg.model in subst_moves.QRATES_COUNT or (
                ctx.custom is not None and ctx.custom.q_slots):
            state, (p, a) = subst_moves.qrates_move(
                ctx, cfg, state, jax.random.fold_in(keys[6], 1))
            stats = stats.at[MV_QRATES].add(jnp.stack([p, a]))
        if cfg.alphaprior is not None:
            state, (p, a) = subst_moves.alpha_move(ctx, cfg, state, keys[7])
            stats = stats.at[MV_ALPHA].add(jnp.stack([p, a]))
        if cfg.est_locusrate == 1 and cfg.locusrate_prior == 3:
            state, (p, a) = subst_moves.locusrate_move(ctx, cfg, state,
                                                       keys[5])
            stats = stats.at[MV_LRHT].add(jnp.stack([p, a]))
        if cfg.est_heredity == 1:
            state, (p, a) = mig_moves.heredity_move_mig(
                ctx, cfg, routes, state, jax.random.fold_in(keys[5], 1))
            stats = stats.at[MV_LRHT].add(jnp.stack([p, a]))

        # locus mu_i (hierarchical/GammaDir) + relaxed-clock moves under
        # migration (method.c:5745-5835; the logl path routes branch
        # lengths through the migration-aware sub-edge sweep)
        from ..config import Clock
        if cfg.est_locusrate == 1 and cfg.locusrate_prior in (0, 1):
            from . import clock_moves
            kmu = jax.random.fold_in(keys[5], 7)
            state, (p, a) = clock_moves.mui_move(ctx, cfg, state, kmu)
            stats = stats.at[MV_MUI].add(jnp.stack([p, a]))
            if cfg.locusrate_prior == 1 and cfg.locusrate_mubar_est:
                state, (p, a) = clock_moves.mubar_move(
                    ctx, cfg, state, jax.random.fold_in(kmu, 1))
                stats = stats.at[MV_MUBAR].add(jnp.stack([p, a]))
        if cfg.clock != Clock.GLOBAL:
            from . import clock_moves
            kck = jax.random.fold_in(keys[5], 8)
            if cfg.clock != Clock.SIMPLE:
                state, (p, a) = clock_moves.nui_move(ctx, cfg, state, kck)
                stats = stats.at[MV_NUI].add(jnp.stack([p, a]))
                if cfg.locusrate_prior == 1:
                    state, (p, a) = clock_moves.nubar_move(
                        ctx, cfg, state, jax.random.fold_in(kck, 1))
                    stats = stats.at[MV_NUBAR].add(jnp.stack([p, a]))
                state, (p, a) = clock_moves.brate_move(
                    ctx, cfg, state, jax.random.fold_in(kck, 2))
            else:
                state, (p, a) = clock_moves.brate_simple_move(
                    ctx, cfg, state, jax.random.fold_in(kck, 2))
            stats = stats.at[MV_BRATE].add(jnp.stack([p, a]))

        # move #16: trait branch rates (method.c:5838) — trait logl
        # depends on the taus only, so it composes with migration
        if ctx.trait_fn is not None:
            from .state import MV_TRAIT
            from . import trait_moves
            state, (p, a) = trait_moves.trait_brate_move(
                ctx, cfg, state, jax.random.fold_in(keys[9], 1))
            stats = stats.at[MV_TRAIT].add(jnp.stack([p, a]))

        return state, stats

    def step(self, state: McmcState, key):
        return self._step_jit(state, key, self.ctx)

    def a1b1_stats(self, state: McmcState):
        """Per-sample conditional posterior params (log_a1b1,
        method.c:4829): theta_h | G ~ InvG(a + K_h, b + C_h) (or the
        gamma-approximated conditional under a gamma prior), and
        M_k | G ~ Gamma(alpha + mc_k, beta + W_k) under migration.

        Returns (a1 [H], b1 [H], wa1 [K]|None, wb1 [K]|None).
        """
        if not hasattr(self, "_a1b1_jit"):
            from ..config import PriorDist
            cfg = self.cfg
            a, b = cfg.thetaprior.alpha, cfg.thetaprior.beta
            gamma_prior = cfg.thetaprior.dist == PriorDist.GAMMA

            def fn(state):
                mask = self.ctx.locus_mask[:, None]
                if cfg.migration:
                    from .mig_moves import make_logpr_fn_mig
                    _, c, t2, W, mc, _ = make_logpr_fn_mig(
                        self.ctx, self.routes)(state.gt, state.sp,
                                               state.mig,
                                               state.subst.heredity)
                else:
                    _, c, t2 = self._logpr_fn(state.gt, state.sp,
                                              state.subst.heredity)
                    W = mc = None
                ksum = jnp.sum(jnp.where(mask, c, 0), axis=0).astype(
                    t2.dtype)
                csum = jnp.sum(jnp.where(
                    mask, t2 / state.subst.heredity[:, None], 0.0), axis=0)
                if self.ctx.theta_link is not None:
                    link = self.ctx.theta_link
                    ksum = jnp.zeros_like(ksum).at[link].add(ksum)[link]
                    csum = jnp.zeros_like(csum).at[link].add(csum)[link]
                if gamma_prior:
                    from .gibbs import gamma_conditional_approx
                    a1, b1 = gamma_conditional_approx(a, b, ksum, csum,
                                                      invgamma_proposal=False)
                else:
                    a1, b1 = a + ksum, b + csum
                if W is not None:
                    wa1 = jnp.asarray(self.routes.alpha, W.dtype) + jnp.sum(
                        jnp.where(mask, mc, 0), axis=0)
                    wb1 = jnp.asarray(self.routes.beta, W.dtype) + jnp.sum(
                        jnp.where(mask, W, 0.0), axis=0)
                else:
                    wa1 = wb1 = None
                return a1, b1, wa1, wb1

            self._a1b1_jit = jax.jit(fn)
        return self._a1b1_jit(state)

    def validate_state(self, state: McmcState, it=None):
        """Runtime invariant mode (``check = N [tol]``): recompute every
        cached per-locus quantity from scratch through the full
        independent path and hard-fail on drift.

        The moves maintain ``state.logl``/``state.logpr`` (and the
        notheta ``coal``/``t2h`` caches, trait logl) incrementally with
        where-selects and topology-cached shortcuts (the ``msp``
        fast path of make_logpr_fn); this check re-derives them the slow
        way, so a silently inconsistent accept would be caught here.
        User-visible analog of the reference's compile-time
        CHECK_LOGL/CHECK_LOGPR recomputation (method.c:4699 check_logl,
        debug.c:1688 debug_validate_logpg).
        """
        cfg = self.cfg
        tol = cfg.check_tol or (
            1e-6 if self.dtype == jnp.float64 else 0.5)
        mask = np.asarray(self.ctx.locus_mask)
        where = f" at iteration {it}" if it is not None else ""

        def cmp(what, cached, fresh):
            c = np.asarray(cached, np.float64)
            f = np.asarray(fresh, np.float64)
            m = mask.reshape((-1,) + (1,) * (c.ndim - 1))
            d = np.abs(np.where(m, c - f, 0.0))
            bad = ~np.isfinite(np.where(m, c, 0.0)).all() or (d > tol).any()
            if not bad:
                return
            per_locus = d.reshape(len(mask), -1).max(axis=1)
            worst = int(np.argmax(per_locus))
            raise RuntimeError(
                f"check{where}: cached {what} drifted from full "
                f"recompute (max |delta| = {d.max():.6g} > tol {tol:g}, "
                f"worst locus {worst}: cached "
                f"{c.reshape(len(mask), -1)[worst][:4]} fresh "
                f"{f.reshape(len(mask), -1)[worst][:4]})")

        logl2 = self._logl_fn(state.gt, state.subst, sp=state.sp,
                              clock=state.clock, mig=state.mig)
        cmp("logl", state.logl, logl2)

        if cfg.migration:
            out = self._logpr_mig_jit(state.gt, state.sp, state.mig,
                                      state.subst.heredity)
            cmp("logpr (MSC-M density)", state.logpr, out[0])
        else:
            lp2, c2, t22 = self._logpr_fn(state.gt, state.sp,
                                          state.subst.heredity)
            cmp("logpr (MSC density)", state.logpr, lp2)
            if cfg.theta_integrated:
                cmp("coal counts (notheta K cache)", state.coal, c2)
                cmp("T2h sums (notheta C cache)", state.t2h, t22)

        if state.trait is not None:
            sp = state.sp
            fresh = (self.ctx.trait_fn(sp.tau, state.trait.brate)
                     if self.ctx.trait_fn is not None else
                     self.ctx.trait_fn_topo(sp.left, sp.right, sp.parent,
                                            sp.tau, state.trait.brate))
            d = np.abs(np.asarray(state.trait.logl) - np.asarray(fresh))
            if (d > tol).any():
                raise RuntimeError(
                    f"check{where}: cached trait logl drifted "
                    f"(max |delta| = {d.max():.6g} > tol {tol:g})")
        return True

    def _trace_of(self, state: McmcState):
        """Small per-iteration sample record (device): everything the
        sample log / mcmc.txt needs except per-locus dumps.  Stacked by
        the chunk scan so one device dispatch can cover MANY sample
        points (the reference logs on host every sampfreq iterations;
        over a remote TPU tunnel that dispatch cadence dominates)."""
        tr = {"theta": state.sp.theta, "tau": state.sp.tau,
              "lnl": jnp.sum(state.logl), "logpr": jnp.sum(state.logpr)}
        if state.sp.phi is not None:
            tr["phi"] = state.sp.phi
        if state.mig is not None:
            M = state.mig.M
            if state.mig.on is not None:
                M = jnp.where(state.mig.on, M, 0.0)
            tr["migM"] = M
        if state.mubar is not None:
            tr["mubar"] = state.mubar
        if self.cfg.est_stree:
            tr["sp_left"] = state.sp.left
            tr["sp_right"] = state.sp.right
            tr["sp_parent"] = state.sp.parent
        return tr

    def _chunk(self, state: McmcState, key, n: int, ctx=None):
        """n MCMC iterations in one jitted scan (amortizes dispatch/sync:
        the per-iteration host round trip dominates on a TPU tunnel).
        Returns (state, stats, trace) with trace leaves stacked [n, ...]."""

        def body(carry, sub):
            st, acc = carry
            st, stats = self._step(st, sub, ctx)
            return (st, acc + stats), self._trace_of(st)

        (state, stats), trace = jax.lax.scan(
            body, (state, jnp.zeros((N_MOVES, 2), jnp.int32)),
            jax.random.split(key, n))
        return state, stats, trace

    def chunk_step(self, state: McmcState, key, n: int):
        state, stats, _ = self._chunk_jit(state, key, n, self.ctx)
        return state, stats

    def chunk_step_traced(self, state: McmcState, key, n: int):
        """(state, stats, trace) — trace leaves stacked [n, ...]."""
        return self._chunk_jit(state, key, n, self.ctx)

    # --- full run -------------------------------------------------------------

    def run_mcmc(self, progress_every: int = 1000, log_fp=None,
                 on_sample=None, resume=None,
                 on_checkpoint=None, mesh=None) -> SampleLog:
        """Run the chain.  ``resume = (state, key, it, stats_acc)``
        continues from a checkpoint; ``on_checkpoint(state, key, it,
        stats_acc)`` fires at the ctl-scheduled generations
        (``checkpoint = initial [step]``, method.c:6183-6188).

        ``mesh``: optional jax.sharding.Mesh — shard the locus axis of
        all run state over it before stepping (single- or multi-process;
        see parallel.multihost)."""
        cfg = self.cfg
        if resume is None:
            state = self.init_state()
            key = jax.random.PRNGKey(self.seed)
            it0 = -cfg.burnin
            stats_acc = np.zeros((N_MOVES, 2), np.float64)
        else:
            self.init_state()         # rebuilds host stree + root_age0
            state, key, it0, stats_acc = resume
            stats_acc = np.asarray(stats_acc, np.float64).copy()
        if mesh is not None:
            from ..parallel.multihost import shard_global_pytree
            L = int(self.ctx.locus_mask.shape[0])
            if self.ctx.pack is not None:
                # pack arrays have no leading-L axis, so they cannot be
                # locus-sharded; indexing them per locus would all-gather
                # the dominant likelihood work onto every device.  Mesh
                # runs drop the pack and ride the locus-sharded per-locus
                # kernel / XLA path instead.
                import dataclasses as _dc
                self.ctx = _dc.replace(
                    self.ctx, pack=None,
                    tips_am=self._build_tips_am(self.ctx.tip_partials))
            # ctx rides into the jitted step as an argument, so global
            # (multi-process) sharded arrays are legal here
            self.ctx = shard_global_pytree(self.ctx, mesh, L)
            state = shard_global_pytree(state, mesh, L)
        log = SampleLog()

        total_burn = cfg.burnin
        t0 = time.time()
        last_print = [0]

        # checkpoint generations count like the reference: generation 1
        # is the first post-burnin iteration; negative = burn-in
        if cfg.checkpoint:
            ck_initial, ck_step = cfg.checkpoint
            next_ck = [ck_initial]

            def maybe_checkpoint(it, state, key):
                if on_checkpoint is None or it < next_ck[0]:
                    return
                on_checkpoint(state, key, it, stats_acc)
                next_ck[0] = (it + ck_step) if ck_step > 0 else (1 << 60)
        else:
            def maybe_checkpoint(it, state, key):
                pass

        # runtime invariant mode (check = N): validate at every Nth
        # iteration, counting from the start of burn-in
        chk_n = cfg.check_every
        next_chk = [it0 + chk_n] if chk_n > 0 else [1 << 60]

        def maybe_check(it, state):
            if it < next_chk[0]:
                return
            self.validate_state(state, it=it)
            print(f"  check at it {it:>8d}: caches consistent",
                  file=log_fp or sys.stderr)
            next_chk[0] = it + chk_n

        def progress(it):
            if not progress_every:
                return
            if it - last_print[0] < progress_every and it != 0:
                return
            last_print[0] = it
            with np.errstate(invalid="ignore", divide="ignore"):
                pj = stats_acc[:, 1] / np.maximum(stats_acc[:, 0], 1)
            msg = (f"  it {it:>8d}  lnL "
                   f"{float(jnp.sum(state.logl)):.4f}"
                   f"  pjump " + " ".join(f"{x:.2f}" for x in pj[:5])
                   + f"  [{time.time()-t0:.1f}s]")
            print(msg, file=log_fp or sys.stderr)

        # Position-based loop so a resume can start at any iteration.
        # Chunk boundaries: finetune marks, it = 0, checkpoint
        # generations, end of run.  Without a per-sample host callback
        # the on-device trace carries the samples, so one dispatch can
        # span MANY sample points (over the remote TPU tunnel the
        # per-dispatch overhead would otherwise dominate at small
        # sampfreq); a callback (per-locus file logging, a1b1) forces
        # the legacy one-sample-per-chunk cadence because it needs the
        # full state at each sample generation.
        K = max(1, cfg.sampfreq)
        total_main = cfg.nsample * cfg.sampfreq
        auto_ft = cfg.finetune.auto and total_burn >= 8
        quarter = max(1, total_burn // 4)
        # finetune marks at it = -burn + q*quarter (q = 1..3) and at 0
        marks = sorted({-total_burn + q * quarter for q in (1, 2, 3)}
                       | {0}) if auto_ft else [0]
        fast = on_sample is None
        ch_max = 500 if fast else K

        def log_row(g, row):
            log.gen.append(g)
            log.theta.append(np.asarray(row["theta"]))
            log.tau.append(np.asarray(row["tau"]))
            log.lnL.append(float(row["lnl"]))
            log.logpr.append(float(row["logpr"]))
            if "phi" in row:
                log.phi.append(np.asarray(row["phi"]))
            if "migM" in row:
                log.migM.append(np.asarray(row["migM"]))
            if "mubar" in row:
                log.mubar.append(float(row["mubar"]))
            if "sp_left" in row:
                log.sptrees.append((np.asarray(row["sp_left"]),
                                    np.asarray(row["sp_right"]),
                                    np.asarray(row["sp_parent"])))

        it = it0
        while it < total_main:
            bounds = [m for m in marks if m > it]
            if not fast and it >= 0:
                bounds.append(((it // K) + 1) * K)
            if cfg.checkpoint and on_checkpoint is not None \
                    and next_ck[0] > it:
                bounds.append(next_ck[0])
            if chk_n > 0 and next_chk[0] > it:
                bounds.append(next_chk[0])
            bounds.append(total_main)
            n = max(1, min(ch_max, min(bounds) - it))
            key, sub = jax.random.split(key)
            state, stats, trace = self.chunk_step_traced(state, sub, n)
            stats_acc += np.asarray(stats)
            prev = it
            it += n
            progress(it)
            if auto_ft and it in marks and it <= 0:
                state = self._reset_finetune(state, stats_acc)
                stats_acc[:] = 0.0
            # sample generations inside (prev, it]
            first = K * (max(prev, 0) // K + 1)
            if first <= it:
                # device -> host once per chunk (trace leaves are
                # replicated: valid under multi-process sharding too)
                htr = {k: np.asarray(v) for k, v in trace.items()}
                for g in range(first, it + 1, K):
                    if g <= prev:
                        continue
                    row = {k: v[g - prev - 1] for k, v in htr.items()}
                    log_row(g, row)
                    if on_sample is not None:
                        # legacy cadence: the chunk ends exactly at g
                        assert g == it
                        on_sample(g, state)
            maybe_check(it, state)
            maybe_checkpoint(it, state, key)

        return log

    # --- multi-chain batching (OUR extension; no reference analog) ------------

    def init_states(self, n_chains: int) -> McmcState:
        """K independent chain states stacked on a leading axis.

        Chains differ by seed only (reference users run replicate
        chains as separate processes; a TPU runs them batched nearly
        for free on small-to-mid locus counts)."""
        base = self.seed
        states = []
        try:
            for k in range(n_chains):
                self.seed = base + 1000003 * k
                states.append(self.init_state())
        finally:
            self.seed = base
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def _chunk_multi(self, states, key, n: int, ctx):
        keys = jax.random.split(key, states.logl.shape[0])
        return jax.vmap(lambda st, k: self._chunk(st, k, n, ctx))(
            states, keys)

    def run_mcmc_multi(self, n_chains: int, progress_every: int = 1000,
                       log_fp=None, resume=None, on_checkpoint=None):
        """Run K chains batched on one chip; returns a list of K
        SampleLogs.  Per-chain finetune auto-tuning mirrors the
        single-chain schedule; per-locus sample callbacks and the check
        mode are single-chain features (use chains = 1).

        ``resume = (states, key, it, stats_acc, logs)`` continues a
        batch from a checkpoint; ``on_checkpoint(states, key, it,
        stats_acc, logs)`` fires at the ctl-scheduled generations —
        the batch's sample history rides in the checkpoint (files are
        only written at the end of the run, so exactly-once output
        needs no offset truncation here)."""
        cfg = self.cfg
        if not hasattr(self, "_chunk_multi_jit"):
            self._chunk_multi_jit = jax.jit(self._chunk_multi,
                                            static_argnums=2)
        if resume is not None:
            states, key, it, stats_acc, logs = resume
            self.init_state()          # rebuilds host stree + root_age0
            stats_acc = np.asarray(stats_acc, np.float64).copy()
        else:
            states = self.init_states(n_chains)
            key = jax.random.PRNGKey(self.seed ^ 0x5eed)
            it = -cfg.burnin
            stats_acc = np.zeros((n_chains, N_MOVES, 2), np.float64)
            logs = [SampleLog() for _ in range(n_chains)]
        if cfg.checkpoint and on_checkpoint is not None:
            ck_initial, ck_step = cfg.checkpoint
            next_ck = [ck_initial if it < ck_initial else
                       (it + ck_step if ck_step > 0 else (1 << 60))]
        else:
            next_ck = [1 << 60]
        total_burn = cfg.burnin
        total_main = cfg.nsample * cfg.sampfreq
        auto_ft = cfg.finetune.auto and total_burn >= 8
        quarter = max(1, total_burn // 4)
        marks = sorted({-total_burn + q * quarter for q in (1, 2, 3)}
                       | {0}) if auto_ft else [0]
        K = max(1, cfg.sampfreq)
        t0 = time.time()
        last_print = [0]
        while it < total_main:
            # chunk boundaries: finetune marks AND the next checkpoint
            # generation, so checkpoints land exactly at their scheduled
            # gens (making resume bit-reproduce the uninterrupted run —
            # the chunk sizes, hence the PRNG key chain, match)
            bounds = [m for m in marks if m > it] \
                + ([next_ck[0]] if it < next_ck[0] <= total_main else []) \
                + [total_main]
            n = max(1, min(500, min(bounds) - it))
            key, sub = jax.random.split(key)
            states, stats, trace = self._chunk_multi_jit(
                states, sub, n, self.ctx)
            stats_acc += np.asarray(stats)
            prev = it
            it += n
            if progress_every and (it - last_print[0] >= progress_every
                                   or it == 0):
                last_print[0] = it
                print(f"  it {it:>8d} x{n_chains} chains  lnL "
                      f"{float(jnp.sum(states.logl[0])):.4f}  "
                      f"[{time.time()-t0:.1f}s]", file=log_fp or sys.stderr)
            if auto_ft and it in marks and it <= 0:
                ft = np.array(states.finetune)
                for c in range(n_chains):
                    for mv, fti in MOVE_TO_FT.items():
                        prop, acc = stats_acc[c, mv]
                        if prop >= 30:
                            ft[c, fti] = reset_finetune_onestep(
                                acc / prop, ft[c, fti])
                states = states._replace(
                    finetune=jnp.asarray(ft, self.dtype))
                stats_acc[:] = 0.0
            first = K * (max(prev, 0) // K + 1)
            if first <= it:
                htr = {k: np.asarray(v) for k, v in trace.items()}
                for g in range(first, it + 1, K):
                    if g <= prev:
                        continue
                    for c in range(n_chains):
                        row = {k: v[c, g - prev - 1] for k, v in htr.items()}
                        log = logs[c]
                        log.gen.append(g)
                        log.theta.append(np.asarray(row["theta"]))
                        log.tau.append(np.asarray(row["tau"]))
                        log.lnL.append(float(row["lnl"]))
                        log.logpr.append(float(row["logpr"]))
                        if "phi" in row:
                            log.phi.append(np.asarray(row["phi"]))
                        if "migM" in row:
                            log.migM.append(np.asarray(row["migM"]))
                        if "mubar" in row:
                            log.mubar.append(float(row["mubar"]))
            if it >= next_ck[0]:
                on_checkpoint(states, key, it, stats_acc, logs)
                ck_step = cfg.checkpoint[1]
                next_ck[0] = (it + ck_step) if ck_step > 0 else (1 << 60)
        return logs

    def _reset_finetune(self, state: McmcState, stats_acc) -> McmcState:
        ft = np.array(state.finetune)
        for mv, fti in MOVE_TO_FT.items():
            prop, acc = stats_acc[mv]
            # too few proposals (short burn-in quarters) make the pjump
            # estimate useless and can drive eps to an extreme
            if prop >= 30:
                ft[fti] = reset_finetune_onestep(acc / prop, ft[fti])
        return state._replace(finetune=jnp.asarray(ft, self.dtype))
