"""Heredity x migration third referee (VERDICT r3 missing #5).

Tiny exactly-integrable IM case: 2 species (A, B), one forward
migration route A->B (backward: the B lineage jumps to A at rate M),
2 sequences per locus (one from each species), JC69, per-locus
heredity scalars from a file.  The pairwise coalescent-time density is
closed-form:

  t < tau :  f(t) = M cA (e^{-M t} - e^{-cA t}) / (cA - M),
             cA = 2 / (theta_A * h)
  t >= tau:  f(t) = S(tau) cR e^{-cR (t - tau)},
             cR = 2 / (theta_AB * h)

and the sequence likelihood depends only on the mismatch count k of n
sites: L(t) = ps(2t)^(n-k) pd(2t)^k with pd(b) = 3/4 (1 - e^{-4b/3}).
The exact posterior over (theta_A, theta_AB, tau, M) follows by
Gauss-Legendre quadrature in prior-quantile space; theta_B never
enters (the A-resident lineage cannot jump), so its posterior must
equal its prior in BOTH samplers - a built-in control.

Usage: python hm_oracle.py [gen|oracle]
"""
import os
import sys

import numpy as np
from scipy.stats import gamma as sgamma, invgamma

OUT = "/tmp/hmoracle"
TRUE = dict(theta_A=0.01, theta_AB=0.02, tau=0.02, M=1.0)
H = np.array([0.5, 1.5, 1.0, 2.0, 0.75, 1.25, 1.0, 0.5])
NSITES = 500
SEED = 20260820

# priors (ctl): thetaprior = 3 0.04 (invgamma, mean 0.02),
# tauprior = 3 0.04, wprior = 2 2 (gamma, mean 1)
TH_A, TH_B = 3.0, 0.04
TAU_A, TAU_B = 3.0, 0.04
W_A, W_B = 2.0, 2.0


def pd(b):
    return 0.75 * (1.0 - np.exp(-4.0 * b / 3.0))


def gen():
    rng = np.random.default_rng(SEED)
    os.makedirs(OUT, exist_ok=True)
    th_a, th_r, tau, M = (TRUE["theta_A"], TRUE["theta_AB"],
                          TRUE["tau"], TRUE["M"])
    ks, ts = [], []
    for h in H:
        cA = 2.0 / (th_a * h)
        cR = 2.0 / (th_r * h)
        s = rng.exponential(1.0 / M)
        t = np.inf
        if s < tau:
            t0 = s + rng.exponential(1.0 / cA)
            if t0 < tau:
                t = t0
        if not np.isfinite(t):
            t = tau + rng.exponential(1.0 / cR)
        k = rng.binomial(NSITES, pd(2.0 * t))
        ks.append(int(k))
        ts.append(float(t))
    print("true t:", [round(x, 4) for x in ts])
    print("k:", ks)
    NTS = "TCAG"
    with open(f"{OUT}/hm.phy", "w") as f:
        for k in ks:
            f.write(f"2 {NSITES}\n")
            s1 = rng.integers(0, 4, NSITES)
            s2 = s1.copy()
            pos = rng.choice(NSITES, k, replace=False)
            s2[pos] = (s1[pos] + rng.integers(1, 4, k)) % 4
            f.write("a^a1  " + "".join(NTS[x] for x in s1) + "\n")
            f.write("b^b1  " + "".join(NTS[x] for x in s2) + "\n\n")
    with open(f"{OUT}/Imap.txt", "w") as f:
        f.write("a1 A\nb1 B\n")
    with open(f"{OUT}/heredity.txt", "w") as f:
        f.write(" ".join(str(x) for x in H) + "\n")
    np.save(f"{OUT}/k.npy", np.array(ks))
    ctl = """\
seed = 101
seqfile = hm.phy
Imapfile = Imap.txt
jobname = {job}
species&tree = 2 A B
                 1 1
                (A, B);
usedata = 1
nloci = 8
cleandata = 0
model = 0
heredity = 2 heredity.txt
migration = 1
  A B
wprior = 2 2
thetaprior = 3 0.04
tauprior = 3 0.04
finetune = 1
print = 1 0 0 0
burnin = {burn}
sampfreq = {sf}
nsample = {ns}
"""
    with open(f"{OUT}/ours.ctl", "w") as f:
        f.write(ctl.format(job="ours", burn=8000, sf=2, ns=50000))
    with open(f"{OUT}/ref.ctl", "w") as f:
        f.write(ctl.format(job="ref", burn=8000, sf=2, ns=50000))
    print("wrote", OUT)


def likelihood_t(t, k):
    b = 2.0 * t
    p = pd(b)
    return np.exp((NSITES - k) * np.log1p(-p) + k * np.log(np.maximum(p, 1e-300)))


def oracle2(nq=32, nt=400):
    """Posterior means by straightforward log-domain quadrature."""
    ks = np.load(f"{OUT}/k.npy")
    x, w = np.polynomial.legendre.leggauss(nq)
    u = 0.5 * (x + 1.0)
    wq = 0.5 * w
    th_a = invgamma.ppf(u, TH_A, scale=TH_B)
    th_r = invgamma.ppf(u, TH_A, scale=TH_B)
    tau = invgamma.ppf(u, TAU_A, scale=TAU_B)
    M = sgamma.ppf(u, W_A, scale=1.0 / W_B)

    loglik = np.zeros((nq, nq, nq, nq))    # [a, r, tau, M]
    for it, tv in enumerate(tau):
        t1 = np.linspace(1e-9, tv, nt)
        for im, Mv in enumerate(M):
            ll = np.zeros((nq, nq))
            for k, h in zip(ks, H):
                cA = 2.0 / (th_a * h)
                cR = 2.0 / (th_r * h)
                d = cA[:, None] - Mv
                f1 = Mv * cA[:, None] * (
                    np.exp(-Mv * t1[None, :])
                    - np.exp(-cA[:, None] * t1[None, :])) / d
                L1 = likelihood_t(t1, k)
                I1 = np.trapezoid(f1 * L1[None, :], t1, axis=1)
                S = np.clip(1.0 - np.trapezoid(f1, t1, axis=1), 0.0, 1.0)
                e2u = np.linspace(0.0, 12.0, nt)
                e2 = e2u[None, :] / cR[:, None]
                f2 = np.exp(-e2u)[None, :]          # cR de cancels in e2u
                I2 = np.trapezoid(f2 * likelihood_t(tv + e2, k),
                                  e2u, axis=1)
                Il = I1[:, None] + S[:, None] * I2[None, :]
                ll += np.log(np.maximum(Il, 1e-300))
            loglik[:, :, it, im] = ll
    wgrid = (wq[:, None, None, None] * wq[None, :, None, None]
             * wq[None, None, :, None] * wq[None, None, None, :])
    lw = loglik + np.log(wgrid)
    lw -= lw.max()
    pw = np.exp(lw)
    Z = pw.sum()

    def pmean(vals, axis):
        shape = [1, 1, 1, 1]
        shape[axis] = nq
        return float((pw * vals.reshape(shape)).sum() / Z)

    print(f"oracle posterior means (nq={nq}, nt={nt}):")
    print(f"  theta_A  {pmean(th_a, 0):.6f}")
    print(f"  theta_AB {pmean(th_r, 1):.6f}")
    print(f"  tau      {pmean(tau, 2):.6f}")
    print(f"  W (M)    {pmean(M, 3):.6f}")


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen()
    elif sys.argv[1] == "oracle":
        oracle2(*(int(a) for a in sys.argv[2:]))
