"""Run outputs: mcmc.txt sample log and the A00 summary report.

Matches the reference's file layout (``src/method.c``
``mcmc_printheader:1851`` / ``mcmc_logsample:2339``): tab-separated
``Gen  theta:i:label ...  tau:i:label ...  lnL`` with BPP's node
numbering (tips 1..NS in control-file order; inner nodes numbered
pre-order from the root, which gets index NS+1).
"""

from __future__ import annotations

import numpy as np

from .config import BppConfig, Method
from .summary.allfixed import format_summary, summary_table
from .trees.stree import SpeciesTree


def bpp_inner_order(st: SpeciesTree) -> list[int]:
    """Inner nodes in BPP output order: pre-order from the root."""
    order = []

    def rec(i: int):
        if st.left[i] == -1:
            return
        order.append(i)
        rec(st.left[i])
        rec(st.right[i])

    if st.n_tips > 1:
        rec(st.root)
    return order


def node_label(st: SpeciesTree, i: int) -> str:
    if i < st.n_tips:
        return st.names[i]
    tips = [t for t in range(st.n_tips) if st.pptable()[t, i]]
    return ",".join(st.names[t] for t in sorted(tips))


class McmcWriter:
    """Streams samples to <jobname>.mcmc.txt in the reference layout."""

    def __init__(self, path: str, cfg: BppConfig, st: SpeciesTree):
        self.cfg = cfg
        self.st = st
        self.fp = open(path, "w")
        self.inner = bpp_inner_order(st)
        self._anc = st.pptable()
        # node output order: all nodes with theta (tips then inner pre-order)
        self.theta_nodes = list(range(st.n_tips)) + self.inner
        self.tau_nodes = list(self.inner)
        self._write_header()

    def _bpp_index(self, i: int) -> int:
        """1-based output index: tips keep their index; inner nodes are
        numbered NS+1.. in pre-order."""
        if i < self.st.n_tips:
            return i + 1
        return self.st.n_tips + 1 + self.inner.index(i)

    def _label(self, i: int) -> str:
        if i < self.st.n_tips:
            return self.st.names[i]
        tips = [t for t in range(self.st.n_tips) if self._anc[t, i]]
        return ",".join(self.st.names[t] for t in sorted(tips))

    def _write_header(self):
        cols = ["Gen"]
        for i in self.theta_nodes:
            cols.append(f"theta:{self._bpp_index(i)}:{self._label(i)}")
        for i in self.tau_nodes:
            cols.append(f"tau:{self._bpp_index(i)}:{self._label(i)}")
        cols.append("lnL")
        self.fp.write("\t".join(cols) + "\n")
        self.columns = cols

    def write_sample(self, gen: int, theta: np.ndarray, tau: np.ndarray,
                     lnl: float):
        vals = [str(gen)]
        vals += [f"{theta[i]:.6f}" for i in self.theta_nodes]
        vals += [f"{tau[i]:.6f}" for i in self.tau_nodes]
        vals.append(f"{lnl:.3f}")
        self.fp.write("\t".join(vals) + "\n")

    def close(self):
        self.fp.close()


def species_newick(left, right, parent, tau, names) -> str:
    """Newick with branch lengths from taus (A01 sample lines,
    method.c mcmc_logsample tree output)."""
    ns = len(names)
    root = int(np.nonzero(np.asarray(parent) < 0)[0][0])

    def rec(i):
        if i < ns:
            s = names[i]
            h = 0.0
        else:
            a, ha = rec(int(left[i]))
            b, hb = rec(int(right[i]))
            s = f"({a}, {b})"
            h = float(tau[i])
            s_a, s_b = sorted([f"{a}", f"{b}"])
            s = f"({s_a}, {s_b})"
        p = int(parent[i])
        if p >= 0:
            s += f": {float(tau[p]) - h:.6f}"
        return s, h

    return rec(root)[0] + ";"


class A01McmcWriter:
    """Streams A01 samples: one newick per line (mcmc_logsample)."""

    def __init__(self, path: str, cfg: BppConfig, st: SpeciesTree):
        self.fp = open(path, "w")
        self.names = st.names

    def write_sample(self, gen, left, right, parent, tau):
        self.fp.write(species_newick(left, right, parent, tau,
                                     self.names) + "\n")

    def close(self):
        self.fp.close()


def a00_summary(cfg: BppConfig, st: SpeciesTree, gen, theta, tau, lnl) -> str:
    """Posterior summary text for an A00 run (allfixed.c analog)."""
    inner = bpp_inner_order(st)
    cols: dict[str, np.ndarray] = {}
    order = list(range(st.n_tips)) + inner
    for pos, i in enumerate(order):
        idx = i + 1 if i < st.n_tips else st.n_tips + 1 + inner.index(i)
        cols[f"theta:{idx}"] = theta[:, i]
    for i in inner:
        if tau[:, i].max() > 0:
            cols[f"tau:{st.n_tips + 1 + inner.index(i)}"] = tau[:, i]
    cols["lnL"] = np.asarray(lnl)
    return format_summary(summary_table(cols))
