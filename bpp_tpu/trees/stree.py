"""Species tree: host-side structure + replicated device arrays.

TPU-native counterpart of the reference's ``stree_t``/``snode_t``
(``src/bpp.h:627-681``; built by ``stree_init`` ``src/stree.c:3095``).
Instead of pointer nodes, the tree is a set of small index arrays:

  * node indexing: tips ``0..NS-1`` (order of the ``species&tree``
    control line), inner nodes ``NS..2NS-2``; the root is always the
    last index.
  * ``pptable[i, j]`` — True iff ``j`` is on the path from ``i`` to the
    root, including ``i==j`` (mirrors ``stree.c:2840``).
  * ``mrca[i, j]`` — species-MRCA lookup used to re-derive gene-node
    population assignments from ages alone (no event bookkeeping).

The species tree is tiny (tens of nodes) and replicated on every
device; only per-locus gene trees shard.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.newick import Node, parse_newick


@dataclass
class SpeciesTree:
    names: list[str]                 # tip labels, index = tip id
    left: np.ndarray                 # [NSt] int32, -1 for tips
    right: np.ndarray                # [NSt] int32
    parent: np.ndarray               # [NSt] int32, -1 for root
    tau: np.ndarray                  # [NSt] float64, 0 for tips
    theta: np.ndarray                # [NSt] float64

    @property
    def n_tips(self) -> int:
        return len(self.names)

    @property
    def n_nodes(self) -> int:
        return len(self.parent)

    @property
    def root(self) -> int:
        return self.n_nodes - 1

    # --- construction --------------------------------------------------------

    @classmethod
    def from_newick(cls, newick: str, tip_order: list[str] | None = None
                    ) -> "SpeciesTree":
        root = parse_newick(newick)
        return cls.from_node(root, tip_order)

    @classmethod
    def from_node(cls, root: Node, tip_order: list[str] | None = None
                  ) -> "SpeciesTree":
        leaves = root.leaves()
        labels = [n.label for n in leaves]
        if any(lab is None for lab in labels):
            raise ValueError("species tree has unlabeled tips")
        if tip_order is None:
            tip_order = labels
        if sorted(tip_order) != sorted(labels):
            raise ValueError(
                f"species&tree names {tip_order} do not match newick tips {labels}")
        ns = len(labels)
        nst = 2 * ns - 1
        left = np.full(nst, -1, dtype=np.int32)
        right = np.full(nst, -1, dtype=np.int32)
        parent = np.full(nst, -1, dtype=np.int32)
        tau = np.zeros(nst, dtype=np.float64)
        tip_id = {lab: i for i, lab in enumerate(tip_order)}

        next_inner = [ns]

        def assign(node: Node) -> int:
            if node.is_leaf:
                return tip_id[node.label]
            if len(node.children) != 2:
                raise ValueError("species tree must be binary (rooted)")
            li = assign(node.children[0])
            ri = assign(node.children[1])
            idx = next_inner[0]
            next_inner[0] += 1
            left[idx], right[idx] = li, ri
            parent[li] = parent[ri] = idx
            return idx

        ridx = assign(root)
        # make the root the last index by construction: a binary tree assigned
        # post-order always finishes at nst-1
        assert ridx == nst - 1
        return cls(names=list(tip_order), left=left, right=right,
                   parent=parent, tau=tau, theta=np.zeros(nst))

    @classmethod
    def single_population(cls, name: str) -> "SpeciesTree":
        return cls(names=[name],
                   left=np.array([-1], np.int32),
                   right=np.array([-1], np.int32),
                   parent=np.array([-1], np.int32),
                   tau=np.zeros(1), theta=np.zeros(1))

    # --- derived tables ------------------------------------------------------

    def pptable(self) -> np.ndarray:
        """anc[i, j] = True iff j is i or an ancestor of i (stree.c:2840)."""
        n = self.n_nodes
        anc = np.zeros((n, n), dtype=bool)
        for i in range(n):
            j = i
            while j != -1:
                anc[i, j] = True
                j = self.parent[j]
        return anc

    def mrca_table(self) -> np.ndarray:
        n = self.n_nodes
        anc = self.pptable()
        mrca = np.zeros((n, n), dtype=np.int32)
        # the mrca is the common ancestor with the smallest subtree; with the
        # post-order inner indexing, that is the minimum-index common ancestor
        # whose tau is minimal; compute directly by walking
        depth = np.zeros(n, dtype=np.int64)
        for i in range(n):
            j, d = i, 0
            while self.parent[j] != -1:
                j = self.parent[j]
                d += 1
            depth[i] = d
        for i in range(n):
            for j in range(n):
                a, b = i, j
                da, db = depth[a], depth[b]
                while da > db:
                    a = self.parent[a]
                    da -= 1
                while db > da:
                    b = self.parent[b]
                    db -= 1
                while a != b:
                    a = self.parent[a]
                    b = self.parent[b]
                mrca[i, j] = a
        del anc
        return mrca

    def postorder_inner(self) -> list[int]:
        order = []

        def rec(i: int):
            if self.left[i] != -1:
                rec(self.left[i])
                rec(self.right[i])
                order.append(i)
        rec(self.root)
        return order

    def newick(self, with_theta: bool = False) -> str:
        def rec(i: int) -> str:
            if self.left[i] == -1:
                s = self.names[i]
            else:
                s = f"({rec(self.left[i])}, {rec(self.right[i])}){self.label(i)}"
            if self.parent[i] != -1:
                blen = self.tau[self.parent[i]] - self.tau[i]
                s += f": {blen:.6f}"
            return s
        return rec(self.root) + ";"

    def label(self, i: int) -> str:
        if self.left[i] == -1:
            return self.names[i]
        return ""

    def topology_newick(self) -> str:
        """Newick with tip names only, no lengths — for tree posteriors."""
        def rec(i: int) -> str:
            if self.left[i] == -1:
                return self.names[i]
            return f"({rec(self.left[i])}, {rec(self.right[i])})"
        return rec(self.root) + ";"

    def copy(self) -> "SpeciesTree":
        return SpeciesTree(
            names=list(self.names), left=self.left.copy(),
            right=self.right.copy(), parent=self.parent.copy(),
            tau=self.tau.copy(), theta=self.theta.copy())
