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


def theta_link_map(st: "SpeciesTree", mode: int) -> np.ndarray | None:
    """Per-node theta OWNER indices for the ``thetamodel`` linked-theta
    models (init_theta_linkage stree.c:2427, msci_link_thetas :2189).

    mode: 0 none, 1 linked-all, 2 linked-inner, 3 linked-msci.
    Returns [NSt] int owner per node (identity where unlinked), or
    None for mode 0.  Chains are compressed to their terminal node
    ("youngest daughter", stree.c:2246).
    """
    if mode == 0:
        return None
    n = st.n_nodes
    link = np.full(n, -1, np.int64)
    if mode == 1:
        link[:] = st.root
        link[st.root] = -1
    elif mode == 2:
        for i in range(st.n_tips, st.n_tips + st.n_inner):
            if i != st.root:
                link[i] = st.root
    elif mode == 3:
        if st.hindex is None:
            raise ValueError("thetamodel = linked-msci needs an MSC-I "
                             "network (cfile.c linked-msci check)")

        def sibling(i):
            p = int(st.parent[i])
            s = int(st.right[p]) if int(st.left[p]) == i \
                else int(st.left[p])
            return s            # -1 when the parent is unary

        mirror0 = st.n_tips + st.n_inner
        for m in range(mirror0, n):
            hin = int(st.hybrid[m])
            if getattr(st, "bdi", None) is not None and st.bdi[hin] >= 0:
                # bidirection: hybrid linked to its child (stree.c:2234)
                link[hin] = int(st.left[hin])
                continue
            if st.htau[hin] and st.htau[m]:
                continue                      # model A: nothing linked
            if not st.htau[hin]:
                p = int(st.parent[hin])
                s = sibling(hin)
                if s >= 0:
                    link[p] = s               # parent -> sibling
            else:
                link[hin] = int(st.left[hin])  # hybrid -> child
            if not st.htau[m]:
                p = int(st.parent[m])
                s = sibling(m)
                if s >= 0:
                    link[p] = s
            else:
                link[m] = int(st.left[hin])
    else:
        raise NotImplementedError(
            "thetamodel = linked-mscm is not yet supported")
    owner = np.arange(n, dtype=np.int64)
    for i in range(n):
        x = i
        seen = 0
        while link[x] >= 0 and seen <= n:
            x = int(link[x])
            seen += 1
        owner[i] = x
    return owner


def _canonicalize_bdi(root: Node) -> dict[str, str]:
    """Detect bidirectional introgressions and rewrite diagram-1 form
    into diagram-2 form (resolve_bd_introgression, treeparse.c:1232).

    Two accepted notations for a BDI between X and Y::

        diagram 1:  ((A,(B)Y)X,(X)Y)R
        diagram 2:  ((A,Y)X,(X,B)Y)R

    Diagram 1 is rewritten in place to diagram 2: the unary ``(B)Y``
    inside X becomes a marker leaf ``Y`` (keeping its annotations) and
    subtree B moves under the (previously unary) node ``(X)Y``.
    Returns {X_label: Y_label, Y_label: X_label} for every BDI pair.
    """
    pairs: dict[str, str] = {}

    def find_parent(target: Node):
        for n in root.walk():
            if target in n.children:
                return n
        return None

    inner_by_label: dict[str, list[Node]] = {}
    for n in root.walk():
        if n.children and n.label:
            inner_by_label.setdefault(n.label, []).append(n)

    for leaf in list(root.leaves()):
        lab = leaf.label
        if lab is None or lab not in inner_by_label or lab in pairs:
            continue
        par = find_parent(leaf)
        if par is None or not par.label:
            continue
        # candidate inner X: an inner node labeled `lab` that is not
        # `par` and has a child labeled like `par`
        for xinner in inner_by_label[lab]:
            ych = next((c for c in xinner.children
                        if c.label == par.label), None)
            if ych is None:
                continue
            if ych.children and len(ych.children) == 1 and \
                    len(par.children) == 1:
                # diagram 1: move B under par, ych becomes a marker leaf
                b = ych.children[0]
                ych.children = []
                par.children = [b, leaf]
            elif ych.is_leaf and len(par.children) == 2:
                pass                      # already diagram 2
            else:
                continue
            pairs[lab] = par.label
            pairs[par.label] = lab
            break
    return pairs


@dataclass
class SpeciesTree:
    names: list[str]                 # tip labels, index = tip id
    left: np.ndarray                 # [NSt] int32, -1 for tips
    right: np.ndarray                # [NSt] int32
    parent: np.ndarray               # [NSt] int32, -1 for root
    tau: np.ndarray                  # [NSt] float64, 0 for tips
    theta: np.ndarray                # [NSt] float64
    # --- MSC-I network extension (treeparse.c resolve_hybridization) ---
    # node layout: tips [0, NS), inner [NS, NS+NI) with the ROOT at
    # NS+NI-1, mirror nodes [NS+NI, NS+NI+HY).  A hybridization is a
    # pair (hinner, mirror): hinner is an inner node with one child
    # (right == -1) and parent = first parent; the mirror has no
    # children and parent = second parent.  A lineage leaving hinner's
    # child goes to hinner w.p. phi[hinner] or to the mirror w.p.
    # phi[mirror] = 1 - phi[hinner].
    hybrid: np.ndarray | None = None   # [NSt] int32 partner index or -1
    phi: np.ndarray | None = None      # [NSt] float64 (hinner/mirror only)
    htau: np.ndarray | None = None     # [NSt] int8: 1 = the node's parent
                                       # has its own tau; 0 = parent tau
                                       # is tied to this hybrid's tau
    hindex: np.ndarray | None = None   # [NSt] int32 hybridization slot
                                       # (same slot on hinner & mirror)
    labels: list | None = None         # [NSt] newick labels (None where
                                       # the newick gave no label); used
                                       # for reference-style output names
    # bidirectional introgression (resolve_bd_introgression,
    # treeparse.c:1232): for a BDI hinner X, the partner hinner Y
    # (X.right = mirror_Y, mirror_X.parent = Y, all four taus tied,
    # one free tau owned by min(X, Y)); -1 elsewhere
    bdi: np.ndarray | None = None      # [NSt] int32 partner hinner or -1

    @property
    def n_tips(self) -> int:
        return len(self.names)

    @property
    def n_nodes(self) -> int:
        return len(self.parent)

    @property
    def n_hybrids(self) -> int:
        if self.hindex is None:
            return 0
        return int(self.hindex.max(initial=-1)) + 1

    @property
    def is_network(self) -> bool:
        return self.n_hybrids > 0

    @property
    def root(self) -> int:
        return self.n_nodes - 1 - self.n_hybrids

    # --- construction --------------------------------------------------------

    @classmethod
    def from_newick(cls, newick: str, tip_order: list[str] | None = None
                    ) -> "SpeciesTree":
        root = parse_newick(newick)
        return cls.from_node(root, tip_order)

    @classmethod
    def from_node(cls, root: Node, tip_order: list[str] | None = None
                  ) -> "SpeciesTree":
        bdi_pairs = _canonicalize_bdi(root)
        leaves = root.leaves()
        inner_labels = {n.label for n in root.walk()
                        if n.children and n.label}
        # hybridization tips: leaves whose label duplicates an inner
        # node's label (treeparse.c resolve_hybridization); they are the
        # second-parent attachment of the hybridization, not species
        htips = [n for n in leaves if n.label in inner_labels]
        species_leaves = [n for n in leaves if n.label not in inner_labels]
        if htips:
            return cls._from_network(root, species_leaves, htips, tip_order,
                                     bdi_pairs)
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

        node_labels: list = [None] * nst
        for i, lab in enumerate(tip_order):
            node_labels[i] = lab

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
            node_labels[idx] = node.label
            return idx

        ridx = assign(root)
        # make the root the last index by construction: a binary tree assigned
        # post-order always finishes at nst-1
        assert ridx == nst - 1
        return cls(names=list(tip_order), left=left, right=right,
                   parent=parent, tau=tau, theta=np.zeros(nst),
                   labels=node_labels)

    @classmethod
    def _from_network(cls, root: Node, species_leaves, htips, tip_order,
                      bdi_pairs=None) -> "SpeciesTree":
        """MSC-I network: resolve duplicate-label hybridizations into
        (hinner, mirror) node pairs (treeparse.c:1118
        resolve_hybridization + annotate_hybridization:1053);
        ``bdi_pairs`` maps BDI partner labels (X<->Y) whose marker
        leaves resolve to cross-linked mirrors
        (resolve_bd_introgression, treeparse.c:1232)."""
        bdi_pairs = bdi_pairs or {}
        labels = [n.label for n in species_leaves]
        if tip_order is None:
            tip_order = labels
        if sorted(tip_order) != sorted(labels):
            raise ValueError(
                f"species&tree names {tip_order} do not match newick "
                f"species tips {labels}")
        ns = len(labels)
        hy = len(htips)
        # inner nodes of the resolved network: every parsed inner node
        # (hinner keeps its single child); htips are removed
        inner_nodes = [n for n in root.walk() if n.children]
        ni = len(inner_nodes)
        nst = ns + ni + hy
        left = np.full(nst, -1, np.int32)
        right = np.full(nst, -1, np.int32)
        parent = np.full(nst, -1, np.int32)
        tau = np.zeros(nst)
        hybrid = np.full(nst, -1, np.int32)
        phi = np.zeros(nst)
        htau = np.ones(nst, np.int8)
        hindex = np.full(nst, -1, np.int32)
        tip_id = {lab: i for i, lab in enumerate(tip_order)}
        hinner_by_label = {}
        next_inner = [ns]
        node_idx: dict[int, int] = {}
        htip_slot: dict[int, tuple] = {}
        node_labels: list = [None] * nst
        for i, lab in enumerate(tip_order):
            node_labels[i] = lab

        def assign(node: Node) -> int:
            if node.is_leaf:
                if node.label in tip_id and node.label not in hinner_by_label:
                    i = tip_id[node.label]
                    node_idx[id(node)] = i
                    return i
                return -2          # hybridization tip: resolved later
            ch = [assign(c) for c in node.children]
            if len(ch) > 2 or len(ch) < 1:
                raise ValueError("species network nodes must have 1-2 children")
            idx = next_inner[0]
            next_inner[0] += 1
            node_idx[id(node)] = idx
            node_labels[idx] = node.label
            for k, ci in enumerate(ch):
                if ci >= 0:
                    (left if k == 0 else right)[idx] = ci
                    parent[ci] = idx
                else:
                    # hybridization tip: record its newick slot so the
                    # mirror lands there (preserves reference child
                    # order in output labels)
                    htip_slot[id(node.children[k])] = (idx, k)
            if len(ch) == 1:
                # unary hinner keeps its child in the left slot
                pass
            if node.label and node.children and (
                    len(node.children) == 1 or node.label in bdi_pairs):
                hinner_by_label[node.label] = idx
            return idx

        # pre-scan: register hinner labels so duplicate tips resolve
        # (unary hybridization inners + binary BDI inners)
        for n in root.walk():
            if n.children and n.label and (
                    len(n.children) == 1 or n.label in bdi_pairs):
                hinner_by_label[n.label] = None
        ridx = assign(root)
        assert ridx == ns + ni - 1, (ridx, ns, ni)

        def getf(node: Node, key: str, default=None):
            v = node.attributes.get(key)
            return v if v is not None else default

        # create mirrors
        for k, htip_node in enumerate(htips):
            lab = htip_node.label
            hin = hinner_by_label.get(lab)
            if hin is None:
                raise ValueError(f"hybridization label {lab!r} has no inner node")
            mir = ns + ni + k
            # attach mirror under htip's parent, in htip's newick slot
            pidx, slot = htip_slot[id(htip_node)]
            (left if slot == 0 else right)[pidx] = mir
            parent[mir] = pidx
            hybrid[hin] = mir
            hybrid[mir] = hin
            hindex[hin] = hindex[mir] = k
            node_labels[mir] = lab
            if lab in bdi_pairs:
                # BDI marker (annotate_bd_introgression treeparse.c:1066):
                # the marker leaf's phi belongs to the mirror; one tau is
                # shared by the whole X/Y/mirror quad, so tau annotations
                # are forbidden
                if getf(htip_node, "tau-parent") is not None:
                    raise ValueError(
                        f"bidirectional introgression {lab!r} shares one "
                        "tau; remove all tau annotations (treeparse.c:1280)")
                p1 = getf(htip_node, "phi")
                phi[mir] = 0.5 if p1 is None else float(p1)
                phi[hin] = 1.0 - phi[mir]
                hybrid[hin] = mir
                hybrid[mir] = hin
                hindex[hin] = hindex[mir] = k
                continue
            # annotations: hinner occurrence -> hinner; htip -> mirror
            p1 = getf(htip_node, "phi")
            # find the hinner Node to read its attributes
            hin_node = next(n for n in root.walk()
                            if n.children and n.label == lab)
            p0 = getf(hin_node, "phi")
            if p0 is not None and p1 is not None:
                if abs(float(p0) + float(p1) - 1.0) > 1e-9:
                    raise ValueError(f"phi annotations for {lab!r} do not sum to 1")
            if p0 is None and p1 is not None:
                p0 = 1.0 - float(p1)
            if p0 is None:
                p0 = 0.5           # inference default; estimated anyway
            phi[hin] = float(p0)
            phi[mir] = 1.0 - float(p0)
            tp0 = getf(hin_node, "tau-parent")
            tp1 = getf(htip_node, "tau-parent")
            if parent[hin] == parent[mir]:
                # parallel edges: parent must keep its tau
                if (tp0 and tp0.lower() != "yes") or (tp1 and tp1.lower() != "yes"):
                    raise ValueError(
                        f"parallel-edge hybridization {lab!r} requires "
                        "tau-parent = yes on both edges")
            if tp0 is not None:
                htau[hin] = 1 if tp0.lower() in ("yes", "1", "true") else 0
            if tp1 is not None:
                htau[mir] = 1 if tp1.lower() in ("yes", "1", "true") else 0

        bdi = None
        if bdi_pairs:
            bdi = np.full(nst, -1, np.int32)
            for la, lb in bdi_pairs.items():
                ia = hinner_by_label.get(la)
                ib = hinner_by_label.get(lb)
                if ia is None or ib is None:
                    raise ValueError(
                        f"BDI pair {la!r}<->{lb!r} did not resolve")
                bdi[ia] = ib
                bdi[ib] = ia
        st = cls(names=list(tip_order), left=left, right=right,
                 parent=parent, tau=tau, theta=np.zeros(nst),
                 hybrid=hybrid, phi=phi, htau=htau, hindex=hindex,
                 labels=node_labels, bdi=bdi)
        return st

    @classmethod
    def single_population(cls, name: str) -> "SpeciesTree":
        return cls(names=[name],
                   left=np.array([-1], np.int32),
                   right=np.array([-1], np.int32),
                   parent=np.array([-1], np.int32),
                   tau=np.zeros(1), theta=np.zeros(1))

    # --- derived tables ------------------------------------------------------

    def pptable(self) -> np.ndarray:
        """anc[i, j] = True iff j is i or an ancestor of i (stree.c:2840).

        For MSC-I networks, ancestry is reachability through EITHER
        parent of a hybridization: a lineage below hinner's child can
        exit through hinner (first parent) or its mirror (second
        parent), so both parents' ancestor sets are inherited.
        """
        n = self.n_nodes
        anc = np.zeros((n, n), dtype=bool)
        np.fill_diagonal(anc, True)
        # fixpoint closure: anc(i) |= anc(parent(i)); and when walking
        # INTO a hinner, also anc(mirror) (a lineage entering the
        # hybridization may take either side)
        changed = True
        while changed:
            changed = False
            for i in range(n):
                p = self.parent[i]
                if p == -1:
                    continue
                new = anc[i] | anc[p]
                if self.hybrid is not None and self.hybrid[p] != -1:
                    # p is one side of a hybridization reached from
                    # below: the other side is reachable too
                    new = new | anc[self.hybrid[p]]
                if (new != anc[i]).any():
                    anc[i] = new
                    changed = True
        return anc

    def is_mirror(self, i: int) -> bool:
        return i >= self.n_tips + self.n_inner

    @property
    def n_inner(self) -> int:
        return self.n_nodes - self.n_tips - self.n_hybrids

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
