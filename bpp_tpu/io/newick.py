"""Newick / extended-newick parser.

Behavioral equivalent of the reference's ``src/treeparse.c``
(``bpp_parse_newick_string:2315``): plain rooted trees for MSC, plus
extended-newick hybridization nodes (``label[&phi=..,&tau-parent=..]``
and ``#H`` tags) for MSC-I networks.  The output is a lightweight
host-side node structure; device-side index arrays are built by
``bpp_tpu.trees.stree``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    label: str | None = None
    length: float | None = None          # branch length to parent
    children: list["Node"] = field(default_factory=list)
    parent: "Node | None" = None
    # extended-newick annotation key->value (phi, tau-parent, ...)
    attributes: dict[str, str] = field(default_factory=dict)
    # hybrid tag, e.g. 'H' from a label like 'h[&phi=0.3]' or 'X#H1'
    hybrid_tag: str | None = None

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def walk(self):
        """Post-order traversal."""
        for c in self.children:
            yield from c.walk()
        yield self

    def leaves(self) -> list["Node"]:
        return [n for n in self.walk() if n.is_leaf]

    def newick(self, lengths: bool = True, attrs: bool = False) -> str:
        parts = []
        if self.children:
            parts.append("(" + ",".join(
                c.newick(lengths=lengths, attrs=attrs) for c in self.children) + ")")
        if self.label:
            parts.append(self.label)
        if self.hybrid_tag:
            parts.append("#" + self.hybrid_tag)
        if attrs and self.attributes:
            inner = ",".join(f"&{k}={v}" for k, v in self.attributes.items())
            parts.append(f"[{inner}]")
        if lengths and self.length is not None:
            parts.append(f":{self.length:.6g}")
        return "".join(parts)


class _Tok:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str | None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        return self.s[self.i] if self.i < len(self.s) else None

    def take(self) -> str:
        c = self.peek()
        if c is None:
            raise ValueError("unexpected end of newick string")
        self.i += 1
        return c

    def read_label(self) -> str:
        self.peek()  # skip ws
        start = self.i
        if self.i < len(self.s) and self.s[self.i] in "'\"":
            q = self.s[self.i]
            self.i += 1
            lab_start = self.i
            while self.i < len(self.s) and self.s[self.i] != q:
                self.i += 1
            lab = self.s[lab_start:self.i]
            self.i += 1  # closing quote
            return lab
        while self.i < len(self.s) and self.s[self.i] not in "():,;[":
            self.i += 1
        return self.s[start:self.i].strip()

    def read_annotation(self) -> dict[str, str]:
        """Read a '[...]' comment; parse '&k=v' pairs (treeparse.c:830)."""
        assert self.take() == "["
        start = self.i
        depth = 1
        while self.i < len(self.s) and depth:
            c = self.s[self.i]
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
            self.i += 1
        body = self.s[start:self.i - 1]
        attrs: dict[str, str] = {}
        for item in body.split(","):
            item = item.strip().lstrip("&")
            if "=" in item:
                k, v = item.split("=", 1)
                attrs[k.strip()] = v.strip()
            elif item:
                attrs[item] = ""
        return attrs


def parse_newick(text: str) -> Node:
    """Parse a (possibly extended) newick string into a Node tree."""
    tk = _Tok(text.strip())

    def parse_node() -> Node:
        node = Node()
        if tk.peek() == "(":
            tk.take()
            while True:
                child = parse_node()
                child.parent = node
                node.children.append(child)
                c = tk.peek()
                if c == ",":
                    tk.take()
                    continue
                if c == ")":
                    tk.take()
                    break
                raise ValueError(f"expected ',' or ')' at position {tk.i}")
        # label (may be absent)
        c = tk.peek()
        if c is not None and c not in "():,;[":
            lab = tk.read_label()
            if "#" in lab:
                lab, tag = lab.split("#", 1)
                node.hybrid_tag = tag.strip()
            node.label = lab.strip() or None
        # annotations, possibly several
        while tk.peek() == "[":
            node.attributes.update(tk.read_annotation())
        # hybrid tag may follow annotation: name[...]#H1  (rare) — handled above
        if tk.peek() == ":":
            tk.take()
            num_start = tk.i
            while tk.i < len(tk.s) and tk.s[tk.i] not in "(),;[#":
                tk.i += 1
            node.length = float(tk.s[num_start:tk.i].strip())
            while tk.peek() == "[":
                node.attributes.update(tk.read_annotation())
        # '#tag' may follow the branch length (sim ctl: ':age #theta')
        if tk.peek() == "#":
            tk.take()
            tag_start = tk.i
            while tk.i < len(tk.s) and tk.s[tk.i] not in "():,;[# \t":
                tk.i += 1
            node.hybrid_tag = tk.s[tag_start:tk.i].strip()
        return node

    root = parse_node()
    if tk.peek() == ";":
        tk.take()
    return root
