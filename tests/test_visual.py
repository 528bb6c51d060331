"""Species-tree PDF export (visual.c / pdfgen.c analog)."""

import re

import numpy as np

from bpp_tpu.trees.stree import SpeciesTree
from bpp_tpu.visual import MiniPdf, stree_export_pdf


def _valid_pdf(data: bytes):
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the right objects
    xref_at = int(data.split(b"startxref")[1].split(b"%%EOF")[0].strip())
    assert data[xref_at:xref_at + 4] == b"xref"
    n = int(re.search(rb"xref\n0 (\d+)", data).group(1))
    offsets = re.findall(rb"(\d{10}) 00000 n", data)
    assert len(offsets) == n - 1
    for i, off in enumerate(offsets, start=1):
        at = int(off)
        assert data[at:].startswith(b"%d 0 obj" % i), i


def test_minipdf_structure(tmp_path):
    pdf = MiniPdf()
    pdf.line(10, 10, 100, 100)
    pdf.text("hello (world)", 50, 50)
    pdf.circle(30, 30, 5)
    p = tmp_path / "t.pdf"
    pdf.save(str(p))
    data = p.read_bytes()
    _valid_pdf(data)
    assert rb"hello \(world\)" in data


def test_stree_pdf(tmp_path):
    st = SpeciesTree.from_newick("((A:0.01,B:0.01):0.02,C:0.03);")
    st.tau[:] = [0, 0, 0, 0.01, 0.03]
    st.theta[:] = 0.002
    p = tmp_path / "tree.pdf"
    stree_export_pdf(st, str(p), cmdline="bpp_tpu --cfile x.ctl")
    data = p.read_bytes()
    _valid_pdf(data)
    for name in "ABC":
        assert f"({name})".encode() in data


def test_network_pdf(tmp_path):
    # MSC-I network with one hybridization (mirror-node edges drawn)
    nwk = ("((A:0.02,(B:0.01)h[&phi=0.3,tau-parent=yes]:0.01)s:0.01,"
           "(h[&tau-parent=yes]:0.015,C:0.025)t:0.005)r;")
    st = SpeciesTree.from_newick(nwk)
    p = tmp_path / "net.pdf"
    stree_export_pdf(st, str(p))
    _valid_pdf(p.read_bytes())
