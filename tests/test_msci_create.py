"""--msci-create tool tests (msci_gen.c cmd_msci_create analog)."""

from bpp_tpu.tools.msci_create import msci_create
from bpp_tpu.trees.stree import SpeciesTree


def test_hybridization_roundtrip():
    text = """
tree ((A,B),C);
define T as A,B
define R as A,B,C
hybridization A T, C R as S H tau=yes,no phi=0.3
"""
    nwk = msci_create(text)
    assert nwk == ("(((H[&phi=0.300000,tau-parent=yes],A)S,B)T,"
                   "(C)H[&phi=0.700000,tau-parent=no])R;")
    # the emitted newick must parse back into a 1-hybridization network
    st = SpeciesTree.from_newick(nwk, tip_order=["A", "B", "C"])
    assert st.n_hybrids == 1
    assert st.n_nodes == 8
    hin = [i for i in range(st.n_nodes)
           if st.hindex[i] >= 0 and i < st.n_tips + st.n_inner][0]
    assert abs(st.phi[hin] - 0.7) < 1e-9      # main side keeps 1-phi
    assert st.htau[hin] == 0                  # tau-parent=no on target


def test_parallel_hybridization():
    text = """
tree ((A,B),C);
define T as A,B
hybridization A T as S H phi=0.4
"""
    nwk = msci_create(text)
    assert nwk.count("H[") == 2 and "(A)H[" in nwk
    assert "phi=0.400000" in nwk and "phi=0.600000" in nwk


def test_bidirection():
    text = """
tree ((A,B),C);
define T as A,B
define R as A,B,C
bidirection A T, C R as X Y phi=0.2,0.3
"""
    nwk = msci_create(text)
    assert nwk == "(((A,Y[&phi=0.300000])X,B)T,(C,X[&phi=0.200000])Y)R;"
