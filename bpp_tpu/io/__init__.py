from . import maps, phylip, imap, ctl, newick  # noqa: F401
