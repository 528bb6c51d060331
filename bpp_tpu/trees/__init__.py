from . import stree, gtree, coalescent  # noqa: F401
