from . import compress, msa, packing  # noqa: F401
