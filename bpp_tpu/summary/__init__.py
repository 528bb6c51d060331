from . import allfixed  # noqa: F401
