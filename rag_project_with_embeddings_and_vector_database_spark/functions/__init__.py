from . import text, vectors  # noqa: F401
