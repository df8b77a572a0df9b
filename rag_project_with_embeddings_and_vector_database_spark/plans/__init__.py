from .pipeline import run_experiment  # noqa: F401
