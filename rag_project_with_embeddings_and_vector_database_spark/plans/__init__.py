from .pipeline import run_experiment, run_full_experiment, write_report  # noqa: F401
