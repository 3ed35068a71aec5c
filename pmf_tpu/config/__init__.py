from .options import Options, check_run_dir, load_options

__all__ = ["Options", "check_run_dir", "load_options"]
