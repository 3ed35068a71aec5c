from .options import Options, load_options

__all__ = ["Options", "load_options"]
