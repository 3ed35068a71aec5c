from .zbuffer import zbuffer_pallas

__all__ = ["zbuffer_pallas"]
