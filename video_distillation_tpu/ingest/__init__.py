from .extract_ssv2 import evenly_spaced

__all__ = ["evenly_spaced"]
