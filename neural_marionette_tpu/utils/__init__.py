"""Utilities: console display, torch checkpoint conversion."""
from .console import COLORS, display_it, display_opts, display_phase

__all__ = ["COLORS", "display_it", "display_opts", "display_phase"]
