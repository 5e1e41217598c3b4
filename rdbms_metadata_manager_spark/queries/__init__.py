from .base import load, tables

__all__ = ["load", "tables"]
