from .engine import RULES, detect_schema_flaws

__all__ = ["RULES", "detect_schema_flaws"]
