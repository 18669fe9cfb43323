"""SQL-callable function registration (SURVEY.md §2.8)."""
from .registry import register_builtin_library, register_function

__all__ = ["register_function", "register_builtin_library"]
