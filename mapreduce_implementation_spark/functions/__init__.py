from .textfn import normalize_line, normalize_token, tokens_array

__all__ = ["normalize_line", "normalize_token", "tokens_array"]
