from .tokens_source import read_tokens, with_body

__all__ = ["read_tokens", "with_body"]
