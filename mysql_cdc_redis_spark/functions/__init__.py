from .hashing import md5long, norm_text

__all__ = ["md5long", "norm_text"]
