from .scalar import dec, hex_hash64, norm_text, strip_filename, wildcard_hive

__all__ = ["dec", "hex_hash64", "norm_text", "strip_filename", "wildcard_hive"]
