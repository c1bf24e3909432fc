from . import arrays, dedup, rollups, sequences, similarity, text

__all__ = ["arrays", "dedup", "rollups", "sequences", "similarity", "text"]
