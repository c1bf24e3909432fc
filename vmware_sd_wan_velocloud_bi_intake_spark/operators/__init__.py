from . import (
    arrays,
    dedup,
    enrichment,
    multimodal,
    rollups,
    sequences,
    similarity,
    text,
)

__all__ = [
    "arrays",
    "dedup",
    "enrichment",
    "multimodal",
    "rollups",
    "sequences",
    "similarity",
    "text",
]
