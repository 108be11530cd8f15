from . import relational, joins, aggregates, dedup, similarity, text, multimodal, skew

__all__ = [
    "relational",
    "joins",
    "aggregates",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "skew",
]
