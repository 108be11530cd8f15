from . import relational, joins, aggregates, dedup, similarity, text, multimodal

__all__ = [
    "relational",
    "joins",
    "aggregates",
    "dedup",
    "similarity",
    "text",
    "multimodal",
]
