"""Operators: the metadata pipeline (B1-B9), graph flattening (C2), and the
LLM-data-pipeline extensions (dedup, similarity, text analysis, multimodal)."""
