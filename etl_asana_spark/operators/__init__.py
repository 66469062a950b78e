"""Composed engine operators (joins, dedup, similarity, text, multimodal)."""
