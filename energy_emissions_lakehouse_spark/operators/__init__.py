"""Reusable engine operators (dedup, merge, similarity, text, multimodal)."""
