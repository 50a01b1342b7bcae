"""Embedding similarity operators over ``embeddings`` (extension surface).
Filled in incrementally; see operators/similarity.py."""
