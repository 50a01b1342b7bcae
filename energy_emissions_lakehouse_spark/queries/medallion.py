"""Medallion pipeline parity queries (reference bronze->silver->gold).
Filled in incrementally; see the medallion package."""
