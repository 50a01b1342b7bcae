"""Scalar/aggregate function helpers shared across queries."""
