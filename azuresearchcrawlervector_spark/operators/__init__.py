"""Operators: seen-sketch, politeness/skew, dedup family, similarity."""
