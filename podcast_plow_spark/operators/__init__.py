"""Relational operators: frontier queue, dedup families, windows,
grading, seen-set filtering, similarity search."""
