"""Relational query suite over the TPC-H-ish testdata tables."""
