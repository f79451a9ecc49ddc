"""Operators: SURVEY.md §2 re-expressed as DataFrame transformations.

Each module returns/consumes plain DataFrames so Catalyst sees one
declarative plan per round (pushdown, pruning, broadcast selection all
apply across operator boundaries)."""
