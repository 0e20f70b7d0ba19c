"""Relational operator coverage over the driver tables (SURVEY.md §2).

Placeholder — populated with grouped aggregates, joins, sorts, dedup.
"""
