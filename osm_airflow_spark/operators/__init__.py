"""Relational operators (SURVEY.md §2.C–§2.I)."""
