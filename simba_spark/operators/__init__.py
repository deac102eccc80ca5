"""Operator implementations (SURVEY.md §2 inventory)."""
