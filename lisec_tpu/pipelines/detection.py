"""Placeholder — filled in a later build stage (SURVEY.md §7)."""
