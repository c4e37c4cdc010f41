"""Operator library — each module is a DataFrame-in/DataFrame-out
re-expression of one reference operator family (SURVEY.md §2)."""
