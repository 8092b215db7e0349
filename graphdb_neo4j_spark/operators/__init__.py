"""Operators: each module re-expresses one slice of the reference surface
(SURVEY.md §2) as a declarative DataFrame program."""
