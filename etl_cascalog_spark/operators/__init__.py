"""Operator layer (SURVEY.md §2) — composable DataFrame combinators."""
