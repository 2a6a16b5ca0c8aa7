"""Structured Streaming surface (SURVEY.md §2.9 I6 — absent in the
reference, a first-class part of this engine)."""
