"""Scalar-function library (SURVEY.md §2.8) — all JVM-side built-ins."""
