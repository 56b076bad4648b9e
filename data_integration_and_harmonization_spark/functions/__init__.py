"""Reusable column-expression and distribution helpers (all JVM-side)."""
