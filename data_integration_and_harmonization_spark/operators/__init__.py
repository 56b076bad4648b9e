"""Operator library (SURVEY §2): harmonize, clean, profile, features,
eda, ml, plus the scale extensions (dedup, similarity, text,
multimodal)."""
