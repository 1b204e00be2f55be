"""Operator library: relational, windows, stateful, dedup, similarity,
text, multimodal. See SURVEY.md §2 for the reference-parity inventory."""
