"""Scale extensions beyond the reference surface (SURVEY.md §7 M5,
BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal column plumbing — the operators a 100 TB
training-data pipeline needs.
"""
