"""Query plans: pure DataFrame-building functions.

Each function takes DataFrames in and returns a DataFrame — no
actions, no side effects — so the same plan runs in batch or behind
``readStream`` (Structured Streaming reuses the identical logical
plan; SURVEY.md §2.3's emission-equivalence argument).
"""
