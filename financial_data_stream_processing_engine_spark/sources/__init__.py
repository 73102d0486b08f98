"""Source adapters: batch readers + streaming sources with the
reference's per-source normalization projections (SURVEY.md §2.1 N1).
"""
