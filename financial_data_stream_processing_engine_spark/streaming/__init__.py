"""Structured Streaming layer: streaming sources, time/row-count
windows, watermarks, stateful operators, sinks (SURVEY.md §7 M3).
"""
