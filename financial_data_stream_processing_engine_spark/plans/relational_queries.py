"""Catalog entries: general relational operator inventory (SURVEY.md §2.2).

Populated milestone by milestone; every entry is a built-in DataFrame
composition with a DuckDB oracle.
"""

from __future__ import annotations
