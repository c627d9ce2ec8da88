"""Batch operators: relational surface (SURVEY.md §2.3).

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB SQL twins) which the top-level
registry merges for the driver contract.
"""
