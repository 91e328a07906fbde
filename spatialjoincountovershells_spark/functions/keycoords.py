"""Deterministic key -> coordinate derivation for the driver-contract
queries (FIXTURES.md §8).

Coordinates are exact multiples of 1/64 in [0, 1000): integer-key
arithmetic (exact in both engines) followed by a single exact binary
division.  Every downstream float64 op (abs/least/multiply/add of
1/64-multiples below 2^53) is then EXACT, so Spark and the DuckDB
oracle produce bit-identical results — no float-tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth / xxhash odd multipliers; key*C stays well under 2^63 for any
# TPC-H key at the scale factors in play
CONSTS = (2654435761, 2246822519, 3266489917)
MOD = 64000  # 1000 * 64
DIV = 64.0


def key_coord_expr(key_col: str, axis: int):
    c = CONSTS[axis]
    return ((F.col(key_col) * F.lit(c)) % F.lit(MOD)) / F.lit(DIV)


def with_key_coords(
    df: DataFrame, key_col: str, coords: tuple[str, ...] = ("x", "y", "z")
) -> DataFrame:
    for a, name in enumerate(coords):
        df = df.withColumn(name, key_coord_expr(key_col, a))
    return df


def sql_coord(key_col: str, axis: int) -> str:
    """The identical derivation as ANSI SQL (for DuckDB oracles)."""
    return f"(({key_col} * {CONSTS[axis]}) % {MOD}) / {DIV}"
