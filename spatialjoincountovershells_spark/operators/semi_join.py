"""Halo filter semi-join (J4).

The reference merge-semi-joins the streamed halo file against a
radix-sorted id list (``readAndFilterHalos``,
``src/Gadget/BufHalo.c:121-214``).  In Spark this is a broadcast
left-semi join — the filter list is always small relative to the halo
table, so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_halos(halos: DataFrame, filter_ids: DataFrame, id_col: str = "halo_id") -> DataFrame:
    fid = filter_ids.columns[0]
    right = filter_ids.select(F.col(fid).alias(id_col)).distinct()
    return halos.join(F.broadcast(right), on=id_col, how="left_semi")
