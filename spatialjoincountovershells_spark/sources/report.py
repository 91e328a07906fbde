"""S7 result sink: the reference's text report format.

``outputResult`` (``src/astr_rcount/main.c:371-442``) prints, per halo
in file order: ``id <id>`` then one ``  [<lo> ~ <hi>]: <count>`` line
per shell (zeros included), then a grand ``Total`` section.  Radii are
sqrt-restored from their squared float32 form before printing with %f
(C double sqrt of the f32 square — replicated here so the printed edge
values match byte-for-byte).

Divergence (deliberate, SURVEY §2.11.6): the reference's printed Total
aliases halo 0's count row (``total = &jc->counts[0]``,
``main.c:400``), double-counting halo 0.  We print the *corrected*
total by default; ``buggy_total=True`` reproduces the reference's
arithmetic for byte-level diffing against its goldens.

The dense (nhalos x nshells) matrix is a presentation concern: the
reference materializes it in driver RAM (``main.c:651``) and writes one
sequential file, so this sink does the same via toPandas on the
aggregated (already tiny: nhalos*nshells) result.  The scale path for
results is ``counts.write.parquet`` — long-form, distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.shells import squared_edges


def _edge_labels(edges: np.ndarray) -> list[str]:
    # outputResult restores radii in place: radiuses[i] = sqrt(radiuses[i])
    # with radiuses a FLOAT array (main.c:386-387) — so the double sqrt is
    # rounded back to f32 before the %f print promotes it to double again.
    e = np.asarray(edges)
    r = np.sqrt(squared_edges(e).astype(np.float64)).astype(e.dtype)
    return [f"{float(v):.6f}" for v in r]


def report_lines(
    counts: DataFrame,
    halos: pd.DataFrame,
    edges: np.ndarray,
    id_col: str = "row_idx",
    display_id_col: str = "halo_id",
    buggy_total: bool = False,
) -> list[str]:
    """Render the full report.

    counts: long-form (id_col, shell_idx, cnt) from shell_count().
    halos: pandas (id_col, display_id_col) in the original file order —
    result order follows halo file order (SURVEY §2.11.7) and ids may
    repeat (TestData4PB has two halos with id 0), so rows are keyed by
    ordinal, not id.
    """
    nr = len(np.asarray(edges))
    lab = _edge_labels(edges)
    cp = counts.toPandas()
    dense: dict[int, np.ndarray] = {}
    for hid, sh, c in zip(cp[id_col], cp["shell_idx"], cp["cnt"]):
        dense.setdefault(int(hid), np.zeros(nr, dtype=np.int64))[int(sh)] = c

    out: list[str] = []
    total = np.zeros(nr, dtype=np.int64)
    first_row_counts: np.ndarray | None = None
    for key, disp in zip(halos[id_col], halos[display_id_col]):
        row = dense.get(int(key), np.zeros(nr, dtype=np.int64))
        if first_row_counts is None:
            first_row_counts = row
        out.append(f"id {int(disp)}")
        for i in range(nr):
            lo = "0.0" if i == 0 else lab[i - 1]
            out.append(f"  [{lo} ~ {lab[i]}]: {row[i]}")
        total += row
    out.append("")
    out.append("Total")
    if buggy_total and first_row_counts is not None:
        # total aliased halo 0's row: printing Total re-reads the row it
        # just accumulated into -> halo 0 counted twice (main.c:400,413)
        total += first_row_counts
    for i in range(nr):
        lo = "0.0" if i == 0 else lab[i - 1]
        out.append(f"  [{lo} ~ {lab[i]}]: {total[i]}")
    return out


def write_report(path: str, *args, **kwargs) -> None:
    with open(path, "w") as f:
        f.write("\n".join(report_lines(*args, **kwargs)) + "\n")


def write_report_distributed(
    path: str,
    counts: DataFrame,
    halos: DataFrame,
    edges: np.ndarray,
    id_col: str = "row_idx",
    display_id_col: str = "halo_id",
    buggy_total: bool = False,
    n_files: int = 8,
) -> None:
    """S7 at scale: the same byte format, never materialized on the
    driver (VERDICT r3 #4 — the single-node sink is a 400M-row
    driver pull at the reference's own 10M-halo x 40-shell shape).

    halos is a Spark DataFrame (id_col ordinal, display_id_col), as a
    catalog table would be.  Plan shape:

    * one left join halos->counts + one groupBy(ordinal) Arrow kernel
      formats each halo's block (zeros included) EXECUTOR-side;
    * blocks are range-partitioned by ordinal and sorted within
      partitions, so the text part files are globally ordered by file
      name — `part-00000` holds the lowest ordinals;
    * the Total section is the tiny (nshells)-row aggregate, written
      last as its own single file; a `_REPORT_MANIFEST` names the
      pieces in concatenation order.

    The only driver-side rows are the nshells totals (and, for
    buggy_total parity, halo 0's nshells counts).  Byte-equality with
    write_report() on the same inputs is pinned by
    test_reference_parity.py.
    """
    import json
    import os

    from pyspark.sql import functions as F

    nr = len(np.asarray(edges))
    lab = _edge_labels(edges)
    los = ["0.0"] + lab[:-1]

    j = halos.select(
        F.col(id_col).cast("long").alias("_ord"),
        F.col(display_id_col).cast("long").alias("_disp"),
    ).join(
        counts.select(
            F.col(id_col).cast("long").alias("_ord"),
            "shell_idx",
            "cnt",
        ),
        "_ord",
        "left",
    )

    def fmt(pdf: pd.DataFrame) -> pd.DataFrame:
        row = np.zeros(nr, dtype=np.int64)
        sh = pdf["shell_idx"].to_numpy()
        ok = ~pd.isna(sh)
        row[sh[ok].astype(np.int64)] = pdf["cnt"].to_numpy()[ok]
        lines = [f"id {int(pdf['_disp'].iloc[0])}"]
        lines += [f"  [{lo} ~ {hi}]: {row[i]}"
                  for i, (lo, hi) in enumerate(zip(los, lab))]
        return pd.DataFrame(
            {"_ord": [int(pdf["_ord"].iloc[0])], "value": ["\n".join(lines)]}
        )

    blocks = j.groupBy("_ord").applyInPandas(fmt, schema="_ord long, value string")
    (
        blocks.repartitionByRange(n_files, "_ord")
        .sortWithinPartitions("_ord")
        .select("value")
        .write.mode("overwrite")
        .text(os.path.join(path, "blocks"))
    )

    # Total: nshells rows — the one inherently-global statistic
    tot = {
        int(r["shell_idx"]): int(r["s"])
        for r in j.where(F.col("shell_idx").isNotNull())
        .groupBy("shell_idx").agg(F.sum("cnt").alias("s")).collect()
    }
    total = np.array([tot.get(i, 0) for i in range(nr)], dtype=np.int64)
    if buggy_total:
        first_ord = halos.agg(F.min(F.col(id_col))).collect()[0][0]
        f0 = np.zeros(nr, dtype=np.int64)
        for r in counts.where(F.col(id_col) == first_ord).collect():
            f0[int(r["shell_idx"])] = int(r["cnt"])
        total += f0
    lines = ["", "Total"] + [
        f"  [{lo} ~ {hi}]: {total[i]}"
        for i, (lo, hi) in enumerate(zip(los, lab))
    ]
    tdir = os.path.join(path, "total")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "part-total.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    parts = sorted(
        p for p in os.listdir(os.path.join(path, "blocks"))
        if p.startswith("part-")
    )
    with open(os.path.join(path, "_REPORT_MANIFEST"), "w") as f:
        json.dump(
            {"pieces": [f"blocks/{p}" for p in parts]
             + ["total/part-total.txt"]},
            f,
        )


def read_report_distributed(path: str) -> str:
    """Concatenate a write_report_distributed() directory back into the
    single-file report text (test/verification helper)."""
    import json
    import os

    with open(os.path.join(path, "_REPORT_MANIFEST")) as f:
        pieces = json.load(f)["pieces"]
    return "".join(open(os.path.join(path, p)).read() for p in pieces)
