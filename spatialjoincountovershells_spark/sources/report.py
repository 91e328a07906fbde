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
