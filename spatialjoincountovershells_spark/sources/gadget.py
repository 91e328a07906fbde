"""Readers/writers for the reference's own file formats (SURVEY §2.1).

These give byte-level parity with the reference's data plumbing so the
compiled reference's golden outputs can be compared 1:1:

* ``read_decoded_particles``   — S1/S2: headerless little-endian
  float32[3] rows; particle id = ordinal within the file
  (``src/Gadget/BufVector3D.c:286-335``, id assignment
  ``src/astr_rcount/main.c:718-722``).
* ``read_compressed_particles`` — S3+S4: Fortran-framed Gadget block
  ``[4B len][256B GadgetHeader][8B][uint16[3] x npart[1]]`` with the
  grid+displacement dequantization of ``decodeCompressedParticle``
  (``src/Gadget/BufVector3D.c:112-136`` read, ``:168-201`` decode,
  params ``src/Gadget/GadgetHeader.c:8-24``, id->grid bijection
  ``src/Gadget/GadId.c:39-137``).
* ``read_halos_text``          — S5: skip '#' header lines, project
  cols 0 (id), 2 (mass), 8-10 (x,y,z) of the 40-column rows
  (``src/Gadget/BufHalo.c:218-249``; 16 dummy '#' headers written by
  ``src/uniform_halo_generator/main.c:38-41``).
* ``read_filter_ids``          — S6: newline u64 list
  (``src/Gadget/BufHalo.c:251-299``).
* ``write_decoded_particles`` / ``write_halos_text`` /
  ``write_compressed_particles`` — fixture writers mirroring the
  reference generators' formats (S8/S9), driver-side numpy (test-scale
  only; the cluster-scale data path is parquet, see sources/synth.py).

Scale note: ``binaryFile``-based readers materialize one file per
task — exactly the reference's per-file processing model, and fine for
its file sizes (100M particles = 1.2 GB/file).  The 100 TB path is the
parquet/Iceberg images table; these readers exist for parity and for
one-shot conversion jobs (``convert_*_to_parquet``).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("particle_id", T.LongType()),
        T.StructField("x", T.FloatType()),
        T.StructField("y", T.FloatType()),
        T.StructField("z", T.FloatType()),
    ]
)

# GadgetHeader (include/Gadget/GadgetHeader.h:4-27), natural C alignment,
# little-endian x86-64: 256 bytes total.
_HDR_DTYPE = np.dtype(
    [
        ("npart", "<i4", 6),          # 0
        ("mass", "<f8", 6),           # 24
        ("time", "<f8"),              # 72
        ("redshift", "<f8"),          # 80
        ("flag_sfr", "<i4"),          # 88
        ("flag_feedback", "<i4"),     # 92
        ("npartTotal", "<i4", 6),     # 96
        ("flag_cooling", "<i4"),      # 120
        ("num_files", "<i4"),         # 124
        ("BoxSize", "<f8"),           # 128
        ("Omega0", "<f8"),            # 136
        ("OmegaLambda", "<f8"),       # 144
        ("HubbleParam", "<f8"),       # 152
        ("flag_stellarage", "<i4"),   # 160
        ("flag_metals", "<i4"),       # 164
        ("hashsize", "<i4"),          # 168
        ("disp_min", "<f4"),          # 172
        ("disp_max", "<f4"),          # 176
        ("pos_bits", "<i4"),          # 180
        ("id_start", "<i8"),          # 184
        ("id_end", "<i8"),            # 192
        ("fill", "S56"),              # 200 .. 256
    ]
)
assert _HDR_DTYPE.itemsize == 256


def _binary_files(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.format("binaryFile").load(paths).select("path", "content")


def read_decoded_particles(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S1/S2 -> (file, particle_id, x, y, z); id = ordinal within file."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                a = np.frombuffer(bytes(content), dtype="<f4")
                if a.size % 3:
                    raise ValueError(f"{path}: size not a multiple of 12 bytes")
                a = a.reshape(-1, 3)
                yield pd.DataFrame(
                    {
                        "file": path,
                        "particle_id": np.arange(len(a), dtype=np.int64),
                        "x": a[:, 0],
                        "y": a[:, 1],
                        "z": a[:, 2],
                    }
                )

    return _binary_files(spark, paths).mapInPandas(op, POINT_SCHEMA)


def parse_gadget_header(buf: bytes) -> dict:
    """256-byte GadgetHeader -> plain dict (readCompressedParticlesHeader)."""
    h = np.frombuffer(buf[:256], dtype=_HDR_DTYPE)[0]
    return {k: h[k].tolist() if _HDR_DTYPE[k].shape else h[k].item() for k in _HDR_DTYPE.names if k != "fill"}


def decode_compressed_np(u16: np.ndarray, hdr: dict, ntile: int = 1) -> np.ndarray:
    """(n,3) uint16 -> (n,3) float32 positions.

    Vectorized mirror of ``decodeCompressedParticle`` + ``GadId``:
      id = row + id_start (1-based); id-1 -> (tile, grid) indices;
      gridpos = nt*Ng1D + ng per axis;
      pos = f32(f32(cell_interval*ip) + disp_min) + unitsep*u16  (f64 add,
      stored f32 — the C expression's exact promotion order).
    """
    total = int(hdr["npartTotal"][1]) + (int(hdr["npartTotal"][2]) << 32)
    n1d = int((total + 0.5) ** (1.0 / 3.0))
    cell_interval = np.float32(hdr["BoxSize"] / n1d)
    unitsep = (np.float64(hdr["disp_max"]) - np.float64(hdr["disp_min"])) / 2.0 ** int(hdr["pos_bits"])
    ng1d = n1d // ntile
    ng2d, ng3d = ng1d * ng1d, ng1d * ng1d * ng1d
    nt1d, nt2d = ntile, ntile * ntile

    ids = np.arange(len(u16), dtype=np.int64) + int(hdr["id_start"])
    idt, idg = (ids - 1) // ng3d, (ids - 1) % ng3d
    ig = np.stack([idg // ng2d, (idg % ng2d) // ng1d, idg % ng1d], axis=1)
    it = np.stack([idt // nt2d, (idt % nt2d) // nt1d, idt % nt1d], axis=1)
    ip = (it * ng1d + ig).astype(np.int32)

    base = (cell_interval * ip.astype(np.float32)) + np.float32(hdr["disp_min"])
    pos = base.astype(np.float64) + unitsep * u16.astype(np.float64)
    return pos.astype(np.float32)


def read_compressed_particles(
    spark: SparkSession, paths: str | list[str], ntile: int = 1
) -> DataFrame:
    """S3+S4 -> (file, particle_id, x, y, z) from Gadget compressed blocks."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                hdr = parse_gadget_header(raw[4:260])
                n = int(hdr["npart"][1])
                u16 = np.frombuffer(raw[268 : 268 + 6 * n], dtype="<u2").reshape(-1, 3)
                pos = decode_compressed_np(u16, hdr, ntile)
                yield pd.DataFrame(
                    {
                        "file": path,
                        "particle_id": np.arange(n, dtype=np.int64),
                        "x": pos[:, 0],
                        "y": pos[:, 1],
                        "z": pos[:, 2],
                    }
                )

    return _binary_files(spark, paths).mapInPandas(op, POINT_SCHEMA)


def read_halos_text(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S5 -> (row_idx, halo_id, mass, x, y, z).

    Distributed csv scan: '#' comment lines replace the reference's
    fixed 16-line skip (the generator writes them as '# dummy header i',
    ``src/uniform_halo_generator/main.c:38-41``); only the 5 projected
    columns survive Catalyst pruning.  row_idx preserves file order for
    the report sink (result order follows halo file order, SURVEY
    §2.11.7) — valid because generator ids are sequential from 0; for
    arbitrary files use read_halos_text_ordered.
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.option("comment", "#")
        .option("sep", " ")
        .csv(paths)
        .select(
            F.col("_c0").cast("long").alias("halo_id"),
            F.col("_c2").cast("float").alias("mass"),
            F.col("_c8").cast("float").alias("x"),
            F.col("_c9").cast("float").alias("y"),
            F.col("_c10").cast("float").alias("z"),
        )
    )
    return df


def read_halos_text_ordered(spark: SparkSession, path: str) -> DataFrame:
    """S5 with an explicit per-file row_idx (single file per task)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                lines = [
                    ln
                    for ln in bytes(content).decode().splitlines()
                    if ln and not ln.startswith("#")
                ]
                cols = np.array([ln.split() for ln in lines])
                yield pd.DataFrame(
                    {
                        "row_idx": np.arange(len(cols), dtype=np.int64),
                        "halo_id": cols[:, 0].astype(np.int64),
                        "mass": cols[:, 2].astype(np.float32),
                        "x": cols[:, 8].astype(np.float32),
                        "y": cols[:, 9].astype(np.float32),
                        "z": cols[:, 10].astype(np.float32),
                    }
                )

    schema = "row_idx long, halo_id long, mass float, x float, y float, z float"
    return _binary_files(spark, path).mapInPandas(op, schema)


def read_filter_ids(spark: SparkSession, path: str) -> DataFrame:
    """S6: newline-separated u64 id list -> (halo_id)."""
    return spark.read.schema("halo_id long").csv(path)


# ------------------------------------------------------------- writers
# Driver-side numpy writers for reference-format fixtures (test scale).


def write_decoded_particles(path: str, pos: np.ndarray) -> None:
    np.asarray(pos, dtype="<f4").reshape(-1, 3).tofile(path)


def write_halos_text(path: str, ids: np.ndarray, mass: np.ndarray, pos: np.ndarray) -> None:
    """40-col rows + 16 '#' headers, like uniform_halo_generator (S9)."""
    with open(path, "w") as f:
        for i in range(16):
            f.write(f"# dummy header {i}\n")
        zeros = " ".join(["0"] * 29)
        for hid, m, p in zip(ids, mass, pos):
            f.write(f"{hid} 0 {m:g} 0 0 0 0 0 {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {zeros}\n")


def write_compressed_particles(
    path: str,
    u16: np.ndarray,
    box: float = 1000.0,
    n1d: int | None = None,
    disp_min: float = -2.0,
    disp_max: float = 2.0,
    pos_bits: int = 16,
    id_start: int = 1,
) -> dict:
    """Write a Gadget compressed block the reference can read back.

    n1d defaults to cbrt(n); n must be a perfect cube of it for ids to
    cover the grid.  Returns the header dict used.
    """
    u16 = np.asarray(u16, dtype="<u2").reshape(-1, 3)
    n = len(u16)
    if n1d is None:
        n1d = int(round(n ** (1.0 / 3.0)))
    hdr = np.zeros(1, dtype=_HDR_DTYPE)
    hdr["npart"][0, 1] = n
    hdr["npartTotal"][0, 1] = n1d**3
    hdr["BoxSize"] = box
    hdr["disp_min"] = disp_min
    hdr["disp_max"] = disp_max
    hdr["pos_bits"] = pos_bits
    hdr["id_start"] = id_start
    buf = io.BytesIO()
    frame = np.array([256], dtype="<i4").tobytes()
    buf.write(frame)
    buf.write(hdr.tobytes())
    buf.write(frame)  # closing frame of the header block
    buf.write(np.array([6 * n], dtype="<i4").tobytes())  # opening frame of data
    buf.write(u16.tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return parse_gadget_header(hdr.tobytes())


def convert_decoded_to_parquet(spark: SparkSession, src: str | list[str], dst: str) -> None:
    """S10 analog: one-shot decoded-file -> parquet conversion job."""
    read_decoded_particles(spark, src).write.mode("overwrite").parquet(dst)


def convert_compressed_to_parquet(
    spark: SparkSession, src: str | list[str], dst: str, ntile: int = 1
) -> None:
    read_compressed_particles(spark, src, ntile).write.mode("overwrite").parquet(dst)
