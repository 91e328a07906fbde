"""Golden parity vs the COMPILED reference (astr_rcount.exe et al.).

tests/data/reference_golden/ holds outputs produced by building the
reference (`make` at /root/reference copied to a writable dir) and
running its binaries:

* pb_*.txt / uni_*.txt — astr_rcount.exe reports on the TestData4PB
  fixture and on uniform_*_generator.exe data (up.dat, uh.list; seeds
  113 / 1659533 per the reference defaults);
* uni_filtered_* — with --filter-file (J4) from a build with the
  one-line fix for the reference's uninitialized `fil->nfilters` bug
  (SURVEY §2.11.6b: the unpatched binary keeps only the first matching
  halo; we implement the intended semi-join);
* uni_twofiles_* — the same particle file twice (J5 union accumulation);
* comp_sample.gad / decoded_comp_sample.gad — a Gadget compressed
  block and particle_decoder.exe's decode of it (S3/S4/S10).

Our engine reads the reference's own files through sources/gadget.py
and must reproduce every per-halo count, and the report sink must be
byte-identical (including the buggy-Total variant).
"""

import os
import re
import shutil

import numpy as np
import pandas as pd
import pytest

from spatialjoincountovershells_spark.functions.shells import logspace_edges
from spatialjoincountovershells_spark.operators.semi_join import filter_halos
from spatialjoincountovershells_spark.operators.shell_count import shell_count
from spatialjoincountovershells_spark.sources.gadget import (
    decode_compressed_np,
    parse_gadget_header,
    read_compressed_particles,
    read_decoded_particles,
    read_filter_ids,
    read_halos_text,
    read_halos_text_ordered,
    write_compressed_particles,
    write_decoded_particles,
    write_halos_text,
)
from spatialjoincountovershells_spark.sources.report import report_lines

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLD = os.path.join(DATA, "reference_golden")
PB_PART = os.path.join(DATA, "particles_for_periodic_bound_test.dat")
PB_HALO = os.path.join(DATA, "halos_for_periodic_bound_test.list")
UNI_PART = os.path.join(GOLD, "up.dat")
UNI_HALO = os.path.join(GOLD, "uh.list")


def parse_golden_report(path: str):
    """-> (per-halo counts list[np.ndarray], ids list[int], total np.ndarray)."""
    halos, ids, cur = [], [], None
    total = None
    in_total = False
    for line in open(path):
        line = line.rstrip("\n")
        m = re.match(r"id (\d+)", line)
        if m:
            cur = []
            halos.append(cur)
            ids.append(int(m.group(1)))
            continue
        if line == "Total":
            in_total = True
            total = []
            continue
        m = re.match(r"  \[.* ~ .*\]: (\d+)", line)
        if m:
            (total if in_total else cur).append(int(m.group(1)))
    return [np.array(h) for h in halos], ids, np.array(total)


def run_on_files(spark, part_paths, halo_path, spec, filter_path=None, plan="sql"):
    parts = read_decoded_particles(spark, part_paths)
    halos = read_halos_text_ordered(spark, halo_path)
    if filter_path is not None:
        ids = read_filter_ids(spark, filter_path)
        halos = filter_halos(halos, ids, id_col="halo_id")
    edges = logspace_edges(*spec)
    counts = shell_count(
        halos, parts, edges, id_col="row_idx", dtype="float32", plan=plan
    )
    hp = halos.select("row_idx", "halo_id").toPandas().sort_values("row_idx")
    return counts, hp, edges


def assert_matches_golden(spark, part_paths, halo_path, spec, golden,
                          filter_path=None, plan="sql"):
    counts, hp, edges = run_on_files(spark, part_paths, halo_path, spec,
                                     filter_path, plan=plan)
    want_halos, want_ids, want_total = parse_golden_report(os.path.join(GOLD, golden))
    lines = report_lines(counts, hp, edges, buggy_total=True)
    golden_lines = open(os.path.join(GOLD, golden)).read().splitlines()
    assert lines == golden_lines, (
        f"report mismatch vs {golden}: first diff at "
        f"{next((i, a, b) for i, (a, b) in enumerate(zip(lines, golden_lines)) if a != b)}"
    )


@pytest.mark.parametrize(
    "spec,golden",
    [
        ((0.5, 2.0, 3), "pb_0.5_2_3.txt"),
        ((0.9, 1.8, 2), "pb_0.9_1.8_2.txt"),
        ((0.5, 0.9, 2), "pb_0.5_0.9_2.txt"),
        ((0.001, 5.0, 40), "pb_0.001_5_40.txt"),
    ],
)
def test_pb_golden_report_byte_exact(spark, spec, golden):
    """TestData4PB through our readers == astr_rcount.exe output, byte-level."""
    assert_matches_golden(spark, PB_PART, PB_HALO, spec, golden)


@pytest.mark.parametrize("plan", ["fused", "bcast", "dgrid"])
def test_pb_golden_all_plans_byte_exact(spark, plan):
    """f32 byte-parity is plan-invariant: every physical plan reproduces
    the reference report on the 40-shell PB golden (the kernels share
    one (dx2+dy2)+dz2 / strict-< searchsorted numerics contract)."""
    assert_matches_golden(spark, PB_PART, PB_HALO, (0.001, 5.0, 40),
                          "pb_0.001_5_40.txt", plan=plan)


@pytest.mark.parametrize(
    "spec,golden",
    [
        ((0.001, 5.0, 40), "uni_0.001_5_40.txt"),
        ((10.0, 300.0, 8), "uni_10_300_8.txt"),
        ((50.0, 499.0, 4), "uni_50_499_4.txt"),
    ],
)
def test_uniform_golden_report_byte_exact(spark, spec, golden):
    """2000 uniform particles x 50 halos (reference generators' output)."""
    assert_matches_golden(spark, UNI_PART, UNI_HALO, spec, golden)


def test_filtered_golden(spark):
    """J4: --filter-file semi-join parity."""
    assert_matches_golden(
        spark,
        UNI_PART,
        UNI_HALO,
        (10.0, 300.0, 8),
        "uni_filtered_10_300_8.txt",
        filter_path=os.path.join(GOLD, "filter_even.txt"),
    )


def test_twofiles_union_golden(spark, tmp_path):
    """J5: HALO x (PART1 ∪ PART2) — same file twice doubles every count."""
    a, b = str(tmp_path / "a.dat"), str(tmp_path / "b.dat")
    shutil.copy(UNI_PART, a)
    shutil.copy(UNI_PART, b)
    assert_matches_golden(
        spark, [a, b], UNI_HALO, (10.0, 300.0, 8), "uni_twofiles_10_300_8.txt"
    )


def test_compressed_decode_bit_exact(spark):
    """S3/S4: Gadget compressed block == particle_decoder.exe, bitwise."""
    df = read_compressed_particles(spark, os.path.join(GOLD, "comp_sample.gad"))
    mine = (
        df.orderBy("particle_id")
        .select("x", "y", "z")
        .toPandas()
        .to_numpy(np.float32)
    )
    ref = np.fromfile(
        os.path.join(GOLD, "decoded_comp_sample.gad"), dtype="<f4"
    ).reshape(-1, 3)
    assert np.array_equal(mine.view(np.int32), ref.view(np.int32))


def test_compressed_writer_roundtrip(tmp_path):
    """write_compressed_particles -> parse + decode numpy mirror."""
    rng = np.random.default_rng(7)
    u16 = rng.integers(0, 65536, size=(27, 3), dtype=np.uint16)
    p = str(tmp_path / "c.gad")
    hdr = write_compressed_particles(p, u16, n1d=3)
    raw = open(p, "rb").read()
    hdr2 = parse_gadget_header(raw[4:260])
    assert hdr == hdr2
    n = hdr2["npart"][1]
    back = np.frombuffer(raw[268 : 268 + 6 * n], dtype="<u2").reshape(-1, 3)
    assert np.array_equal(back, u16)
    pos = decode_compressed_np(back, hdr2)
    assert pos.shape == (27, 3) and pos.dtype == np.float32


def test_decoded_roundtrip_and_ids(spark, tmp_path):
    """S1: writer -> reader roundtrip; ids are per-file ordinals."""
    pos = np.arange(30, dtype=np.float32).reshape(-1, 3)
    p = str(tmp_path / "d.dat")
    write_decoded_particles(p, pos)
    df = read_decoded_particles(spark, p).orderBy("particle_id").toPandas()
    assert df["particle_id"].tolist() == list(range(10))
    assert np.array_equal(df[["x", "y", "z"]].to_numpy(np.float32), pos)


def test_halo_text_readers_agree(spark):
    """S5: csv reader and ordered binary reader parse identically."""
    a = (
        read_halos_text(spark, UNI_HALO)
        .orderBy("halo_id")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        read_halos_text_ordered(spark, UNI_HALO)
        .orderBy("halo_id")
        .select("halo_id", "mass", "x", "y", "z")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50


def test_halo_writer_roundtrip(spark, tmp_path):
    ids = np.arange(5, dtype=np.int64)
    mass = np.linspace(1e10, 5e10, 5).astype(np.float32)
    pos = np.linspace(0, 999, 15).astype(np.float32).reshape(-1, 3)
    p = str(tmp_path / "h.list")
    write_halos_text(p, ids, mass, pos)
    df = read_halos_text_ordered(spark, p).orderBy("row_idx").toPandas()
    assert df["halo_id"].tolist() == ids.tolist()
    got = df[["x", "y", "z"]].to_numpy(np.float32)
    assert np.allclose(got, pos, atol=5e-4)  # %.6f text roundtrip


@pytest.mark.parametrize("buggy", [False, True])
def test_distributed_report_byte_equal(spark, tmp_path, buggy):
    """write_report_distributed (range-partitioned text parts + manifest,
    no driver materialization) concatenates to the exact bytes of the
    single-node write_report on the uniform golden inputs — including
    the buggy_total reference-parity mode (VERDICT r3 #4)."""
    from spatialjoincountovershells_spark.sources.report import (
        read_report_distributed,
        write_report_distributed,
    )

    counts, hp, edges = run_on_files(
        spark, UNI_PART, UNI_HALO, (10.0, 300.0, 8))
    want = "\n".join(
        report_lines(counts, hp, edges, buggy_total=buggy)) + "\n"
    halos_df = spark.createDataFrame(hp[["row_idx", "halo_id"]])
    out = str(tmp_path / f"rep_{buggy}")
    write_report_distributed(out, counts, halos_df, edges,
                             buggy_total=buggy, n_files=3)
    got = read_report_distributed(out)
    assert got == want
