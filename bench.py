"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: the SJCS count-over-shells join on a deterministic synthetic
images/halos table sized by the scale factor of $SPARK_GRAFT_SF_DIR,
plus the graft-scope operators (tiling, PIP, kNN, dedup, ANN) on the
driver tables.  `--scaling` re-runs the headline at local[8] and
local[32] in subprocesses and writes BENCH/BASELINE.md with throughput
at both parallelism levels + scaling efficiency (the sandbox stand-in
for the N->4N-executor criterion, see BASELINE.md).

Usage: python bench.py [--cores N] [--scaling] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = "/tmp/sjcs_bench_cache"


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def materialize_inputs(spark, sf: float) -> tuple[str, str, int, int]:
    """Write the synthetic particle/halo tables once per (sf, seed)."""
    from spatialjoincountovershells_spark.functions.phash import decode_phash
    from spatialjoincountovershells_spark.sources.synth import synth_points

    n_part = max(20_000, int(6_000_000 * sf))
    n_halo = max(2_000, int(600_000 * sf))
    pdir = f"{CACHE}/particles_n{n_part}"
    hdir = f"{CACHE}/halos_n{n_halo}"
    for path, n, seed, idc in ((pdir, n_part, 1, "particle_id"), (hdir, n_halo, 2, "halo_id")):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df = decode_phash(synth_points(spark, n, seed=seed, id_col=idc, partitions=32))
            df.write.mode("overwrite").parquet(path)
    return pdir, hdir, n_part, n_halo


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def run_bench(cores: int, sf_dir: str) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from spatialjoincountovershells_spark import get_spark
    from spatialjoincountovershells_spark.operators.shell_count import (
        range_join_pairs,
        shell_count,
    )
    from spatialjoincountovershells_spark.operators.cells import explode_ring, grid_ncells, with_cell
    import __spark_entry__ as entrymod

    sf = sf_of(sf_dir)
    spark = get_spark(app=f"bench_c{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    pdir, hdir, n_part, n_halo = materialize_inputs(spark, sf)
    parts = spark.read.parquet(pdir)
    halos = spark.read.parquet(hdir)
    edges = np.logspace(np.log2(0.5), np.log2(20.0), 40, base=2.0).astype(np.float32)
    edges[-1] = np.float32(2.0 ** np.log2(20.0))

    # candidate-pair volume for the throughput metric (one-off, not timed)
    nc = grid_ncells(float(edges[-1]))
    hr = explode_ring(
        halos.selectExpr("halo_id", "x as _hx", "y as _hy", "z as _hz"),
        nc, cols=("_hx", "_hy", "_hz"),
    )
    pc = with_cell(parts, nc)
    n_pairs = hr.join(pc, "cell_id").count()

    queries: dict[str, float] = {}
    queries["sjcs_shell_sql"] = timed(
        lambda: noop_write(shell_count(halos, parts, edges, plan="sql",
                                       id_col="halo_id"))
    )
    queries["sjcs_shell_fused"] = timed(
        lambda: noop_write(shell_count(halos, parts, edges, plan="fused",
                                       id_col="halo_id"))
    )
    queries["sjcs_range_pairs"] = timed(
        lambda: noop_write(range_join_pairs(halos, parts, radius=5.0,
                                            id_col="halo_id"))
    )
    for name in ("tile_assign", "point_in_polygon", "knn", "minhash_lsh",
                 "ann_cosine", "dedup_exact"):
        fn = entrymod.queries()[name]
        queries[name] = timed(lambda fn=fn: noop_write(fn(spark, sf_dir)))

    t_shell = queries["sjcs_shell_sql"]
    result = {
        "metric": "sjcs_candidate_pairs_per_sec",
        "value": round(n_pairs / t_shell, 1),
        "unit": "pairs/sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "cores": cores,
        "n_particles": n_part,
        "n_halos": n_halo,
        "n_candidate_pairs": n_pairs,
        "total_sec": round(sum(queries.values()), 3),
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str) -> None:
    """local[8] vs local[32] on identical input -> BENCH/BASELINE.md."""
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores), "--sf-dir", sf_dir],
            capture_output=True, text=True, timeout=3000,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    t8 = results[8]["queries"]["sjcs_shell_sql"]
    t32 = results[32]["queries"]["sjcs_shell_sql"]
    thr8 = results[8]["n_candidate_pairs"] / t8
    thr32 = results[32]["n_candidate_pairs"] / t32
    eff = (thr32 / thr8) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence\n\n"
            "Same job (SJCS 40-shell count, plan=sql) on identical input at\n"
            "two parallelism levels — the sandbox stand-in for the N->4N\n"
            "executor criterion (BASELINE.json north_rule).\n\n"
            f"| cores | particles | halos | candidate pairs | shell-count sec | pairs/sec |\n"
            f"|---|---|---|---|---|---|\n"
            f"| 8 | {results[8]['n_particles']} | {results[8]['n_halos']} | "
            f"{results[8]['n_candidate_pairs']} | {t8:.2f} | {thr8:,.0f} |\n"
            f"| 32 | {results[32]['n_particles']} | {results[32]['n_halos']} | "
            f"{results[32]['n_candidate_pairs']} | {t32:.2f} | {thr32:,.0f} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores, 4x): {eff:.3f}**"
            f" (target >= 0.8)\n\n"
            f"Full per-query timings:\n\n```json\n"
            f"{json.dumps(results[8])}\n{json.dumps(results[32])}\n```\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "pairs_per_sec_8": round(thr8, 1),
                      "pairs_per_sec_32": round(thr32, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        run_scaling(args.sf_dir)
    else:
        print(json.dumps(run_bench(args.cores, args.sf_dir)))


if __name__ == "__main__":
    main()
