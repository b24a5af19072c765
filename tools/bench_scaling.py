"""Two-parallelism scaling measurement (north-rule evidence).

Runs the identical pipeline job via ``spark-submit --py-files`` at
local[N] and local[4N] on the same input, computes throughput at each
and the scaling efficiency (throughput@4N / throughput@N) / 4, and
appends a measurement block to BENCH/SCALING_*.json.

Sandbox proxy for "two cluster sizes (N and 4N executors)": same JVM
count, 4x the executor threads — the shuffle/partition topology is
identical to a 4x-executor cluster modulo network, which local mode
cannot model (stated in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build_zip(dst: str) -> str:
    """Package jena_spark for --py-files distribution."""
    z = Path(dst)
    z.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(z, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "jena_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    return str(z)


def run_once(cores: int, sf_dir: str, replicate: int, workdir: str,
             noop: bool = False) -> dict:
    pyz = build_zip(f"{workdir}/jena_spark.zip")
    out = f"{workdir}/kg_out_{cores}"
    shutil.rmtree(out, ignore_errors=True)
    spark_submit = shutil.which("spark-submit") or str(
        Path(sys.executable).parent / "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("JENA_SPARK_DRIVER_MEM", "16g"),
        "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 8)}",
        "--conf", "spark.default.parallelism=%d" % cores,
        # experiment knob: extra --conf pairs, ';'-separated (e.g.
        # JENA_SPARK_EXTRA_CONF="spark.io.compression.codec=zstd") —
        # must precede the script path or spark-submit hands them to
        # the app
        *[a for kv in os.environ.get(
            "JENA_SPARK_EXTRA_CONF", "").split(";") if kv.strip()
          for a in ("--conf", kv.strip())],
        "--py-files", pyz,
        str(REPO / "tools" / "pipeline_job.py"),
        "--sf-dir", sf_dir,
        "--out", out,
        "--replicate", str(replicate),
    ]
    if noop:
        cmd.append("--noop-sink")
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        sys.stderr.write(res.stdout[-2000:] + "\n" + res.stderr[-4000:] + "\n")
        raise RuntimeError(f"job failed at local[{cores}]")
    return json.loads(lines[-1])


def best_of(cores: int, sf_dir: str, replicate: int, workdir: str, repeats: int,
            noop: bool = False) -> dict:
    """Warmup-free repeated measurement, best throughput wins — the
    reference harness's ``--repeat=N,M`` protocol (``tdbqueryplan.java:82``)
    adapted to a shared sandbox where run-to-run noise is external."""
    runs = []
    for _ in range(repeats):
        r = run_once(cores, sf_dir, replicate, workdir, noop)
        sys.stderr.write(
            f"[scaling] cores={cores} noop={noop} wall={r['wall_sec']} "
            f"tps={r['triples_per_sec']}\n"
        )
        runs.append(r)
    return max(runs, key=lambda r: r["triples_per_sec"])


def _burn(k: int) -> int:
    s = 0
    for i in range(k):
        s += i * i
    return s


def cpu_ceiling(n: int, repeats: int = 2) -> float:
    """Measured parallel-speedup ceiling of this host right now: pure
    CPU work (no Spark), N vs 4N processes. Even a perfectly parallel
    job cannot beat this on a shared box."""
    import multiprocessing as mp
    import time

    def bench(workers: int, total: int = 120_000_000) -> float:
        per = total // workers
        t0 = time.perf_counter()
        with mp.Pool(workers) as p:
            p.map(_burn, [per] * workers)
        return time.perf_counter() - t0

    lo = min(bench(n) for _ in range(repeats))
    hi = min(bench(4 * n) for _ in range(repeats))
    return round((lo / hi) / 4.0, 3)


def _stream(mb: int) -> float:
    """Memory-streaming work unit: hash + copy over a buffer far larger
    than LLC — the access pattern of shuffling/scanning wide rows."""
    import numpy as np

    a = np.arange(mb * 131_072, dtype=np.int64)  # mb MiB of int64
    s = 0
    for _ in range(4):
        b = (a * 2654435761) ^ (a >> 7)  # multiply+shift: load/store bound
        s += int(b[::4096].sum())
        a = b
    return float(s)


def mem_bandwidth_ceiling(n: int, repeats: int = 2, mb: int = 256) -> float:
    """Parallel-speedup ceiling for MEMORY-STREAMING work, N vs 4N
    processes. Unlike :func:`cpu_ceiling` (cache-resident integer
    loop), this saturates the shared DRAM bandwidth the way a
    string-row ETL does. A single box shares one memory system across
    local[N] threads; a real cluster brings 4x the bandwidth with 4x
    the executors — so this ceiling, not the CPU one, bounds what
    thread-scaling can show for byte-heavy jobs in this sandbox."""
    import multiprocessing as mp
    import time

    def bench(workers: int) -> float:
        t0 = time.perf_counter()
        with mp.Pool(workers) as p:
            p.map(_stream, [mb] * (workers * 2))  # 2 waves each
        return time.perf_counter() - t0

    bench(n)  # warmup: page-cache / allocator first-touch effects
    lo = min(bench(n) for _ in range(repeats))
    hi = min(bench(4 * n) for _ in range(repeats))
    # work scales with worker count, so efficiency = (thr_4n/thr_n)/4
    # = ((4W/hi) / (W/lo)) / 4 = lo/hi; >1 is measurement noise
    return round(min(lo / hi, 1.0), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "1"))
    replicate = int(os.environ.get("SCALING_REPLICATE", "64"))
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    workdir = os.environ.get("SCALING_WORKDIR", "/tmp/jena_spark_scaling")
    Path(workdir).mkdir(parents=True, exist_ok=True)

    lo = best_of(n, sf_dir, replicate, workdir, repeats)
    hi = best_of(4 * n, sf_dir, replicate, workdir, repeats)
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / 4.0
    lo_c = best_of(n, sf_dir, replicate, workdir, repeats, noop=True)
    hi_c = best_of(4 * n, sf_dir, replicate, workdir, repeats, noop=True)
    eff_c = (hi_c["triples_per_sec"] / lo_c["triples_per_sec"]) / 4.0
    report = {
        "sf_dir": sf_dir,
        "replicate": replicate,
        "format": "encoded (TDB posture: id-tuple triples + node dictionary)",
        "n_cores": n,
        "4n_cores": 4 * n,
        "n_turns": lo["n_turns"],
        "n_triples": lo["n_triples"],
        "end_to_end": {
            "wall_sec_n": lo["wall_sec"],
            "wall_sec_4n": hi["wall_sec"],
            "triples_per_sec_n": lo["triples_per_sec"],
            "triples_per_sec_4n": hi["triples_per_sec"],
            "scaling_efficiency": round(eff, 3),
            # per-job byte census (UI REST, pipeline_job._job_bytes):
            # the shuffle/scan GiB the job pushes through the shared
            # memory system — the quantified ceiling evidence
            "bytes_n": lo.get("bytes", {}),
            "bytes_4n": hi.get("bytes", {}),
        },
        "compute_only": {
            "wall_sec_n": lo_c["wall_sec"],
            "wall_sec_4n": hi_c["wall_sec"],
            "triples_per_sec_n": lo_c["triples_per_sec"],
            "triples_per_sec_4n": hi_c["triples_per_sec"],
            "scaling_efficiency": round(eff_c, 3),
        },
        "host_cpu_ceiling_n_to_4n": cpu_ceiling(n),
        "host_mem_bandwidth_ceiling_n_to_4n": mem_bandwidth_ceiling(n),
        # north-rule headline: end-to-end throughput scaling of the
        # deployment job (extraction -> canonicalize -> materialize)
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    out_path = REPO / "BENCH" / "SCALING.json"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(report, indent=1) + "\n")
    (REPO / "BENCH" / f"SCALING_{n}_{4*n}.json").write_text(
        json.dumps(report, indent=1) + "\n"
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
