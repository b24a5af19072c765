"""spark-submit job: full KG-construction pipeline with per-partition
lineage checkpoints (the north-rule deployment shape).

Usage:
  spark-submit --master local[N] --py-files jena_spark.zip \\
      tools/pipeline_job.py --sf-dir /root/testdata/sf0.1 \\
      --out /tmp/kg_out --replicate 4 [--resume]

Prints ONE JSON line: wall seconds per stage, triples in/out, and
triples/sec (the LoadMonitor-style ticker,
``jena-tdb/.../bulkloader/LoadMonitor.java:151``).

``--replicate R`` unions R deterministic copies of the derived
transcripts (conv_id suffixed ``-rK``) — same data shape at R× volume,
used to give the scaling-efficiency measurement enough work per core.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _job_bytes(spark) -> dict:
    """Whole-job byte census from the UI REST API (per-stage input/
    output/shuffle totals) — the evidence base for the scaling-ceiling
    analysis in BENCH/BASELINE.md: shuffle GiB over wall seconds =
    the bandwidth the job demands of the (shared, single-socket)
    memory system. Returns {} when the UI is disabled."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete",
                timeout=10) as r:
            doc = json.loads(r.read().decode("utf-8"))
        return {
            "input_bytes": sum(s.get("inputBytes", 0) for s in doc),
            "output_bytes": sum(s.get("outputBytes", 0) for s in doc),
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in doc),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in doc),
            "n_stages": len(doc),
        }
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--bucket-paths", default="spo,osp",
                    help="comma list of bucketed access paths for "
                         "--format bucketed (spo, osp, pos — pos is "
                         "the predicate-led composite (p_id,o_id) "
                         "layout, opt-in per its storage cost)")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing output; compute only missing buckets")
    ap.add_argument("--noop-sink", action="store_true",
                    help="force full compute but write to the noop sink: "
                         "isolates compute/shuffle scaling from the sandbox's "
                         "single shared local disk (a real cluster writes to "
                         "distributed storage)")
    ap.add_argument("--format", choices=["encoded", "strings", "bucketed"],
                    default="encoded",
                    help="encoded (default): TDB posture — id-tuple triple "
                         "table + node dictionary (term strings exist once); "
                         "strings: one denormalized string-triple table; "
                         "bucketed: encoded PLUS the SPO/OSP bucketed+sorted "
                         "tables (TDB index posture — later id-joins plan "
                         "with zero Exchange)")
    ap.add_argument("--append-from", default=None, metavar="PREV_OUT",
                    help="incremental maintenance: read the canonical "
                         "store of a PRIOR run (PREV_OUT/triples for "
                         "--format strings, PREV_OUT/{triples_enc,"
                         "node_dict} for --format encoded), fold "
                         "--sf-dir's transcripts in as a NEW conversation "
                         "batch (conv ids suffixed --conv-suffix) via "
                         "construct_incremental[_encoded], and write the "
                         "next snapshot to --out")
    ap.add_argument("--dedup-convs", action="store_true",
                    help="drop exact whole-conversation duplicates "
                         "(ordered role|text fingerprint, keep-first by "
                         "conv_id) before construction — the corpus-"
                         "hygiene stage of a transcript pipeline; "
                         "applied BEFORE --replicate (replicas are "
                         "deliberate duplicates for scale testing and "
                         "must survive)")
    ap.add_argument("--drop-loops", type=int, default=None,
                    metavar="MAX_RUN",
                    help="drop conversations whose longest run of "
                         "consecutive identical turn texts exceeds "
                         "MAX_RUN (stuck tool loops; "
                         "data.agentic.detect_loops) — like "
                         "--dedup-convs, applied before --replicate")
    ap.add_argument("--conv-suffix", default="-b2",
                    help="suffix making the appended batch's conv ids new "
                         "(deployment appends genuinely new conversations)")
    args = ap.parse_args()

    from jena_spark.data.transcripts import transcripts_df
    from jena_spark.pipeline.materialize import run_pipeline

    spark = (
        SparkSession.builder.appName("kg_pipeline_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UI on: its REST API is the per-stage byte census the scaling
        # report needs (_job_bytes); the web server itself costs ~0
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if not args.resume:
        shutil.rmtree(args.out, ignore_errors=True)

    tr = transcripts_df(spark, args.sf_dir)
    if args.dedup_convs:
        from jena_spark.data.transcripts import dedup_conversations

        keep = dedup_conversations(tr).where(F.col("keep") == 1) \
            .select("conv_id")
        tr = tr.join(keep, "conv_id", "left_semi")
    if args.drop_loops is not None:
        from jena_spark.data.agentic import detect_loops

        keep = detect_loops(tr, max_run=args.drop_loops) \
            .where(F.col("keep") == 1).select("conv_id")
        tr = tr.join(keep, "conv_id", "left_semi")
    if args.replicate > 1:
        tr = tr.crossJoin(
            spark.range(args.replicate).select(F.col("id").alias("rep"))
        ).withColumn(
            "conv_id", F.concat("conv_id", F.lit("-r"), F.col("rep").cast("string"))
        ).drop("rep")
    tr = tr.persist()
    n_turns = tr.count()

    t0 = time.perf_counter()
    if args.append_from and args.format in ("encoded", "bucketed"):
        from jena_spark.pipeline.encoded import construct_incremental_encoded
        from jena_spark.pipeline.materialize import resume_or_write

        def _prev(name):
            # drop the physical partition column; the fold re-buckets
            df = spark.read.parquet(f"{args.append_from}/{name}")
            return df.drop(*[c for c in ("part_id", "bucket") if c in df.columns])

        if args.format == "bucketed":
            # a bucketed snapshot stores the id-triples under
            # bucketed/spo (plain parquet files; the bucket metadata
            # lives in the catalog, not the files)
            prev_t = _prev("bucketed/spo")
        else:
            prev_t = _prev("triples_enc")
        batch = tr.withColumn(
            "conv_id", F.concat("conv_id", F.lit(args.conv_suffix)))
        folded_t, folded_n = construct_incremental_encoded(
            prev_t, _prev("node_dict"), batch)
        if args.format == "bucketed":
            from jena_spark.pipeline.bucketed import write_bucketed_store

            folded_t = folded_t.persist()
            write_bucketed_store(
                folded_t, "kg", f"{args.out}/bucketed", args.n_buckets)
            r_n = resume_or_write(
                folded_n, f"{args.out}/node_dict", "node_dict",
                args.n_buckets, key="val")
            n_triples = folded_t.count()
            stages = {"bucketed_appended": {"rows_out": n_triples},
                      "node_dict_appended": r_n.counters}
        else:
            r_t = resume_or_write(
                folded_t, f"{args.out}/triples_enc", "triples_enc",
                args.n_buckets, key="conv_id")
            r_n = resume_or_write(
                folded_n, f"{args.out}/node_dict", "node_dict",
                args.n_buckets, key="val")
            n_triples = r_t.counters["rows_out"]
            stages = {"triples_enc_appended": r_t.counters,
                      "node_dict_appended": r_n.counters}
    elif args.append_from:
        from jena_spark.pipeline.canonicalize import construct_incremental
        from jena_spark.pipeline.materialize import resume_or_write

        existing = spark.read.parquet(f"{args.append_from}/triples")
        existing = existing.drop(
            *[c for c in ("part_id", "bucket") if c in existing.columns])
        batch = tr.withColumn(
            "conv_id", F.concat("conv_id", F.lit(args.conv_suffix)))
        folded = construct_incremental(existing, batch)
        r = resume_or_write(
            folded, f"{args.out}/triples", "triples", args.n_buckets)
        n_triples = r.counters["rows_out"]
        stages = {"triples_appended": r.counters}
    elif args.noop_sink and args.format == "encoded":
        from pyspark.sql import Observation

        from jena_spark.pipeline.encoded import construct_canonical_encoded

        triples_enc, node_dict = construct_canonical_encoded(tr)
        obs = Observation("n")

        def _sink(df):
            df.write.format("noop").mode("overwrite").save()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as pool:  # concurrent jobs, cf. e2e
            f_t = pool.submit(
                _sink, triples_enc.observe(obs, F.count(F.lit(1)).alias("rows"))
            )
            f_n = pool.submit(_sink, node_dict)
            f_t.result(), f_n.result()
        n_triples = obs.get["rows"]
        stages = {"triples_enc_noop": {"rows_out": n_triples}}
    elif args.noop_sink:
        from pyspark.sql import Observation

        from jena_spark.pipeline.canonicalize import construct_canonical

        # Single streaming pass: extraction -> rewrite -> dedup -> sink,
        # no persist of the raw table (see construct_canonical: only the
        # small mention branch is double-consumed, via its reused
        # exchange; the structure branch streams once).
        canon = construct_canonical(tr)
        obs = Observation("n")
        canon.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
            "noop"
        ).mode("overwrite").save()
        n_triples = obs.get["rows"]
        stages = {"canonical_noop": {"rows_out": n_triples}}
    elif args.format == "bucketed":
        import time as _t

        from jena_spark.pipeline.bucketed import write_bucketed_store
        from jena_spark.pipeline.encoded import construct_canonical_encoded
        from jena_spark.pipeline.materialize import resume_or_write

        triples_enc, node_dict = construct_canonical_encoded(tr)
        # one compute, three sinks: the encoded frame is persisted so
        # the two access-path writes and the dictionary share it
        triples_enc = triples_enc.persist()
        t1 = _t.perf_counter()
        tables = write_bucketed_store(
            triples_enc, "kg", f"{args.out}/bucketed", args.n_buckets,
            paths=tuple(p.strip() for p in args.bucket_paths.split(",")
                        if p.strip()))
        w_bucketed = _t.perf_counter() - t1
        r_n = resume_or_write(
            node_dict, f"{args.out}/node_dict", "node_dict",
            args.n_buckets, key="val")
        n_triples = spark.table(next(iter(tables.values()))).count()
        stages = {
            "bucketed_" + "_".join(tables): {"rows_out": n_triples,
                                             "wall_sec": w_bucketed},
            "node_dict": r_n.counters,
        }
    elif args.format == "encoded":
        from concurrent.futures import ThreadPoolExecutor

        from jena_spark.pipeline.encoded import construct_canonical_encoded
        from jena_spark.pipeline.materialize import resume_or_write

        triples_enc, node_dict = construct_canonical_encoded(tr)
        # The two output tables are independent sinks of the same
        # (already-materialized) mention cache — submit them as
        # CONCURRENT Spark jobs so their stage tails interleave instead
        # of serializing (Spark's scheduler handles multi-threaded job
        # submission; on one core FIFO degenerates to sequential).
        with ThreadPoolExecutor(2) as pool:
            f_t = pool.submit(
                resume_or_write, triples_enc, f"{args.out}/triples_enc",
                "triples_enc", args.n_buckets, key="conv_id",
            )
            f_n = pool.submit(
                resume_or_write, node_dict, f"{args.out}/node_dict",
                "node_dict", args.n_buckets, key="val",
            )
            r_t, r_n = f_t.result(), f_n.result()
        n_triples = r_t.counters["rows_out"]
        stages = {"triples_enc": r_t.counters, "node_dict": r_n.counters}
    else:
        results = run_pipeline(spark, tr, args.out, n_buckets=args.n_buckets)
        n_triples = results["triples"].counters["rows_out"]
        stages = {k: v.counters for k, v in results.items()}
    wall = time.perf_counter() - t0
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "replicate": args.replicate,
        "parallelism": spark.sparkContext.defaultParallelism,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
        "sink": "noop" if args.noop_sink else "parquet",
        "stages": stages,
        "bytes": _job_bytes(spark),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
