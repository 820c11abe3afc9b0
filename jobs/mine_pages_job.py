"""Checkpointed pages -> tile-counts ingest job (spark-submit entrypoint).

The north rule's deployment shape: jobs run via ``spark-submit --py-files``
against the web-pages table, resumable from snapshot checkpoints with
per-partition lineage + metrics. This is that job, end to end:

    zip -r gs.zip geostructures_spark            # the --py-files payload
    spark-submit --master local[8] --py-files gs.zip jobs/mine_pages_job.py \
        --input  /data/pages.parquet \
        --table  /data/cell_counts_table \
        --snapshot s000 --groups 64

Pipeline per logical partition (a deterministic slice of the input part
files): scan only that slice, column-pruned to ``text`` -> mine coordinate
mentions + Niemeyer-tile + per-batch partial count in ONE fused Arrow stage
(operators/miner.py:mine_cell_counts) -> within-partition (cell, n)
aggregate -> parquet under snapshots/<id>/part=<key>.

Scale + resume story (10^12-row table, 1000 executors):
- a logical partition's work is proportional to its input files, and each
  partition is an independent Spark job over ONLY those files — no rescans;
- completion is checkpointed atomically per partition (manifest.py wip
  sidecars), so a preempted/crashed driver restarted with the same
  --snapshot skips finished partitions (verified by tests that kill the
  job mid-run via --fail-after);
- an incremental load passes --resume-from <previous snapshot> and only
  processes new partitions; the commit carries prior lineage forward;
- the manifest records, per partition: input files (lineage), output path,
  row count, wall seconds — the per-partition lineage + metrics record.

Reading the table: ``read_snapshot(spark, table)`` then
``groupBy('cell').agg(sum('n'))`` folds the per-partition partials; the
partials are associative so the final aggregate is independent of how many
partitions (or snapshot increments) produced them.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--input', required=True,
                   help='pages parquet dir (url, warc_ts, html, text, lang)')
    p.add_argument('--table', required=True, help='output snapshot-table path')
    p.add_argument('--snapshot', required=True, help='snapshot id to write')
    p.add_argument('--resume-from', default=None,
                   help='previous committed snapshot id (incremental load)')
    p.add_argument('--groups', type=int, default=16,
                   help='logical partitions (input part-file groups)')
    p.add_argument('--cell-length', type=int, default=8)
    p.add_argument('--cell-base', type=int, default=16)
    p.add_argument('--metrics-out', default=None,
                   help='also write the run metrics JSON here')
    p.add_argument('--fail-after', type=int, default=None,
                   help='TEST HOOK: exit(17) after N partitions, before '
                        'commit — simulates a mid-run crash for resume tests')
    return p


def main(argv=None) -> dict:
    args = build_arg_parser().parse_args(argv)

    # imports deferred past argparse so --help works without the zip
    from pyspark.sql import SparkSession, functions as F
    from geostructures_spark.operators.miner import mine_cell_counts
    from geostructures_spark.sources.manifest import SnapshotWriter, read_snapshot

    # master/conf come from spark-submit; only app-level settings here
    spark = (SparkSession.builder.appName('mine_pages_job')
             .config('spark.sql.session.timeZone', 'UTC')
             .getOrCreate())
    spark.sparkContext.setLogLevel('WARN')

    files = sorted(glob.glob(os.path.join(args.input, 'part-*')))
    if not files:
        raise SystemExit(f'no parquet part files under {args.input}')
    n_groups = min(args.groups, len(files))
    groups = {f'g{i:04d}': files[i::n_groups] for i in range(n_groups)}

    writer = SnapshotWriter(args.table, snapshot_id=args.snapshot,
                            resume_from=args.resume_from)
    t0 = time.time()
    written, skipped, rows_written = 0, 0, 0
    for key in sorted(groups):
        if writer.is_done(key):
            skipped += 1
            continue
        part_files = groups[key]
        partial = mine_cell_counts(spark.read.parquet(*part_files),
                                   cell_length=args.cell_length,
                                   cell_base=args.cell_base)
        rec = writer.write_partition(
            key, partial,
            lineage={'input_files': [os.path.basename(f) for f in part_files],
                     'n_input_files': len(part_files),
                     'op': 'mine_cell_counts',
                     'cell_length': args.cell_length,
                     'cell_base': args.cell_base})
        rows_written += rec['rows']
        written += 1
        print(f'PARTITION {key} rows={rec["rows"]} wall={rec["wall_sec"]}s',
              flush=True)
        if args.fail_after is not None and written >= args.fail_after:
            print(json.dumps({'simulated_crash_after_partitions': written}),
                  flush=True)
            sys.exit(17)

    manifest_path = writer.commit()
    distinct_cells = (read_snapshot(spark, args.table, args.snapshot)
                      .groupBy('cell').agg(F.sum('n').alias('n'))
                      .count())
    metrics = {
        'job': 'mine_pages_job',
        'snapshot': args.snapshot,
        'resumed_from': args.resume_from,
        'partitions_written': written,
        'partitions_skipped': skipped,
        'partial_rows_written': rows_written,
        'distinct_cells': distinct_cells,
        'wall_sec': round(time.time() - t0, 3),
        'manifest': manifest_path,
    }
    print('METRICS ' + json.dumps(metrics), flush=True)
    if args.metrics_out:
        with open(args.metrics_out, 'w') as f:
            json.dump(metrics, f, indent=1)
    spark.stop()
    return metrics


if __name__ == '__main__':
    main()
