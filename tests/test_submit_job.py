"""End-to-end spark-submit job tests (north rule deployment shape).

Runs jobs/mine_pages_job.py as a real ``spark-submit --py-files gs.zip``
subprocess: crash mid-snapshot (--fail-after test hook), restart the same
snapshot, and check the resumed run skips the checkpointed partitions and
the final table matches a direct single-pass run bit-for-bit.
"""

import glob
import json
import os
import subprocess
import sys
import zipfile

import pytest

from geostructures_spark.plans.session import get_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get('SPARK_HOME', '/opt/spark'), 'bin', 'spark-submit')


@pytest.fixture(scope='module')
def spark():
    s = get_session(app='tests_submit', cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope='module')
def pages_path(spark, tmp_path_factory):
    from geostructures_spark.sources.pages import pages_df
    path = str(tmp_path_factory.mktemp('pages') / 'pages.parquet')
    pages_df(spark, 4000, partitions=8).write.parquet(path)
    return path


@pytest.fixture(scope='module')
def pyfiles_zip(tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp('dist') / 'gs.zip')
    pkg = os.path.join(REPO, 'geostructures_spark')
    with zipfile.ZipFile(zpath, 'w') as z:
        for f in glob.glob(os.path.join(pkg, '**', '*'), recursive=True):
            if f.endswith(('.py', '.npz')):
                z.write(f, os.path.relpath(f, REPO))
    return zpath


def _submit(pyfiles_zip, *job_args):
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    return subprocess.run(
        [SPARK_SUBMIT, '--master', 'local[4]',
         '--conf', 'spark.ui.enabled=false',
         '--conf', 'spark.sql.shuffle.partitions=8',
         '--py-files', pyfiles_zip,
         os.path.join(REPO, 'jobs', 'mine_pages_job.py'), *job_args],
        capture_output=True, text=True, timeout=600, env=env)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason='spark-submit not on this host')
def test_submit_crash_then_resume(spark, pages_path, pyfiles_zip, tmp_path):
    table = str(tmp_path / 'cells_table')
    metrics_out = str(tmp_path / 'metrics.json')

    # leg 1: crash after 2 of 4 partitions, before commit
    r1 = _submit(pyfiles_zip,
                 '--input', pages_path, '--table', table,
                 '--snapshot', 's000', '--groups', '4', '--fail-after', '2')
    assert r1.returncode == 17, r1.stderr[-3000:]
    wip = glob.glob(os.path.join(table, '_manifests', 's000.wip', '*.json'))
    assert len(wip) == 2  # two checkpointed partitions survived the crash
    assert not os.path.exists(os.path.join(table, '_manifests', 's000.json'))

    # leg 2: restart the SAME snapshot — must skip the 2 done partitions
    r2 = _submit(pyfiles_zip,
                 '--input', pages_path, '--table', table,
                 '--snapshot', 's000', '--groups', '4',
                 '--metrics-out', metrics_out)
    assert r2.returncode == 0, r2.stderr[-3000:]
    metrics = json.load(open(metrics_out))
    assert metrics['partitions_skipped'] == 2
    assert metrics['partitions_written'] == 2

    # manifest: 4 partitions, each with lineage + per-partition metrics
    manifest = json.load(open(os.path.join(table, '_manifests', 's000.json')))
    assert len(manifest['partitions']) == 4
    seen_inputs = []
    for p in manifest['partitions']:
        assert p['rows'] > 0 and p['wall_sec'] >= 0
        assert p['lineage']['op'] == 'mine_cell_counts'
        seen_inputs += p['lineage']['input_files']
    # lineage covers every input part file exactly once
    all_parts = sorted(os.path.basename(f)
                       for f in glob.glob(os.path.join(pages_path, 'part-*')))
    assert sorted(seen_inputs) == all_parts
    # wip checkpoints were folded into the manifest and cleared
    assert not os.path.isdir(os.path.join(table, '_manifests', 's000.wip'))

    # the resumed snapshot folds to exactly the direct single-pass result
    from pyspark.sql import functions as F
    from geostructures_spark.operators.miner import mine_cell_counts
    from geostructures_spark.sources.manifest import read_snapshot
    got = sorted(
        read_snapshot(spark, table, 's000')
        .groupBy('cell').agg(F.sum('n').alias('n')).collect())
    want = sorted(mine_cell_counts(spark.read.parquet(pages_path)).collect())
    assert got == want


def test_snapshot_crash_resume_inprocess(spark, tmp_path):
    """SnapshotWriter wip-sidecar semantics without a subprocess."""
    from geostructures_spark.sources.manifest import (
        SnapshotWriter, last_snapshot_id, read_snapshot)
    table = str(tmp_path / 'tbl')

    w = SnapshotWriter(table, snapshot_id='s000')
    w.write_partition('p0', spark.range(7).selectExpr('id'),
                      lineage={'input': 'gen:p0'})
    del w  # crash: no commit — snapshot stays invisible
    assert last_snapshot_id(table) is None

    w2 = SnapshotWriter(table, snapshot_id='s000')
    assert w2.is_done('p0') and not w2.is_done('p1')
    w2.write_partition('p1', spark.range(5).selectExpr('id'))
    w2.commit()
    assert last_snapshot_id(table) == 's000'
    assert read_snapshot(spark, table).count() == 12
    manifest = json.load(open(os.path.join(table, '_manifests', 's000.json')))
    # the crashed run's lineage record survived into the commit
    by_key = {p['part_key']: p for p in manifest['partitions']}
    assert by_key['p0']['lineage'] == {'input': 'gen:p0'}
