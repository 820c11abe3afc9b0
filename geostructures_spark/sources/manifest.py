"""Snapshot-manifest checkpoint layer over Parquet.

The north rule requires Iceberg-table semantics: atomic snapshots,
resume-from-checkpoint, per-partition lineage + metrics. No Iceberg jars
ship with this pyspark build (SURVEY.md §7.1 consequence 4), so the engine
implements the same contract as a thin manifest layer:

  <table>/
    snapshots/<snapshot_id>/part=<k>/...parquet      (data, per logical partition)
    _manifests/<snapshot_id>.json                    (atomic commit record)

- A logical partition (e.g. a page-id range or a cell bucket) is written
  independently; its completion is recorded with row counts + input lineage.
- The manifest is written last via atomic rename — a snapshot either has a
  complete manifest or is invisible.
- ``resume``: re-running a job skips partitions already present in the last
  good manifest (idempotent re-runs keyed by (snapshot, partition)).
- ``crash resume``: every completed partition ALSO writes an atomic sidecar
  record under ``_manifests/<snapshot>.wip/``; a job killed mid-snapshot and
  restarted with the SAME snapshot id skips those partitions too, then
  ``commit()`` folds the sidecars into the manifest and clears the wip dir.
  This is the Iceberg-commit analogue the north rule's "resumable from
  snapshot checkpoints" asks for, at both granularities (within a snapshot
  and across snapshots).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ['SnapshotWriter', 'read_snapshot', 'last_snapshot_id']


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, '_manifests')


def last_snapshot_id(table_path: str) -> Optional[str]:
    mdir = _manifest_dir(table_path)
    if not os.path.isdir(mdir):
        return None
    snaps = sorted(f[:-5] for f in os.listdir(mdir) if f.endswith('.json'))
    return snaps[-1] if snaps else None


def read_snapshot(spark: SparkSession, table_path: str,
                  snapshot_id: Optional[str] = None) -> DataFrame:
    snap = snapshot_id or last_snapshot_id(table_path)
    if snap is None:
        raise FileNotFoundError(f'no committed snapshot under {table_path}')
    manifest = json.load(open(os.path.join(_manifest_dir(table_path), f'{snap}.json')))
    paths = [p['path'] for p in manifest['partitions']]
    return spark.read.parquet(*paths)


class SnapshotWriter:
    """Partition-at-a-time writer with resume.

    Usage:
        w = SnapshotWriter(table_path, snapshot_id='s001',
                           resume_from='s000')          # or resume_from=None
        for part_key in parts:
            if w.is_done(part_key):
                continue                                 # resume skip
            df = build_partition(part_key)
            w.write_partition(part_key, df, lineage={'input': ...})
        w.commit()
    """

    def __init__(self, table_path: str, snapshot_id: str,
                 resume_from: Optional[str] = None):
        self.table_path = table_path
        self.snapshot_id = snapshot_id
        self._partitions: List[Dict] = []
        self._done_keys: Dict[str, Dict] = {}
        self._wip: Dict[str, Dict] = {}
        os.makedirs(_manifest_dir(table_path), exist_ok=True)
        if resume_from:
            prev = os.path.join(_manifest_dir(table_path), f'{resume_from}.json')
            if os.path.exists(prev):
                for p in json.load(open(prev))['partitions']:
                    self._done_keys[p['part_key']] = p
        # crash resume: partitions a previous (killed) run of THIS snapshot
        # already completed — each has an atomic sidecar record
        wdir = self._wip_dir()
        if os.path.isdir(wdir):
            for f in os.listdir(wdir):
                if f.endswith('.json'):
                    rec = json.load(open(os.path.join(wdir, f)))
                    self._wip[rec['part_key']] = rec

    def _wip_dir(self) -> str:
        return os.path.join(_manifest_dir(self.table_path),
                            f'{self.snapshot_id}.wip')

    def is_done(self, part_key: str) -> bool:
        return part_key in self._done_keys or part_key in self._wip

    def write_partition(self, part_key: str, df: DataFrame,
                        lineage: Optional[Dict] = None) -> Dict:
        path = os.path.join(self.table_path, 'snapshots', self.snapshot_id,
                            f'part={part_key}')
        t0 = time.time()
        df.write.mode('overwrite').parquet(path)
        n = df.sparkSession.read.parquet(path).count()
        rec = {
            'part_key': part_key,
            'path': path,
            'rows': n,
            'wall_sec': round(time.time() - t0, 3),
            'lineage': lineage or {},
            'committed_at': time.time(),
        }
        self._partitions.append(rec)
        # atomic sidecar: lands only after the parquet write finished, so a
        # restart of this snapshot can trust it and skip the partition
        os.makedirs(self._wip_dir(), exist_ok=True)
        spath = os.path.join(self._wip_dir(), f'{part_key}.json')
        with open(spath + '.tmp', 'w') as f:
            json.dump(rec, f)
        os.replace(spath + '.tmp', spath)
        return rec

    def commit(self) -> str:
        """Atomic publish: resumed + crash-recovered + new partitions."""
        merged: Dict[str, Dict] = dict(self._done_keys)
        merged.update(self._wip)
        merged.update({p['part_key']: p for p in self._partitions})
        all_parts = [merged[k] for k in sorted(merged)]
        manifest = {
            'snapshot_id': self.snapshot_id,
            'partitions': all_parts,
            'total_rows': sum(p['rows'] for p in all_parts),
            'committed_at': time.time(),
        }
        mpath = os.path.join(_manifest_dir(self.table_path),
                             f'{self.snapshot_id}.json')
        tmp = mpath + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)  # atomic commit
        # the manifest now owns these records; clear the wip checkpoints
        wdir = self._wip_dir()
        if os.path.isdir(wdir):
            for f in os.listdir(wdir):
                try:
                    os.unlink(os.path.join(wdir, f))
                except OSError:
                    pass
            try:
                os.rmdir(wdir)
            except OSError:
                pass
        return mpath
