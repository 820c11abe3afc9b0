"""Build and persist the calibrated H3 lookup tables
(geostructures_spark/kernels/_h3_tables_cache.npz) so Spark workers load
them instead of re-deriving (~seconds per Python worker otherwise).
Deterministic: derivation + calibration use fixed probe grids."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from geostructures_spark.kernels import h3_core as H

bc_tab, rot_tab = H._run_calibration()
np.savez_compressed(H._TABLE_CACHE_PATH, bc_tab=bc_tab, rot_tab=rot_tab)
print('wrote', H._TABLE_CACHE_PATH)
