"""Reference pytest-parity report (the north rule's parity gate).

Two layers:

1. Run the reference's OWN test modules that import without its optional
   dependencies (h3/shapely/pyproj/fastkml/pyshp/geographiclib are not
   installable here — no network). The karney_* tests are deselected: they
   require geographiclib and fail in the reference itself in this
   environment.
2. Run this engine's golden-replay test modules — every hardcoded golden
   value extractable from the reference suite (including the H3 cell ids
   that the reference's own tests cannot check here, because the h3 package
   is absent) asserted against the engine's kernels and operators.

Exit 0 iff both layers pass.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = '/root/reference'

REF_MODULES = ['tests/test_calc.py', 'tests/test_geometry.py',
               'tests/test_conversion.py', 'tests/test_geodesic.py']
ENGINE_MODULES = ['tests/']  # the full golden-replay + operator suite


def run(cwd, args):
    r = subprocess.run([sys.executable, '-m', 'pytest', '-q', *args],
                       cwd=cwd, capture_output=True, text=True, timeout=1200)
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-200:]
    return r.returncode, tail


def main() -> int:
    ok = True
    code, tail = run(REF, [*REF_MODULES, '--deselect', 'tests/test_geodesic.py::test_karney_bearing',
                           '--deselect', 'tests/test_geodesic.py::test_karney_distance',
                           '--deselect', 'tests/test_geodesic.py::test_karney_destination',
                           '--deselect', 'tests/test_geodesic.py::test_set_geodesic_algorithm'])
    print(f'[{"OK" if code == 0 else "FAIL"}] reference suite (dependency-free subset): {tail}')
    print('      (karney_* deselected: geographiclib is not installable here, so'
          ' those tests fail in the reference itself in this environment;'
          ' their golden VALUES are replayed against the from-scratch kernel'
          ' in tests/test_kernels_karney.py below)')
    ok &= code == 0

    code, tail = run(REPO, ENGINE_MODULES)
    print(f'[{"OK" if code == 0 else "FAIL"}] engine golden-replay suite: {tail}')
    ok &= code == 0
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
