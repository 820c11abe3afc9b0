"""DuckDB-SQL replay of the S2 cell-id forward transform.

Independent execution of kernels/s2.py (cube face -> quadratic st ->
Hilbert curve position -> 64-bit id), one 2-bit Hilbert step per CTE
layer with the published order/orientation tables as array literals.
UBIGINT arithmetic uses multiplication by power-of-two constants
(DuckDB's << overflow-checks at bit 61). Same oracle standard as
plans/h3_sql.py.
"""

from __future__ import annotations

from geostructures_spark.plans.h3_sql import _Pipe

__all__ = ['s2_latlng_to_token_sql']

_IJ_TO_POS = '[[1, 2, 4, 3], [1, 4, 2, 3], [3, 2, 4, 1], [3, 4, 2, 1]]'
# NOTE: entries above are pos+1 (DuckDB lists are 1-indexed); see below.
_POS_TO_ORIENT = '[1, 0, 0, 3]'


def s2_latlng_to_token_sql(points_sql: str, level: int,
                           id_col: str = 'pid') -> str:
    """SQL producing ({id_col}, cell) — canonical S2 tokens at ``level``
    for every (lon, lat) row of ``points_sql``."""
    from geostructures_spark.kernels import s2 as S

    # build the 1-indexed lookup literal from the kernel's table so the
    # two implementations share one source of truth
    ij_to_pos = ('[' + ', '.join(
        '[' + ', '.join(str(int(S._IJ_TO_POS[o, ij]) + 1) for ij in range(4)) + ']'
        for o in range(4)) + ']')
    pos_to_orient = ('[' + ', '.join(str(int(v)) for v in S._POS_TO_ORIENT)
                     + ']')

    pipe = _Pipe('s2pts')
    pipe.layer({
        'px': 'cos(radians(lat)) * cos(radians(lon))',
        'py': 'cos(radians(lat)) * sin(radians(lon))',
        'pz': 'sin(radians(lat))',
    })
    pipe.layer({'ax': 'abs(px)', 'ay': 'abs(py)', 'az': 'abs(pz)'})
    pipe.layer({'f0': """CASE WHEN ax >= ay THEN
                    CASE WHEN ax >= az THEN 0 ELSE 2 END
                  ELSE CASE WHEN ay >= az THEN 1 ELSE 2 END END"""})
    pipe.layer({'face': """f0 + CASE WHEN
        (CASE f0 WHEN 0 THEN px WHEN 1 THEN py ELSE pz END) < 0.0e0
        THEN 3 ELSE 0 END"""})
    pipe.layer({
        'fu': """CASE face
            WHEN 0 THEN py / px WHEN 1 THEN -px / py WHEN 2 THEN -px / pz
            WHEN 3 THEN pz / px WHEN 4 THEN pz / py ELSE -py / pz END""",
        'fv': """CASE face
            WHEN 0 THEN pz / px WHEN 1 THEN pz / py WHEN 2 THEN -py / pz
            WHEN 3 THEN py / px WHEN 4 THEN -px / py ELSE -px / pz END""",
    })
    st = ("""CASE WHEN {0} >= 0.0e0
             THEN 0.5e0 * sqrt(1.0e0 + 3.0e0 * {0})
             ELSE 1.0e0 - 0.5e0 * sqrt(1.0e0 - 3.0e0 * {0}) END""")
    pipe.layer({'fs': st.format('fu'), 'ft': st.format('fv')})
    max_ij = (1 << S.MAX_LEVEL) - 1
    pipe.layer({
        'ci': (f'LEAST(GREATEST(CAST(trunc(fs * {1 << S.MAX_LEVEL}) '
               f'AS BIGINT), 0), {max_ij})'),
        'cj': (f'LEAST(GREATEST(CAST(trunc(ft * {1 << S.MAX_LEVEL}) '
               f'AS BIGINT), 0), {max_ij})'),
    })
    # Hilbert walk: one 2-bit step per layer, MSB first
    pipe.layer({'o0': 'face % 2', 'p0': 'CAST(0 AS UBIGINT)'})
    for step, k in enumerate(range(S.MAX_LEVEL - 1, -1, -1)):
        prev_o, prev_p = f'o{step}', f'p{step}'
        ij = f'((ci // {1 << k}) % 2) * 2 + ((cj // {1 << k}) % 2)'
        pipe.layer({f'd{step}': f'{ij_to_pos}[{prev_o} + 1][{ij} + 1] - 1'})
        pipe.layer({
            f'o{step + 1}': f'xor({prev_o}, {pos_to_orient}[d{step} + 1])',
            f'p{step + 1}': (f'{prev_p} * CAST(4 AS UBIGINT) '
                             f'+ CAST(d{step} AS UBIGINT)'),
        })
    pos = f'p{S.MAX_LEVEL}'
    # leaf id then ancestor at `level` (clear below the sentinel, set it)
    two61 = 1 << 61
    lsb = 1 << (2 * (S.MAX_LEVEL - level))
    pipe.layer({'leaf': (f'CAST(face AS UBIGINT) * {two61} '
                         f'+ {pos} * CAST(2 AS UBIGINT) '
                         f'+ CAST(1 AS UBIGINT)')})
    pipe.layer({'cid': (f'leaf - (leaf % {2 * lsb}) '
                        f'+ CAST({lsb} AS UBIGINT)')})
    pipe.layer({'cell': "rtrim(lpad(lower(to_hex(cid)), 16, '0'), '0')"})
    ctes = ',\n'.join([f's2pts AS ({points_sql})'] + pipe.ctes)
    return f'WITH {ctes}\nSELECT {id_col}, cell FROM {pipe.prev}'
