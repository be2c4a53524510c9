"""Driver-gate simulation: run every registered query through
``__ray_entry__.queries()`` at sf0.01 in ONE fresh 32-cpu Ray process
and compare rows + sorted-column schema + values against its DuckDB
oracle — exactly the contract the round driver applies when it writes
``CORRECTNESS_r{N}.json``.

Usage:
    python scripts/gate_sim.py [--sf /root/testdata/sf0.01] [--only q1,q2]

Prints one line per query (OK/BAD + wall seconds) and a final summary;
exit code 1 if any query fails.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ('region nation customer supplier part orders lineitem events '
          'documents embeddings').split()


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sf', default='/root/testdata/sf0.01')
    ap.add_argument('--only', default='')
    ap.add_argument('--num-cpus', type=int,
                    default=int(os.environ.get('RAY_GRAFT_CPUS', '32')))
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address='local', num_cpus=args.num_cpus,
                 include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs
             if not args.only or n in args.only.split(',')]

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    bad, results = [], {}
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](args.sf)))
            status, detail = 'OK', ''
            if name in oracles:
                want = canon(con.sql(oracles[name]).df())
                if list(got.columns) != list(want.columns):
                    status, detail = 'BAD', (
                        f'cols {list(got.columns)} != {list(want.columns)}')
                elif len(got) != len(want):
                    status, detail = 'BAD', f'{len(got)} rows != {len(want)}'
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False,
                            check_exact=False, rtol=0, atol=1e-9)
                    except AssertionError as e:
                        status, detail = 'BAD', str(e).splitlines()[-1]
            else:
                status = 'OK(rows-only)'
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            status, detail = 'BAD', f'{type(e).__name__}: {e}'
        secs = time.time() - t0
        results[name] = {'status': status, 'secs': round(secs, 2)}
        if status.startswith('BAD'):
            bad.append(name)
            print(f'BAD  {name:34s} {secs:6.1f}s  {detail[:160]}')
        else:
            print(f'{status:4s} {name:34s} {secs:6.1f}s')
        sys.stdout.flush()

    print(json.dumps({'total': len(names), 'bad': len(bad),
                      'bad_names': bad}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
