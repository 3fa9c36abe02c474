import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def norm(df):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('datetime64[us]').astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f'oracle error: {e}')); continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        fails.append((name, 'no spark output')); continue
    sdf = pd.concat([pq.read_table(f).to_pandas() for f in files])
    a, b = norm(sdf), norm(odf)
    if list(a.columns) != list(b.columns):
        fails.append((name, f'cols spark={list(a.columns)} oracle={list(b.columns)}')); continue
    if len(a) != len(b):
        fails.append((name, f'rows spark={len(a)} oracle={len(b)}')); continue
    mismatch = None
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = a[c].astype(float).values; bf = b[c].astype(float).values
            bad = ~(np.isclose(af, bf, rtol=0, atol=1e-12) | (np.isnan(af)&np.isnan(bf)))
        else:
            bad = ~(av == bv)
        if bad.any():
            i = int(np.argmax(bad))
            mismatch = f'col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r} ({int(bad.sum())} bad)'
            break
    if mismatch: fails.append((name, mismatch))
    else: print(f'OK   {name} ({len(a)} rows)')
for n, m in fails: print(f'FAIL {n}: {m}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match')
# rows-only queries
# every query in the out dir without an oracleSql entry is rows-only
for name in sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)) and d not in oracle):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if files:
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        print(f'rows-only {name}: {n} rows')
    else:
        print(f'rows-only {name}: MISSING')
